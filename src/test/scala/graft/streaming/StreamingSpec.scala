package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal the batch equivalent (complete mode)") {
    val stream = StreamingOps.eventStream(spark, sf("sf0.001"))
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .orderBy($"wstart", $"event_type").collect().toSeq
      val batch = StreamingOps.windowedCountsBatch(
        graft.Tables.t(spark, sf("sf0.001"), "events"))
        .orderBy($"wstart", $"event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per normalized content hash") {
    // memory-source stream of doc-shaped rows with planted duplicates
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    src.addData(
      (1L, at(0), "Hello  World"), (2L, at(1), "hello world"), // dup after norm
      (3L, at(2), "other doc"), (4L, at(3), "Hello World"))    // dup again
    val docs = src.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStream(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("sd").outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("sd").select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(kept.size == 2)              // one per distinct normalized text
      assert(kept.contains(3L))           // the unique doc survives
      assert((kept - 3L).subsetOf(Set(1L, 2L, 4L))) // exactly one of the dups
    } finally q.stop()
  }

  test("sessionization counts per-user events with gap splits") {
    val events = Seq(
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "b"),
      // 40-minute gap → session closes
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:50:00"), "c"),
      StreamingOps.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDS()
    // run through the same state function in batch mode (Spark supports
    // flatMapGroupsWithState on static Datasets for testing)
    val out = StreamingOps.sessionize(events).collect()
    val u1 = out.filter(_.user_id == 1L)
    assert(u1.exists(o => o.closed && o.n_events == 2))   // closed session of 2
    assert(u1.exists(o => !o.closed && o.n_events == 1))  // open session of 1
    assert(out.filter(_.user_id == 2L).map(_.n_events).toSeq == Seq(1L))
  }
}
