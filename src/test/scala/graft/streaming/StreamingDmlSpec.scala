package graft.streaming

import graft.SparkSpec
import graft.sources.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming micro-batches landing as GraftTable DML commits: contents
  * equal the batch-equivalent table after each wave, every micro-batch is
  * one time-travelable version, and replayed batch ids are skipped (the
  * exactly-once guard the txn-in-manifest marker exists for). */
class StreamingDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streaming insert sink appends one table version per micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("graft_sdml_ins")
    GraftTable.create(spark, root, Seq((1L, "seed")).toDF("id", "v"))
    val src = MemoryStream[(Long, String)]
    val q = StreamingDml.insertSink(src.toDF().toDF("id", "v"), root,
      "ins_q", tmp("graft_sdml_ckpt"))
    try {
      src.addData((2L, "b0"), (3L, "b0"))
      q.processAllAvailable()
      val v2 = GraftTable.currentVersion(root)
      src.addData((4L, "b1"))
      q.processAllAvailable()
      assert(GraftTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "seed"), (2L, "b0"), (3L, "b0"), (4L, "b1")))
      // each batch is a version; the earlier snapshot is still readable
      assert(GraftTable.currentVersion(root) == v2 + 1)
      assert(GraftTable.read(spark, root, Some(v2)).count() == 3)
    } finally q.stop()
  }

  test("replayed or stale batch ids are skipped (exactly-once guard)") {
    val root = tmp("graft_sdml_replay")
    GraftTable.create(spark, root, Seq((1L, "seed")).toDF("id", "v"))
    def ins(id: Long): Boolean = StreamingDml.applyBatch(root, "q", id) {
      GraftTable.insert(spark, root, Seq((100L + id, "x")).toDF("id", "v"),
        txn = Some(("q", id)))
    }
    assert(ins(0));  assert(!ins(0))       // replay of the same batch: no-op
    assert(ins(1));  assert(!ins(0))       // stale id after progress: no-op
    assert(GraftTable.read(spark, root).count() == 3) // seed + batch0 + batch1
    assert(GraftTable.lastTxn(root, "q").contains(1L))
    assert(GraftTable.lastTxn(root, "other").isEmpty)
  }

  test("chunking is stream-transparent (stateless projection chain)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "a b c d e f g h i j"), (2L, "k l m"))
    val q = graft.pipeline.Chunking.chunk(
        src.toDF().toDF("doc_id", "text"), "text", size = 4, stride = 3)
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("chunks")
        .orderBy("doc_id", "chunk_id").collect().toSeq
      val batch = graft.pipeline.Chunking.chunk(
          Seq((1L, "a b c d e f g h i j"), (2L, "k l m")).toDF("doc_id", "text"),
          "text", size = 4, stride = 3)
        .orderBy("doc_id", "chunk_id").collect().toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming upsert sink merges each micro-batch on the key") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("graft_sdml_ups")
    GraftTable.create(spark, root,
      Seq((1L, "old1"), (2L, "old2")).toDF("id", "v"))
    val src = MemoryStream[(Long, String)]
    val q = StreamingDml.upsertSink(src.toDF().toDF("id", "v"), root,
      Seq("id"), "ups_q", tmp("graft_sdml_ckpt2"))
    try {
      src.addData((2L, "new2"), (3L, "new3")) // one update, one insert
      q.processAllAvailable()
      assert(GraftTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "old1"), (2L, "new2"), (3L, "new3")))
    } finally q.stop()
  }
}
