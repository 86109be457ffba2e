package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("a stream can be DEFINED before the first events file exists") {
    // the normal streaming-source lifecycle: schema resolution must not
    // throw when the directory is still empty — the sniff falls back to
    // the default (normalized-ts) schema
    val empty = java.nio.file.Files.createTempDirectory("graft_stream_empty_").toString
    val schema = StreamingOps.eventsRawSchema(spark, empty)
    assert(schema === StreamingOps.eventsDefaultSchema)
    val stream = StreamingOps.eventStream(spark, empty) // must not throw
    assert(stream.isStreaming)
    assert(stream.schema.fields.find(_.name == "ts").get.dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("streaming anomaly flags are bit-identical to the batch entry on replay") {
    val batchEvents = graft.Tables.t(spark, sf("sf0.001"), "events")
    val profile = StreamingOps.anomalyProfile(batchEvents)
    val q = StreamingOps.anomalyStream(
        StreamingOps.eventStream(spark, sf("sf0.001")), profile)
      .writeStream.format("memory").queryName("anom")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("anom")
        .select($"event_type", $"d", $"c", $"z", $"is_anomaly")
        .orderBy($"event_type", $"d").collect().toSeq
      val batch = graft.operators.OlapSuites.eventsAnomaly(spark, sf("sf0.001"))
        .orderBy($"event_type", $"d").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

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

  test("streaming EWMA across micro-batches is bit-identical to the one-shot batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // two users, 6 events each, values chosen so truncation fires
    val rows = for (u <- 1L to 2L; i <- 0L until 6L)
      yield StreamingOps.EwmaIn(u, at(u * 1000 + i * 60), u * 100 + i,
        (i + 1) * 1.01 * u)
    val (first, second) = rows.partition(_.event_id % 100 < 3)
    val src = MemoryStream[StreamingOps.EwmaIn]
    val q = StreamingOps.ewmaStream(src.toDS())
      .writeStream.format("memory").queryName("ewma").outputMode("append").start()
    try {
      // time-ordered micro-batches per key: the state hand-off is what's
      // under test — the incremental recurrence must equal the full fold
      src.addData(first: _*)
      q.processAllAvailable()
      src.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("ewma")
        .orderBy($"user_id", $"event_id")
        .as[StreamingOps.EwmaOut].collect().toSeq
      val batch = StreamingOps.ewmaBatch(rows.toDS())
        .orderBy($"user_id", $"event_id").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch,
        "incremental state hand-off must reproduce the one-shot fold")
      // spot-check the recurrence arithmetic by hand for user 1:
      // cents = 101, 202, 303, ... ; e1=101, e2=(202+101)/2=151 (floor), …
      val u1 = batch.filter(_.user_id == 1L).map(_.ewma_cents)
      assert(u1.head == 101L && u1(1) == 151L)
    } finally q.stop()
  }

  test("streaming SCD2 across micro-batches equals the one-shot fold and the batch entry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // replay the real fixture: per-key monotone arrival via a global ts split
    val all = graft.Tables.t(spark, sf("sf0.001"), "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[StreamingOps.Scd2In].collect().toSeq
    val cut = all.map(_.ts.getTime).sorted.apply(all.size / 2)
    val (first, second) = all.partition(_.ts.getTime < cut)
    val src = MemoryStream[StreamingOps.Scd2In]
    val q = StreamingOps.scd2Stream(src.toDS())
      .writeStream.format("memory").queryName("scd2").outputMode("append").start()
    try {
      src.addData(first: _*)
      q.processAllAvailable()
      src.addData(second: _*)
      q.processAllAvailable()
      def key(r: StreamingOps.Scd2Out) =
        (r.user_id, r.version, r.state, r.valid_from.getTime, r.valid_to.getTime)
      val streamed = spark.table("scd2").as[StreamingOps.Scd2Out]
        .collect().map(key).toSet
      val oneShot = StreamingOps.scd2Batch(all.toDS()).collect().map(key).toSet
      assert(streamed.nonEmpty && streamed == oneShot,
        "incremental state hand-off must reproduce the one-shot fold")
      // and both equal the declarative batch entry's CLOSED versions
      val entry = graft.operators.BizAnalytics.eventsScd2(spark, sf("sf0.001"))
        .filter(!$"is_current")
        .select($"user_id", $"version", $"state", $"valid_from", $"valid_to")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getTimestamp(3).getTime, r.getTimestamp(4).getTime)).toSet
      assert(streamed == entry,
        "stream must equal the window-based batch entry bit-for-bit")
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

  test("streaming near-dup keys on the batch-identical MinHash signature") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "THE  quick   Brown fox jumps over the lazy DOG", // same after norm
      "a completely different document about spark engines")
    src.addData((1L, at(0), texts(0)), (2L, at(1), texts(1)), (3L, at(2), texts(2)))
    val docs = src.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.nearDedupStream(docs, "text")
      .writeStream.format("memory").queryName("nd").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("nd").select($"doc_id", $"mh_sig").collect()
      assert(rows.length == 2, "signature-equal docs dedup to one")
      assert(rows.exists(_.getLong(0) == 3L))
      // batch-equivalence: the per-row signature must equal the batch
      // pipeline's (shingleHashes + minhashSignaturesHashed) for the
      // same text — same normalization, shingling, hash family
      val static = Seq((10L, texts(0)), (30L, texts(2))).toDF("doc_id", "text")
      val batchSig = graft.pipeline.Dedup.minhashSignaturesHashed(
        graft.pipeline.Dedup.shingleHashes(static, "text", 3), 32)
      val batchCat = batchSig.select($"doc_id",
        org.apache.spark.sql.functions.concat_ws("|",
          (0 until 32).map(i => $"h$i"): _*).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val streamSig = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamSig(streamSig.keys.filter(_ != 3L).head) == batchCat(10L))
      assert(streamSig(3L) == batchCat(30L))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch band join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val errors = MemoryStream[(Long, java.sql.Timestamp, Long)]
    clicks.addData((1L, at(0), 100L), (1L, at(120), 101L), (2L, at(10), 102L))
    errors.addData((1L, at(30), 200L), (1L, at(300), 201L), (2L, at(500), 202L))
    val cl = clicks.toDF().toDF("user_id", "ts", "event_id")
    val er = errors.toDF().toDF("user_id", "ts", "event_id")
    val q = StreamingOps.intervalJoin(cl, er, "user_id", bandSeconds = 60)
      .select($"event_id", $"r_event_id")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // within 60s on the same user: click 100 ↔ error 200 only
      assert(got == Set((100L, 200L)))
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch left join") {
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3))
      .toDF("et", "weight")
    val stream = StreamingOps.eventStream(spark, sf("sf0.001"))
    val q = StreamingOps.enrichStream(stream, dim, "event_type", "et")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enr")
      val events = graft.Tables.t(spark, sf("sf0.001"), "events")
      val batch = StreamingOps.enrichStream(events, dim, "event_type", "et")
      // left join preserves every event; matches agree with the batch plan
      assert(streamed.count() == events.count())
      assert(streamed.filter($"weight".isNotNull).count() ==
        batch.filter($"weight".isNotNull).count())
      assert(streamed.filter($"weight".isNull).count() ==
        batch.filter($"weight".isNull).count())
    } finally q.stop()
  }

  test("streaming ANN lookup equals the batch LSH lookup, self is nearest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = graft.Tables.t(spark, sf("sf0.001"), "embeddings")
      .select($"vec_id", $"embedding")
    // tiny plane family (4 bits) so buckets are populated at 500 vectors
    val planes = graft.pipeline.Similarity.hyperplanes(spark, 4, 64)
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (p, rows) =>
        p -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    // three corpus vectors as streaming queries
    val queryRows = corpus.filter($"vec_id".isin(1L, 7L, 42L))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qs = MemoryStream[(Long, Seq[Float])]
    qs.addData(queryRows.toSeq: _*)
    val qdf = qs.toDF().toDF("query_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val q = StreamingOps.annLookupStream(qdf, corpus, planes, k = 3)
      .writeStream.format("memory").queryName("annq").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("annq").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1),
          r.getAs[Number](2).doubleValue)).toList
      assert(streamed.length == 3)
      // a query vector IS in the corpus: its own id leads the neighbor
      // list with cosine 1.0 (bucket family is the same on both sides)
      streamed.foreach { case (qid, ns, best) =>
        assert(ns.head == qid, s"query $qid nearest should be itself, got $ns")
        assert(math.abs(best - 1.0) < 1e-6)
      }
      // batch equivalence: the same function over a static frame
      val batchQ = corpus.filter($"vec_id".isin(1L, 7L, 42L))
        .select($"vec_id".as("query_id"), $"embedding")
      val batch = StreamingOps.annLookupStream(batchQ, corpus, planes, k = 3)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      streamed.foreach { case (qid, ns, _) =>
        assert(batch(qid) == ns, s"stream/batch neighbor mismatch for $qid")
      }
    } finally q.stop()
  }

  test("quota admission caps each domain across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[StreamingOps.DocIn]
    // batch 1: a gets 2, b gets 1 — under the quota of 3
    src.addData(StreamingOps.DocIn(1L, "a"), StreamingOps.DocIn(2L, "a"),
      StreamingOps.DocIn(3L, "b"))
    val q = StreamingOps.quotaAdmitStream(src.toDS(), quota = 3L)
      .writeStream.format("memory").queryName("qa").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: a offers 3 more but only 1 slot remains; b fills up
      src.addData(StreamingOps.DocIn(4L, "a"), StreamingOps.DocIn(5L, "a"),
        StreamingOps.DocIn(6L, "a"), StreamingOps.DocIn(7L, "b"),
        StreamingOps.DocIn(8L, "b"))
      q.processAllAvailable()
      // batch 3: both saturated — nothing admitted
      src.addData(StreamingOps.DocIn(9L, "a"), StreamingOps.DocIn(10L, "b"))
      q.processAllAvailable()
      val out = spark.table("qa").as[StreamingOps.AdmitOut].collect()
      val byDomain = out.groupBy(_.domain).view.mapValues(_.sortBy(_.admit_seq)).toMap
      assert(byDomain("a").map(_.doc_id).toSeq == Seq(1L, 2L, 4L),
        "domain a admits the first 2, then the doc_id-sorted head of batch 2")
      assert(byDomain("b").map(_.doc_id).toSeq == Seq(3L, 7L, 8L))
      assert(out.forall(_.admit_seq <= 3L), "admission sequence exceeds quota")
      assert(byDomain("a").map(_.admit_seq).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming quantile sketch: final estimate equals the one-shot batch twin, state is bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // deterministic synthetic stream: 2 users, 300 values in [0, 100)
    val all = (0 until 300).map(i =>
      StreamingOps.QuantIn(i % 2, (i * 37 % 1000) / 10.0))
    val (lo, hi, nbins) = (0.0, 100.0, 16)
    val src = MemoryStream[StreamingOps.QuantIn]
    val q = StreamingOps.quantileSketchStream(src.toDS(), lo, hi, nbins)
      .writeStream.format("memory").queryName("qs").outputMode("append").start()
    try {
      // three arrival orders of the same multiset would give the same
      // histogram; drive one split across three micro-batches
      src.addData(all.take(100): _*); q.processAllAvailable()
      src.addData(all.slice(100, 250): _*); q.processAllAvailable()
      src.addData(all.drop(250): _*); q.processAllAvailable()
      val emitted = spark.table("qs").as[StreamingOps.QuantOut].collect()
      // the LAST emission per key is the full-data estimate
      val fin = emitted.groupBy(_.user_id).view
        .mapValues(_.maxBy(_.n)).values.toSeq.sortBy(_.user_id)
      val batch = StreamingOps.quantileSketchBatch(
        spark.createDataset(all), lo, hi, nbins).collect().sortBy(_.user_id).toSeq
      assert(fin == batch, s"stream $fin != batch $batch")
      assert(fin.forall(_.bins_used <= nbins), "state exceeded the declared grid")
      assert(fin.forall(o => o.n == 150), "each user saw 150 values")
      // the estimate is within half a bin width of the exact quantile
      val w = (hi - lo) / nbins
      for (u <- Seq(0L, 1L)) {
        val vs = all.filter(_.user_id == u).map(_.value).sorted
        val exact50 = vs((vs.length / 2) - 1)
        val got = fin.find(_.user_id == u).get.p50
        assert(math.abs(got - exact50) <= w,
          s"p50 estimate $got too far from exact $exact50")
      }
    } finally q.stop()
  }

  test("streaming heavy hitters: state hand-off equals the one-shot Space-Saving fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def at(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // 6 distinct types against capacity 4 → evictions fire, the
    // order-dependent regime; user 2 sees the reversed type order so the
    // two keys' sketches genuinely differ
    val types = Seq("a", "a", "a", "b", "a", "c", "b", "d", "a", "e",
      "b", "f", "a", "c", "a", "b", "a", "d", "e", "a")
    val rows = for {
      u <- 1L to 2L
      (t, i) <- (if (u == 1L) types else types.reverse).zipWithIndex
    } yield StreamingOps.HhIn(u, at(u * 10000 + i * 60), u * 1000 + i, t)
    val src = MemoryStream[StreamingOps.HhIn]
    val q = StreamingOps.heavyHittersStream(src.toDS())
      .writeStream.format("memory").queryName("hh").outputMode("append").start()
    try {
      // per-key time-ordered micro-batches (prefix splits of each key's
      // stream): the hand-off must reproduce the one-shot fold exactly
      val batches = Seq(
        rows.filter(_.event_id % 1000 < 7),
        rows.filter(r => r.event_id % 1000 >= 7 && r.event_id % 1000 < 14),
        rows.filter(_.event_id % 1000 >= 14))
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      val emitted = spark.table("hh").as[StreamingOps.HhOut].collect()
      val fin = emitted.groupBy(_.user_id).view
        .mapValues { es => val n = es.map(_.n_seen).max
          es.filter(_.n_seen == n).toSet }.toMap
      val batch = StreamingOps.heavyHittersBatch(rows.toDS()).collect()
        .groupBy(_.user_id).view.mapValues(_.toSet).toMap
      assert(fin == batch, s"stream $fin != batch $batch")
      // Space-Saving guarantees against the true counts: tracked values
      // satisfy est − err ≤ true ≤ est; 'a' (freq 8/20 > N/capacity) is
      // always tracked and ranked first
      for (u <- Seq(1L, 2L)) {
        val truth = types.groupBy(identity).view.mapValues(_.length.toLong)
        val snap = fin(u)
        assert(snap.exists(_.value == "a"))
        snap.foreach { h =>
          val t = truth.getOrElse(h.value, 0L)
          assert(h.est - h.err <= t && t <= h.est,
            s"user $u ${h.value}: true $t outside [${h.est - h.err}, ${h.est}]")
        }
        assert(snap.maxBy(_.est).value == "a")
        assert(snap.size <= 3) // top-k emission bound
      }
    } finally q.stop()
  }

  test("streaming curation: quality gate, dedup, quota compose") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "the cat runs to the big park in warm sun"
    val src = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // batch 1: a good doc, a quality reject, an exact duplicate
    src.addData(
      (1L, at(0), s"$good light", "a"),
      (5L, at(1), "zz zz", "a"),
      (2L, at(2), s"$good light", "a"))
    val docs = src.toDF().toDF("doc_id", "ts", "text", "domain")
    val q = StreamingOps.curateStream(docs, quota = 2L)
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: two more good distinct docs — only one quota slot left
      src.addData(
        (3L, at(3), s"$good glow", "a"),
        (4L, at(4), s"$good rays", "a"))
      q.processAllAvailable()
      val admitted = spark.table("cs").as[StreamingOps.AdmitOut].collect()
      assert(admitted.length == 2, admitted.mkString(","))
      val ids = admitted.map(_.doc_id).toSet
      assert(!ids.contains(5L), "quality reject must not be admitted")
      assert((ids & Set(1L, 2L)).size == 1, "exactly one of the dups")
      assert(ids.contains(3L), "doc_id-sorted head of batch 2 takes the last slot")
      assert(admitted.map(_.admit_seq).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("streaming incremental dedup ingestion accumulates exactly the batch pair set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Dedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    // duplicates within a shard (6,7), across adjacent shards (1→10),
    // across distant shards (2→30), near-dups across shards (4→20),
    // uniques — the full arrival-order matrix
    val docs = Seq(
      (1L, base), (2L, base), (6L, "one two three four five six seven eight nine ten"),
      (7L, "one two three four five six seven eight nine ten"),
      (10L, base), (4L, near),
      (20L, near), (30L, base),
      (40L, "another unique document that matches nothing in the corpus"))
    val shards = Seq(docs.take(4), docs.slice(4, 7), docs.drop(7))
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    val (indexDir, pairsDir) = (s"$root/index", s"$root/pairs")
    val src = MemoryStream[(Long, String)]
    val q = StreamingOps.incrementalDedupIngest(
      src.toDF().toDF("doc_id", "text"), "text", indexDir, pairsDir).start()
    try {
      shards.foreach { s => src.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    val streamed = pairSet(spark.read.parquet(pairsDir)
      .select($"id1", $"id2", $"jaccard"))
    val batch = pairSet(Dedup.dedupMinhashPairs(docs.toDF("doc_id", "text")))
    assert(streamed == batch,
      s"extra ${streamed -- batch} missing ${batch -- streamed}")
    // the cross-shard exact pair (2,30) and in-shard pair (6,7) both present
    assert(streamed.exists(p => p._1 == 2L && p._2 == 30L))
    assert(streamed.exists(p => p._1 == 6L && p._2 == 7L))
    // replaying the LAST shard (same batch id) must not duplicate pairs:
    // overwrite-by-batch-id idempotence. Use the ACTUAL last batch id —
    // the runtime may insert an empty micro-batch, shifting ids.
    val lastId = new java.io.File(s"$indexDir/sh").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).max
    Dedup.ingestShard(shards.last.toDF("doc_id", "text"),
      batchId = lastId, indexDir, pairsDir)
    val replayed = pairSet(spark.read.parquet(pairsDir)
      .select($"id1", $"id2", $"jaccard"))
    assert(replayed == batch, "replay of a shard id must overwrite, not append")
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
