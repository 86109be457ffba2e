package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface — additive scope beyond the reference
  * (which is batch-only; its `physical_streaming_*` operators are
  * pipelined batch, SURVEY.md §2.10): event-time windowed aggregation with
  * watermarked late-data handling, and custom sessionization state via
  * `flatMapGroupsWithState`. The batch `time_bucket` operator and these
  * streaming windows share bucketing semantics, so a pipeline can be
  * developed batch-first and switched to streaming unchanged.
  */
object StreamingOps {

  /** Default events schema when no file exists yet to sniff: the current
    * fixture shape with `ts` already a session-zone TIMESTAMP (the
    * normalized form — `eventStream`'s type dispatch is then a no-op). */
  val eventsDefaultSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events-table schema for streaming reads, resolved from the actual
    * fixture file when one exists (streaming sources require an explicit
    * schema; the fixture's `ts` physical type has varied across driver
    * versions — nanos-long, µs TIMESTAMP_NTZ, µs TIMESTAMP — so sniff,
    * don't hard-code). When the directory has no events file YET — the
    * normal streaming-source lifecycle, where the stream is defined
    * before the first micro-batch arrives — fall back to
    * [[eventsDefaultSchema]] instead of throwing at definition time. */
  def eventsRawSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try spark.read.parquet(s"$dir/events.parquet").schema
    catch { case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "PATH_NOT_FOUND" => eventsDefaultSchema }
  }

  /** File-based event stream over the fixture dir (one file = one
    * micro-batch in tests; in production this is a stream source like
    * kafka with identical downstream code). `ts` is normalized to a
    * session-zone TIMESTAMP exactly as the batch loader (`Tables.t`)
    * does, so batch-first pipelines switch to streaming unchanged. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(eventsRawSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    raw.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling event-time window aggregation with a watermark: counts and
    * value sums per (window, event_type); late rows beyond 10 minutes are
    * dropped deterministically. */
  def windowedCounts(events: DataFrame, width: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionState(nEvents: Long, lastTs: Long)
  case class SessionOut(user_id: Long, n_events: Long, closed: Boolean)

  /** Custom stateful sessionization: per-user running event counts with a
    * 30-minute inactivity gap, emitted on update (mapGroupsWithState is
    * the Spark analog of a custom stateful operator). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val gapMs = 30L * 60 * 1000
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            if (st.lastTs != Long.MinValue && t - st.lastTs > gapMs) {
              out += SessionOut(user, st.nEvents, closed = true)
              st = SessionState(0L, t)
            }
            st = SessionState(st.nEvents + 1, t)
          }
          state.update(st)
          out += SessionOut(user, st.nEvents, closed = false)
          out.iterator
      }
  }

  /** Streaming exact dedup — the streaming face of the pipeline's
    * dedup_exact operator: drop rows whose normalized-content hash was
    * already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark` keys state by the hash and expires
    * it with event time, so state is bounded at 100 TB/∞-stream scale —
    * an unbounded `dropDuplicates` would accrete state forever). */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
      horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash",
        md5(lower(trim(regexp_replace(col(textCol), "\\s+", " "))).cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming MinHash NEAR-dup — the streaming face of the pipeline's
    * dedup_minhash: drop documents whose full 32-hash MinHash signature
    * was already seen within the watermark horizon. The signature is
    * computed with PER-ROW array expressions (shingle → hash → 32
    * universal-hash mins via transform/array_min) — the exact same
    * normalization, 3-gram shingling, md5-derived base hash, and
    * (a·x+b) mod p family as the batch path (`Dedup.shingleHashes` +
    * `minhashSignaturesHashed`; min is duplicate-insensitive, so the
    * batch path's per-doc DISTINCT is immaterial to the signature) —
    * verified equal in StreamingSpec. No explode/groupBy, so each
    * micro-batch is one narrow map + the bounded dedup state.
    *
    * CONTRACT vs batch: streaming uses the FULL signature as the key
    * (bands = 1 × 32) — near-identical docs whose signatures agree on
    * all 32 mins dedup (j ≈ 1); the batch path's 8×4 banding +
    * jaccard verification catches lower-j near-dups but needs the
    * band-bucket SHUFFLE join, which an unbounded stream cannot run
    * per-batch with bounded state. High precision, reduced recall —
    * the streaming/batch split production dedup pipelines actually
    * deploy (stream pre-filter, periodic batch sweep). */
  def nearDedupStream(docs: DataFrame, textCol: String,
      horizon: String = "10 minutes", numHashes: Int = 32): DataFrame = {
    import graft.pipeline.Dedup
    val withSig = docs
      .withColumn("__w", split(Dedup.normalized(col(textCol)), " "))
      .withColumn("__sh", expr(
        "transform(sequence(1, greatest(size(__w) - 2, 1)), " +
          "i -> concat_ws(' ', slice(__w, i, 3)))"))
      .withColumn("__hb",
        transform(col("__sh"), s => Dedup.hash64(0, s) % lit(4294967296L)))
      .withColumn("mh_sig", concat_ws("|", (0 until numHashes).map(i =>
        array_min(transform(col("__hb"), x =>
          (lit(Dedup.mhA(i)) * x + lit(Dedup.mhB(i))) % lit(Dedup.mhP)))): _*))
      .drop("__w", "__sh", "__hb")
    withSig
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("mh_sig")
  }

  /** Stream-stream interval join — the streaming face of
    * ScaleJoins.bandJoin: pairs rows from two streams on an equi-key
    * within a time band. Watermarks on both sides bound the join state
    * (Spark retains only rows inside the interval horizon), so an
    * infinite stream holds a bounded buffer — the requirement for a
    * stream-stream join to be runnable at all at scale. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      key: String, bandSeconds: Long, horizon: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", horizon)
    val r = right.select(
        col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
      .withWatermark("r_ts", horizon)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $bandSeconds SECONDS") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $bandSeconds SECONDS"))
  }

  /** Stream-static enrichment join — the canonical ingest shape: an
    * unbounded event stream joined to a bounded dimension table. The
    * static side broadcasts (re-read per micro-batch, so dimension
    * updates are picked up without restarting the query); no watermark
    * is needed because the static side holds no streaming state. At
    * 100 TB/day this is the plan that keeps the stream linear: each
    * micro-batch is one broadcast-hash probe, never a shuffle. */
  def enrichStream(events: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    // Qualify each side explicitly: with unqualified col(...) a shared
    // key name (the common case for enrichment) is an ambiguous
    // reference — AnalysisException, or worse a self-comparison.
    events.join(broadcast(dim), events(streamKey) === dim(dimKey), "left")

  /** Streaming ANN lookup — the streaming face of `Similarity`'s LSH
    * path: each query vector on the stream is bucketed by the SAME
    * sign-random-projection family as the static index via a pure
    * per-row expression (the plane weights are inlined as literals, so
    * bucketing needs NO streaming shuffle — a streaming groupBy before a
    * join would not even plan), probed against the bucketed corpus
    * (broadcast, re-read per micro-batch like `enrichStream`'s dim), and
    * reduced to top-k per query with a sorted-slice aggregate.
    *
    * The per-query top-k is a streaming AGGREGATION: run it in update/
    * complete mode, or add an event-time window + watermark for append —
    * same trade-off as any streaming ranking. At 10⁹ vectors the probe
    * touches ~1/2^planes of the corpus per query (the batch path's scale
    * argument, unchanged); the corpus-side bucket index would be
    * persisted, not recomputed per batch, in a production job.
    *
    * `planes`: (plane-bit, weights-per-dim), from
    * `Similarity.hyperplanes(...).collect()` — tiny (planes × dim). */
  def annLookupStream(queries: DataFrame, corpus: DataFrame,
      planes: Seq[(Int, Seq[Double])], k: Int = 5): DataFrame = {
    import graft.functions.{GraftFunctions => G}
    def bucketOf(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      planes.map { case (j, ws) =>
        val warr = array(ws.map(lit): _*)
        val dot = aggregate(zip_with(emb, warr, (x, w) => x * w),
          lit(0.0), (acc, v) => acc + v)
        when(dot > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val indexed = corpus.select(col("vec_id"), col("embedding"),
      bucketOf(col("embedding")).as("bucket"))
    val probes = queries.select(col("query_id"),
      col("embedding").as("q_emb"), bucketOf(col("embedding")).as("qbucket"))
    probes.join(broadcast(indexed), col("qbucket") === col("bucket"))
      .select(col("query_id"), col("vec_id"),
        G.list_cosine_similarity(col("q_emb"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(transform(
        slice(sort_array(collect_list(struct((col("cos") * -1).as("nc"),
          col("vec_id").as("v"))), asc = true), 1, k),
        s => s.getField("v")).as("neighbors"),
        max(col("cos")).as("best_cos"))
  }

  case class DocIn(doc_id: Long, domain: String)
  case class QuotaState(admitted: Long)
  case class AdmitOut(domain: String, doc_id: Long, admit_seq: Long)

  /** Streaming per-domain quota admission — the streaming face of the
    * mixture stage (`pipeline/Mixture`): an ingest stream admits at most
    * `quota` documents per domain and drops the rest, the admission
    * control a continuously-fed training-data pipeline runs where the
    * batch path would compute mixture rates after the fact.
    *
    * State is ONE counter per domain (`QuotaState(admitted)`) — bounded
    * by |domains|, not by stream length, the essential property at
    * ∞-stream scale; a saturated domain's group keeps a single long and
    * emits nothing. Admission is arrival-order dependent ACROSS
    * micro-batches by design (quota semantics); WITHIN a batch the group
    * iterator is sorted by doc_id so replays of the same batch admit the
    * same prefix. Emitted rows carry their admission sequence number
    * (1-based per domain) so downstream audit can verify the cap. */
  def quotaAdmitStream(docs: Dataset[DocIn], quota: Long): Dataset[AdmitOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.domain)
      .flatMapGroupsWithState[QuotaState, AdmitOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[DocIn], state: GroupState[QuotaState]) =>
          var n = state.getOption.map(_.admitted).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[AdmitOut]
          rows.toSeq.sortBy(_.doc_id).iterator
            .takeWhile(_ => n < quota)
            .foreach { d =>
              n += 1
              out += AdmitOut(domain, d.doc_id, n)
            }
          state.update(QuotaState(n))
          out.iterator
      }
  }

  case class QuantIn(user_id: Long, value: Double)
  case class QuantState(counts: Map[Int, Long])
  case class QuantOut(user_id: Long, n: Long, p50: Double, p95: Double,
      bins_used: Int)

  /** Fixed-grid histogram bin for a value (clamped into the edge bins). */
  private[streaming] def binOf(v: Double, lo: Double, hi: Double,
      nbins: Int): Int = {
    val w = (hi - lo) / nbins
    math.min(nbins - 1, math.max(0, math.floor((v - lo) / w).toInt))
  }

  /** p-quantile estimate from bin counts: midpoint of the bin holding the
    * ceil(p·n)-th value — deterministic, no interpolation across bins. */
  private[streaming] def binQuantile(counts: Map[Int, Long], lo: Double,
      hi: Double, nbins: Int, p: Double): Double = {
    val w = (hi - lo) / nbins
    val n = counts.valuesIterator.sum
    val rank = math.max(1L, math.ceil(p * n).toLong)
    var c = 0L
    for (i <- 0 until nbins) {
      c += counts.getOrElse(i, 0L)
      if (c >= rank) return lo + (i + 0.5) * w
    }
    lo + (nbins - 0.5) * w
  }

  /** Streaming per-key quantiles with BOUNDED state — the holistic
    * aggregate (median/p95) the batch `win_median_frame` family computes
    * exactly, recomposed for an unbounded stream: per key the state is a
    * fixed-grid histogram of at most `nbins` longs, NEVER the values
    * themselves, so state size is O(keys × nbins) regardless of stream
    * length (an exact streaming median would need all values — unbounded).
    * Estimates are midpoints of the declared grid, so the answer is
    * within w/2 = (hi−lo)/2·nbins of an exact quantile, and — the property
    * [[graft.streaming]] pins everywhere — BIT-IDENTICAL to the batch
    * twin [[quantileSketchBatch]] over the same data: histogram merge is
    * commutative/associative integer addition, so micro-batch arrival
    * order cannot change the result (unlike value-order-sensitive
    * sketches). Emits the updated estimate per touched key each batch. */
  def quantileSketchStream(rows: Dataset[QuantIn], lo: Double, hi: Double,
      nbins: Int): Dataset[QuantOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[QuantState, QuantOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[QuantIn], state: GroupState[QuantState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Int, Long])
          it.foreach { r =>
            val b = binOf(r.value, lo, hi, nbins)
            counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
          }
          state.update(QuantState(counts))
          Iterator.single(QuantOut(uid, counts.valuesIterator.sum,
            binQuantile(counts, lo, hi, nbins, 0.5),
            binQuantile(counts, lo, hi, nbins, 0.95),
            counts.size))
      }
  }

  /** One-shot batch twin of [[quantileSketchStream]]: same grid, same
    * midpoint rule, computed in one pass (typed groups so the two paths
    * share `binOf`/`binQuantile` literally — the identity the spec pins
    * is that incremental state accumulation across micro-batches equals
    * the single-pass result). */
  def quantileSketchBatch(rows: Dataset[QuantIn], lo: Double, hi: Double,
      nbins: Int): Dataset[QuantOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id).mapGroups { (uid, it) =>
      val counts = it.foldLeft(Map.empty[Int, Long]) { (m, r) =>
        val b = binOf(r.value, lo, hi, nbins)
        m.updated(b, m.getOrElse(b, 0L) + 1L)
      }
      QuantOut(uid, counts.valuesIterator.sum,
        binQuantile(counts, lo, hi, nbins, 0.5),
        binQuantile(counts, lo, hi, nbins, 0.95),
        counts.size)
    }
  }

  /** Streaming curation — the streaming face of the batch
    * `mix_curation_funnel`, composed from the same three stages with
    * streaming state semantics:
    *
    *   1. quality ∧ repetition gate — STATELESS (the same
    *      `TextAnalysis.qualityFlags`/`dupTrigramFrac` column builders
    *      the batch entries pin, evaluated in the scan's codegen stage);
    *   2. exact dedup — watermark-bounded state
    *      ([[dedupStream]]'s `dropDuplicatesWithinWatermark` keyed by
    *      normalized-content hash);
    *   3. per-domain quota admission — |domains|-bounded state
    *      ([[quotaAdmitStream]]).
    *
    * Input needs (doc_id, ts, text, domain). Total state: dedup hashes
    * within the watermark horizon + one counter per domain — bounded at
    * ∞-stream scale. */
  def curateStream(docs: DataFrame, quota: Long,
      horizon: String = "10 minutes"): Dataset[AdmitOut] = {
    import docs.sparkSession.implicits._
    import graft.pipeline.TextAnalysis
    val qualified = docs.filter(
      TextAnalysis.qualityFlags(col("text")).reduce(_ && _) &&
        coalesce(TextAnalysis.dupTrigramFrac(col("text")), lit(0.0)) <= 0.3)
    quotaAdmitStream(
      dedupStream(qualified, "doc_id", "text", horizon)
        .select(col("doc_id"), col("domain")).as[DocIn],
      quota)
  }

  /** Streaming INCREMENTAL near-dup ingestion — the streaming face of
    * `dedup_incremental` and the production daily-shard loop: each
    * arriving micro-batch of documents is near-dup-paired against the
    * accumulated on-disk MinHash index (batch band keys broadcast
    * against the store, new×(new∪old) candidates only — never
    * old×old), its pairs land in `pairsDir/batch=<id>`, and the store
    * gains the batch's frames ([[graft.pipeline.Dedup.ingestShard]]).
    *
    * Unlike [[nearDedupStream]] (bounded in-memory state, full-signature
    * key, reduced recall), this recipe keeps the FULL batch-path
    * semantics — 8×4 LSH banding + exact jaccard ≥ 0.5 verification —
    * by holding state on disk, where a 100 TB corpus's index actually
    * lives. Replay-idempotent: every write is an overwrite of its own
    * `batch=<id>` subdirectory, the foreachBatch exactly-once
    * convention the DML streaming sinks established.
    *
    * ACCUMULATION CONTRACT (StreamingSpec): any disjoint sharding of a
    * corpus accumulates EXACTLY the batch pipeline's verified pair set
    * — each pair is emitted once, by whichever member arrives later. */
  def incrementalDedupIngest(docs: DataFrame, textCol: String,
      indexDir: String, pairsDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Dedup.ingestShard(
          batch.select(col("doc_id").cast("long").as("doc_id"),
            col(textCol).as("text")),
          batchId, indexDir, pairsDir)
      }

  case class EwmaIn(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    value: Double)
  case class EwmaState(last: Long)
  case class EwmaOut(user_id: Long, event_id: Long, ewma_cents: Long)

  /** The exact per-key EWMA recurrence eₜ = (centsₜ + eₜ₋₁) DIV 2 as a
    * shared fold — ONE definition for the streaming operator and its
    * batch twin, so the bit-identity proof compares deployments of the
    * same arithmetic, not two spellings of it. Integer cents + α = 1/2
    * keep every step exact (the established determinism contract); the
    * truncation per step is part of the defined semantics. */
  private def ewmaFold(user: Long, rows: Seq[EwmaIn], st0: EwmaState)
      : (Vector[EwmaOut], EwmaState) = {
    var st = st0
    val out = Vector.newBuilder[EwmaOut]
    // (getTime, getNanos, event_id): the same total order scd2Fold uses
    // and the SQL entries' ORDER BY ts resolves to — getTime alone drops
    // sub-millisecond nanos, folding such events in a different order
    rows.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).foreach { e =>
      val c = math.round(e.value * 100)
      val next = if (st.last == Long.MinValue) c
        else Math.floorDiv(c + st.last, 2L)
      st = EwmaState(next)
      out += EwmaOut(user, e.event_id, next)
    }
    (out.result(), st)
  }

  /** Streaming EWMA — the UNBOUNDED-horizon recurrence the batch
    * `ts_ewma` entry truncates to 8 taps to stay windowed/distributable:
    * streaming state is where the true serial recurrence lives naturally
    * (O(1) state per key — just the last smoothed value), the
    * stream-vs-batch split a production metrics pipeline runs. Emitted
    * per event in Append mode; state never times out (a real deployment
    * sets a TTL matched to key churn). */
  def ewmaStream(rows: Dataset[EwmaIn]): Dataset[EwmaOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[EwmaIn], state: GroupState[EwmaState]) =>
          val (out, st) = ewmaFold(user, it.toSeq,
            state.getOption.getOrElse(EwmaState(Long.MinValue)))
          state.update(st)
          out.iterator
      }
  }

  /** One-shot batch twin of [[ewmaStream]]: the same fold over each key's
    * full history (mapGroups — the per-key serial recurrence is the
    * documented non-distributable core; batch pipelines use the windowed
    * `ts_ewma` instead). */
  def ewmaBatch(rows: Dataset[EwmaIn]): Dataset[EwmaOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      ewmaFold(user, it.toSeq, EwmaState(Long.MinValue))._1.iterator
    }
  }

  case class Scd2In(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String)
  case class Scd2State(state: String, validFrom: java.sql.Timestamp,
    version: Int)
  case class Scd2Out(user_id: Long, version: Int, state: String,
    valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Shared SCD Type-2 fold: change-compress each key's attribute stream
    * into versioned [valid_from, valid_to) rows — ONE definition for the
    * streaming operator and its batch twin (the ewmaFold discipline).
    * Emits a version the moment the NEXT change closes it; the still-open
    * version lives only in the returned state. Within a batch, rows fold
    * in (ts, event_id) order — the same total order the batch
    * `events_scd2` entry windows by. */
  private def scd2Fold(user: Long, rows: Seq[Scd2In], st0: Option[Scd2State])
      : (Vector[Scd2Out], Option[Scd2State]) = {
    var st = st0
    val out = Vector.newBuilder[Scd2Out]
    rows.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).foreach { e =>
      st match {
        case Some(s) if s.state == e.event_type => () // same-state run: compress
        case Some(s) =>
          out += Scd2Out(user, s.version, s.state, s.validFrom, e.ts)
          st = Some(Scd2State(e.event_type, e.ts, s.version + 1))
        case None =>
          st = Some(Scd2State(e.event_type, e.ts, 1))
      }
    }
    (out.result(), st)
  }

  /** Streaming SCD Type-2 dimension maintenance — the incremental face of
    * `BizAnalytics.eventsScd2`: the nightly "rebuild the dimension
    * history" batch becomes per-micro-batch upkeep with O(1) state per
    * key (just the OPEN version: state string, valid_from, version
    * counter). A closed version row is emitted exactly once, when the
    * change that closes it arrives (Append mode); the open versions are
    * the state store itself — a production deployment snapshots them to
    * the dimension table's is_current partition. Assumes per-key
    * time-ordered arrival across micro-batches (the watermark/replay
    * discipline of the other recipes); StreamingSpec proves micro-batch
    * state hand-off ≡ the one-shot fold ≡ the batch entry's closed rows,
    * bit-for-bit. */
  def scd2Stream(rows: Dataset[Scd2In]): Dataset[Scd2Out] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Scd2In], state: GroupState[Scd2State]) =>
          val (out, st) = scd2Fold(user, it.toSeq, state.getOption)
          st.foreach(state.update)
          out.iterator
      }
  }

  /** One-shot batch twin of [[scd2Stream]]: the same fold over each key's
    * full history. Returns CLOSED versions only (the open ones are state
    * by definition) — exactly `events_scd2` minus its is_current rows. */
  def scd2Batch(rows: Dataset[Scd2In]): Dataset[Scd2Out] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      scd2Fold(user, it.toSeq, None)._1.iterator
    }
  }

  case class HhIn(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String)
  case class HhState(counters: Map[String, (Long, Long)], nSeen: Long)
  case class HhOut(user_id: Long, n_seen: Long, value: String, est: Long,
    err: Long)

  /** Streaming heavy hitters — the Space-Saving sketch
    * (`agg_topk_sketch`'s batch aggregator) run as per-key streaming
    * state: O(capacity) counters per key forever, the top-k snapshot
    * re-emitted each micro-batch with a monotone n_seen marker (the
    * latest snapshot per key has the max). The fold step IS the
    * batch Aggregator's own `reduce` — one definition for both
    * deployments, so the twin proof compares deployments of the same
    * arithmetic (the `ewmaStream`/`scd2Stream` discipline). Events fold
    * in the (ts, nanos, event_id) total order within each batch; the
    * sketch itself is order-dependent BETWEEN evictions, which is why
    * the twin proof replays the stream in the same global split order
    * the one-shot fold sees. */
  private val hhSketch =
    new graft.functions.GraftAggregators.SpaceSavingAggregator(4, 3)

  private def hhFold(rows: Seq[HhIn], st0: Map[String, (Long, Long)])
      : Map[String, (Long, Long)] =
    rows.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      .foldLeft(st0)((m, e) => hhSketch.reduce(m, e.event_type))

  private def hhTopK(user: Long, n: Long,
      m: Map[String, (Long, Long)]): Seq[HhOut] =
    hhSketch.finish(m).map(h => HhOut(user, n, h.value, h.count_est, h.max_err))

  /** Per-user streaming top-3 event types in 4 bounded counters. */
  def heavyHittersStream(rows: Dataset[HhIn]): Dataset[HhOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[HhState, HhOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[HhIn], state: GroupState[HhState]) =>
          val st0 = state.getOption.getOrElse(HhState(Map.empty, 0L))
          val batch = it.toSeq
          val next = HhState(hhFold(batch, st0.counters),
            st0.nSeen + batch.length)
          state.update(next)
          hhTopK(user, next.nSeen, next.counters).iterator
      }
  }

  /** One-shot batch twin of [[heavyHittersStream]]: the same fold over
    * each key's full history. */
  def heavyHittersBatch(rows: Dataset[HhIn]): Dataset[HhOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      val all = it.toSeq
      hhTopK(user, all.length.toLong, hhFold(all, Map.empty)).iterator
    }
  }

  /** Static side of the streaming anomaly detector: per-type mean and
    * sample-sd of DAILY counts, learned offline from history — the
    * versioned profile a monitoring pipeline refreshes on its own cadence
    * and broadcasts to the stream. Metadata-sized (|types| rows). */
  def anomalyProfile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(avg(col("c")).as("mu"), stddev(col("c")).as("sd"))

  /** Streaming volume-anomaly detector — the streaming face of
    * `OlapSuites.eventsAnomaly`: daily windowed counts per type, scored
    * live against the static profile. The profile joins BEFORE the
    * aggregation (Structured Streaming permits static joins only
    * upstream of a streaming aggregation; mu/sd are per-type constants,
    * so carrying them as grouping keys changes nothing) — each
    * micro-batch is a broadcast probe plus a map-side-combining count,
    * never a history re-aggregation. The z arithmetic is spelled
    * op-for-op like the batch entry, so a full replay produces
    * bit-identical flags (proved in StreamingSpec). */
  def anomalyStream(events: DataFrame, profile: DataFrame): DataFrame =
    events.select(col("ts"), col("event_type"))
      .join(broadcast(profile), Seq("event_type"))
      .groupBy(window(col("ts"), "1 day"), col("event_type"),
        col("mu"), col("sd"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("window.start").cast("date").as("d"),
        col("c"),
        round((col("c") - col("mu")) / nullif(col("sd"), lit(0.0)), 4).as("z"))
      .withColumn("is_anomaly", abs(col("z")) >= 2.0)

  /** Batch-equivalence helper: the same windowed aggregation phrased over
    * a static frame (used to validate streaming results in tests). */
  def windowedCountsBatch(events: DataFrame, width: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))
}
