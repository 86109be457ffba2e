package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale-path join recipes for shapes where a naive plan degrades at
  * 100 TB:
  *
  *  - `bandJoin`: interval/band predicates (|a.x − b.x| ≤ w) — the common
  *    special case of the reference's IEJoin (reference
  *    `physical_iejoin.cpp`) — as a bucketed equi-join: each left row maps
  *    to its bucket, each right row to its bucket and both neighbors, the
  *    join runs on bucket equality (a shuffle, not a cross product), and
  *    the exact predicate filters the ≤3-bucket candidate set. O(n·k)
  *    instead of O(n²).
  *
  *  - `saltedJoin`: hot-key skew — the build side is replicated `salt`
  *    ways, the probe side scatters uniformly across replicas, restoring
  *    parallel balance (the AQE skew-join fallback for when runtime stats
  *    arrive too late, e.g. under a single straggler key).
  */
object ScaleJoins {

  /** Equi-band join: rows (l, r) with l.key === r.key (optional) and
    * |l.x − r.x| ≤ width. `leftX`/`rightX` must be numeric (µs for
    * timestamps). */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftX: Column, rightX: Column, width: Long,
      extraCond: Column = lit(true)): DataFrame = {
    val lb = left.withColumn("_bucket", floor(leftX / width))
    val rb = right.withColumn("_b0", floor(rightX / width))
      .withColumn("_bucket", explode(array(col("_b0") - 1, col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    lb.join(rb, lb("_bucket") === rb("_bucket") &&
        abs(leftX - rightX) <= width && extraCond)
      .drop("_bucket")
  }

  /** Salted equi-join for skewed keys: build side × salt replicas, probe
    * side scattered by deterministic hash-salt. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int): DataFrame = {
    val salted = probe.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val replicated = build.withColumn("_salt", explode(array((0 until salt).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Oracle-checked band-join query: pairs of events by the same user
    * within 60 seconds of each other (distinct types) — the naive phrasing
    * is a per-user theta join; the band join keeps it shuffle-shaped. */
  def joinBand(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cx"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("uid2"), col("event_id").as("error_id"),
        unix_micros(col("ts")).as("ex"))
    bandJoin(clicks, errors, col("cx"), col("ex"), width = 60000000L,
        extraCond = col("user_id") === col("uid2"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val joinBandSql: String =
    """SELECT c.user_id, count(*) AS n_pairs
      |FROM (SELECT user_id, event_id, epoch_us(ts) AS cx FROM events WHERE event_type = 'click') c
      |JOIN (SELECT user_id, event_id, epoch_us(ts) AS ex FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id AND abs(c.cx - e.ex) <= 60000000
      |GROUP BY c.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_band" -> (joinBand _))

  val oracle: Map[String, String] = Map(
    "join_band" -> joinBandSql)
}
