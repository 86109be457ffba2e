package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest file-stats pruning: DML must plan against the per-file
  * min/max envelope in the manifest (driver-side, zero files opened)
  * before any scan — the property that keeps a point DELETE on a
  * 10⁶-file table from reading the whole table. */
class StatsPruneSpec extends SparkSpec {

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_prune_spec_").toString

  private def manifestLines(root: String, v: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$root/_manifests/v$v.manifest"))
      .asScala.toSeq.filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  /** 4 files with disjoint c_custkey ranges via range partitioning. */
  private def rangedTable(): String = {
    val root = freshRoot()
    GraftTable.create(spark, root,
      graft.Tables.t(spark, sf(), "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .repartitionByRange(4, col("c_custkey")))
    root
  }

  test("manifest entries carry min/max stats fields for eligible columns") {
    val root = rangedTable()
    val lines = manifestLines(root, 1)
    assert(lines.size === 4)
    assert(lines.forall(_.contains("\tc_custkey=")),
      "every entry should carry c_custkey stats")
    assert(lines.forall(_.contains("\tc_name=")),
      "string columns are stats-eligible too")
  }

  test("point-predicate candidates: only the stats-matching file survives") {
    val root = rangedTable()
    val victim = graft.Tables.t(spark, sf(), "customer")
      .agg(min("c_custkey")).collect()(0).getLong(0)
    val cands = GraftTable.candidateEntries(root, col("c_custkey") === victim)
    assert(cands.size === 1,
      s"a point predicate must prune to one file, got ${cands.size}")
    // an out-of-range predicate prunes EVERYTHING — no scan will run
    val none = GraftTable.candidateEntries(root, col("c_custkey") === -1L)
    assert(none.isEmpty)
    // a range predicate keeps only overlapping files
    val half = GraftTable.candidateEntries(root, col("c_custkey") <= victim)
    assert(half.size === 1)
    // IN-lists prune by their [min,max] envelope
    val in2 = GraftTable.candidateEntries(root,
      col("c_custkey").isin(victim, victim + 1))
    assert(in2.size <= 2)
  }

  test("opaque predicates disable pruning, never drop files (soundness)") {
    val root = rangedTable()
    val all = manifestLines(root, 1).size
    // column-to-column and OR shapes contribute no constraints
    assert(GraftTable.candidateEntries(root,
      col("c_custkey") === col("c_acctbal")).size === all)
    assert(GraftTable.candidateEntries(root,
      (col("c_custkey") === 1L) || (col("c_acctbal") > 0)).size === all)
    // conjunct composition: the prunable half still prunes
    val victim = graft.Tables.t(spark, sf(), "customer")
      .agg(min("c_custkey")).collect()(0).getLong(0)
    assert(GraftTable.candidateEntries(root,
      (col("c_custkey") === victim) && (col("c_name") =!= lit("x"))).size === 1)
  }

  test("legacy stats-less manifests keep every file as a candidate") {
    val root = rangedTable()
    // strip the stats fields in place — simulates a pre-stats manifest
    val p = java.nio.file.Paths.get(s"$root/_manifests/v1.manifest")
    val stripped = manifestLines(root, 1).map(_.takeWhile(_ != '\t'))
    java.nio.file.Files.writeString(p, stripped.mkString("\n"))
    assert(GraftTable.candidateEntries(root,
      col("c_custkey") === -1L).size === stripped.size)
    // and reads still work
    assert(GraftTable.read(spark, root).count() ===
      graft.Tables.t(spark, sf(), "customer").count())
  }

  test("delete end-to-end: correct result AND single-file rewrite") {
    val root = rangedTable()
    val before = manifestLines(root, 1).toSet
    val victim = graft.Tables.t(spark, sf(), "customer")
      .agg(min("c_custkey")).collect()(0).getLong(0)
    GraftTable.delete(spark, root, col("c_custkey") === victim)
    val after = manifestLines(root, 2).toSet
    assert((before intersect after).size === before.size - 1,
      "exactly one file rewritten")
    assert(GraftTable.read(spark, root)
      .filter(col("c_custkey") === victim).count() === 0)
    // rewritten file carries fresh stats
    assert((after -- before).forall(_.contains("\tc_custkey=")))
  }

  test("pre-1970 fractional timestamps encode with floor semantics (sign-safe)") {
    // 1969-12-31T23:59:59.5: getTime/1000 truncation would flip the
    // fraction to +0.5s and the stats envelope would prune the file a
    // DELETE on `ts < 1970-01-01` needs to rewrite
    val root = freshRoot()
    import java.sql.Timestamp
    val rows = Seq(
      (1L, Timestamp.valueOf("1969-12-31 23:59:59.5")),
      (2L, Timestamp.valueOf("1970-01-01 00:00:01.25")),
      (3L, Timestamp.valueOf("2001-06-15 12:00:00.0")))
    import spark.implicits._
    GraftTable.create(spark, root,
      rows.toDF("id", "ts").repartitionByRange(3, col("ts")))
    val cands = GraftTable.candidateEntries(root,
      col("ts") < lit(Timestamp.valueOf("1970-01-01 00:00:00")))
    assert(cands.size === 1, s"the pre-epoch file must survive pruning, got $cands")
    GraftTable.delete(spark, root,
      col("ts") < lit(Timestamp.valueOf("1970-01-01 00:00:00")))
    assert(GraftTable.read(spark, root).count() === 2)
  }

  test("float stats use the widened-double expansion (boundary-safe)") {
    // file max 0.3f; the predicate compares in DOUBLE space where
    // 0.3f widens to 0.30000001…, ABOVE decimal 0.3 — shortest-repr
    // stats ("0.3") would prune the file and strand the row
    val root = freshRoot()
    import spark.implicits._
    GraftTable.create(spark, root,
      Seq((1L, 0.1f), (2L, 0.3f)).toDF("id", "v").repartition(1))
    val cands = GraftTable.candidateEntries(root,
      col("v") > lit(0.3))
    assert(cands.size === 1,
      "0.3f widens above 0.3d — the file can match and must be kept")
    GraftTable.delete(spark, root, col("v") > lit(0.3))
    assert(GraftTable.read(spark, root).count() === 1)
  }

  test("double literal equal to a widened float prunes soundly (exact encoding)") {
    // 0.30000001192092896d IS 0.3f widened (same binary value, shortest
    // repr). If the stat side stores the exact expansion ...955078125 but
    // the literal side parses the shortest repr, the equality envelope
    // check misses and DELETE silently skips matching rows.
    val root = freshRoot()
    import spark.implicits._
    GraftTable.create(spark, root,
      Seq((1L, 0.1f), (2L, 0.3f)).toDF("id", "v").repartition(1))
    val lit03f = lit(0.30000001192092896) // == 0.3f widened
    assert(GraftTable.candidateEntries(root, col("v") === lit03f).size === 1,
      "the file's max IS the literal's value — it must survive pruning")
    GraftTable.delete(spark, root, col("v") === lit03f)
    assert(GraftTable.read(spark, root).count() === 1,
      "the widened-float row must actually be deleted, not stats-skipped")
    // and on a DoubleType column the same value round-trips exactly too
    val root2 = freshRoot()
    GraftTable.create(spark, root2,
      Seq((1L, 0.1), (2L, 0.30000001192092896)).toDF("id", "v").repartition(1))
    assert(GraftTable.candidateEntries(root2, col("v") === lit03f).size === 1)
  }

  test("wide string stats are truncated soundly (bounded manifest lines)") {
    val root = freshRoot()
    import spark.implicits._
    val longA = "a" * 500 + "zzz"
    val longB = "b" * 500 + "qqq"
    GraftTable.create(spark, root,
      Seq((1L, longA), (2L, longB)).toDF("id", "txt").repartition(1))
    val line = manifestLines(root, 1).head
    assert(line.length < 300,
      s"manifest line must not carry full 500-char bodies: ${line.length} chars")
    // soundness: equality on the full long value must keep the file
    assert(GraftTable.candidateEntries(root, col("txt") === longB).size === 1)
    // and a predicate outside the [aaaa.., b+prefix-bound] envelope prunes
    assert(GraftTable.candidateEntries(root, col("txt") === ("x" * 40)).isEmpty)
    // unit properties of the bounds themselves
    assert(GraftTable.truncMin(longA) <= longA && GraftTable.truncMin(longA).length <= 32)
    val up = GraftTable.truncMax(longB)
    assert(up.nonEmpty && up.get > longB.substring(0, 32) && up.get.length <= 32)
    // short strings pass through untouched
    assert(GraftTable.truncMin("abc") === "abc" && GraftTable.truncMax("abc") === Some("abc"))
    // surrogate-pair boundary: never cut a pair in half ("x" + pairs puts
    // a HIGH surrogate at index 31, forcing the cut back to 31)
    val sLong = "x" + ("😀" * 40)
    val tm = GraftTable.truncMin(sLong)
    assert(!Character.isHighSurrogate(tm.last), "must cut at a code-point boundary")
    assert(tm.length === 31)
  }

  test("struct-field predicates yield no constraint (no column-name aliasing)") {
    import org.apache.spark.sql.graft.Bridge
    // s.x must NOT be attributed to a top-level column named x
    assert(GraftTable.extractConstraints(
      Bridge.catalystExpression(col("s.x") === 5)).isEmpty)
    // plain x still constrains
    assert(GraftTable.extractConstraints(
      Bridge.catalystExpression(col("x") === 5)).nonEmpty)
  }

  test("merge prunes target files by the source's key range") {
    val root = rangedTable()
    val before = manifestLines(root, 1).toSet
    val victim = graft.Tables.t(spark, sf(), "customer")
      .agg(min("c_custkey")).collect()(0).getLong(0)
    // source touches only the lowest key → only its file may be rewritten
    val src = spark.range(1).select(
      lit(victim).as("c_custkey"),
      lit("UPDATED").as("c_name"),
      lit(0.0).as("c_acctbal"))
    GraftTable.merge(spark, root, src, Seq("c_custkey"))
    val after = manifestLines(root, 2).toSet
    assert((before intersect after).size === before.size - 1,
      "merge must rewrite only the key-range-matching file")
    val got = GraftTable.read(spark, root)
      .filter(col("c_custkey") === victim).select("c_name").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("UPDATED"))
  }
}
