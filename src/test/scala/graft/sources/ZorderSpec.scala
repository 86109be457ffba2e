package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: the pruning-selectivity proof. A 256×256 grid is
  * laid out two ways — linear sort on x (the single-dimension layout)
  * and Z-order on (x, y) — and the manifest's file-level min/max stats
  * are probed through the same `candidateEntries` path the reader uses.
  * The linear layout must prune on x but NOT on y (every file spans the
  * full y range — the 100 TB problem); the Z-layout must prune on BOTH. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def grid() = spark.range(65536).select(
    (col("id") % 256).cast("int").as("x"),
    (col("id") / 256).cast("int").as("y"),
    col("id").as("payload"))
    // scramble so neither layout is an accident of generation order
    .orderBy(xxhash64(col("id")))

  private def mkTable(sorted: org.apache.spark.sql.DataFrame): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_z_").toString
    GraftTable.create(spark, root, sorted)
    root
  }

  test("z-order prunes on every clustered dimension; linear only on the leading one") {
    val linRoot = mkTable(grid().repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    val zRoot = mkTable(grid().repartition(16))
    GraftTable.zorderBy(spark, zRoot, Seq("x", "y"), 16)

    def cands(root: String, pred: org.apache.spark.sql.Column): Int =
      GraftTable.candidateEntries(root, pred).size
    val nLin = GraftTable.candidateEntries(linRoot, lit(true)).size
    val nZ = GraftTable.candidateEntries(zRoot, lit(true)).size
    assert(nLin >= 8 && nZ >= 8, "both layouts hold many files")

    // leading dimension: both layouts prune hard
    assert(cands(linRoot, col("x") === 7) <= 2)
    assert(cands(zRoot, col("x") === 7) <= nZ / 2)
    // second dimension: the linear layout reads EVERYTHING, z-order skips
    assert(cands(linRoot, col("y") === 7) == nLin,
      "a linear layout cannot prune the non-leading dimension")
    assert(cands(zRoot, col("y") === 7) <= nZ / 2,
      "the z layout must prune the second dimension too")
  }

  test("z-order rewrite preserves the row multiset exactly") {
    val root = mkTable(grid().repartition(16))
    val before = GraftTable.read(spark, root)
      .as[(Int, Int, Long)].collect().sorted.toSeq
    GraftTable.zorderBy(spark, root, Seq("x", "y"), 16)
    val after = GraftTable.read(spark, root)
      .as[(Int, Int, Long)].collect().sorted.toSeq
    assert(after == before)
  }

  test("z-order refuses string dimensions loudly and validates arity") {
    val root = mkTable(grid().select(col("x"), col("y"),
      concat(lit("s"), col("payload")).as("s")))
    val e = intercept[IllegalArgumentException] {
      GraftTable.zorderBy(spark, root, Seq("x", "s"), 4)
    }
    assert(e.getMessage.contains("numeric/date/timestamp"))
    intercept[IllegalArgumentException] {
      GraftTable.zorderBy(spark, root, Seq("x"), 4)
    }
    intercept[IllegalArgumentException] {
      GraftTable.zorderBy(spark, root, Seq("x", "nope"), 4)
    }
  }

  test("null and constant dimensions rank zero and stay correct") {
    val root = mkTable(spark.range(100).select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7)
        .cast("int").as("x"),
      lit(3).as("k"), col("id").as("payload")))
    GraftTable.zorderBy(spark, root, Seq("x", "k"), 4)
    assert(GraftTable.read(spark, root).count() == 100)
    assert(GraftTable.read(spark, root)
      .filter(col("x").isNull).count() == 10)
  }
}
