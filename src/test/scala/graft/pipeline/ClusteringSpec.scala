package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics + plan pins for k-means and SemDeDup. The fixture corpus is
  * random (clusters are arbitrary), so recovery is proven on PLANTED
  * clusters where the ground truth is known. */
class ClusteringSpec extends SparkSpec {

  /** Four tight planted clusters at orthogonal corners, plus one exact
    * duplicate inside cluster 0. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("clustering").toString
    def vec(corner: Int, jitter: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(corner) = 10.0f
      a((corner + 7) % 64) = jitter // tiny within-cluster spread
      a
    }
    val rows = (0 until 40).map { i =>
      val corner = i % 4
      // vec_ids 0..3 land in distinct corners -> the K lowest ids seed
      // one centroid per planted cluster
      (i.toLong, vec(corner, 0.01f * (i / 4)), corner)
    } :+ ((40L, vec(0, 0.0f), 0)) // exact duplicate of vec_id 0
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("emb_kmeans recovers planted clusters exactly") {
    val out = Clustering.embKmeans(spark, plantedDir)
      .orderBy("cluster").collect()
    assert(out.length == 4)
    // corner 0 has its 10 members + the duplicate
    assert(out(0).getAs[Long]("n") == 11L)
    assert(out.drop(1).forall(_.getAs[Long]("n") == 10L))
    // tight planted clusters: inertia is the tiny jitter only
    assert(out.forall(_.getAs[Double]("inertia") < 1.0))
  }

  test("kmeans assignments agree with the planted labels") {
    val a = Clustering.kmeansAssignments(spark, plantedDir)
    val byLabel = a.join(
        spark.read.parquet(s"$plantedDir/embeddings.parquet")
          .select(col("vec_id"), col("label")), "vec_id")
      .groupBy("label").agg(countDistinct("cluster").as("k"))
      .collect()
    assert(byLabel.forall(_.getAs[Long]("k") == 1L),
      "every planted label maps to exactly one cluster")
  }

  test("dedup_semantic drops the planted exact duplicate, keeps the lowest id") {
    val out = Clustering.dedupSemantic(spark, plantedDir).collect()
    val total = out.map(_.getAs[Long]("n_total")).sum
    val kept = out.map(_.getAs[Long]("n_kept")).sum
    assert(total == 41L)
    // the duplicate (vec_id 40, cosine 1.0 with vec_id 0) must go; the
    // jittered cluster-mates sit at cosine ~0.999 and also collapse to
    // their cluster's min id -> exactly K survivors at tau = 0.2
    assert(kept == 4L, s"expected one survivor per planted cluster, got $kept")
  }

  test("assignment plan is join-free (centroids enter as literals)") {
    val a = Clustering.kmeansAssignments(spark, sf())
    val p = a.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "Lloyd assignment must not join — centroids are literals")
    val scans = p.split("\n").count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"one corpus scan per assignment, saw $scans")
  }

  test("fixture corpus: clusters partition the corpus and kept <= total") {
    val km = Clustering.embKmeans(spark, sf()).collect()
    val n = graft.Tables.t(spark, sf(), "embeddings").count()
    assert(km.map(_.getAs[Long]("n")).sum == n)
    val sd = Clustering.dedupSemantic(spark, sf()).collect()
    assert(sd.map(_.getAs[Long]("n_total")).sum == n)
    sd.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total")))
  }
}
