package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions => G}

/** Approximate-nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column. Brute-force cosine top-k is the exact baseline (built on the
  * codegen'd vector expressions, reference
  * `src/core_functions/scalar/list/list_cosine_similarity.cpp`);
  * sign-random-projection LSH bucketing is the scale path — at 10⁹ vectors
  * the bucket join touches ~1/2^planes of the corpus per probe instead of
  * all of it.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes: plane j, dim d ←
    * hash(seed,j,d) mapped to [-1,1). Generated distributed (spark.range —
    * no driver materialization), broadcast to the bucket join. */
  def hyperplanes(s: SparkSession, numPlanes: Int, dim: Int, seed: Int = 42): DataFrame =
    s.range(numPlanes.toLong * dim).select(
      (col("id") / dim).cast("int").as("plane"),
      (col("id") % dim).cast("int").as("d"),
      (xxhash64(lit(seed), col("id")).cast("double") / lit(Long.MaxValue.toDouble))
        .as("w"))

  /** Sign-random-projection bucket id per vector: bit j = sign(v·plane_j). */
  def lshBuckets(vecs: DataFrame, planes: DataFrame, numPlanes: Int): DataFrame = {
    val unpacked = vecs.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
    unpacked.join(broadcast(planes), "d")
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum(col("x") * col("w")).as("dot"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dot") > 0, expr("shiftleft(1L, plane)")).otherwise(0L))
        .as("bucket"))
  }

  /** Exact top-k by cosine for one query vector (deterministic tie-break). */
  def topK(vecs: DataFrame, query: DataFrame, k: Int): DataFrame =
    vecs.crossJoin(broadcast(query.select(col("embedding").as("q"))))
      .select(col("vec_id"), G.list_cosine_similarity(col("embedding"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)

  /** Oracle-checked brute-force top-10 neighbors of vec_id 0. */
  def annTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    topK(e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0), 10)
  }

  val annTopkSql: String =
    """SELECT a.vec_id, list_cosine_similarity(a.embedding, q.embedding) AS cos
      |FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      |WHERE a.vec_id <> 0
      |ORDER BY cos DESC, a.vec_id LIMIT 10""".stripMargin

  /** LSH-bucketed ANN: each of the first 5 vectors probes only its own
    * bucket (rows-only check — bucketing is engine-specific hashing). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    val planes = hyperplanes(s, numPlanes = 8, dim = 64)
    val buckets = lshBuckets(e, planes, 8)
    val withB = e.join(buckets, "vec_id")
    val probes = withB.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q"), col("bucket"))
    withB.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        G.list_cosine_similarity(col("embedding"), col("q")).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk" -> (annTopk _),
    "ann_lsh" -> (annLsh _))

  val oracle: Map[String, String] = Map(
    "ann_topk" -> annTopkSql)
}
