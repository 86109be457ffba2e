package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for large-scale training-data pipelines: exact
  * (normalized-hash), MinHash+LSH banding, SimHash, n-gram Jaccard
  * verification, and embedding-cosine near-dup. The reference ships the
  * string/list similarity primitives these build on (reference
  * `src/core_functions/scalar/string/jaccard.cpp`,
  * `list_cosine_similarity.cpp`); the pipeline composition is standard
  * published MinHash/SimHash (Broder '97; Charikar '02).
  *
  * Scale posture: every stage is a DataFrame transform — shingle explode is
  * linear in corpus size, signatures are one groupBy per doc, candidate
  * generation joins on band buckets (never all-pairs), and only verified
  * pairs survive. No driver-side collection anywhere.
  */
object Dedup {

  /** Canonical text normalization shared by exact dedup + fingerprints. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup summary per source: total vs distinct normalized hashes. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(normalized(col("text")).cast("binary"))).as("n_unique"))

  val dedupExactSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_unique
      |FROM documents GROUP BY source""".stripMargin

  /** Word n-gram shingles of a text column (n-gram Jaccard ground set).
    * The word array is projected once before the lambda — re-splitting
    * inside `transform` would tokenize the document once per shingle. */
  def shingles(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(col("doc_id"), split(normalized(col(textCol)), " ").as("w"))
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, greatest(size(w) - ${n - 1}, 1)), " +
            s"i -> concat_ws(' ', slice(w, i, $n)))")).as("shingle"))
      .distinct()

  /** MinHash signatures: k independent hash functions simulated as
    * xxhash64(seed_i, shingle); one shuffle (groupBy doc). */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(
        min(xxhash64(lit(0), col("shingle"))).as("h0"),
        (1 until numHashes).map(i =>
          min(xxhash64(lit(i), col("shingle"))).as(s"h$i")): _*)

  /** LSH banding: band r consecutive minhashes into one bucket key; docs
    * sharing any band bucket become candidate pairs. */
  def lshCandidates(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*).as("sig"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs (verification stage): join
    * through the shingle sets, never materializing full cross products. */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = pairs
      .join(sh.select(col("doc_id").as("id1"), col("shingle")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("shingle")), Seq("id2", "shingle"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("id1"), col("n_sh").as("n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("n_sh").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        (col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common"))).as("jaccard"))
  }

  /** MinHash-LSH near-dup pipeline: shingle → sign → band → verify.
    * 32 hashes in 8 bands of 4 rows: candidate probability ≈1 at j≥0.8,
    * ≈1.3% at j=0.2 — false candidates are cheap (exact verification
    * kills them), so the smaller signature wins on both the min-aggregate
    * width and codegen size. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(Tables.t(s, dir, "documents"), "text", 3)
    val sig = minhashSignatures(sh, numHashes = 32)
    val cand = lshCandidates(sig, numHashes = 32, bands = 8)
    verifyJaccard(cand, sh)
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash per document from word-frequency-weighted hashes. */
  def simhashSignatures(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(normalized(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("weight"))
      .withColumn("h", xxhash64(col("w")))
    words
      .select(col("doc_id"), col("weight"), col("h"),
        explode(sequence(lit(0), lit(63))).as("bit"))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(when(expr("(h >> bit) & 1") === 1, col("weight"))
        .otherwise(-col("weight"))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, bit)")).otherwise(0L))
        .as("simhash"))
  }

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashSignatures(Tables.t(s, dir, "documents"), "text")

  /** n-gram Jaccard all-verified pairs above a threshold, using shared-
    * shingle blocking (no LSH approximation — the exact-verification
    * sibling of dedupMinhash). */
  def dedupNgram(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(Tables.t(s, dir, "documents"), "text", 3)
    val cand = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
    verifyJaccard(cand, sh)
      .filter(col("jaccard") >= 0.6)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding-cosine near-dup, exact all-pairs (oracle-checkable; the
    * LSH-bucketed scale path is Similarity.lshBuckets + verify). */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{GraftFunctions => G}
    val a = Tables.t(s, dir, "embeddings").select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = Tables.t(s, dir, "embeddings").select(col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        G.list_cosine_similarity(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") > 0.45f)
  }

  val dedupEmbeddingSql: String =
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  list_cosine_similarity(a.embedding, b.embedding) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.45""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_embedding" -> (dedupEmbedding _))

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_embedding" -> dedupEmbeddingSql)
}
