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
    * through the shingle sets, never materializing full cross products.
    * The candidate set is orders of magnitude smaller than the corpus
    * (that is LSH's job), so it rides as the broadcast side — the shingle
    * table is never shuffled during verification. */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = broadcast(pairs)
      .join(sh.select(col("doc_id").as("id1"), col("shingle")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("shingle")), Seq("id2", "shingle"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_common"))
    broadcast(common)
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
      .select(col("id1"), col("id2"), col("jaccard"))
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
      .select(col("id1"), col("id2"), col("jaccard"))
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

  /** Connected components over an undirected pair list via min-label
    * propagation: labels converge in O(component diameter) rounds — for
    * near-dup graphs that is 2-3 (clusters are cliques-ish). Driver loop
    * bounds ITERATIONS, never data; each round is one shuffle join and
    * lineage is cut with localCheckpoint so 100 TB inputs don't accrete
    * a deep DAG. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id1").as("u"), col("id2").as("v"))
      .unionAll(pairs.select(col("id2").as("u"), col("id1").as("v")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id")).agg(min(col("label")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    labels
  }

  /** End-to-end corpus curation: MinHash-LSH near-dup detection →
    * connected components → keep the smallest doc_id per duplicate
    * cluster → minimum-quality filter. Returns the kept documents with
    * their cluster label (own id when unique). */
  def curateCorpus(s: SparkSession, dir: String, minWords: Int = 10): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val pairs = dedupMinhash(s, dir).select(col("id1"), col("id2"))
    val comp = connectedComponents(pairs)
    docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("label"), col("doc_id")))
      .filter(col("cluster") === col("doc_id")) // canonical representative
      .filter(size(split(normalized(col("text")), " ")) >= minWords)
      .select(col("doc_id"), col("cluster"), col("source"))
  }

  def pipelineCurate(s: SparkSession, dir: String): DataFrame =
    curateCorpus(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (pipelineCurate _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_embedding" -> (dedupEmbedding _))

  /** Oracle for the full curation pipeline: exact 3-gram-jaccard pair
    * detection (LSH candidates verify to the same set — asserted in
    * DedupSpec) + recursive transitive closure for components. */
  val pipelineCurateSql: String =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
      |    FOR i IN range(1, greatest(len(w)-2, 1)+1)]) AS s
      |  FROM (SELECT doc_id, string_split(t, ' ') AS w FROM docs)),
      |pairs AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
      |edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (SELECT u AS id, least(u, min(v)) AS label FROM reach GROUP BY u)
      |SELECT d.source, count(*) AS n_kept
      |FROM docs d
      |WHERE NOT EXISTS (SELECT 1 FROM labels l WHERE l.id = d.doc_id AND l.label < d.doc_id)
      |  AND len(string_split(d.t, ' ')) >= 10
      |GROUP BY d.source""".stripMargin

  /** Exact n-gram jaccard pairs — same shingle construction as the Spark
    * side, all-pairs in SQL (fine at oracle scale; Spark blocks on shared
    * shingles instead of enumerating pairs). */
  val dedupNgramSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
      |    FOR i IN range(1, greatest(len(w)-2, 1)+1)]) AS s
      |  FROM (SELECT doc_id, string_split(t, ' ') AS w FROM docs))
      |SELECT id1, id2, j AS jaccard FROM (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2,
      |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) p
      |WHERE j >= 0.6""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_ngram" -> dedupNgramSql,
    "pipeline_curate" -> pipelineCurateSql)
}
