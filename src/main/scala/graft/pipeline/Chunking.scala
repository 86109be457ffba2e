package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document chunking — the training-data op between cleaning and
  * embedding/tokenization: split each document into fixed-size token
  * windows with overlap (stride < window), so every token appears in ≥1
  * chunk and context straddles boundaries. Deterministic whitespace
  * tokenization keeps the chunk text reconstructible and the whole op
  * oracle-checkable; a BPE tokenizer slots in at the same seam
  * (`TextAnalysis` carries the token-counting surface).
  *
  * Scale posture: tokenize → explode(sequence) → slice is a pure
  * codegen projection chain — shuffle-free, linear in corpus size, and
  * the explode fan-out is bounded by ceil(tokens/stride) per document.
  * At 100 TB this is embarrassingly parallel over parquet splits.
  */
object Chunking {

  /** Window of `size` tokens every `stride` tokens (overlap = size −
    * stride). chunk_id is 0-based; the last chunk may be short, never
    * empty (the id bound floor((n−1)/stride) puts its start ≤ n−1). */
  def chunk(docs: DataFrame, textCol: String, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        floor((org.apache.spark.sql.functions.size(col("__toks")) - 1) / stride)
          .cast("long"))))
      .withColumn("__slice", slice(col("__toks"),
        (col("chunk_id") * stride + 1).cast("int"), lit(size)))
      .withColumn("chunk_text", concat_ws(" ", col("__slice")))
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(col("__slice")).cast("long"))
      .drop("__toks", "__slice", textCol)
  }

  /** Driver-gate entry: window 8 / stride 6 over the documents fixture. */
  def textChunk(s: SparkSession, dir: String): DataFrame =
    chunk(Tables.t(s, dir, "documents").select("doc_id", "text"),
      "text", size = 8, stride = 6)

  /** Same tokenization/windowing in DuckDB: 1-based list slicing clamps
    * exactly like Spark's `slice`, generate_series is inclusive like
    * `sequence`. */
  val textChunkSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), idx AS (
      |  SELECT doc_id, t,
      |         unnest(generate_series(0, CAST(floor((len(t) - 1) / 6) AS BIGINT))) AS chunk_id
      |  FROM toks
      |)
      |SELECT doc_id, chunk_id,
      |       array_to_string(t[(chunk_id*6+1):(chunk_id*6+8)], ' ') AS chunk_text,
      |       CAST(len(t[(chunk_id*6+1):(chunk_id*6+8)]) AS BIGINT) AS n_tokens
      |FROM idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_chunk" -> (textChunk _))

  val oracle: Map[String, String] = Map(
    "text_chunk" -> textChunkSql)
}
