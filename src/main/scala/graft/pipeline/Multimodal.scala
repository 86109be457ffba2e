package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads travel as opaque `BINARY`
  * columns with a typed metadata struct; decode / feature-extraction runs
  * as partition-batched typed transforms (the Scala analog of
  * `mapInPandas` — one iterator per partition, no per-row serialization).
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * container): `decodeStub` derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, binary batching, partitioning,
  * the feature-struct shape — is real and tested, so swapping in a true
  * decoder is a one-function change.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, n_frames: Int,
      checksum: String, features: Array[Float])

  /** Wrap a text corpus as a media table: payload = utf-8 bytes, kind from
    * the source column (stand-in for image/audio blobs). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("source").as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: ??? in a real deployment this calls the codec; here it
    * derives deterministic features so the plumbing is testable. Runs
    * partition-batched via mapPartitions — the batch shape a real decoder
    * needs (amortized codec init per partition, not per row). */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = Encoders.product[MediaFeatures]
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as(Encoders.product[MediaRow])
      .mapPartitions { rows =>
        // per-partition "codec init" happens once here
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          md.reset()
          val digest = md.digest(r.payload)
          val hex = digest.map("%02x".format(_)).mkString
          val feats = Array.tabulate(4) { i =>
            ((digest(i) & 0xff).toFloat / 255.0f)
          }
          MediaFeatures(
            doc_id = r.doc_id,
            kind = r.kind,
            n_bytes = r.payload.length.toLong,
            n_frames = (r.payload.length / 1024) + 1,
            checksum = hex,
            features = feats)
        }
      }(enc)
      .toDF()
  }

  /** Oracle-checked slice of the stub-decode output: byte counts, frame
    * counts, and checksum are arithmetic on the payload, reproducible in
    * any engine. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    decodeStub(asMedia(Tables.t(s, dir, "documents")))
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("n_frames"),
        col("checksum"))

  val mmFeaturesSql: String =
    """SELECT doc_id, source AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) // 1024 + 1 AS INTEGER) AS n_frames,
      |  md5(text) AS checksum
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _))

  val oracle: Map[String, String] = Map(
    "mm_features" -> mmFeaturesSql)
}
