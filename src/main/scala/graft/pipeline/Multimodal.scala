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

  /** STUB decode: in a real deployment this calls the media codec; here it
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

  /** Frame sampling: chunk each payload into fixed-width frames and keep
    * every k-th — the video/audio frame-sample stage. The chunk/explode/
    * stride plumbing is the real deliverable (a codec swaps in at the
    * frame-decode step); 128-byte frames at fixture scale so the explode
    * actually fans out. Fixture text is pure ASCII (asserted in specs),
    * so char-slices equal byte-slices and the oracle reproduces frames
    * exactly. */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), (length(col("text")) / 128).cast("int")))
          .as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text").substr(col("frame_idx") * 128 + 1, lit(128)).cast("binary"))
          .as("frame_md5"),
        length(col("text").substr(col("frame_idx") * 128 + 1, lit(128)))
          .as("frame_len"))

  val mmFrameSampleSql: String =
    """SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  md5(substr(text, frame_idx*128+1, 128)) AS frame_md5,
      |  CAST(length(substr(text, frame_idx*128+1, 128)) AS INTEGER) AS frame_len
      |FROM (SELECT doc_id, text,
      |        unnest(range(CAST(length(text) // 128 + 1 AS BIGINT))) AS frame_idx
      |      FROM documents)
      |WHERE frame_idx % 2 = 0""".stripMargin

  /** Resize: deterministic down-sampling of the payload onto a fixed
    * 4-point grid (byte code at position i·n/4) — the image-resize stage
    * with nearest-neighbor sampling standing in for the pixel kernel.
    * The grid is emitted as one scalar column per sample point (p0..p3):
    * the compare harness hashes flat columns, and a fixed-size grid is by
    * definition a fixed-width row, so no array column is needed. */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    def p(i: Int) =
      ascii(txt.substr((lit(i) * length(txt) / 4).cast("int") + 1, lit(1)))
        .as(s"p$i")
    Tables.t(s, dir, "documents")
      .select(col("doc_id") +: (0 until 4).map(p): _*)
  }

  val mmResizeSql: String =
    """SELECT doc_id,
      |  unicode(substr(text, CAST(0 * length(text) // 4 AS BIGINT) + 1, 1)) AS p0,
      |  unicode(substr(text, CAST(1 * length(text) // 4 AS BIGINT) + 1, 1)) AS p1,
      |  unicode(substr(text, CAST(2 * length(text) // 4 AS BIGINT) + 1, 1)) AS p2,
      |  unicode(substr(text, CAST(3 * length(text) // 4 AS BIGINT) + 1, 1)) AS p3
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _))

  val oracle: Map[String, String] = Map(
    "mm_features" -> mmFeaturesSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql)
}
