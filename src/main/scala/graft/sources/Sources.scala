package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File sources/sinks beyond parquet — the reference's CSV reader with
  * dialect/type sniffing, JSON reader, glob table function, and COPY TO
  * sinks (reference `src/execution/operator/csv_scanner/sniffer/` — dialect
  * /header/type detection, `extension/json/buffered_json_reader.cpp`,
  * `src/function/table/glob.cpp`,
  * `src/execution/operator/persistent/physical_copy_to_file.cpp`).
  *
  * Spark equivalents are configuration, not code: `inferSchema`+`header`
  * is the sniffer, DataFrameWriter is COPY TO (with per-partition
  * parallel writes — the batched COPY variant), glob paths +
  * `input_file_name()` cover the glob table function.
  */
object Sources {

  /** COPY TO — write a frame as csv/json/parquet. `single=true` emits one
    * file (the reference's default serial COPY; at scale leave false so
    * every partition writes in parallel — the FixedBatchCopy analog). */
  def copyTo(df: DataFrame, path: String, format: String,
      single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    val w = out.write.mode("overwrite")
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "parquet" => w.parquet(path)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** CSV with dialect/type sniffing (header + schema inference). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Newline-delimited JSON with schema inference. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Glob scan with file provenance (`glob()` + filename virtual column). */
  def readGlob(spark: SparkSession, globPath: String, format: String): DataFrame = {
    val df = format match {
      case "csv" => readCsv(spark, globPath)
      case "json" => readJson(spark, globPath)
      case _ => spark.read.parquet(globPath)
    }
    df.withColumn("_file", input_file_name())
  }
}
