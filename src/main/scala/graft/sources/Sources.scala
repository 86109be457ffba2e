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

  /** Partitioned COPY TO (reference `COPY … (PARTITION_BY col)`,
    * `src/execution/operator/persistent/physical_copy_to_file.cpp`
    * partition_output path): hive-style directory layout
    * `col=value/part-*.parquet`. The payoff at scale is on the READ side:
    * a filter on the partition column becomes a PartitionFilter — whole
    * directories are skipped before any file is opened. Keep partition
    * columns low-cardinality (each value is a directory). */
  def copyToPartitioned(df: DataFrame, path: String, format: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite").partitionBy(partitionCols: _*)
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "parquet" => w.parquet(path)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** CSV dialect sniffing (reference
    * `src/execution/operator/csv_scanner/sniffer/dialect_detection.cpp`,
    * `header_detection.cpp`): sample the first lines once, score candidate
    * delimiters by (consistent column count across lines, columns > 1),
    * then decide header presence by type dissonance — a first line whose
    * fields are non-numeric while the body column is numeric is a header.
    * The sample is a driver-side peek at a few KB (the same thing the
    * reference's buffered sniffer does), never a data-path collect. */
  case class CsvDialect(delimiter: String, header: Boolean)

  def sniffCsv(spark: SparkSession, path: String, sampleLines: Int = 64): CsvDialect = {
    val lines = spark.read.textFile(path).limit(sampleLines).collect().toSeq
      .filter(_.nonEmpty)
    val candidates = Seq(",", ";", "\t", "|")
    def fields(l: String, d: String): Array[String] =
      l.split(java.util.regex.Pattern.quote(d), -1)
    val delimiter = candidates.maxBy { d =>
      val counts = lines.map(l => fields(l, d).length)
      if (counts.isEmpty || counts.max < 2) -1
      // score: consistency (all lines same width) then width
      else (if (counts.distinct.size == 1) 1000 else 0) + counts.min
    }
    val isNum = (s: String) => s.nonEmpty &&
      scala.util.Try(java.lang.Double.parseDouble(s)).isSuccess
    val header = lines match {
      case first +: body if body.nonEmpty =>
        val f = fields(first, delimiter)
        val bodyNumeric = body.map(fields(_, delimiter))
          .filter(_.length == f.length)
          .transpose.map(_.forall(isNum))
        // any column numeric in the body but not in line 1 → header line
        f.zip(bodyNumeric).exists { case (h, numeric) => numeric && !isNum(h) }
      case _ => false
    }
    CsvDialect(delimiter, header)
  }

  /** CSV with dialect/type sniffing: detected delimiter + header, Spark's
    * schema inference for types (the sniffer's type-detection phase). */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    val d = sniffCsv(spark, path)
    spark.read
      .option("header", d.header.toString)
      .option("sep", d.delimiter)
      .option("inferSchema", "true")
      .csv(path)
  }

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
