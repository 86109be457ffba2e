package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("graft-sources").toString

  test("CSV round-trip with schema inference recovers rows and types") {
    val cust = graft.Tables.t(spark, sf(), "customer")
    Sources.copyTo(cust, s"$tmp/cust_csv", "csv")
    val back = Sources.readCsv(spark, s"$tmp/cust_csv")
    assert(back.count() == cust.count())
    val types = back.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("c_custkey") == LongType || types("c_custkey") == IntegerType)
    assert(types("c_acctbal") == DoubleType)
    assert(types("c_name") == StringType)
    // values identical after aligning the inferred integer width
    val a = cust.select($"c_custkey".cast("long"), $"c_name", $"c_acctbal")
      .orderBy($"c_custkey").collect().toSeq
    val b = back.select($"c_custkey".cast("long"), $"c_name", $"c_acctbal")
      .orderBy($"c_custkey").collect().toSeq
    assert(a == b)
  }

  test("sniffer detects semicolon-delimited headerless CSV") {
    val dir = new java.io.File(s"$tmp/semi"); dir.mkdirs()
    val pw = new java.io.PrintWriter(s"$tmp/semi/data.csv")
    (1 to 20).foreach(i => pw.println(s"$i;name $i;${i * 1.5}"))
    pw.close()
    val d = Sources.sniffCsv(spark, s"$tmp/semi")
    assert(d.delimiter == ";" && !d.header)
    val df = Sources.readCsv(spark, s"$tmp/semi")
    assert(df.count() == 20 && df.columns.length == 3)
    assert(df.schema.fields(2).dataType == DoubleType)
  }

  test("sniffer detects tab-delimited CSV with header") {
    val dir = new java.io.File(s"$tmp/tabs"); dir.mkdirs()
    val pw = new java.io.PrintWriter(s"$tmp/tabs/data.tsv")
    pw.println("id\tlabel\tscore")
    (1 to 20).foreach(i => pw.println(s"$i\tl$i\t${i * 0.5}"))
    pw.close()
    val d = Sources.sniffCsv(spark, s"$tmp/tabs")
    assert(d.delimiter == "\t" && d.header)
    val df = Sources.readCsv(spark, s"$tmp/tabs")
    assert(df.count() == 20 && df.columns.toSeq == Seq("id", "label", "score"))
  }

  test("JSON round-trip preserves values") {
    val sup = graft.Tables.t(spark, sf(), "supplier")
    Sources.copyTo(sup, s"$tmp/sup_json", "json")
    val back = Sources.readJson(spark, s"$tmp/sup_json")
    assert(back.count() == sup.count())
    val a = sup.select($"s_suppkey", $"s_name").orderBy($"s_suppkey").collect().toSeq
    val b = back.select($"s_suppkey", $"s_name").orderBy($"s_suppkey").collect().toSeq
    assert(a == b)
  }

  test("glob scan unions files and exposes provenance") {
    val r = graft.Tables.t(spark, sf(), "region")
    Sources.copyTo(r, s"$tmp/multi/a", "json")
    Sources.copyTo(r, s"$tmp/multi/b", "json")
    val all = Sources.readGlob(spark, s"$tmp/multi/*/", "json")
    assert(all.count() == 2 * r.count())
    assert(all.select($"_file").distinct().count() >= 2)
  }

  test("parallel COPY writes one file per partition") {
    val df = spark.range(0, 1000).repartition(4)
    Sources.copyTo(df.toDF(), s"$tmp/par", "parquet")
    val files = new java.io.File(s"$tmp/par").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 4)
  }

  test("partitioned COPY writes hive layout and reads back with partition pruning") {
    val cust = graft.Tables.t(spark, sf(), "customer")
    Sources.copyToPartitioned(cust, s"$tmp/partit", "parquet", Seq("c_mktsegment"))
    val dirs = new java.io.File(s"$tmp/partit").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("c_mktsegment=")))
    val back = spark.read.parquet(s"$tmp/partit")
    assert(back.count() == cust.count())
    // a filter on the partition column must prune at planning time
    val plan = back.filter($"c_mktsegment" === "BUILDING")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"))
    assert(back.filter($"c_mktsegment" === "BUILDING").count() ==
      cust.filter($"c_mktsegment" === "BUILDING").count())
  }

  test("df.summary provides the summary table function") {
    val s = graft.Tables.t(spark, sf(), "lineitem")
      .select($"l_quantity").summary("count", "min", "max")
    val rows = s.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("count").toLong > 0)
    assert(rows("min").toDouble >= 1.0)
  }
}
