package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Arrow IPC ingestion: schema mapping, value fidelity (incl. µs
  * timestamps and NULLs), multi-file parallel read, loud type refusal. */
class ArrowSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory("arrow").resolve(n).toString

  test("round-trip: fixture slice -> IPC file -> DataFrame is value-identical") {
    val src = graft.Tables.t(spark, sf(), "events")
      .filter($"event_id" < 50)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val p = tmp("events.arrow")
    ArrowSource.write(src, p)
    assert(ArrowSource.schemaOf(p) == src.schema.copy(fields =
      src.schema.fields.map(_.copy(nullable = true))))
    val back = ArrowSource.read(spark, Seq(p))
    val a = src.orderBy($"event_id").collect().toSeq
    val b = back.orderBy($"event_id").collect().toSeq
    assert(a.nonEmpty && a == b, "round-trip must be value-identical (µs exact)")
  }

  test("NULLs and multi-file reads survive") {
    val src = Seq((1L, Some("x"), Some(1.5)), (2L, None, None))
      .toDF("id", "s", "d")
    val (p1, p2) = (tmp("a.arrow"), tmp("b.arrow"))
    ArrowSource.write(src.filter($"id" === 1), p1)
    ArrowSource.write(src.filter($"id" === 2), p2)
    val back = ArrowSource.read(spark, Seq(p1, p2))
    assert(back.rdd.getNumPartitions == 2, "one task per file")
    val rows = back.orderBy($"id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(0).getString(1) == "x" && rows(0).getDouble(2) == 1.5)
  }

  test("a file whose footer schema differs from the head file refuses loudly") {
    val (p1, p2) = (tmp("s1.arrow"), tmp("s2.arrow"))
    ArrowSource.write(Seq((1L, "a")).toDF("id", "s"), p1)
    ArrowSource.write(Seq(("b", 2L)).toDF("s", "id"), p2) // columns swapped
    val e = intercept[Throwable] {
      ArrowSource.read(spark, Seq(p1, p2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("schema mismatch")),
      s"expected a descriptive schema-mismatch refusal, got: ${msgs(e).mkString(" | ")}")
  }

  test("partially consumed iterators (limit) close via the task listener") {
    // df.limit stops the iterator mid-file: the task-completion listener —
    // not the exhausted-iterator path — must release reader/channel/
    // allocator, and a subsequent full read of the same file must work.
    val p = tmp("part.arrow")
    ArrowSource.write(spark.range(0, 1000).toDF("id"), p)
    assert(ArrowSource.read(spark, Seq(p)).limit(3).collect().length == 3)
    assert(ArrowSource.read(spark, Seq(p)).count() == 1000)
  }

  test("unsupported types refuse loudly with the type name") {
    val e = intercept[IllegalArgumentException] {
      ArrowSource.write(Seq(Tuple1(Array(1, 2))).toDF("xs"), tmp("bad.arrow"))
    }
    assert(e.getMessage.contains("unsupported Spark type"))
  }
}
