package graft.functions

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}
import org.apache.spark.sql.functions._

/** Known-value tests for the formatting expressions; every expected value
  * below was taken verbatim from the oracle engine (DuckDB 1.0.0) — see
  * also fn_format in the correctness gate and the version-skew notes on
  * [[Formatting]]. */
class FormattingSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("format_bytes: oracle-pinned binary units, truncated tenths") {
    val pins = Seq(
      0L -> "0 bytes", 1L -> "1 byte", 999L -> "999 bytes",
      1023L -> "1023 bytes", 1024L -> "1.0 KiB", 1536L -> "1.5 KiB",
      1048575L -> "1023.9 KiB", // truncation, not rounding
      1048576L -> "1.0 MiB", 123456789L -> "117.7 MiB",
      -1L -> "-1 byte", -2048L -> "-2.0 KiB",
      3L * 1073741824L + 12345678L -> "3.0 GiB",
      1125899906842624L -> "1.0 PiB",
      1152921504606846976L -> "1024.0 PiB", // PiB cap, no EiB
      Long.MaxValue -> "8191.9 PiB",
      Long.MinValue -> "-8192.0 PiB") // unsigned magnitude, no overflow
    pins.foreach { case (n, want) =>
      assert(one(G.format_bytes(lit(n))) == want, s"format_bytes($n)")
    }
  }

  test("to_base: radix rendering, zero padding, refusals") {
    assert(one(G.to_base(lit(255L), lit(16))) == "FF")
    assert(one(G.to_base(lit(255L), lit(2))) == "11111111")
    assert(one(G.to_base(lit(10L), lit(36))) == "A")
    assert(one(G.to_base(lit(35L), lit(36))) == "Z")
    assert(one(G.to_base(lit(255L), lit(16), lit(6))) == "0000FF")
    assert(one(G.to_base(lit(0L), lit(8))) == "0")
    assert(one(G.to_base(lit(12345L), lit(10))) == "12345")
    intercept[Exception](one(G.to_base(lit(-1L), lit(16))))
    intercept[Exception](one(G.to_base(lit(5L), lit(37))))
    intercept[Exception](one(G.to_base(lit(5L), lit(1))))
    intercept[Exception](one(G.to_base(lit(5L), lit(16), lit(-1))))
    intercept[Exception](one(G.to_base(lit(5L), lit(16), lit(100))))
  }

  test("bar: eighth-block ladder, truncation, clamping, no padding") {
    // the full 1-cell ladder (x/64 of an 8-cell bar = x eighths)
    val ladder = Seq("▏", "▎", "▍", "▌", "▋", "▊", "▉")
    ladder.zipWithIndex.foreach { case (want, i) =>
      assert(one(G.bar(lit(i + 1), lit(0), lit(8), lit(1))) == want)
    }
    assert(one(G.bar(lit(50), lit(0), lit(100), lit(10))) == "█████")
    assert(one(G.bar(lit(2.56), lit(0), lit(8), lit(1))) == "▎") // 2.56 eighths truncates to 2
    assert(one(G.bar(lit(0), lit(0), lit(100), lit(10))) == "")  // reference: no padding
    assert(one(G.bar(lit(150), lit(0), lit(100), lit(10))) == "██████████") // clamp high
    assert(one(G.bar(lit(-5), lit(0), lit(100), lit(10))) == "")            // clamp low
    assert(one(G.bar(lit(Double.NaN), lit(0), lit(10), lit(8))) == "")
    assert(one(G.bar(lit(5), lit(0), lit(10))) ==
      "█" * 40) // default width 80
    intercept[Exception](one(G.bar(lit(5), lit(0), lit(10), lit(0))))
    intercept[Exception](one(G.bar(lit(5), lit(0), lit(10), lit(1001))))
    intercept[Exception](one(G.bar(lit(5), lit(0), lit(10), lit(Double.NaN))))
  }

  test("nulls propagate") {
    val r = Seq(Option.empty[Long]).toDF("n")
      .select(G.format_bytes($"n"), G.to_base($"n", lit(16)),
        G.bar($"n", lit(0), lit(10), lit(8))).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("SQL registration: 2-arg and full-arg forms") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT format_bytes(123456789) AS fb, to_base(255, 16) AS tb,
        |       to_base(255, 2, 16) AS tbp, bar(33, 0, 100, 4) AS b""".stripMargin).head
    assert(r.getString(0) == "117.7 MiB")
    assert(r.getString(1) == "FF")
    assert(r.getString(2) == "0000000011111111")
    assert(r.getString(3) == "█▎")
  }
}
