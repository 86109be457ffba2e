package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Human-readable formatting scalars from the reference's string library
  * (reference `src/core_functions/scalar/string/format_bytes.cpp`,
  * `to_base.cpp`, `bar.cpp`) — report-layer functions, CodegenFallback by
  * design (they format final, already-aggregated rows, never scan-loop
  * data).
  *
  * `format_bytes` note: the reference SNAPSHOT's
  * `StringUtil::BytesToHumanReadableString` (`src/common/string_util.cpp:157`)
  * renders decimal units ("1.5MB"); the released DuckDB 1.0.0 the oracle
  * runs renders binary units ("1.5 MiB", truncated to one decimal, PiB
  * cap, "N byte[s]" under 1 KiB). We implement the released semantics —
  * that is what the correctness gate can pin value-for-value.
  *
  * `bar` note: DuckDB 1.0.0 space-pads the bar to `width` BYTES (a
  * display artifact of its fixed-width rendering, dropped in later
  * releases and absent from the reference snapshot's `bar.cpp`); we emit
  * the reference's unpadded bar and the oracle compares under rtrim,
  * which agrees with both versions (an all-space bar rtrims to the
  * reference's empty string).
  */
object Formatting {

  private[functions] val BASE_DIGITS = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  /** DuckDB-1.0.0 `format_bytes`: magnitude is taken UNSIGNED (so
    * Long.MinValue formats as -8192.0 PiB, not an overflow), one
    * TRUNCATED decimal, units capped at PiB. */
  private[functions] def formatBytes(bytes: Long): String = {
    val neg = bytes < 0
    val mag = if (neg) -bytes else bytes // Long.MinValue stays itself; treat as unsigned below
    if (java.lang.Long.compareUnsigned(mag, 1024L) < 0) {
      val n = bytes.toString
      n + (if (mag == 1L) " byte" else " bytes")
    } else {
      val units = Array("KiB", "MiB", "GiB", "TiB", "PiB")
      var k = 1
      while (k < 5 && java.lang.Long.compareUnsigned(mag, 1L << (10 * (k + 1))) >= 0) k += 1
      // Tenths the way the oracle engine computes them: truncate to the
      // NEXT-LOWER unit first, then take tenths of that count — i.e.
      // floor((mag >> 10(k-1)) * 10 / 1024), NOT floor(mag*10 / 2^10k)
      // (the two differ in the last sub-unit: 47605569 B is 45.40022 MiB
      // exactly but has only 409 full KiB past 45 MiB → "45.3 MiB").
      val v = mag >>> (10 * (k - 1)) // unit count in 1/1024ths (unsigned-safe)
      val tenths = (v * 10) >>> 10
      (if (neg) "-" else "") + (tenths / 10) + "." + (tenths % 10) + " " + units(k - 1)
    }
  }

  /** DuckDB `to_base`: non-negative value rendered in radix 2..36 with
    * uppercase digits, left-zero-padded to `minLength` (0..64). */
  private[functions] def toBase(n: Long, radix: Int, minLength: Int): String = {
    require(radix >= 2 && radix <= 36, "'to_base' radix must be between 2 and 36")
    require(minLength >= 0 && minLength <= 64, "'to_base' min_length must be between 0 and 64")
    require(n >= 0, "'to_base' number must be greater than or equal to 0")
    val sb = new java.lang.StringBuilder
    var v = n
    if (v == 0) sb.append('0')
    while (v > 0) { sb.append(BASE_DIGITS((v % radix).toInt)); v /= radix }
    while (sb.length < minLength) sb.append('0')
    sb.reverse.toString
  }

  private[functions] val FULL_BLOCK = "█"
  // PARTIAL_BLOCKS[r] = r eighths, r in 1..7 (reference unicode_bar.hpp)
  private[functions] val PARTIAL_BLOCKS =
    Array("", "▏", "▎", "▍", "▌", "▋", "▊", "▉")

  /** Reference `bar.cpp:12-57`: clamp x into [min,max], scale to
    * `maxWidth` cells, truncate to eighth-blocks; no padding. */
  private[functions] def bar(x: Double, min: Double, max: Double, maxWidth: Double): String = {
    require(!maxWidth.isNaN && !maxWidth.isInfinite, "Max bar width must not be NaN or infinity")
    require(maxWidth >= 1, "Max bar width must be >= 1")
    require(maxWidth <= 1000, "Max bar width must be <= 1000")
    val width =
      if (x.isNaN || min.isNaN || max.isNaN || x <= min) 0.0
      else if (x >= max) maxWidth
      else maxWidth * (x - min) / (max - min)
    require(!width.isNaN && !width.isInfinite, "Bar width must not be NaN or infinity")
    val widthAsInt = (width * 8).toInt
    val full = widthAsInt / 8
    val rem = widthAsInt % 8
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append(FULL_BLOCK); i += 1 }
    if (rem != 0) sb.append(PARTIAL_BLOCKS(rem))
    sb.toString
  }
}

case class FormatBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "format_bytes"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"format_bytes requires BIGINT input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Formatting.formatBytes(v.asInstanceOf[Long]))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ToBase(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "to_base"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == IntegerType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "to_base requires (BIGINT, INT, INT) inputs, got " +
        Seq(first, second, third).map(_.dataType.catalogString).mkString(", "))

  override def nullSafeEval(n: Any, radix: Any, minLen: Any): Any =
    UTF8String.fromString(Formatting.toBase(
      n.asInstanceOf[Long], radix.asInstanceOf[Int], minLen.asInstanceOf[Int]))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

case class BarChart(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {
  override def prettyName: String = "bar"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third, fourth).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bar requires DOUBLE inputs, got " +
        Seq(first, second, third, fourth).map(_.dataType.catalogString).mkString(", "))

  override def nullSafeEval(x: Any, mn: Any, mx: Any, w: Any): Any =
    UTF8String.fromString(Formatting.bar(x.asInstanceOf[Double],
      mn.asInstanceOf[Double], mx.asInstanceOf[Double], w.asInstanceOf[Double]))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}
