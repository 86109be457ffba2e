package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compressed materialization — the Spark analog of the reference's
  * optimizer pass that bit-packs group/sort keys into narrower types
  * before a materializing operator and unpacks after (reference
  * `src/optimizer/compressed_materialization.cpp`: integer keys are
  * range-compressed via min/max statistics, multi-column keys collapse
  * into fewer registers, so the hash table / sort run holds narrower
  * rows).
  *
  * Spark's Tungsten rows already store fixed-width columns compactly,
  * so the win here is not row width per se but (a) ONE 8-byte shuffle
  * key instead of several, (b) one hash/compare per row instead of one
  * per key column, and (c) a smaller shuffle record. The transform is
  * purely algebraic — pack = (a << 32) | (b & 0xffffffff), unpack =
  * (shift, mask) — and stays inside whole-stage codegen on both sides
  * of the exchange; no UDF, no extra pass.
  *
  * Like the reference's pass (which needs validated statistics before it
  * fires), packing here is gated on the caller KNOWING the key ranges:
  * both keys must fit in 32 bits. That contract is asserted per-row in
  * the packed expression (overflowing keys raise, not corrupt) — the
  * analog of the reference refusing to compress without stats. */
object CompressedMaterialization {

  /** Pack two int-range keys into one long: (a << 32) | (b & 0xffffffff).
    * Injective for any values in [Int.MinValue, Int.MaxValue]; inputs
    * outside 32-bit range fail loudly via the overflow-checked int cast
    * (ANSI-off sessions get the assert_true guard instead).
    *
    * CONTRACT: both keys must be NON-NULL as well as 32-bit. A plain
    * groupBy would place NULL keys in their own group; the packed form
    * cannot represent them (the reference's pass side-steps this with
    * validated range stats that reserve a sentinel slot,
    * `compressed_materialization.cpp`; a 64-bit pack of two full 32-bit
    * ranges has no spare bit for a NULL flag). A NULL key therefore
    * ABORTS the query with an explicit message — never a silent
    * misgroup. Callers with nullable keys should pre-image NULL to an
    * out-of-domain sentinel (then both contracts hold) or use the plain
    * groupBy. */
  def packPair(a: Column, b: Column): Column = {
    val guard = assert_true(
      a.isNotNull && b.isNotNull &&
        a.between(Int.MinValue.toLong, Int.MaxValue.toLong) &&
        b.between(Int.MinValue.toLong, Int.MaxValue.toLong),
      lit("compressed-materialization pack: key NULL or outside 32-bit " +
        "range (pack requires non-null 32-bit keys; pre-map NULL to a " +
        "sentinel or use plain groupBy)"))
    when(guard.isNull,
      shiftleft(a.cast("long"), 32).bitwiseOR(
        b.cast("long").bitwiseAND(lit(0xffffffffL))))
  }

  /** Inverse of packPair. unpackB sign-extends the low 32 bits with
    * arithmetic (not a narrowing cast, which ANSI mode rejects as
    * overflow for any packed value with a high half). */
  def unpackA(packed: Column): Column = shiftright(packed, 32).cast("long")
  def unpackB(packed: Column): Column = {
    val low = packed.bitwiseAND(lit(0xffffffffL))
    when(low >= lit(2147483648L), low - lit(4294967296L)).otherwise(low)
  }

  /** groupBy over the packed composite key: one 8-byte shuffle key and
    * one hash per row through the exchange; keys are restored (with the
    * caller's names) after the aggregate. `aggs` must be non-empty. */
  def groupByPacked(df: DataFrame, keyA: String, keyB: String,
      aggs: Seq[Column]): DataFrame =
    df.withColumn("_packed", packPair(col(keyA), col(keyB)))
      .groupBy(col("_packed"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(keyA, unpackA(col("_packed")))
      .withColumn(keyB, unpackB(col("_packed")))
      .drop("_packed")
}
