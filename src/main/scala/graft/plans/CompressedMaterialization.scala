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

  /** Stats-gated packing — the faithful analog of the reference's pass,
    * which RANGE-compresses keys via min/max statistics and simply does
    * not fire when the ranges don't fit
    * (`src/optimizer/compressed_materialization.cpp`). A cheap stats
    * pre-pass (column-pruned, map-side-combined min/max/null-count agg —
    * no shuffle of data rows; the reference reads the same numbers from
    * its catalog for free) decides per query:
    *
    *  - both key RANGES (not absolute values) fit a combined ≤63 bits →
    *    offset-pack `((a-minA+nullA) << bitsB) | (b-minB+nullB)`, with
    *    slot 0 reserved for NULL exactly like the reference's sentinel
    *    slot, so nullable keys group correctly;
    *  - otherwise → plain groupBy. NEVER a runtime failure: the round-9
    *    sf1-scale sweep caught [[packPair]]'s value-range assert aborting
    *    `compress_pack_agg` on 10×-inflated (sparse, >32-bit) keys — the
    *    stats gate turns that abort into the reference's own behavior,
    *    "don't compress what stats can't prove compressible". */
  def groupByPackedAuto(df: DataFrame, keyA: String, keyB: String,
      aggs: Seq[Column]): DataFrame = {
    val a = col(keyA).cast("long"); val b = col(keyB).cast("long")
    val r = df.agg(
      min(a).as("mna"), max(a).as("mxa"),
      min(b).as("mnb"), max(b).as("mxb"),
      count(lit(1)).as("n"), count(a).as("na"), count(b).as("nb"))
      .collect().head
    def plain = df.groupBy(col(keyA), col(keyB)).agg(aggs.head, aggs.tail: _*)
    if (r.isNullAt(0) || r.isNullAt(2)) return plain // empty or all-null key
    val (mna, mxa) = (r.getLong(0), r.getLong(1))
    val (mnb, mxb) = (r.getLong(2), r.getLong(3))
    val nullA = if (r.getLong(5) < r.getLong(4)) 1L else 0L
    val nullB = if (r.getLong(6) < r.getLong(4)) 1L else 0L
    val maxIdxA = BigInt(mxa) - BigInt(mna) + nullA
    val maxIdxB = BigInt(mxb) - BigInt(mnb) + nullB
    def bits(maxIdx: BigInt): Int = math.max(1, maxIdx.bitLength)
    if (!maxIdxA.isValidLong || !maxIdxB.isValidLong ||
        bits(maxIdxA) + bits(maxIdxB) > 63) return plain
    val bitsB = bits(maxIdxB)
    def enc(k: Column, mn: Long, nullOff: Long): Column =
      if (nullOff == 0L) k.cast("long") - lit(mn)
      else when(k.isNull, lit(0L)).otherwise(k.cast("long") - lit(mn) + lit(1L))
    val packed =
      shiftleft(enc(col(keyA), mna, nullA), bitsB)
        .bitwiseOR(enc(col(keyB), mnb, nullB))
    def dec(idx: Column, mn: Long, nullOff: Long): Column =
      if (nullOff == 0L) idx + lit(mn)
      else when(idx === 0L, lit(null).cast("long")).otherwise(idx - lit(1L) + lit(mn))
    val (dtA, dtB) = (df.schema(keyA).dataType, df.schema(keyB).dataType)
    val agged = df.withColumn("_packed", packed)
      .groupBy(col("_packed"))
      .agg(aggs.head, aggs.tail: _*)
    val aggNames = agged.columns.filterNot(_ == "_packed").toIndexedSeq
    // keys first, aggregates after — positionally identical to the plain
    // groupBy this is a drop-in replacement for
    agged.select(
      (dec(shiftright(col("_packed"), bitsB), mna, nullA).cast(dtA).as(keyA) +:
        dec(col("_packed").bitwiseAND(lit((1L << bitsB) - 1L)), mnb, nullB)
          .cast(dtB).as(keyB) +:
        aggNames.map(col)): _*)
  }
}
