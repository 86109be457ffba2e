package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions.udaf

/** Public function surface of the engine — Column wrappers over the custom
  * Catalyst expressions plus SQL registration, mirroring how the reference
  * registers its scalar library in one function list
  * (reference `src/core_functions/function_list.cpp`).
  */
object GraftFunctions {

  private def col2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    Bridge.column(f(Bridge.expression(a), Bridge.expression(b)))

  // ---- vector similarity (ARRAY<FLOAT>) ----
  def list_inner_product(a: Column, b: Column): Column = col2(ListInnerProduct)(a, b)
  def list_cosine_similarity(a: Column, b: Column): Column = col2(ListCosineSimilarity)(a, b)
  def list_distance(a: Column, b: Column): Column = col2(ListDistance)(a, b)

  // ---- string similarity ----
  def jaccard(a: Column, b: Column): Column = col2(JaccardSimilarity)(a, b)
  def jaro_winkler_similarity(a: Column, b: Column): Column = col2(JaroWinklerSimilarity)(a, b)
  def damerau_levenshtein(a: Column, b: Column): Column = col2(DamerauLevenshtein)(a, b)
  def hamming(a: Column, b: Column): Column = col2(HammingDistance)(a, b)

  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))

  // ---- human-readable formatting ----
  def format_bytes(c: Column): Column =
    Bridge.column(FormatBytes(Bridge.expression(c.cast("long"))))
  def to_base(n: Column, radix: Column, minLength: Column): Column =
    Bridge.column(ToBase(Bridge.expression(n.cast("long")),
      Bridge.expression(radix.cast("int")), Bridge.expression(minLength.cast("int"))))
  def to_base(n: Column, radix: Column): Column =
    to_base(n, radix, org.apache.spark.sql.functions.lit(0))
  def bar(x: Column, min: Column, max: Column, width: Column): Column =
    Bridge.column(BarChart(Bridge.expression(x.cast("double")),
      Bridge.expression(min.cast("double")), Bridge.expression(max.cast("double")),
      Bridge.expression(width.cast("double"))))
  def bar(x: Column, min: Column, max: Column): Column =
    bar(x, min, max, org.apache.spark.sql.functions.lit(80.0))

  /** Non-string inputs take the same to-string cast the composed concat()
    * spelling applied (a LONG id hashes as its decimal rendering — what
    * the DuckDB `seed || ':' || v` dialect does too). */
  def md5_hash64(seed: Int, c: Column): Column =
    Bridge.column(Md5Hash64(Bridge.expression(c.cast("string")), seed))

  // ---- integer math ----
  def gcd(a: Column, b: Column): Column = col2(Gcd)(a, b)
  def lcm(a: Column, b: Column): Column = col2(Lcm)(a, b)

  // ---- time ----
  def time_bucket(width: String, ts: Column): Column =
    TimeFunctions.timeBucket(width, ts)

  // ---- custom aggregates ----
  def entropy(c: Column): Column =
    udaf(new GraftAggregators.EntropyAggregator).apply(c)
  def histogram_map(c: Column): Column =
    udaf(new GraftAggregators.HistogramAggregator).apply(c)
  def approx_top_k(c: Column, capacity: Int = 64, k: Int = 5): Column =
    udaf(new GraftAggregators.SpaceSavingAggregator(capacity, k)).apply(c)
  def reservoir_quantile(c: Column, q: Double,
      capacity: Int = 1 << 21, seed: Long = 42L): Column =
    udaf(new GraftAggregators.ReservoirQuantileAggregator(q, capacity, seed)).apply(c)
  def kahan_sum(c: Column): Column =
    udaf(new GraftAggregators.KahanSumAggregator).apply(c.cast("double"))

  /** ENUM modeling (reference `src/core_functions/scalar/enum/enum.cpp`:
    * enum_code/enum_first/enum_last/enum_range/enum_range_boundary).
    * Spark has no ENUM type; the model is an ORDERED value domain
    * carried as metadata — exactly what an ENUM column is after
    * dictionary encoding. `code` is the 0-based domain ordinal
    * (row-dependent, evaluated by array_position), `lt` compares by
    * CODE, not lexicographically — the ENUM semantic that differs
    * observably from VARCHAR ('error' < 'purchase' is true as strings,
    * false in a domain that orders error after purchase). first/last/
    * range/rangeBoundary are domain metadata, resolved at plan time
    * like DuckDB's binder does. Oracle-checked against DuckDB's REAL
    * anonymous ENUM type in `fn_enum`. */
  case class EnumDomain(values: Seq[String]) {
    require(values.nonEmpty && values.distinct == values,
      "ENUM domain must be non-empty and duplicate-free")
    private def arr = org.apache.spark.sql.functions.lit(values.toArray)
    /** 0-based ordinal. Out-of-domain input RAISES, matching the oracle's
      * real `CAST(x AS enum)` conversion error (a silent -1 would diverge
      * from the pinned ENUM semantics — round-13 advice); NULL stays NULL
      * on both engines (array_position(arr, NULL) is NULL, so neither
      * branch fires and the projection yields NULL). */
    def code(c: Column): Column = {
      import org.apache.spark.sql.functions.{array_position, concat, lit, raise_error, when}
      val pos = array_position(arr, c)
      when(pos === 0, raise_error(concat(
        lit("ENUM conversion error: value '"), c,
        lit(s"' is not in the domain ${values.mkString("('", "', '", "')")}"))))
        .otherwise((pos - 1).cast("int"))
    }
    def first: Column = org.apache.spark.sql.functions.lit(values.head)
    def last: Column = org.apache.spark.sql.functions.lit(values.last)
    def range: Column = arr
    def rangeBoundary(lo: String, hi: String): Column = {
      val (i, j) = (values.indexOf(lo), values.indexOf(hi))
      require(i >= 0 && j >= i, s"invalid ENUM boundary [$lo, $hi]")
      org.apache.spark.sql.functions.lit(values.slice(i, j + 1).toArray)
    }
    def lt(c: Column, v: String): Column = {
      require(values.contains(v), s"'$v' is not in the ENUM domain")
      code(c) < values.indexOf(v)
    }
  }

  /** Expression-level LET binding: evaluate `c` ONCE per row and make it
    * available to `f` as a lambda variable. Spark evaluates higher-order
    * function ARGUMENTS once but re-evaluates LAMBDA-BODY subtrees on
    * every element — so an expensive expression (a normalize+split, an
    * n-gram build) referenced inside a transform/filter/aggregate lambda
    * multiplies by the array length. `bind(x)(f)` = `transform(array(x),
    * v -> f(v))[1]` routes the expensive tree through the argument
    * position. Measured on the curation funnel's trigram gate: 32 s →
    * 0.9 s at sf0.1 (the unbound spelling re-derived the word split
    * 3 × |trigrams| times per document). */
  def bind(c: Column)(f: Column => Column): Column = {
    import org.apache.spark.sql.functions.{array, element_at, transform}
    element_at(transform(array(c), f), 1)
  }

  /** Register the custom scalar functions for `spark.sql` use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("list_inner_product",
      es => ListInnerProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("list_cosine_similarity",
      es => ListCosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("list_distance",
      es => ListDistance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaccard",
      es => JaccardSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler_similarity",
      es => JaroWinklerSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("damerau_levenshtein",
      es => DamerauLevenshtein(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming",
      es => HammingDistance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("gcd",
      es => Gcd(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("lcm",
      es => Lcm(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash",
      es => RollingHash(es.head), "built-in")
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    reg.createOrReplaceTempFunction("format_bytes",
      es => FormatBytes(Cast(es.head, LongType)), "built-in")
    reg.createOrReplaceTempFunction("to_base", es => ToBase(
      Cast(es.head, LongType), Cast(es(1), IntegerType),
      if (es.length > 2) Cast(es(2), IntegerType) else Literal(0)), "built-in")
    reg.createOrReplaceTempFunction("bar", es => BarChart(
      Cast(es.head, DoubleType), Cast(es(1), DoubleType), Cast(es(2), DoubleType),
      if (es.length > 3) Cast(es(3), DoubleType) else Literal(80.0)), "built-in")
    // md5_hash64(seed, v): seed must be an integer literal (it is baked
    // into the generated code, mirroring the Column API's Int parameter).
    reg.createOrReplaceTempFunction("md5_hash64", es => {
      val seed = es.head match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"md5_hash64 seed must be an integer literal, got $other")
      }
      Md5Hash64(org.apache.spark.sql.catalyst.expressions.Cast(
        es(1), org.apache.spark.sql.types.StringType), seed)
    }, "built-in")
  }
}
