package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity functions Spark lacks (Spark ships only
  * `levenshtein`): character-set Jaccard, Jaro-Winkler, true
  * Damerau-Levenshtein, and Hamming — matching the reference's scalar
  * string library semantics (reference
  * `src/core_functions/scalar/string/jaccard.cpp`, `jaro_winkler.cpp`,
  * `damerau_levenshtein.cpp`, `hamming.cpp`), verified value-identical
  * against the oracle engine.
  *
  * These are interpretered (`CodegenFallback`) — they sit in scoring /
  * dedup-verification paths, not tight scan loops; the algorithms are
  * O(n·m) per pair and dominate any dispatch overhead.
  */
abstract class StringSimilarityBinary extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  protected def compute(a: String, b: String): Any

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
}

/** Jaccard similarity of the character (codepoint) sets of two strings. */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends StringSimilarityBinary {
  override def prettyName: String = "jaccard"
  override def dataType: DataType = DoubleType

  override protected def compute(a: String, b: String): Any = {
    require(a.nonEmpty && b.nonEmpty, "jaccard requires non-empty strings")
    val sa = a.codePoints().toArray.toSet
    val sb = b.codePoints().toArray.toSet
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaro-Winkler similarity: standard Jaro with winkler prefix boost
  * (scaling 0.1, boost threshold 0.7, prefix capped at 4). */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringSimilarityBinary {
  override def prettyName: String = "jaro_winkler_similarity"
  override def dataType: DataType = DoubleType

  override protected def compute(a: String, b: String): Any = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val s = a.toCharArray; val t = b.toCharArray
    val window = math.max(0, math.max(s.length, t.length) / 2 - 1)
    val sMatch = new Array[Boolean](s.length)
    val tMatch = new Array[Boolean](t.length)
    var matches = 0
    var i = 0
    while (i < s.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(t.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / s.length + m / t.length + (m - transpositions / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(s.length, t.length)) && s(prefix) == t(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** True Damerau-Levenshtein distance (unrestricted transpositions). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringSimilarityBinary {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = LongType

  override protected def compute(a: String, b: String): Any = {
    val s = a.toCharArray; val t = b.toCharArray
    val n = s.length; val m = t.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    for (i <- 0 to n) { d(i + 1)(1) = i; d(i + 1)(0) = inf }
    for (j <- 0 to m) { d(1)(j + 1) = j; d(0)(j + 1) = inf }
    val last = scala.collection.mutable.HashMap.empty[Char, Int]
    for (i <- 1 to n) {
      var lastMatchCol = 0
      for (j <- 1 to m) {
        val i1 = last.getOrElse(t(j - 1), 0)
        val j1 = lastMatchCol
        val cost = if (s(i - 1) == t(j - 1)) { lastMatchCol = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)),
          d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1))
      }
      last(s(i - 1)) = i
    }
    d(n + 1)(m + 1).toLong
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance over equal-length strings (errors otherwise, matching
  * the reference's behavior). */
case class HammingDistance(left: Expression, right: Expression)
    extends StringSimilarityBinary {
  override def prettyName: String = "hamming"
  override def dataType: DataType = LongType

  override protected def compute(a: String, b: String): Any = {
    require(a.length == b.length, "hamming: strings must be of equal length")
    var n = 0L
    var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) n += 1; i += 1 }
    n
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
