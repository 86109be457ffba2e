package graft.functions

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}
import org.apache.spark.sql.functions._

/** Known-value tests for the string-similarity expressions; expected values
  * verified against the oracle engine (see also fn_strsim in the
  * correctness gate). */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("jaccard: character-set semantics") {
    assert(one(G.jaccard(lit("duck"), lit("luck"))) == 0.6)
    assert(one(G.jaccard(lit("aa"), lit("a"))) == 1.0)
    assert(one(G.jaccard(lit("Abc"), lit("abc"))) == 0.5)
  }

  test("jaro_winkler: standard reference values") {
    assert(math.abs(one(G.jaro_winkler_similarity(lit("MARTHA"), lit("MARHTA")))
      .asInstanceOf[Double] - 0.9611111111111111) < 1e-15)
    assert(math.abs(one(G.jaro_winkler_similarity(lit("DWAYNE"), lit("DUANE")))
      .asInstanceOf[Double] - 0.8400000000000001) < 1e-15)
    assert(math.abs(one(G.jaro_winkler_similarity(lit("DIXON"), lit("DICKSONX")))
      .asInstanceOf[Double] - 0.8133333333333332) < 1e-15)
    assert(one(G.jaro_winkler_similarity(lit("abc"), lit("abc"))) == 1.0)
    assert(one(G.jaro_winkler_similarity(lit(""), lit("abc"))) == 0.0)
  }

  test("damerau_levenshtein: true (unrestricted) transposition distance") {
    assert(one(G.damerau_levenshtein(lit("ca"), lit("abc"))) == 2L)
    assert(one(G.damerau_levenshtein(lit("duck"), lit("luck"))) == 1L)
    assert(one(G.damerau_levenshtein(lit("abcdef"), lit("abcdef"))) == 0L)
    assert(one(G.damerau_levenshtein(lit(""), lit("xyz"))) == 3L)
  }

  test("hamming: equal-length requirement") {
    assert(one(G.hamming(lit("duck"), lit("luck"))) == 1L)
    assert(one(G.hamming(lit("abc"), lit("abc"))) == 0L)
    intercept[Exception] {
      one(G.hamming(lit("ab"), lit("abc")))
    }
  }

  test("nulls propagate") {
    val r = Seq((Option.empty[String], Some("x")))
      .toDF("a", "b").select(G.jaccard($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT jaccard('duck', 'luck') AS j").head.getDouble(0)
    assert(r == 0.6)
  }

  test("gcd/lcm: codegen matches reference semantics") {
    assert(one(G.gcd(lit(-4L), lit(6L))) == 2L)
    assert(one(G.gcd(lit(0L), lit(7L))) == 7L)
    assert(one(G.lcm(lit(4L), lit(6L))) == 12L)
    assert(one(G.lcm(lit(0L), lit(6L))) == 0L)
    assert(one(G.lcm(lit(-4L), lit(6L))) == 12L)
  }
}
