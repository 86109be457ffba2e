package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ENUM model semantics pinned beyond the `fn_enum` oracle's in-domain
  * rows: out-of-domain input must RAISE (DuckDB's real `CAST(x AS enum)`
  * throws a conversion error — a silent -1 would diverge; round-13
  * advice), NULL stays NULL, and codes follow DOMAIN order. */
class EnumDomainSpec extends SparkSpec {
  import spark.implicits._

  private val dom = GraftFunctions.EnumDomain(Seq("click", "purchase", "error"))

  test("code follows domain order; NULL input stays NULL") {
    val got = Seq(Some("click"), Some("error"), None).toDF("v")
      .select(dom.code(col("v")).as("c")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq[Any](0, 2, null))
  }

  test("out-of-domain value raises like the oracle's real ENUM cast") {
    val e = intercept[Throwable] {
      Seq("not-a-member").toDF("v").select(dom.code(col("v"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("ENUM conversion error")),
      s"expected the typed conversion error, got: ${msgs(e).mkString(" | ")}")
  }
}
