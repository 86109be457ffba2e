package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generic as-of join: all four inequality ops and both join types
  * against a plain-Scala reference, bit-identity with the round-4
  * hand-rolled recipe, null-order semantics, and collision suffixing. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (key, ord, lid)
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "b2"), (1L, 35L, "c"),
    (2L, 5L, "d"), (3L, 7L, "e"))
    .toDF("k", "o", "lid")
  private val right = Seq(
    // (key, ord, rid)
    (1L, 10L, "P10"), (1L, 30L, "P30"), (2L, 9L, "P9"))
    .toDF("k", "o", "rid")

  private def run(op: String, jt: String): Map[String, Option[String]] =
    Joins.asofJoin(left, right, Seq("k"), "o", "o", op, jt)
      .collect().map(r => r.getString(2) -> Option(r.getString(4))).toMap

  private def reference(op: String): Map[String, Option[String]] = {
    val rs = Seq((1L, 10L, "P10"), (1L, 30L, "P30"), (2L, 9L, "P9"))
    Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "b2"), (1L, 35L, "c"),
      (2L, 5L, "d"), (3L, 7L, "e")).map { case (k, o, lid) =>
      val cands = rs.filter(_._1 == k).filter { case (_, ro, _) =>
        op match {
          case ">=" => o >= ro; case ">" => o > ro
          case "<=" => o <= ro; case "<" => o < ro
        }
      }
      // nearest by order: max ro for backward ops, min ro for forward
      val best =
        if (cands.isEmpty) None
        else if (op.startsWith(">")) Some(cands.maxBy(c => (c._2, c._3))._3)
        else Some(cands.minBy(_._2) match { case m =>
          cands.filter(_._2 == m._2).maxBy(_._3)._3 })
      lid -> best
    }.toMap
  }

  for (op <- Seq(">=", ">", "<=", "<")) {
    test(s"asofJoin '$op' left matches the scala reference") {
      assert(run(op, "left") == reference(op))
    }
    test(s"asofJoin '$op' inner drops unmatched probes") {
      val exp = reference(op).collect { case (l, Some(r)) => l -> Option(r) }.toMap
      assert(run(op, "inner") == exp)
    }
  }

  test("asofJoinRight pins the DuckDB-probed RIGHT-outer semantics") {
    // probed on DuckDB 1.0.0 (round 15): NOT a side-swap — matching stays
    // left→right; right rows never chosen as a best match pad NULL-left
    val a = Seq((1, 5, 50), (1, 9, 90), (2, 4, 40), (3, 7, 70)).toDF("k", "t", "av")
    val b = Seq((1, 3, 300), (1, 6, 600), (1, 8, 800), (2, 10, 1000), (4, 1, 100))
      .toDF("k", "t", "bv")
    val got = Joins.asofJoinRight(a, b, Seq("k"), "t", "t", ">=")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    // (1,6,600) pads even though left rows at t>=6 exist: (1,9) matched (1,8)
    assert(got == Set(
      (Some(1), Some(5), Some(50), 1, 3, 300),
      (Some(1), Some(9), Some(90), 1, 8, 800),
      (None, None, None, 1, 6, 600),
      (None, None, None, 2, 10, 1000),
      (None, None, None, 4, 1, 100)), got.toString)
    // duplicate right rows: all probes match ONE physical row; the other
    // copies pad (multiplicity − 1 when matched, multiplicity otherwise)
    val a2 = Seq((1, 5, 50), (1, 6, 60), (1, 7, 70)).toDF("k", "t", "av")
    val b2 = Seq((1, 3, 300), (1, 3, 300)).toDF("k", "t", "bv")
    val got2 = Joins.asofJoinRight(a2, b2, Seq("k"), "t", "t", ">=")
      .collect().map(r => (Option(r.get(0)), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(got2.count(_._1.isEmpty) == 1 && got2.length == 4, got2.mkString(","))
    // inclusive-op tie: the largest-payload row is the match, the tied
    // sibling pads; under a strict op both pad
    val a3 = Seq((1, 5, 50)).toDF("k", "t", "av")
    val b3 = Seq((1, 5, 500), (1, 5, 501)).toDF("k", "t", "bv")
    val incl = Joins.asofJoinRight(a3, b3, Seq("k"), "t", "t", ">=")
      .collect().map(r => (Option(r.get(2)), r.getInt(5))).toSet
    assert(incl == Set((Some(50), 501), (None, 500)), incl.toString)
    val strict = Joins.asofJoinRight(a3, b3, Seq("k"), "t", "t", ">")
      .collect().map(r => (Option(r.get(2)), r.getInt(5))).toSet
    assert(strict == Set((None, 500), (None, 501)), strict.toString)
    // NULL-order right rows always pad
    val b4 = Seq((Some(1), Option.empty[Int], Some(999))).toDF("k", "t", "bv")
    val nul = Joins.asofJoinRight(a3, b4, Seq("k"), "t", "t", ">=")
      .collect().map(r => (Option(r.get(2)), r.getInt(5))).toSet
    assert(nul == Set((None, 999)), nul.toString)
  }

  test("asofJoinFull pins the DuckDB-probed FULL-outer semantics") {
    // probed on DuckDB 1.0.0: LEFT-outer as-of result + never-matched
    // right rows NULL-padded; right keys surface as _r (NULL on
    // unmatched-left rows)
    val a = Seq((1, 5, 50), (1, 9, 90), (3, 7, 70)).toDF("k", "t", "av")
    val b = Seq((1, 3, 300), (1, 6, 600), (2, 10, 1000)).toDF("k", "t", "bv")
    val got = Joins.asofJoinFull(a, b, Seq("k"), "t", "t", ">=")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    assert(got == Set(
      (Some(1), Some(5), Some(50), Some(1), Some(3), Some(300)),
      (Some(1), Some(9), Some(90), Some(1), Some(6), Some(600)),
      (Some(3), Some(7), Some(70), None, None, None),
      (None, None, None, Some(2), Some(10), Some(1000))), got.toString)
  }

  test("asofJoin matches the reference on random data, every op and type") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val row = for {
      k <- Gen.chooseNum(1L, 4L)   // few keys → partners and misses
      o <- Gen.chooseNum(0L, 12L)  // small range → plenty of order ties
    } yield (k, o)
    val side = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, row))
    val opG = Gen.oneOf(">=", ">", "<=", "<")
    val jtG = Gen.oneOf("left", "inner")
    val prop = Prop.forAll(side, side, opG, jtG) { (ls, rs, op, jt) =>
      val lrows = ls.zipWithIndex.map { case ((k, o), i) => (k, o, s"l$i") }
      val rrows = rs.zipWithIndex.map { case ((k, o), i) => (k, o, s"r$i") }
      val expected = lrows.map { case (k, o, lid) =>
        val cands = rrows.filter(_._1 == k).filter { case (_, ro, _) =>
          op match {
            case ">=" => o >= ro; case ">" => o > ro
            case "<=" => o <= ro; case "<" => o < ro
          }
        }
        val best =
          if (cands.isEmpty) None
          else if (op.startsWith(">")) {
            val m = cands.map(_._2).max
            Some(cands.filter(_._2 == m).maxBy(_._3)._3)
          } else {
            val m = cands.map(_._2).min
            Some(cands.filter(_._2 == m).maxBy(_._3)._3)
          }
        lid -> best
      }.filter { case (_, b) => jt == "left" || b.isDefined }.toMap
      val got = Joins.asofJoin(
        lrows.toDF("k", "o", "lid"), rrows.toDF("k", "o", "rid"),
        Seq("k"), "o", "o", op, jt)
        .collect().map(r => r.getString(2) -> Option(r.getString(4))).toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("null order values never match, on either side") {
    val l = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "o", "lid")
    val r = Seq((1L, Some(5L), "P5"), (1L, None, "PNULL")).toDF("k", "o", "rid")
    val got = Joins.asofJoin(l, r, Seq("k"), "o", "o", ">=", "left")
      .collect().map(x => x.getString(2) -> Option(x.getString(4))).toMap
    assert(got == Map("a" -> Some("P5"), "b" -> None))
  }

  test("colliding right columns get the _r suffix; left columns unchanged") {
    val out = Joins.asofJoin(left, right, Seq("k"), "o", "o")
    assert(out.columns.toSeq == Seq("k", "o", "lid", "o_r", "rid"))
  }

  test("generic asofJoin reproduces the hand-rolled entry bit-for-bit") {
    val viaGeneric = Joins.joinAsof(spark, sf())
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)))).toSet
    val viaLegacy = Joins.joinAsofLegacy(spark, sf())
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)))).toSet
    assert(viaGeneric == viaLegacy && viaGeneric.nonEmpty)
  }

  test("plan: one exchange on the equality keys, no nested-loop join") {
    val p = Joins.asofJoin(left, right, Seq("k"), "o", "o")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "as-of must not plan a domain product")
    assert(p.contains("Window"), "the union+window recipe plans a Window")
  }
}
