package graft.functions

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("inner product of orthogonal unit vectors is 0") {
    val r = df2(Seq(1f, 0f), Seq(0f, 1f))
      .select(G.list_inner_product($"a", $"b")).head.getFloat(0)
    assert(r == 0f)
  }

  test("cosine of identical vectors is 1") {
    val r = df2(Seq(0.3f, 0.4f, 0.5f), Seq(0.3f, 0.4f, 0.5f))
      .select(G.list_cosine_similarity($"a", $"b")).head.getFloat(0)
    assert(math.abs(r - 1f) < 1e-6)
  }

  test("l2 distance 3-4-5 triangle") {
    val r = df2(Seq(0f, 0f), Seq(3f, 4f))
      .select(G.list_distance($"a", $"b")).head.getFloat(0)
    assert(r == 5f)
  }

  test("null input yields null") {
    val r = Seq((Some(Seq(1f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(G.list_inner_product($"a", $"b")).head
    assert(r.isNullAt(0))
  }

  test("dimension mismatch throws") {
    val ex = intercept[Exception] {
      df2(Seq(1f, 2f), Seq(1f)).select(G.list_distance($"a", $"b")).collect()
    }
    assert(ex.getMessage.contains("dimensions") ||
      ex.getCause != null && ex.getCause.getMessage.contains("dimensions"))
  }

  test("codegen and interpreted paths agree on fixture embeddings") {
    val e = graft.Tables.t(spark, sf(), "embeddings").limit(50).cache()
    val pairs = e.select($"vec_id", $"embedding".as("a"))
      .crossJoin(e.select($"embedding".as("b")).limit(3))
    val viaCodegen = pairs.select(
      G.list_cosine_similarity($"a", $"b").as("c"),
      G.list_inner_product($"a", $"b").as("i"),
      G.list_distance($"a", $"b").as("d")).collect()
    // interpreted: evaluate compute() directly on collected arrays
    val raw = pairs.select($"a", $"b").collect()
    viaCodegen.zip(raw).foreach { case (Row(c: Float, i: Float, d: Float), Row(a, b)) =>
      val av = a.asInstanceOf[scala.collection.Seq[Float]].toArray
      val bv = b.asInstanceOf[scala.collection.Seq[Float]].toArray
      var ip = 0f; var na = 0f; var nb = 0f; var ds = 0f
      var k = 0
      while (k < av.length) {
        ip += av(k) * bv(k); na += av(k) * av(k); nb += bv(k) * bv(k)
        val dd = av(k) - bv(k); ds += dd * dd
        k += 1
      }
      assert(i == ip)
      assert(c == ip / (math.sqrt(na.toDouble).toFloat * math.sqrt(nb.toDouble).toFloat))
      assert(d == math.sqrt(ds.toDouble).toFloat)
    }
  }

  test("property: inner product symmetric, distance non-negative (seeded random)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(10) {
      (Seq.fill(8)(rnd.nextFloat() * 20f - 10f), Seq.fill(8)(rnd.nextFloat() * 20f - 10f))
    }
    val df = cases.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("a", "b")
    val r = df.select(G.list_inner_product($"a", $"b"), G.list_distance($"a", $"b")).collect()
    r.grouped(2).foreach { case Array(ab, ba) =>
      assert(ab.getFloat(0) == ba.getFloat(0))
      assert(ab.getFloat(1) >= 0f && ab.getFloat(1) == ba.getFloat(1))
    }
  }
}
