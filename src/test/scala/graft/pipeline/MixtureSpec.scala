package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("uniform cap: min domain keeps everything, others land near n_min") {
    val rows = Mixture.mixDomainUniform(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_total"),
        r.getAs[Long]("rate_ppm"), r.getAs[Long]("n_kept")))
    assert(rows.nonEmpty)
    val nMin = rows.map(_._2).min
    for ((src, total, ppm, kept) <- rows) {
      if (total == nMin) {
        assert(ppm == 1000000L, s"$src: min domain must keep all (ppm=$ppm)")
        assert(kept == total)
      }
      // expectation is ~n_min per source; hash-Bernoulli at fixture sizes
      // stays well within a factor-2 band
      assert(kept <= total)
      assert(kept >= nMin / 2 && kept <= nMin * 2,
        s"$src: kept=$kept far from n_min=$nMin")
    }
  }

  test("temperature α=0.5 interpolates: uniform rate ≤ rate ≤ 1") {
    val uni = Mixture.mixDomainUniform(spark, sf("sf0.001"))
      .select("domain", "rate_ppm").as[(String, Long)].collect().toMap
    val temp = Mixture.mixTemperature(spark, sf("sf0.001"))
      .select("domain", "rate_ppm").as[(String, Long)].collect().toMap
    assert(temp.keySet == uni.keySet)
    for ((src, tPpm) <- temp) {
      assert(tPpm >= uni(src), s"$src: temperature below uniform cap")
      assert(tPpm <= 1000000L)
      // sqrt(r) ≥ r with equality only at 0/1: strictly above for
      // non-min sources (floor can cost at most 1 ppm)
      if (uni(src) < 999999L) assert(tPpm > uni(src))
    }
  }

  test("sample is deterministic and matches the audit's kept counts") {
    val kept1 = Mixture.sampleUniform(spark, sf("sf0.001"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val kept2 = Mixture.sampleUniform(spark, sf("sf0.001"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept1 == kept2, "hash-Bernoulli sample must be deterministic")
    val audit = Mixture.mixDomainUniform(spark, sf("sf0.001"))
      .agg(sum("n_kept")).as[Long].head
    assert(kept1.size.toLong == audit,
      "sampleUniform and the audit entry must agree on the kept set size")
  }

  test("split is exhaustive, deterministic, and ~90/5/5") {
    val rows = Mixture.mixSplit(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    assert(total == 500L, "every document lands in exactly one split")
    val bySplit = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 90/5/5 in expectation; generous bands at n=500
    assert(bySplit("train") > 400L && bySplit("train") < 490L, bySplit.toString)
    assert(bySplit("val") < 60L && bySplit("test") < 60L, bySplit.toString)
    val again = Mixture.mixSplit(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(again == rows.toSet, "split assignment must be reproducible")
  }

  test("plan pins: broadcast rate joins, fp exchange is the only corpus shuffle") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pu = plan(Mixture.mixDomainUniform(spark, sf()))
    assert(pu.contains("BroadcastHashJoin"),
      "the rate table must broadcast back to the corpus scan")
    assert(!pu.contains("SortMergeJoin"),
      "no corpus-scale shuffle join in the mixture audit")
    val pf = plan(Mixture.mixCurationFunnel(spark, sf()))
    assert(pf.contains("hashpartitioning(fp"),
      "exact dedup must exchange on the fingerprint")
    assert(pf.contains("BroadcastHashJoin") && !pf.contains("SortMergeJoin"),
      "all rate/audit joins are broadcast — only the dedup exchange " +
        "touches corpus-sized data")
  }

  test("single-domain corpus keeps everything under both policies") {
    val df = Seq((1L, "src0"), (2L, "src0"), (3L, "src0"))
      .toDF("doc_id", "source")
    // route through the same frame by staging a one-source documents dir
    val dir = java.nio.file.Files.createTempDirectory("mixture").toString
    df.withColumn("text", lit("t")).withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(1))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Mixture.mixDomainUniform(spark, dir).collect()
    assert(r.length == 1 && r.head.getAs[Long]("rate_ppm") == 1000000L
      && r.head.getAs[Long]("n_kept") == 3L)
    val t = Mixture.mixTemperature(spark, dir).collect()
    assert(t.head.getAs[Long]("rate_ppm") == 1000000L
      && t.head.getAs[Long]("n_kept") == 3L)
  }

  test("mix_dsir: target-like content outweighs raw-typical content") {
    import spark.implicits._
    // target (en) speaks vocab A; the bulk of the corpus speaks vocab B;
    // two probe docs share a source-per-doc so the per-source audit
    // exposes their individual weights: the A-speaking probe must score
    // higher than the B-speaking one, whatever its lang label says
    val a = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val b = "uno dos tres cuatro uno dos tres cuatro uno dos"
    val corpus =
      (0 until 4).map(i => (i.toLong, a, "en", "tgt")) ++
        (4 until 12).map(i => (i.toLong, b, "xx", "bulk")) ++
        Seq((12L, a, "xx", "probe_a"), (13L, b, "xx", "probe_b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_").toString
    corpus.toDF("doc_id", "text", "lang", "source").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val w = Mixture.mixDsir(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // on a 14-doc corpus the add-1 smoothing mass keeps ALL weights
    // negative; the CONTRAST is the contract — a wide, stable gap
    assert(w("probe_a") - w("probe_b") > 1000000L,
      s"target-vocab probe must outweigh raw-vocab probe by a wide margin: $w")
  }
}
