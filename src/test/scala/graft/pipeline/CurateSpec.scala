package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, clique, and singleton-free") {
    // chain 1-2-3, separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp.size == 5) // only vertices appearing in pairs
  }

  test("curation keeps exactly one representative per near-dup cluster") {
    val pairs = Dedup.dedupMinhash(spark, sf("sf0.001"))
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = Dedup.curateCorpus(spark, sf("sf0.001"), minWords = 1)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // no kept doc may be the larger end of a dup pair whose smaller end exists
    pairs.foreach { case (a, b) =>
      assert(!(kept.contains(a) && kept.contains(b)),
        s"both ends of dup pair ($a,$b) kept")
    }
    val total = graft.Tables.t(spark, sf("sf0.001"), "documents").count()
    assert(kept.size < total && kept.nonEmpty)
  }

  test("quality filter drops short documents") {
    val all = Dedup.curateCorpus(spark, sf("sf0.001"), minWords = 1).count()
    val filtered = Dedup.curateCorpus(spark, sf("sf0.001"), minWords = 40).count()
    assert(filtered < all)
  }
}
