package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash-LSH candidates recover the exact ngram-jaccard pairs") {
    // LSH is approximate on candidates but verification is exact, so at a
    // high threshold the pair sets must agree with full blocking.
    val viaMinhash = Dedup.dedupMinhash(spark, sf("sf0.001"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaNgram = Dedup.dedupNgram(spark, sf("sf0.001"))
      .filter($"jaccard" >= 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaNgram.subsetOf(viaMinhash) && viaMinhash == viaNgram)
  }

  test("star contraction collapses a long chain that bounded propagation cannot") {
    // path 0-1-2-...-16: diameter 16 >> the 3 rounds dedup_clusters runs;
    // Kiveris alternation must still land every node on root 0
    val chain = (0L until 16L).map(i => (i, i + 1))
    val labels = Dedup.connectedComponentsStar(chain.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (0L to 16L).toSet)
    assert(labels.values.forall(_ == 0L), s"chain must collapse to root 0: $labels")
    // two separate components keep separate minimum roots
    val two = Seq((10L, 11L), (11L, 12L), (3L, 4L), (4L, 5L))
    val l2 = Dedup.connectedComponentsStar(two.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    // hand-built corpus: eval doc = id 0 (0 % 31 == 0); id 1 embeds an
    // exact 8-token run from it; id 2 shares 7 tokens (one short of a
    // gram); id 3 is disjoint
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (0L, evalText),
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta trailer"),
      (2L, "alpha beta gamma delta epsilon zeta eta other tail words here"),
      (3L, "completely unrelated content with none of those tokens at all"))
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam_").toString
    corpus.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = Dedup.pipelineDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "eval docs excluded from the output")
    assert(got(1L) == ((1L, true)), s"one shared 8-gram: ${got(1L)}")
    assert(got(2L) == ((0L, false)), "a 7-token overlap is below the gram size")
    assert(got(3L) == ((0L, false)))
  }

  test("shingleHashes widens narrow input but adds no exchange to wide input") {
    def physical(df: org.apache.spark.sql.DataFrame): String =
      Dedup.shingleHashes(df, "text", 3).queryExecution.executedPlan.toString
    def mk(parts: Int) = spark.range(0, 64, 1, parts)
      .selectExpr("id AS doc_id",
        "concat('alpha beta gamma delta epsilon ', id) AS text")
    // narrow staging (1 partition on a multi-core session) → round-robin widen
    assert(physical(mk(1)).toLowerCase.contains("roundrobin"),
      "a narrower-than-cores input must be widened for the CPU-bound shingle stage")
    // input already at full width → the gate must NOT add the raw-text shuffle
    val cores = spark.sparkContext.defaultParallelism
    assert(!physical(mk(cores)).toLowerCase.contains("roundrobin"),
      "an already-wide input must not pay a second raw-text exchange")
  }

  test("exact dedup counts duplicates of normalized text") {
    val df = Seq(
      (1L, "Hello  World", "s"), (2L, "hello world", "s"),
      (3L, "other", "s")).toDF("doc_id", "text", "source")
    df.createOrReplaceTempView("x")
    val r = df.groupBy($"source")
      .agg(countDistinct(md5(Dedup.normalized($"text").cast("binary"))).as("u"))
      .head
    assert(r.getLong(1) == 2L) // two normalized-distinct texts
  }

  test("exact-dup pre-collapse: pair set identical to the un-collapsed pipeline") {
    // A corpus WITH exact duplicates (raw-identical, whitespace/case
    // variants that normalize identical) plus near-dups and uniques —
    // the shape the 100x probe corpus amplifies. The pre-collapsed
    // pipeline must emit EXACTLY the pair set of the un-collapsed
    // shingle→sign→band→verify over all docs, jaccard values included.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val docs = Seq(
      (1L, base), (2L, base), (3L, "  ALPHA beta gamma delta epsilon zeta eta theta iota kappa "),
      (4L, near), (5L, near),
      (6L, "one two three four five six seven eight nine ten"),
      (7L, "completely different text with no overlap whatsoever at all"))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    val collapsed = pairSet(Dedup.dedupMinhashPairs(docs))
    // the un-collapsed reference: same stages over ALL docs, no pre-pass
    val sh = Dedup.shingleHashes(docs, "text", 3)
    val sig = Dedup.minhashSignaturesHashed(sh, numHashes = 32)
    val cand = Dedup.lshCandidates(sig, numHashes = 32, bands = 8)
    val raw = pairSet(Dedup.verifyJaccardHashed(cand, sh, sig.select($"doc_id", $"n_sh"))
      .filter($"jaccard" >= 0.5).select($"id1", $"id2", $"jaccard"))
    assert(collapsed == raw, s"collapsed ${collapsed -- raw} vs raw ${raw -- collapsed}")
    // sanity on the shape itself: the 1-2-3 group yields 3 exact pairs at
    // 1.0 (including the normalize-identical doc 3), 4-5 one exact pair,
    // and the cross near-dup pairs carry one shared jaccard < 1.0
    val ones = collapsed.filter(_._3 == BigDecimal(1).setScale(9))
    assert(ones.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    val crossJ = collapsed.filter(p => Set(1L, 2L, 3L).contains(p._1) &&
      Set(4L, 5L).contains(p._2)).map(_._3)
    assert(crossJ.size == 1 && crossJ.head < BigDecimal(1).setScale(9),
      s"cross-group pairs must share one sub-1.0 jaccard: $crossJ")
  }

  test("incremental dedup: pair set equals the full recompute restricted to batch pairs") {
    // Corpus with exact duplicates, near-dups, and uniques; batch = ids
    // ≡ 0 (mod 10). The incremental plan (new×(new∪old) through shared
    // band buckets, old×old never paired) must emit EXACTLY the full
    // pipeline's verified pairs that involve a batch doc — jaccard
    // values included — and the staged-index round-trip must not change
    // a bit of it.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val docs = Seq(
      (1L, base), (2L, base), (10L, base),              // exact dups across old/new
      (4L, near), (20L, near),                          // near-dup old + exact-dup new
      (30L, "one two three four five six seven eight nine ten"),
      (6L, "one two three four five six seven eight nine ten"),
      (7L, "completely different text with no overlap whatsoever at all"),
      (40L, "another unique document that matches nothing in the corpus"))
      .toDF("doc_id", "text")
    val batch = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    // ground truth: full pipeline over corpus+batch, batch-involving only
    val sh = Dedup.shingleHashes(docs, "text", 3)
    val sig = Dedup.minhashSignaturesHashed(sh, numHashes = 32)
    val cand = Dedup.lshCandidates(sig, numHashes = 32, bands = 8)
    val full = pairSet(Dedup.verifyJaccardHashed(cand, sh, sig.select($"doc_id", $"n_sh"))
      .filter($"jaccard" >= 0.5).select($"id1", $"id2", $"jaccard"))
    val want = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(want.nonEmpty && want.size < full.size,
      "fixture must exercise both kept and excluded (old×old) pairs")
    val inline = pairSet(Dedup.incrementalPairs(Dedup.buildIndex(corpus), batch))
    assert(inline == want, s"extra ${inline -- want} missing ${want -- inline}")
    // staged-index round-trip (the production reload path)
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_idx_").toString
    val staged = pairSet(Dedup.incrementalPairs(
      Dedup.stageIndex(Dedup.buildIndex(corpus), dir), batch))
    assert(staged == want)
    // the exact-dup triangle (1,2,10): only the batch-involving legs
    assert(want.exists(p => p._1 == 1L && p._2 == 10L))
    assert(want.exists(p => p._1 == 2L && p._2 == 10L))
    assert(!want.exists(p => p._1 == 1L && p._2 == 2L), "old×old leg excluded")
  }

  test("pre-collapse gate: collapse only when duplicates are worth it") {
    // the hand corpus above (7 docs, 4 distinct texts) takes the
    // collapsed branch; boundary checks for the decision itself
    assert(!Dedup.shouldCollapse(0L, 0L), "empty corpus: nothing to collapse")
    assert(!Dedup.shouldCollapse(1L, 1L))
    assert(!Dedup.shouldCollapse(100L, 96L), "(near-)duplicate-free skips")
    assert(Dedup.shouldCollapse(100L, 94L))
    assert(Dedup.shouldCollapse(100L, 25L), "the 100x probe regime collapses")
    assert(Dedup.shouldCollapse(7L, 4L), "the equivalence-spec corpus collapses")
  }

  test("star contraction refuses to emit labels from a non-fixpoint edge set") {
    val chain = (0L until 16L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponentsStar(chain.toDF("id1", "id2"), maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("no fixpoint"))
  }

  test("simhash of identical docs is identical; permuted docs close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "dog lazy the over jumps fox brown quick the")).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(df, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    // bag-of-words simhash ignores order entirely → permutation identical
    assert(sigs(1L) == sigs(3L))
  }

  test("embedding near-dup threshold is exclusive and symmetric-free") {
    val pairs = Dedup.dedupEmbedding(spark, sf("sf0.001")).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getFloat(2) > 0.45f))
  }

  test("minhash pipeline forces no broadcasts (100 TB posture)") {
    // Scale posture: the candidate/verification joins must carry no
    // broadcast hints — at 10⁸⁺ candidate pairs a forced broadcast is a
    // driver OOM. AQE may still promote small sides at runtime (good);
    // what we assert is that nothing is FORCED at plan time.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = Dedup.dedupMinhash(spark, sf("sf0.001"))
    val hints = df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(hints.nonEmpty)
    assert(hints.forall(h => h.leftHint.isEmpty && h.rightHint.isEmpty))
  }

  test("ngram df-cap drops boilerplate blocking but keeps true pairs") {
    val default = Dedup.dedupNgram(spark, sf("sf0.001"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // A moderate cap must not lose any pair (the fixture's near-dups
    // share plenty of sub-cap shingles)…
    val capped = Dedup.dedupNgram(spark, sf("sf0.001"), maxDf = 10)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == default)
    // …while an aggressive cap can only shrink the blocking (subset), and
    // the result is still the exact-verified set over what it blocks.
    val strict = Dedup.dedupNgram(spark, sf("sf0.001"), maxDf = 2)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.subsetOf(default))
  }

  test("substring dedup flags exactly the docs sharing a k-token span") {
    val dir = java.nio.file.Files.createTempDirectory("spandedup").toString
    Seq(
      (1L, "a b c d e f g h unique1 tail1"),   // shares the 8-run a..h with 2
      (2L, "prefix2 a b c d e f g h tail2"),
      (3L, "p q r s t u v w x y"),             // no cross-doc span
      (4L, "too short for any"))               // under k tokens: no windows
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupSubstring(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_spans"), r.getAs[Long]("tot_spans"),
          r.getAs[Double]("dup_ratio"))).toMap
    // docs 1+2 each have 3 distinct windows, exactly one shared (a..h)
    assert(got.keySet == Set(1L, 2L), s"flagged: ${got.keySet}")
    assert(got(1L) == ((1L, 3L, 0.333333)))
    assert(got(2L) == ((1L, 3L, 0.333333)))
  }

  test("substring dedup: longer spans flag a subset of shorter-span docs") {
    // two docs sharing k consecutive tokens share every (k-2)-token
    // sub-run, so the k=10 flagged-doc set must nest inside k=8's
    def flagged(k: Int) = Dedup.dedupSubstring(spark, sf("sf0.001"), k = k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at8 = flagged(8)
    val at10 = flagged(10)
    assert(at10.subsetOf(at8), s"k=10 set ⊄ k=8 set: ${at10 -- at8}")
    assert(at8.nonEmpty, "fixture is known to carry cross-doc 8-spans")
  }

  test("dedup_clusters: identical-text groups collapse to min-id canonical clusters") {
    val dir = java.nio.file.Files.createTempDirectory("clusters").toString
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "one two three four five six seven eight"
    Seq((1L, shared), (2L, shared), (3L, shared), (4L, other), (5L, other),
      (6L, "lonely text with no duplicate partner anywhere here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_canonical"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), "doc 6 has no pair: not in graph")
    assert(got(1L) == ((1L, 3L, true)) && got(2L) == ((1L, 3L, false)) &&
      got(3L) == ((1L, 3L, false)))
    assert(got(4L) == ((4L, 2L, true)) && got(5L) == ((4L, 2L, false)))
  }

  test("dedup_clusters: fixture labels are a fixpoint and separate the pair graph") {
    def run(iters: Int) = Dedup.dedupClusters(spark, sf("sf0.001"), iters = iters)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at3 = run(3)
    assert(at3 == run(4), "a 4th propagation round must be a no-op (3 = fixpoint)")
    // every verified pair's endpoints carry the same label, and the
    // canonical is the cluster's min doc_id
    val pairs = Dedup.dedupMinhash(spark, sf("sf0.001"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(at3(a) == at3(b), s"pair ($a,$b) split across clusters")
    }
    at3.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min, s"cluster $label canonical is not min")
    }
  }

  test("embedding LSH candidates verify to a subset of exact pairs") {
    val exact = Dedup.dedupEmbedding(spark, sf("sf0.001"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupEmbeddingLsh(spark, sf("sf0.001"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    // banding shrinks the candidate space; verification keeps it honest
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val hints = Dedup.dedupEmbeddingLsh(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(hints.count(h => h.leftHint.isEmpty && h.rightHint.isEmpty) >= 2)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force topK is ordered and excludes the query") {
    val top = Similarity.annTopk(spark, sf("sf0.001")).collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(0) != 0L))
    val sims = top.map(_.getFloat(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("identical vectors share an LSH bucket") {
    val e = graft.Tables.t(spark, sf("sf0.001"), "embeddings").limit(20)
    val dup = e.union(e) // every vector twice
    val planes = Similarity.hyperplanes(spark, 8, 64)
    val b = Similarity.lshBuckets(dup, planes)
      .groupBy($"vec_id").agg(countDistinct($"bucket").as("n"))
    assert(b.filter($"n" > 1).count() == 0)
  }

  test("hyperplanes are deterministic for a fixed seed") {
    val a = Similarity.hyperplanes(spark, 4, 8).collect().toSeq
    val b = Similarity.hyperplanes(spark, 4, 8).collect().toSeq
    assert(a.toSet == b.toSet)
  }

  test("random projection is linear and deterministic (JL preprocessing)") {
    val p1 = Similarity.embProject(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("j").intValue()) ->
        r.getAs[Double]("p")).toMap
    val p2 = Similarity.embProject(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("j").intValue()) ->
        r.getAs[Double]("p")).toMap
    assert(p1 == p2, "projection must be bit-deterministic")
    assert(p1.keys.map(_._2).toSet == (0 until 8).toSet, "8 output dims")
    // linearity check against a scalar reference for one vector
    val e = graft.Tables.t(spark, sf("sf0.001"), "embeddings")
      .filter($"vec_id" === 3L).select($"embedding").head.getSeq[Float](0)
    val w = Similarity.hyperplanes(spark, 8, 64, seed = 17).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (j <- 0 until 8) {
      val want = e.zipWithIndex.map { case (x, d) => x * w((j, d)) }.sum
      assert(p1((3L, j)) == want, s"dim $j: ${p1((3L, j))} != $want")
    }
  }

  test("diversity diagnostic: collapsed label → 1.0, spread label near 0") {
    val dir = java.nio.file.Files.createTempDirectory("diversity").toString
    val collapsed = (0 until 10).map(i =>
      (i.toLong, Array.fill(8)(0.5f) :+ 1.0f, "collapsed"))
    // orthogonal one-hot vectors: every pairwise cosine is exactly 0
    val spread = (0 until 9).map(i =>
      (100L + i, Array.tabulate(9)(d => if (d == i) 1.0f else 0.0f), "spread"))
    (collapsed ++ spread).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.embDomainDiversity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("mean_cos")))
      .toMap
    assert(got("collapsed") == ((10L, 1.0)),
      s"identical vectors → mean pairwise cosine 1.0: $got")
    assert(got("spread")._2 == 0.0,
      s"orthogonal vectors → mean pairwise cosine 0.0: $got")
  }

  test("PQ: codebook vectors encode to their own codes; ADC to a codebook vector is the exact table distance") {
    val e = graft.Tables.t(spark, sf("sf0.001"), "embeddings")
      .filter($"embedding".isNotNull)
    val codes = Similarity.pqCodes(e).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("sub").longValue()) ->
        r.getAs[Number]("code").longValue()).toMap
    // every non-null vector has exactly 8 sub-codes, all in [0, 4)
    val byVec = codes.keys.groupBy(_._1)
    assert(byVec.values.forall(_.size == 8), "8 subspaces per vector")
    assert(codes.values.forall(c => c >= 0 && c < 4), "codes within codebook")
    // a codebook vector's nearest codebook entry in every subspace is itself
    for (cid <- 0L until 4L; sub <- 0L until 8L)
      assert(codes((cid, sub)) == cid, s"codebook vec $cid sub $sub self-code")
    // ADC distance from probe 0 to codebook vector 1 equals the directly
    // computed integer-picounit squared L2 distance (codes(1,·) = 1, so the
    // ADC sum IS the full distance table row)
    val adc = Similarity.annPq(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("adist")).toMap
    val vecs = e.filter($"vec_id" < 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    val want = vecs(0L).zip(vecs(1L)).map { case (x, c) =>
      val d = x.toDouble - c.toDouble
      math.floor(d * d * 1e12).toLong
    }.sum
    adc.get((0L, 1L)).foreach(got => assert(got == want,
      s"ADC(0,1) $got != direct integer distance $want"))
    // top-5 per probe, self excluded, sorted output contract
    val perProbe = adc.keys.groupBy(_._1)
    assert(perProbe.values.forall(_.size == 5), "top-5 per probe")
    assert(adc.keys.forall { case (q, v) => q != v }, "self excluded")
  }

  test("trained PQ codebooks: Lloyd rounds reduce total quantization distortion") {
    // distortion(cb) = Σ over (vec, sub) of the min integer sub-distance —
    // the k-means objective; two quantized Lloyd rounds must not increase
    // it vs the first-K init (and on this corpus strictly decrease it)
    import org.apache.spark.sql.DataFrame
    val e = graft.Tables.t(spark, sf("sf0.001"), "embeddings")
      .filter(col("embedding").isNotNull)
    def initCb: DataFrame = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"),
        posexplode(col("embedding")).as(Seq("d", "cf")))
      .select(col("cid"), col("d"), round(col("cf").cast("double"), 6).as("c"))
    def distortion(cb: DataFrame): Long =
      e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .join(broadcast(cb), Seq("d"))
        .select(col("vec_id"), expr("d DIV 8").as("sub"), col("cid"),
          floor((col("x").cast("double") - col("c")) *
            (col("x").cast("double") - col("c")) * 1e12).cast("long").as("t"))
        .groupBy(col("vec_id"), col("sub"), col("cid"))
        .agg(sum(col("t")).as("dist"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(col("dist")).as("best"))
        .agg(sum(col("best"))).head().getLong(0)
    val before = distortion(initCb)
    val after = distortion(Similarity.pqTrainCodebook(e))
    assert(after < before,
      s"training must reduce distortion: init $before, trained $after")
    // every codebook row is a quantized decimal (the determinism contract)
    val cb = Similarity.pqTrainCodebook(e).collect()
    assert(cb.nonEmpty)
    cb.foreach { r =>
      val c = r.getAs[Double]("c")
      assert((math.abs(c * 1e6) - math.rint(math.abs(c * 1e6))).abs < 1e-6)
    }
  }

  test("PQ plan: codebook and distance table broadcast; no cartesian product") {
    val plan = Similarity.annPq(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), "codebook/dtable joins must broadcast")
    assert(!plan.contains("CartesianProduct"), "ADC must not plan a cartesian")
  }

  test("IVFADC: candidates come only from the probe's routed cells; ADC agrees with exhaustive PQ") {
    val e = graft.Tables.t(spark, sf("sf0.001"), "embeddings")
      .filter($"embedding".isNotNull)
    val cellOf = Similarity.ivfCells(e, 16).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val got = Similarity.annIvfPq(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Long]("adist")))
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.length <= 5))
    // every returned candidate sits in one of its probe's nprobe=2 cells —
    // recompute the routing from the shipped cell assignment
    val probes = got.map(_._1).distinct
    val routed: Map[Long, Set[Long]] = probes.map { q =>
      val cents = Similarity.ivfCentroids(e, 16)
      val qv = e.filter($"vec_id" === q).select($"embedding").head.getSeq[Float](0)
      val top2 = cents.collect().map { r =>
        val cv = r.getSeq[Float](1)
        val dot = qv.zip(cv).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val cos = dot / (math.sqrt(qv.map(x => x.toDouble * x).sum) *
          math.sqrt(cv.map(x => x.toDouble * x).sum))
        (r.getLong(0), cos)
      }.filterNot(_._2.isNaN).sortBy { case (cid, cos) => (-cos, cid) }
        .take(2).map(_._1).toSet
      q -> top2
    }.toMap
    got.foreach { case (q, v, _) =>
      assert(routed(q).contains(cellOf(v)), s"candidate $v outside probe $q's cells")
    }
    // where a pair also appears in exhaustive PQ's top-5, the ADC
    // distances are the same integers (same codes, same tables)
    val pq = Similarity.annPq(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("adist"))
      .toMap
    got.foreach { case (q, v, d) =>
      pq.get((q, v)).foreach(dd => assert(dd == d, s"ADC mismatch for ($q,$v)"))
    }
  }

  test("residual IVFADC: ADC factorization is exact; fixture energy premise pinned") {
    val e = graft.Tables.t(spark, sf("sf0.001"), "embeddings")
      .filter($"embedding".isNotNull)
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)
      .toMap
    val cellOf = Similarity.ivfCells(e, 16).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    def resid(v: Long): IndexedSeq[Double] =
      vecs(v).zip(vecs(cellOf(v))).map { case (x, c) => x - c }
    // shared residual codebook = residuals of vec 16..19 (non-centroids)
    val cb = (0 until 4).map(k => resid(16L + k))
    def subDist(a: IndexedSeq[Double], b: IndexedSeq[Double], sub: Int): Long =
      (0 until 8).map { j =>
        val d = a(sub * 8 + j) - b(sub * 8 + j)
        math.floor(d * d * 1e12).toLong
      }.sum
    def codeOf(v: Long, sub: Int): Int = {
      val r = resid(v)
      (0 until 4).minBy(k => (subDist(r, cb(k), sub), k))
    }
    val got = Similarity.annIvfPqResidual(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.length <= 5))
    // the (sub, code) table factorization must equal the direct
    // per-dimension residual recompute — quantize-then-sum, no table
    got.foreach { case (q, v, adist) =>
      val rq = vecs(q).zip(vecs(cellOf(v))).map { case (x, c) => x - c }
      val want = (0 until 8).map(sub => subDist(rq, cb(codeOf(v, sub)), sub)).sum
      assert(want == adist, s"direct residual distance for ($q,$v): $want != $adist")
    }
    // On the DRIVER fixture, residual re-centering cannot help:
    // the embeddings are i.i.d. random (no cluster structure) and the
    // coarse "centroids" are first-K raw vectors, not cell means —
    // measured here, subtracting them INFLATES energy (‖x−c‖² ≈ 1.5‖x‖²:
    // x·c is small relative to ‖c‖² for random 64-dim data). Pin the
    // measurement so the premise stays visible: recall dominance is NOT
    // a property this fixture can exhibit (3-probe deltas on it are
    // sampling noise — measured both directions across scales).
    val rawE = vecs.values.map(_.map(x => x * x).sum).sum
    val resE = vecs.keys.map(v => resid(v).map(x => x * x).sum).sum
    assert(resE > rawE,
      f"fixture premise changed: residual energy ${resE / rawE}%.2fx raw — " +
        "if embeddings gained cluster structure, tighten this pin to <1")
  }

  test("residual IVFADC beats raw IVFADC on data WITH cluster structure") {
    // The property that makes residual quantization the production form
    // (Jégou et al. 2011 §IV.B) requires its premise: vectors
    // concentrated around coarse cells. Build a deterministic clustered
    // corpus (8 integer-lattice centers, ±0.2 noise) and run BOTH
    // SHIPPED operators on it — residuals carry ~0.1% of the raw energy
    // there, and ADC over residuals resolves within-cluster neighbors
    // that raw 4-codeword PQ cannot (prototyped: 12/15 vs 3/15).
    val n = 500; val dim = 64; val nClusters = 8
    def center(c: Int, d: Int): Float = (((c * 37 + d * 11) % 19) - 9).toFloat
    def noise(i: Int, d: Int): Float = ((((i * 13 + d * 7) % 5) - 2) * 0.1).toFloat
    val rows = (0 until n).map { i =>
      (i.toLong,
        (0 until dim).map(d => center(i % nClusters, d) + noise(i, d)).toArray,
        s"c${i % nClusters}")
    }
    val cdir = java.nio.file.Files.createTempDirectory("graft_clustered_").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$cdir/embeddings.parquet")
    val vecs = rows.map(r => r._1 -> r._2.map(_.toDouble).toIndexedSeq).toMap
    def cosine(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def exactTop5(q: Long): Set[Long] =
      vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cosine(vecs(q), vecs(v)))).filterNot(_._2.isNaN)
        .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (q, vs) => vs.map(_._2).toSet.intersect(exactTop5(q)).size }
        .sum
    val rawHits = hits(Similarity.annIvfPq(spark, cdir))
    val resHits = hits(Similarity.annIvfPqResidual(spark, cdir))
    assert(resHits > rawHits,
      s"residual recall $resHits/15 must beat raw $rawHits/15 on clustered data")
    assert(resHits >= 10, s"residual recall $resHits/15 below the 10/15 floor")
  }

  test("banding lifts LSH recall; recall is bounded and IVF stays strong") {
    val r = Similarity.annRecall(spark, sf("sf0.001")).collect()
      .map(x => (x.getString(0), x.getAs[Number]("qid").longValue(),
        x.getAs[Number]("n_hit").longValue()))
    val byMethod = r.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byMethod.keySet == Set("lsh", "lsh_banded", "ivf"))
    // 5 probes × k=5 → 25 possible hits per method
    assert(byMethod.values.forall(h => h >= 0 && h <= 25))
    assert(byMethod("lsh_banded") > byMethod("lsh"),
      s"banding must lift recall over the single 8-plane bucket: $byMethod")
    assert(byMethod("ivf") >= byMethod("lsh"), s"ivf should not trail single-band lsh: $byMethod")
  }

  test("emb_pca: max-abs normalized, partition-invariant, Rayleigh improves over init") {
    val dir = sf("sf0.001")
    val v = Similarity.embPca(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(v.size == 64)
    assert(v.values.map(math.abs).max == 1000000L, "max-abs normalization invariant")
    // exact integers → identical output under a different partitioning
    val again = Similarity.embPca(
      spark, dir).collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(again == v)
    // Rayleigh quotient vᵀCv / vᵀv of the centered micro-unit matrix must
    // improve over the all-ones init — the power-iteration contract
    val rows = graft.Tables.t(spark, dir, "embeddings")
      .filter($"embedding".isNotNull).select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.floor(x.toDouble * 1e6)))
    val n = rows.length
    val mean = Array.tabulate(64)(j => (rows.map(_(j)).sum / n).toLong.toDouble)
    val c = rows.map(r => Array.tabulate(64)(j => r(j) - mean(j)))
    def rayleigh(u: Array[Double]): Double = {
      val num = c.map(ci => math.pow(ci.zip(u).map { case (a, b) => a * b }.sum, 2)).sum
      num / u.map(x => x * x).sum
    }
    val v8 = Array.tabulate(64)(j => v(j).toDouble)
    val v0 = Array.fill(64)(1e6)
    assert(rayleigh(v8) > rayleigh(v0) * 1.5,
      s"power iteration should concentrate variance: ${rayleigh(v8)} vs ${rayleigh(v0)}")
  }

  test("ann_nndescent: refinement rounds recover exact neighbors the LSH init missed") {
    val dir = sf("sf0.001")
    def edges(rounds: Int): Set[(Long, Long)] =
      Similarity.annNnDescent(spark, dir, rounds = rounds).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val init = edges(0)
    val refined = edges(2)
    // ground truth: exact per-node top-5 within the same node slice
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .filter($"embedding".isNotNull && $"vec_id" < 200)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = vecs.keys.flatMap { u =>
      vecs.keys.filter(_ != u).toSeq
        .sortBy(v => (-cos(vecs(u), vecs(v)), v)).take(5).map(u -> _)
    }.toSet
    def recall(g: Set[(Long, Long)]): Double =
      truth.count(g).toDouble / truth.size
    assert(recall(refined) >= recall(init),
      s"refinement must not lose recall: ${recall(init)} -> ${recall(refined)}")
    // i.i.d. fixture vectors carry no neighborhood transitivity (the
    // regime Dong et al. call out as hardest) — 0.75 is the conservative
    // floor; measured 0.806 with init well below
    assert(recall(refined) > 0.75,
      s"two NN-Descent rounds on a 50-node slice: ${recall(refined)}")
    assert(refined.groupBy(_._1).forall(_._2.size == 5), "k = 5 out-degree everywhere")
  }

  test("ann_graph_search: beam recall beats the LSH init; self excluded; no cartesian") {
    val dir = sf("sf0.001")
    val got = Similarity.annGraphSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // shape: 5 results per probe, dense ranks, never the query itself
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L), byQ.keySet.toString)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted == Seq(1L, 2L, 3L, 4L, 5L), s"qid $q ranks")
      assert(rs.forall(_._2 != q), s"qid $q returned itself")
    }
    // ground truth: exact top-5 per probe within the graph's node slice
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .filter($"embedding".isNotNull && $"vec_id" < 200)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = (0L to 4L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (-cos(vecs(q), vecs(v)), v)).take(5).map(q -> _)
    }.toSet
    val beamHits = got.count(r => truth((r._1, r._2)))
    // the LSH-init baseline on the same probes: the graph's own init edges
    val initHits = Similarity.annNnDescent(spark, dir, rounds = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._1 < 5)
      .count(truth)
    assert(beamHits >= initHits,
      s"beam search recall $beamHits/25 must be >= LSH-init recall $initHits/25")
    assert(beamHits >= 15, s"beam recall floor: $beamHits/25")
    // plan: no cartesian anywhere; the 1-row entry node broadcasts
    val plan = Similarity.annGraphSearch(spark, dir).queryExecution
      .explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"),
      "beam expansion must join on keys, never a cartesian")
  }

  test("emb_abtt: projected vectors are EXACTLY orthogonal to the removed component") {
    val dir = sf("sf0.001")
    val vp = Similarity.embPca(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1) / 1000L).toMap
    val rows = Similarity.embAbtt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    assert(rows.nonEmpty)
    // Σ_d xp_d · v'_d = 0 per vector — integer-literal orthogonality,
    // the property the cleared-denominator construction guarantees
    rows.groupBy(_._1).foreach { case (vid, rs) =>
      assert(rs.length == 64)
      val dot = rs.map { case (_, d, xp) => BigInt(xp) * vp(d) }.sum
      assert(dot == 0, s"vec $vid residual dot $dot")
    }
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats on a crafted document") {
    val df = Seq((1L, "the cat and the hat")).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_t")
    val r = df.select(
      size(split(Dedup.normalized($"text"), " ")).as("n_words"),
      size(array_distinct(split(Dedup.normalized($"text"), " "))).as("n_distinct"))
      .head
    assert(r.getInt(0) == 5 && r.getInt(1) == 4)
  }

  test("language ID picks the language with most stopword hits") {
    val df = Seq(
      (1L, "el perro de la casa que en un jardin"),
      (2L, "the cat is in the house and it is warm"),
      (3L, "der hund und die katze von dem haus")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.detectLanguage($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "es" && got(2L) == "en" && got(3L) == "de")
  }

  test("rolling hash: content-sensitive, equals scalar reference impl") {
    import graft.functions.{GraftFunctions => G}
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "abc")).toDF("doc_id", "text")
    val got = df.select($"doc_id", G.rolling_hash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
    assert(got(1L) == ref("abc") && got(2L) == ref("abd"))
    assert(got(1L) == got(3L) && got(1L) != got(2L))
  }

  test("repetition signals on crafted documents") {
    val df = Seq(
      (1L, "a b a b"),        // bigrams: [a b, b a, a b] — "a b" twice
      (2L, "word"),           // too short for any n-gram
      (3L, "x y z"),          // all distinct
      (4L, "spam spam spam spam")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionOf(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val r1 = got(1L)
    assert(r1.getAs[Long]("n_bigrams") == 3L)
    assert(r1.getAs[Long]("top_bigram_count") == 2L)
    assert(r1.getAs[String]("top_bigram") == "a b")
    assert(math.abs(r1.getAs[Double]("top_bigram_frac") - 2.0 / 3) < 1e-15)
    assert(math.abs(r1.getAs[Double]("dup_bigram_frac") - 1.0 / 3) < 1e-15)
    assert(math.abs(r1.getAs[Double]("dup_word_frac") - 0.5) < 1e-15)

    val r2 = got(2L)
    assert(r2.getAs[Long]("n_bigrams") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("top_bigram_count")))
    assert(r2.isNullAt(r2.fieldIndex("dup_bigram_frac")))
    assert(r2.getAs[Double]("dup_word_frac") == 0.0)

    val r3 = got(3L)
    assert(r3.getAs[Long]("top_bigram_count") == 1L)
    assert(r3.getAs[Double]("dup_bigram_frac") == 0.0)
    // 1 trigram, distinct → 0.0
    assert(r3.getAs[Double]("dup_trigram_frac") == 0.0)

    val r4 = got(4L)
    assert(r4.getAs[Double]("dup_word_frac") == 0.75)
    assert(r4.getAs[Long]("top_bigram_count") == 3L)
    assert(r4.getAs[Double]("top_bigram_frac") == 1.0)
    assert(r4.getAs[Double]("dup_trigram_frac") == 0.5)
  }

  test("repetition fold equals a naive reference on random word lists") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet so duplicate bigrams and count ties actually occur
    val word = Gen.oneOf("a", "b", "c", "ab")
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(Gen.listOfN(24, doc)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.repetitionOf(df).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (Option(r.getAs[java.lang.Long]("top_bigram_count")).map(_.toLong),
            Option(r.getAs[String]("top_bigram")))).toMap
      docs.zipWithIndex.forall { case (wsRaw, i) =>
        // the engine normalizes: empty text still splits to [""]
        val ws = wsRaw.mkString(" ").trim.toLowerCase
          .replaceAll("\\s+", " ").split(" ", -1).toSeq
        val bg = if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq
          else Seq.empty
        val want =
          if (bg.isEmpty) (None, None)
          else {
            val counts = bg.groupBy(identity).view.mapValues(_.size.toLong)
            // max by (count, gram) — larger gram wins ties
            val (b, c) = counts.toSeq.maxBy { case (g, n) => (n, g) }
            (Some(c), Some(b))
          }
        got(i.toLong) == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("repetition plan is one codegen projection: no exchange, no join") {
    val p = TextAnalysis.textRepetition(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "repetition signals must stay shuffle-free at any corpus size")
  }

  test("repetition tie-break is the lexicographically larger bigram") {
    val df = Seq((1L, "b a b a")).toDF("doc_id", "text")
    // bigrams [b a, a b, b a]: "b a" wins on count; flip the counts and
    // "z z" vs "a a" at equal count picks "z z"
    val r = TextAnalysis.repetitionOf(df).head
    assert(r.getAs[String]("top_bigram") == "b a")
    val tie = TextAnalysis.repetitionOf(
      Seq((1L, "a a z z")).toDF("doc_id", "text")).head
    // bigrams [a a, a z, z z] all count 1 → max struct picks "z z"
    assert(tie.getAs[String]("top_bigram") == "z z")
  }

  test("empty-text documents flow through quality/repetition without a crash") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "real words here")).toDF("doc_id", "text")
    val q = df.select($"doc_id",
      TextAnalysis.qualityFlags($"text").reduce(_ && _).as("keep"),
      TextAnalysis.dupTrigramFrac($"text").as("dtf")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // '' has length 0: the symbol-ratio division is NULL, keep resolves
    // false-ish (never true), and nothing throws under ANSI mode
    assert(q(1L).isNullAt(1) || !q(1L).getBoolean(1))
    assert(q(1L).isNullAt(2) && q(2L).isNullAt(2)) // <3 words → no trigrams
    val rep = TextAnalysis.repetitionOf(df).collect()
    assert(rep.length == 3)
  }

  test("lm score ranks rare-token documents below common-token ones") {
    val dir = java.nio.file.Files.createTempDirectory("lmscore").toString
    Seq(
      (1L, "the cat the cat the cat"),     // all high-frequency tokens
      (2L, "the cat zyx qwv ptk"),         // half singletons
      (3L, "zzz yyy xxx www vvv"))         // all singletons
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.textLmScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Double]("ppl"))).toMap
    assert(got(1L)._1 > got(2L)._1 && got(2L)._1 > got(3L)._1,
      s"mean log-prob must order common > mixed > rare: $got")
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2,
      "perplexity orders the other way")
    // closed form for doc 1: corpus has 16 tokens, 'the' and 'cat' occur
    // 4 times each (3 in doc 1 + 1 in doc 2) → every doc-1 token scores
    // log2(4/16) = -2
    val want = math.round(math.log(4.0 / 16) / math.log(2.0) * 10000) / 10000.0
    assert(math.abs(got(1L)._1 - want) < 1e-9, s"${got(1L)._1} vs $want")
  }

  test("boilerplate removal strips shared segments, keeps unique ones") {
    // 8-word segments; "one two three four five six seven eight" shared
    // by 3 docs → boilerplate; each doc's second segment is unique
    val shared = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"$shared doc one tail"),
      (2L, s"$shared doc two tail"),
      (3L, s"$shared doc three tail"),
      (4L, "totally different words here make no shared segment at all"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("ignored")
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    df.withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.textBoilerplate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_seg"), r.getAs[Long]("n_boiler"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L) == ((2L, 1L, "doc one tail")))
    assert(out(2L) == ((2L, 1L, "doc two tail")))
    assert(out(3L) == ((2L, 1L, "doc three tail")))
    val (n4, b4, t4) = out(4L)
    assert(n4 == 2L && b4 == 0L &&
      t4 == "totally different words here make no shared segment at all")
  }

  test("fingerprint is order-invariant and content-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val fps = df.select($"doc_id",
      md5(concat_ws(" ", array_sort(array_distinct(
        split(Dedup.normalized($"text"), " ")))).cast("binary")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("lm_perplexity: implausible transitions score worse than fluent repetition") {
    // both docs use the SAME unigrams, so a unigram LM cannot separate
    // them; the fluent doc repeats one high-count transition chain, the
    // scrambled doc takes transitions that appear once each
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "mat the on sat cat the"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ppl_").toString
    import spark.implicits._
    corpus.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.lmPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(0L)._1 == 5L, "6 words -> 5 bigrams")
    assert(got(0L)._2 == got(1L)._2 && got(1L)._2 == got(2L)._2)
    assert(got(3L)._2 > got(0L)._2 * 1.5,
      s"scrambled doc must carry much higher perplexity: $got")
  }

  test("llog2: quadratic-corrected fixed-point log2 is accurate and monotone") {
    // sample the whole count range the classifier sees, plus both sides
    // of power-of-two boundaries where the mantissa resets
    val xs = (1L to 300L) ++ Seq(1023L, 1024L, 1025L, 65535L, 65536L, 65537L,
      999983L, 1L << 30, (1L << 30) + 7, 1L << 40)
    val got = xs.toDF("x")
      .selectExpr("x", s"${TextAnalysis.llog2("x")} AS l")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (x <- xs) {
      val err = math.abs(got(x) / 65536.0 - math.log(x.toDouble) / math.log(2.0))
      assert(err <= 0.009, s"llog2($x) err $err") // minimax of the quadratic ≈ 0.0082
    }
    for (Seq(a, b) <- xs.sorted.distinct.sliding(2)) {
      assert(got(a) <= got(b), s"monotonicity broke between $a and $b")
      // strictly increasing while the value gap exceeds the 2^-16 mantissa
      // grain (above that, equal fixed-point logs are the correct rounding)
      if (b < 65536L) assert(got(a) < got(b), s"$a vs $b not strict")
    }
    assert(got(1L) == 0L && got(65536L) == 16 * 65536L)
  }

  test("classify_nb: disjoint-vocabulary languages classify perfectly") {
    val corpus = Seq(
      (0L, "roka zema vista koral zema", "aa"),
      (1L, "vista roka koral koral", "aa"),
      (2L, "zema roka vista", "aa"),
      (3L, "plin dor vekt sumo dor", "bb"),
      (4L, "sumo plin vekt vekt dor", "bb"),
      (5L, "dor sumo plin", "bb"))
    val dir = java.nio.file.Files.createTempDirectory("graft_nb_").toString
    corpus.toDF("doc_id", "text", "lang").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.classifyNb(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("aa", "aa") -> 3L, ("bb", "bb") -> 3L),
      s"off-diagonal predictions: $got")
  }

  test("classify_nb at sf0.001: confusion totals = corpus, argmax deterministic") {
    val dir = sf("sf0.001")
    val cm = TextAnalysis.classifyNb(spark, dir)
    val total = cm.agg(sum($"n_docs")).head.getLong(0)
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(total == nDocs, "every document classified exactly once")
    // partitioning invariance: integer scores → identical confusion matrix
    val again = TextAnalysis.classifyNb(spark, dir)
      .repartition(7).collect().map(_.toSeq).toSet
    assert(again == cm.collect().map(_.toSeq).toSet)
  }

  test("search_rrf: fused score re-derives from the two ranks, order is by score") {
    val rows = TextAnalysis.searchRrf(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Int] =
      if (r.isNullAt(i)) None else Some(r.getInt(i))
    val scores = rows.map { r =>
      val expect = opt(r, 2).map(lr => 1000000L / (60 + lr)).getOrElse(0L) +
        opt(r, 3).map(sr => 1000000L / (60 + sr)).getOrElse(0L)
      assert(r.getLong(4) == expect, s"rrf_micro mismatch on $r")
      r.getLong(4)
    }
    assert(scores.sameElements(scores.sortBy(-_)), "output ordered by rrf desc")
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "dense rank column")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub preserves rows, derives md5 checksum, feature shape") {
    val docs = graft.Tables.t(spark, sf("sf0.001"), "documents").limit(25)
    val out = Multimodal.decodeStub(Multimodal.asMedia(docs))
    assert(out.count() == 25)
    val r = out.head
    assert(r.getAs[String]("checksum").length == 32)
    assert(r.getAs[scala.collection.Seq[Float]]("features").length == 4)
    // checksum equals Spark's own md5 of the payload (cross-check the stub)
    val j = out.select($"doc_id", $"checksum")
      .join(docs.select($"doc_id", md5($"text".cast("binary")).as("want")), "doc_id")
    assert(j.filter($"checksum" =!= $"want").count() == 0)
  }

  test("binary payload round-trips through shuffle repartitioning") {
    val docs = graft.Tables.t(spark, sf("sf0.001"), "documents").limit(50)
    val media = Multimodal.asMedia(docs).repartition(7, $"doc_id")
    assert(media.rdd.getNumPartitions == 7)
    val out = Multimodal.decodeStub(media)
    assert(out.agg(sum($"n_bytes")).head.getLong(0) ==
      docs.agg(sum(length($"text"))).head.getLong(0))
  }

  test("phash: in-place perturbation stays near, different content lands far") {
    // structured 480-byte payloads: the twin flips a handful of bytes IN
    // PLACE (block alignment preserved — the regime the signature is
    // designed for); the foil inverts the intensity structure entirely
    val base = Array.tabulate(480)(i => if (i / 10 % 2 == 0) 'a'.toByte else 'z'.toByte)
    val twin = base.clone(); for (i <- Seq(3, 97, 211)) twin(i) = 'm'.toByte
    val foil = Array.tabulate(480)(i => if (i / 10 % 2 == 0) 'z'.toByte else 'a'.toByte)
    val media = Seq((0L, "img", base), (1L, "img", twin), (2L, "img", foil))
      .toDF("doc_id", "kind", "payload")
    val sig = Multimodal.phashSig(media).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(0L), sig(1L)) <= 4,
      s"in-place perturbation must stay near: ${hamming(sig(0L), sig(1L))}")
    assert(hamming(sig(0L), sig(2L)) >= 20,
      s"inverted structure must land far: ${hamming(sig(0L), sig(2L))}")
    // the SimHash-style 6-bit banding surfaces the twin as a candidate:
    // the local perturbation leaves at least one band untouched
    val bands0 = (0 until 8).map(b => (sig(0L) >> (6 * b)) & 63)
    val bands1 = (0 until 8).map(b => (sig(1L) >> (6 * b)) & 63)
    assert(bands0.zip(bands1).exists { case (x, y) => x == y },
      "banded lookup must surface the perturbed twin")
  }
}
