package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the distributed BPE trainer: the merge fold's greedy-left
  * contract, and the whole trainer against a sequential reference
  * implementation on the real fixture vocabulary. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: textbook BPE over an in-memory word-count
    * map — same tie-break (count desc, then (a, b) ascending). */
  private def referenceTrain(wc: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long)] = {
    def mergeWord(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    var words = wc.toSeq.map { case (w, n) => (w.split("").toList, n) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((a, b, n))
        words = words.map { case (syms, c) => (mergeWord(syms, a, b), c) }
      }
    }
    out.result()
  }

  test("applyMerge is greedy left-to-right: overlapping runs resolve leftmost") {
    val df = Seq(
      Seq("a", "a", "a"),
      Seq("a", "b", "a", "b"),
      Seq("x", "a", "b", "y"),
      Seq("b", "a"),
      Seq.empty[String]).toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(
      List("a", "a", "a"),       // (a,b) absent — untouched
      List("ab", "ab"),          // both pairs merge
      List("x", "ab", "y"),
      List("b", "a"),            // wrong order — no merge
      List()))
    val aa = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(aa.head === List("aa", "a")) // leftmost wins, merged symbol is consumed
  }

  test("train matches the sequential reference on the fixture vocabulary (8 rounds)") {
    val docs = graft.Tables.t(spark, sf(), "documents")
    val wcDf = Bpe.wordCounts(docs, "text")
    val wc = wcDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (merges, words) = Bpe.train(wcDf, rounds = 8)
    val expected = referenceTrain(wc, 8)
    assert(merges.map(m => (m.left, m.right, m.n)) === expected)
    // the final word table preserves mass: every word reassembles exactly
    val reassembled = words
      .select(concat_ws("", col("syms")).as("w"), col("cnt"))
      .groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reassembled === wc)
  }

  test("encode: reassembly is exact and token count shrinks monotonically with merges") {
    val docs = graft.Tables.t(spark, sf(), "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val (merges, _) = Bpe.train(Bpe.wordCounts(docs, "text"), rounds = 6)
    assert(merges.length === 6)
    // concatenating each doc's tokens in position order reproduces the
    // normalized text minus spaces — no merge may lose or invent a char
    val reassembled = Bpe.encode(docs, "text", merges)
      .groupBy(col("doc_id"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("pos"), col("token"))))
        .getField("token")).as("r"))
    val norm = docs.select(col("doc_id"),
      regexp_replace(Dedup.normalized(col("text")), " ", "").as("n"))
    val joined = reassembled.join(norm, "doc_id")
      .filter(col("r") =!= col("n")).count()
    assert(joined === 0L)
    // each additional merge can only reduce (or keep) the token count
    val counts = (0 to merges.length)
      .map(k => Bpe.encode(docs, "text", merges.take(k)).count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"token counts must be non-increasing: $counts")
    assert(counts.last < counts.head, "six merges must actually compress")
  }

  test("encodeBroadcast is bit-identical to the expression-form encode") {
    // the production mapPartitions greedy (lowest-rank-first) against the
    // K-chained-fold expression form, on real fixture docs with TRAINED
    // merges — the two classic BPE encode algorithms must agree exactly
    val docs = graft.Tables.t(spark, sf(), "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val (merges, _) = Bpe.train(Bpe.wordCounts(docs, "text"), rounds = 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val expr = rows(Bpe.encode(docs, "text", merges))
    val prod = rows(Bpe.encodeBroadcast(docs, "text", merges))
    assert(prod == expr,
      s"diff: ${(prod -- expr).take(5)} vs ${(expr -- prod).take(5)}")
  }

  test("encodeBroadcast drops NULL-text rows exactly like the expression form") {
    // ADVICE r15: a null text column arrives in mapPartitions as a null
    // Seq; one null doc must not NPE the job — both forms drop the row.
    import spark.implicits._
    val docs = Seq((1L, "ab ab"), (2L, null: String), (3L, "ba"))
      .toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("a", "b", 2L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val expr = rows(Bpe.encode(docs, "text", merges))
    val prod = rows(Bpe.encodeBroadcast(docs, "text", merges))
    assert(prod == expr)
    assert(!prod.exists(_._1 == 2L), "the null doc contributes no tokens")
    assert(prod.exists(_._1 == 1L) && prod.exists(_._1 == 3L))
  }

  test("encodeWord: adversarial overlaps match the sequential fold") {
    // hand merges exercising rank interaction: overlapping runs, a merge
    // whose output blocks a later rank, rank ties resolved leftmost
    val merges = Seq(Bpe.Merge("a", "a", 0), Bpe.Merge("a", "b", 0),
      Bpe.Merge("b", "c", 0), Bpe.Merge("aa", "a", 0))
    val rank = merges.zipWithIndex.map { case (m, i) => ((m.left, m.right), i) }.toMap
    def sequential(w: String): List[String] =
      merges.foldLeft(w.split("").toList) { case (syms, m) =>
        syms.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == m.left && x == m.right) acc.init :+ (m.left + m.right)
          else acc :+ x
        }
      }
    for (w <- Seq("aaa", "aaaaa", "abc", "aabc", "abab", "cab", "bca",
        "aabbcc", "x", "", "abcabcabc")) {
      assert(Bpe.encodeWord(w, rank).toList == sequential(w),
        s"word '$w': ${Bpe.encodeWord(w, rank).toList} vs ${sequential(w)}")
    }
  }

  test("tokenize_bpe: tokens reassemble the word; merge table is the pair top-16") {
    val got = Bpe.tokenizeBpe(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    assert(got.nonEmpty && got.length <= 100) // sf0.001's vocab is ~30 words
    got.foreach { case (w, toks, n) =>
      assert(toks.split('|').mkString("") == w, s"'$w' != reassembled '$toks'")
      assert(toks.split('|').length.toLong == n)
    }
    // at least one multi-char token must appear (the merges actually fire)
    assert(got.exists(_._2.split('|').exists(_.length > 1)))
  }

  test("bpe_pairs equals round-1 argmax relation of the trainer") {
    val top = Bpe.bpePairs(spark, sf()).collect()
    assert(top.length === 20)
    // non-increasing counts, total-order tie-break
    val ns = top.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
    // the #1 pair is the trainer's first merge
    val (merges, _) = Bpe.train(
      Bpe.wordCounts(graft.Tables.t(spark, sf(), "documents"), "text"), 1)
    assert(top.head.getAs[String]("pair") === merges.head.left + merges.head.right)
    assert(top.head.getAs[Long]("n") === merges.head.n)
  }

  test("wordpiece segmentation is maximal munch with char fallback") {
    val vocab = Seq("abcd", "ab", "cd", "bc")
    val got = Seq("abcde", "xabcy", "bcd", "zz")
      .toDF("w")
      .select($"w", Bpe.wordpieceSegment($"w", vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("abcde") == List("abcd", "e"), "longest match wins at pos 1")
    // greedy: 'ab' consumed at pos 2 even though 'bc' would enable 'cd'? no —
    // maximal munch never backtracks: x | ab | c | y
    assert(got("xabcy") == List("x", "ab", "c", "y"))
    assert(got("bcd") == List("bc", "d"), "3-char prefix 'bcd' not in vocab, 'bc' is")
    assert(got("zz") == List("z", "z"), "out-of-vocab falls back to single chars")
  }

  test("tokenize_wordpiece: pieces reassemble exactly, all multi-char pieces in vocab") {
    val dir = sf()
    val wc = Bpe.wordCounts(graft.Tables.t(spark, dir, "documents"), "text")
    val vocab = Bpe.wordpieceVocab(wc, topK = 40).toSet
    val rows = Bpe.tokenizeWordpiece(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getString(0)
      val pieces = r.getString(2).split('|').toList
      assert(pieces.mkString("") == w, s"reassembly broke for $w")
      assert(r.getLong(3) == pieces.length)
      pieces.filter(_.length > 1).foreach(p =>
        assert(vocab(p), s"multi-char piece $p of $w not in vocab"))
    }
  }
}
