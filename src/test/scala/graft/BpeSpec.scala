package graft

import graft.operators.BpeTokenizer

class BpeSpec extends SparkSpec {

  test("training learns frequency-ordered merges with greedy left-to-right application") {
    // "low" x10, "lower" x5, "lowest" x2: (l,o) is the most frequent
    // pair (17), then (lo,w) (17) — order pinned by count then lex
    val merges = BpeTokenizer.trainMerges(
      Seq(("low", 10L), ("lower", 5L), ("lowest", 2L)), maxMerges = 3)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
  }

  test("training tie-break is (count desc, lhs asc, rhs asc)") {
    // two words, equal counts, disjoint alphabets: every pair in "ab"
    // and "cd" has count 1 < 2 -> stops; with count 2 each, (a,b) wins
    // over (c,d) lexicographically
    val merges = BpeTokenizer.trainMerges(Seq(("ab", 2L), ("cd", 2L)), 1)
    assert(merges == Seq(("a", "b")))
  }

  test("training merge is greedy left-to-right non-overlapping (aaaa -> aa aa)") {
    val merges = BpeTokenizer.trainMerges(Seq(("aaaa", 5L)), 2)
    // round 1: (a,a) count 3*5; after merging: [aa, aa]; round 2: (aa,aa)
    assert(merges == Seq(("a", "a"), ("aa", "aa")))
  }

  test("encode applies the leftmost-lowest-rank single-step rule") {
    val ranks = Map(("l", "o") -> 0, ("lo", "w") -> 1, ("e", "r") -> 2)
    assert(BpeTokenizer.encode("lower", ranks).toSeq == Seq("low", "er"))
    assert(BpeTokenizer.encode("hello", ranks).toSeq == Seq("h", "e", "l", "lo"))
    assert(BpeTokenizer.encode("xyz", ranks).toSeq == Seq("x", "y", "z"))
    assert(BpeTokenizer.encode("a", ranks).toSeq == Seq("a"))
    assert(BpeTokenizer.encode("", ranks).toSeq == Seq.empty)
  }

  test("encode rank ties resolve to the leftmost occurrence") {
    // (a,b) at positions 1 and 3; single rank: leftmost merges first,
    // then the remaining occurrence
    val ranks = Map(("a", "b") -> 0)
    assert(BpeTokenizer.encode("abab", ranks).toSeq == Seq("ab", "ab"))
  }

  test("token concatenation reconstructs the word (lossless subwording)") {
    val words = Seq("partition", "shuffle", "aggregate", "a", "zz")
    val merges = BpeTokenizer.trainMerges(words.map((_, 3L)), 16)
    val ranks = merges.zipWithIndex.map { case (p, i) => (p, i) }.toMap
    words.foreach { w =>
      assert(BpeTokenizer.encode(w, ranks).mkString == w)
    }
  }

  test("code points, not UTF-16 chars: surrogate pairs stay whole") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(BpeTokenizer.codePoints("a" + emoji + "b").toSeq ==
      Seq("a", emoji, "b"))
    assert(BpeTokenizer.encode("a" + emoji, Map.empty).length == 2)
  }

  test("corpus model: frequent words merge to few tokens, encoding is deterministic") {
    val d = "/root/testdata/sf0.001"
    val m1 = graft.queries.BpeQueries.model(spark, d)
    import spark.implicits._
    val toks = m1.wordToks.as[(String, Seq[String], Long, Long)].collect()
    assert(toks.nonEmpty)
    // lossless: concatenation reconstructs every distinct corpus word
    toks.foreach { case (w, ts, _, n) =>
      assert(ts.mkString == w)
      assert(n == ts.length)
    }
    // real-BPE shape: the most frequent word is fully merged (1 token),
    // and the corpus-wide subword ratio sits strictly between 1 (no
    // merges would be len(word)) and the char count (full merge = 1.0)
    val byFreq = toks.sortBy { case (w, _, wc, _) => (-wc, w) }
    assert(byFreq.head._4 == 1L,
      s"most frequent word '${byFreq.head._1}' should merge fully")
    val ratio = toks.map(t => t._3 * t._4).sum.toDouble /
      toks.map(_._3).sum
    assert(ratio > 1.0 && ratio < 3.0, s"subword ratio $ratio")
  }
}

/** Declared-query invariants for the r13 BPE/window/hybrid additions —
  * structural properties the hash oracle cannot express directly.
  */
class BpeQueryInvariantSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("bpe_fertility: >= 1 token per word, totals agree with tokenize_bpe") {
    val f = q("q_bpe_fertility").collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      assert(r.getAs[Long]("fertility_bp") >= 10000L,
        s"a word encoded to <1 token: $r") // every word is >=1 subword
      assert(r.getAs[Long]("n_tokens_bpe") >= r.getAs[Long]("n_words"))
    }
    // the per-lang totals partition the per-doc totals exactly
    val perDoc = q("q_tokenize_bpe").agg(
      sum(col("n_words")), sum(col("n_tokens_bpe"))).head()
    assert(f.map(_.getAs[Long]("n_words")).sum == perDoc.getLong(0))
    assert(f.map(_.getAs[Long]("n_tokens_bpe")).sum == perDoc.getLong(1))
  }

  test("token_windows_bpe: window geometry matches tokenize_bpe counts") {
    val counts = q("q_tokenize_bpe").select(col("doc_id"), col("n_tokens_bpe"))
    val win = q("q_token_windows_bpe")
    // windows per doc = (n-1) DIV 24 + 1, max win_id = (n-1) DIV 24,
    // window 0 holds min(n, 48) tokens — the O-32 window-set convention
    val g = win.groupBy("doc_id")
      .agg(count(lit(1)).as("n_win"), max("win_id").as("max_win"),
        sum(when(col("win_id") === 0, col("n_in_win"))).as("w0"))
      .join(counts, "doc_id")
      .filter(col("n_tokens_bpe") > 0)
    val bad = g.filter(
      col("n_win") =!= expr("(n_tokens_bpe - 1) DIV 24 + 1") ||
      col("max_win") =!= expr("(n_tokens_bpe - 1) DIV 24") ||
      col("w0") =!= least(col("n_tokens_bpe"), lit(48L)))
    assert(bad.count() === 0)
    // docs with zero BPE tokens produce no windows
    val zeros = counts.filter(col("n_tokens_bpe") === 0)
      .join(win, "doc_id").count()
    assert(zeros === 0)
  }

  test("token_windows_bpe: full interior windows hold exactly WinSize tokens") {
    val counts = q("q_tokenize_bpe").select(col("doc_id"), col("n_tokens_bpe"))
    val bad = q("q_token_windows_bpe").join(counts, "doc_id")
      // a window whose span [24·k, 24·k+48) lies fully inside the stream
      .filter(col("win_start") + 48 <= col("n_tokens_bpe"))
      .filter(col("n_in_win") =!= 48)
      .count()
    assert(bad === 0)
  }

  test("hybrid_retrieval_ivf: dense ranks, exact RRF arithmetic, leg consistency") {
    val r = q("q_hybrid_retrieval_ivf")
    // rrf is recomputable from the leg ranks (0 = absent from that leg)
    val badRrf = r.filter(col("rrf") =!=
      expr("coalesce(1000000 DIV (60 + nullif(rkb, 0)), 0) + " +
        "coalesce(1000000 DIV (60 + nullif(rkv, 0)), 0)")).count()
    assert(badRrf === 0)
    // dense 1..n ranks per probe, n <= 10
    val ranks = r.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
    assert(ranks.filter(col("n") > 10 || col("mx") =!= col("n") || col("mn") =!= 1).count() === 0)
    // a doc in both legs outranks (by rrf construction) the same doc
    // appearing in only one leg with the same single-leg rank — spot
    // check: every row with both legs present has rrf > 1e6/(60+20)
    assert(r.filter(col("rkb") > 0 && col("rkv") > 0 &&
      col("rrf") <= 1000000 / 80).count() === 0)
  }
}
