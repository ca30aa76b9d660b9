package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Deterministic corpus-trained byte-pair-encoding tokenizer (r13,
  * VERDICT r12 #2): the subword tokenizer the reference applies through
  * a trained byte-level-BPE `AutoTokenizer`
  * (`/root/reference/src/backend/emotion_analysis/model.py:72,155-158`)
  * — re-expressed as a trainable, exportable, SQL-replayable operator
  * instead of an opaque external artifact. Every prior "token" metric in
  * the engine (O-32 windows, q_token_count, q_pack_sequences, BM25) is
  * whitespace-based; BPE token counts are what an LLM pipeline actually
  * bills (packing, context budgeting, quality thresholds).
  *
  * Determinism contract (everything here is replayed bit-for-bit by the
  * DuckDB twins from the exported merges table):
  *  - TRAINING picks, each round, the adjacent token pair with the
  *    highest corpus count, ties broken by (lhs asc, rhs asc); all
  *    occurrences merge greedily left-to-right (non-overlapping);
  *    training stops at `maxMerges` or when the best pair count < 2.
  *  - ENCODING applies ONE merge per step: the leftmost occurrence of
  *    the lowest-rank pair present (strict `<` keeps the leftmost on
  *    rank ties), repeated until no adjacent pair has a rank. This is
  *    the rule the oracle's recursive CTE replays — an all-occurrences
  *    step reaches the same fixpoint but its intermediate lists differ,
  *    so BOTH engines implement the single-step rule.
  *  - Characters are Unicode CODE POINTS (CLAUDE.md text convention:
  *    DuckDB `w[i]`/`length` are code-point based; a Java char loop
  *    would split surrogate pairs).
  */
object BpeTokenizer {

  /** Code points of `w`, each as a 1-code-point string. */
  def codePoints(w: String): Array[String] = {
    val out = new ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Greedy left-to-right non-overlapping merge of (l, r) in `t`
    * (training-side merge-all-occurrences step).
    */
  private def mergeAll(t: ArrayBuffer[String], l: String, r: String): Unit = {
    var i = 0
    while (i < t.length - 1) {
      if (t(i) == l && t(i + 1) == r) { t(i) = l + r; t.remove(i + 1) }
      i += 1
    }
  }

  /** Train `maxMerges` merges over (word, corpusCount) pairs. The input
    * is the TOP-K distinct words by (count desc, word asc) — bounded by
    * the caller (BpeQueries.MaxTrainWords), which is what keeps training
    * driver-safe at any corpus size: real tokenizers train from a
    * bounded sample the same way. Pair counts are weighted by word
    * counts; overlapping occurrences within a word each count.
    */
  def trainMerges(wordCounts: Seq[(String, Long)], maxMerges: Int): Seq[(String, String)] = {
    val seqs = wordCounts.map { case (w, c) =>
      (ArrayBuffer(codePoints(w): _*), c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var continue = true
    while (r < maxMerges && continue) {
      // recount per round: bounded by MaxTrainWords × avg word length —
      // trivially cheap at the corpus cap; an incremental-delta counter
      // is the standard upgrade if maxMerges ever grows into the 10⁴s
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (t, c) =>
        var i = 0
        while (i < t.length - 1) {
          val k = (t(i), t(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, rr), c) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }
        if (c < 2) continue = false
        else {
          merges += ((l, rr))
          seqs.foreach { case (t, _) => mergeAll(t, l, rr) }
          r += 1
        }
      }
    }
    merges.result()
  }

  /** Encode one word with the single-step leftmost-lowest-rank rule
    * (see object doc — the exact rule the DuckDB twin replays).
    */
  def encode(word: String, rank: Map[(String, String), Int]): Array[String] = {
    val t = ArrayBuffer(codePoints(word): _*)
    var done = t.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < t.length - 1) {
        val r = rank.getOrElse((t(i), t(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i } // strict <: leftmost wins ties
        i += 1
      }
      if (bi < 0) done = true
      else {
        t(bi) = t(bi) + t(bi + 1)
        t.remove(bi + 1)
        done = t.length <= 1
      }
    }
    t.toArray
  }
}
