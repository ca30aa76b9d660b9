package graft

/** Invariants of the r14 curation additions that the hash-parity gate
  * can't express directly: the exact-substring span merge (disjoint
  * duplicated regions must stay separate spans; the one-token-gap
  * boundary must NOT merge) and the mixture-upsampling copy counts
  * (each doc's replication must follow the integer epoch formula
  * exactly).
  */
class CurationOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ngram_overlap: drop-first candidates score exactly 10000, reversed stay below") {
    val rows = SparkEntry.queries("q_ngram_overlap")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, ov, p) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("overlap"), r.getAs[Long]("precision_bp"))
      assert(ov <= n, s"doc $id overlap $ov exceeds candidate grams $n")
      if (id % 2 == 0 && n > 0)
        // every surviving bigram instance of a first-token-dropped
        // candidate is covered by the reference — clipped precision 1.0
        assert(p == 10000L, s"even doc $id precision $p != 10000")
    }
    // reversed candidates must NOT be fully covered in aggregate (a
    // corpus of palindromes would be the only way)
    val odd = rows.filter(r => r.getAs[Long]("doc_id") % 2 == 1)
    assert(odd.nonEmpty &&
      odd.count(_.getAs[Long]("precision_bp") < 10000L) > odd.length / 2)
  }

  test("w1 drift: equals an exact scalar earth-mover recompute; bounded in [0, 1e4]") {
    import org.apache.spark.sql.functions._
    val rows = Tables.documents(spark, sf).select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val xs = rows.map(_._2).distinct.sorted
    val n = rows.length.toLong
    val span = BigInt(xs.max - xs.min)
    val expected = rows.map(_._1).distinct.sorted.map { src =>
      val ns = rows.count(_._1 == src).toLong
      var (cumS, cumAll) = (0L, 0L)
      var area = BigInt(0)
      xs.sliding(2).foreach { case Array(x, nx) =>
        cumS += rows.count(r => r._1 == src && r._2 == x)
        cumAll += rows.count(_._2 == x)
        val diff = (BigInt(cumS) * (n - ns) - BigInt(cumAll - cumS) * ns).abs
        area += diff * BigInt(nx - x)
      }
      src -> (area * 10000 / (BigInt(ns) * (n - ns) * span max BigInt(1))).toLong
    }.toMap
    val got = SparkEntry.queries("q_w1_drift")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expected, "w1 diverges from the scalar earth-mover recompute")
    assert(got.values.forall(v => v >= 0L && v <= 10000L))
  }

  test("dp release: equals a from-first-principles geometric-mechanism recompute") {
    import org.apache.spark.sql.functions._
    val truth = Tables.documents(spark, sf).groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("seed")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // independent derivation: P(K <= k) for the two-sided geometric with
    // alpha = 1/2 as exact BigInt fractions over 3*2^32 — NOT the shared
    // threshold string the query interpolates
    def noise(u: Long): Int = {
      val scale = BigInt(3) * (BigInt(1) << 32)
      def cdf3(k: Int): BigInt = // 3*2^32 * P(K <= k)
        if (k < 0) BigInt(1) << (33 + k)
        else scale - (BigInt(1) << (32 - k))
      (-8 to 7).find(k => BigInt(3) * u < cdf3(k)).getOrElse(8)
    }
    val expected = truth.map { case (k, (n, seed)) =>
      // BigInt like the engines' DECIMAL/HUGEINT widening — a Long
      // multiply would wrap for min doc_ids past ~3.5e9
      val u = ((BigInt(seed) * 2654435761L) mod BigInt(4294967296L)).toLong
      k -> math.max(n + noise(u), 0L)
    }
    val got = SparkEntry.queries("q_dp_release")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, "release diverges from the first-principles mechanism")
    // the mechanism is alive: noise must move a healthy share of groups,
    // and zero-noise mass should sit near its true 1/3 probability
    val zeros = truth.count { case (k, (n, _)) => got(k) == n }
    assert(zeros > truth.size / 6 && zeros < truth.size * 6 / 10,
      s"zero-noise share $zeros/${truth.size} far from the 1/3 law")
  }

  test("kanon: released rows partition the corpus; k respected per level") {
    val rows = SparkEntry.queries("q_kanon")(spark, sf).collect()
    Scratch.release(spark)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "released mass must partition the corpus exactly")
    rows.foreach { r =>
      val (lvl, n) = (r.getAs[Long]("level"), r.getAs[Long]("n"))
      assert(lvl >= 0 && lvl <= 2)
      if (lvl < 2) assert(n >= 10L, s"level-$lvl group below k: $n")
      if (lvl == 0) assert(r.getAs[String]("source") != "*" &&
        r.getAs[Long]("len_bucket") >= 0)
      if (lvl >= 1) assert(r.getAs[String]("source") == "*" &&
        r.getAs[Long]("len_bucket") == -1L)
    }
    assert(rows.count(_.getAs[Long]("level") == 2) <= 1, "at most one residue row")
    // the level-2 residue is exempt from k BY DESIGN: it equals
    // total − Σ released, i.e. it is derivable from the release plus
    // the public corpus cardinality whether or not the row is printed
    val released = rows.filter(_.getAs[Long]("level") < 2)
      .map(_.getAs[Long]("n")).sum
    rows.filter(_.getAs[Long]("level") == 2).foreach { r =>
      assert(r.getAs[Long]("n") == total - released,
        "residue must be exactly the derivable complement of the release")
    }
  }

  test("shard_manifest: 16 exhaustive shards, counts partition the corpus") {
    val rows = SparkEntry.queries("q_shard_manifest")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("shard")).toSet == (0L until 16L).toSet)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_id") <= r.getAs[Long]("max_id"))
      val ck = r.getAs[Long]("checksum")
      assert(ck >= 0L && ck < 2305843009213693951L)
    }
  }

  test("dup spans: planted excerpts fully duplicated, sources carry the excerpt span") {
    val rows = SparkEntry.queries("q_dedup_spans")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // an excerpt doc (+300000) is a verbatim slice of its source — every
    // one of its windows recurs, so its coverage is total
    val excerpts = rows.filter(_.getAs[Long]("doc_id") >= 300000L)
    assert(excerpts.nonEmpty)
    excerpts.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 31L, s"excerpt length: $r")
      assert(r.getAs[Long]("dup_bp") == 10000L, s"excerpt not fully covered: $r")
    }
    // the source of every excerpt carries a span at least as long as the
    // excerpted 31 tokens
    excerpts.foreach { r =>
      val src = byId(r.getAs[Long]("doc_id") - 300000L)
      assert(src.getAs[Long]("dup_tokens") >= 31L, s"source missing excerpt span: $src")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("n_tokens"), s"coverage overflow: $r")
      assert(r.getAs[Long]("n_spans") >= 1L)
    }
  }

  test("span merge: disjoint duplicated regions stay separate; 1-token gap does not merge") {
    val sp = spark
    import sp.implicits._
    def toks(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    // docs 1/2 share two regions (10 and 12 tokens) separated by 20
    // unique tokens -> exactly two spans of 10 and 12 tokens each
    val s1 = toks("s", 10); val s2 = toks("t", 12)
    val a = s1 ++ toks("a", 20) ++ s2 ++ toks("x", 5)
    val b = s1 ++ toks("b", 20) ++ s2 ++ toks("y", 5)
    // docs 3/4 share two 10-token regions separated by ONE unique token:
    // dup window starts 0..2 and 11..13, island gap 11-2=9 > k=8, so the
    // spans stay separate and the unique middle token is never counted
    val g1 = toks("g", 10); val g2 = toks("h", 10)
    val c3 = g1 ++ Seq("u1") ++ g2
    val c4 = g1 ++ Seq("v1") ++ g2
    val corpus = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, c3.mkString(" ")), (4L, c4.mkString(" "))).toDF("doc_id", "text")
    val out = queries.DedupQueries.spanStats(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens")))).toMap
    assert(out(1L) == ((2L, 22L)), s"doc 1: ${out.get(1L)}")
    assert(out(2L) == ((2L, 22L)), s"doc 2: ${out.get(2L)}")
    assert(out(3L) == ((2L, 20L)), s"doc 3: ${out.get(3L)}")
    assert(out(4L) == ((2L, 20L)), s"doc 4: ${out.get(4L)}")
  }

  test("span removal: excises exactly the covered tokens, preserves order") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{md5, lit}
    def toks(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val g1 = toks("g", 10); val g2 = toks("h", 10)
    val s1 = toks("s", 10); val s2 = toks("t", 12)
    val a = s1 ++ toks("a", 20) ++ s2 ++ toks("x", 5)
    val b = s1 ++ toks("b", 20) ++ s2 ++ toks("y", 5)
    val corpus = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, (g1 ++ Seq("u1") ++ g2).mkString(" ")),
      (4L, (g1 ++ Seq("v1") ++ g2).mkString(" "))).toDF("doc_id", "text")
    val out = queries.DedupQueries.spanRemoval(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("clean_hash")))).toMap
    Scratch.release(spark)
    def h(tokens: Seq[String]) = evalStr(md5(lit(tokens.mkString(" "))))
    // doc 1/2: both shared regions excised, middles + tails survive in order
    assert(out(1L) == ((25L, h(toks("a", 20) ++ toks("x", 5)))), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((25L, h(toks("b", 20) ++ toks("y", 5)))), s"doc 2: ${out(2L)}")
    // doc 3/4: only the unique middle token survives
    assert(out(3L) == ((1L, h(Seq("u1")))), s"doc 3: ${out(3L)}")
    assert(out(4L) == ((1L, h(Seq("v1")))), s"doc 4: ${out(4L)}")
  }

  test("span removal on testdata: excerpt docs are fully removed, stats agree") {
    val stats = SparkEntry.queries("q_dedup_spans")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens")))).toMap
    Scratch.release(spark)
    val rem = SparkEntry.queries("q_dedup_spans_removal")(spark, sf).collect()
    Scratch.release(spark)
    val emptyHash = evalStr(org.apache.spark.sql.functions.md5(
      org.apache.spark.sql.functions.lit("")))
    rem.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val kept = r.getAs[Long]("n_kept")
      stats.get(id) match {
        case Some((nTok, dupTok)) =>
          assert(kept == nTok - dupTok, s"doc $id: kept $kept != $nTok - $dupTok")
        case None => // doc with no dup spans: everything kept
          assert(kept > 0L, s"doc $id: no spans but nothing kept")
      }
      if (kept == 0L)
        assert(r.getAs[String]("clean_hash") == emptyHash)
    }
    // the planted excerpts (fully duplicated) must be fully excised
    val excised = rem.filter(r => r.getAs[Long]("doc_id") >= 300000L &&
      r.getAs[Long]("n_kept") == 0L)
    assert(excised.nonEmpty, "no excerpt was fully removed")
  }

  test("cdc kernel: parity with a reference implementation, code-point windows") {
    import org.apache.spark.sql.functions.{call_function, col, lit}
    val pow = Array.iterate(1L, 8)(_ * 31L)
    def ref(s: String, d: Int): Seq[String] = {
      val cps = s.codePoints.toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      for (i <- cps.indices) {
        if (i >= 7) {
          val h = (0 to 7).map(j => cps(i - j).toLong * pow(j)).sum
          if (h % d == d - 1) {
            out += new String(cps, start, i + 1 - start)
            start = i + 1
          }
        }
      }
      out += new String(cps, start, cps.length - start)
      out.toSeq
    }
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "", "short", "exactly8", // below/at the window width
      "the quick brown fox jumps over the lazy dog repeatedly and then some more text",
      ("ab " * 60).trim,
      "emoji 🎉 mixes surrogate pairs 😀 into the rolling window of text here",
      (32 to 121).map(_.toChar).mkString.repeat(3))
    val got = cases.toDF("t")
      .select(call_function("cdc_chunks", col("t"), lit(64)).as("c"))
      .collect().map(_.getAs[scala.collection.Seq[String]]("c").toSeq)
    cases.zip(got).foreach { case (s, g) =>
      assert(g == ref(s, 64), s"kernel mismatch on: $s")
      assert(g.mkString == s, s"chunks must concatenate back to the input: $s")
    }
    // r15 (ADVICE r14 #3): the incremental rolling form must stay
    // bit-identical to the retained O(8n) re-evaluating reference —
    // stress with max-magnitude code points (2^21-ish) where a wrap in
    // the 31·h − cp·31^8 update would first show
    val stress = cases :+
      (0 until 400).map(i => String.valueOf(Character.toChars(
        0x10000 + (i * 2654435761L % 0xFFFF).toInt))).mkString :+
      String.valueOf(Character.toChars(0x10FFFF)).repeat(64)
    for (s <- stress; d <- Seq(2, 17, 64)) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val fast = graft.functions.expressions.CdcChunks.compute(u, d)
      val slow = graft.functions.expressions.CdcChunks.computeReference(u, d)
      assert(fast.array.toSeq == slow.array.toSeq, s"d=$d on: ${s.take(40)}")
    }
  }

  test("cdc dedup: survives the prefix insertion that blinds fixed-size chunking") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_dedup_cdc")(spark, sf).collect()
    Scratch.release(spark)
    def meanBp(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("dup_bp")).sum / math.max(rs.length, 1)
    val copyBp = meanBp(rows.filter(_.getAs[Long]("doc_id") >= 400000L).toSeq)
    assert(copyBp >= 5000L, s"CDC found only $copyBp bp dup on the prefixed copies")
    // the SAME corpus through the fixed 64-char chunker: every boundary
    // shifts by the prefix length, so the copies' chunks match ~nothing
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val copies = Tables.documents(spark, sf).filter(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 400000L).as("doc_id"),
        concat(lit("p"), col("doc_id").cast("string"), lit(" "), col("text")).as("text"))
    val chunks = graft.operators.Chunker
      .chunkChars(docs.unionAll(copies), "text", 64, Seq("doc_id"))
      .select(col("doc_id"), md5(col("chunk")).as("h"))
    val cnt = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    val fixed = chunks.join(cnt, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_bp", expr("(n_dup * 10000) DIV n_chunks"))
      .collect()
    Scratch.release(spark)
    val fixedCopyBp = meanBp(fixed.filter(_.getAs[Long]("doc_id") >= 400000L).toSeq)
    assert(fixedCopyBp <= 1000L,
      s"fixed chunking unexpectedly found $fixedCopyBp bp on shifted copies")
    assert(copyBp >= fixedCopyBp * 5,
      s"CDC ($copyBp bp) should dominate fixed chunking ($fixedCopyBp bp)")
  }

  test("lsh eval: confusion counts are consistent and the banding finds real pairs") {
    val r = SparkEntry.queries("q_lsh_eval")(spark, sf).collect().head
    Scratch.release(spark)
    val (nt, nc, tp) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"), r.getAs[Long]("tp"))
    assert(nt > 0L && nc > 0L, s"degenerate eval: $r")
    assert(tp <= math.min(nt, nc), s"tp exceeds a leg: $r")
    assert(r.getAs[Long]("precision_bp") == tp * 10000L / math.max(nc, 1L))
    assert(r.getAs[Long]("recall_bp") == tp * 10000L / math.max(nt, 1L))
    // 4 bands x 2 hashes is a ~0.5-threshold S-curve: it must find a
    // real fraction of the >=0.5-Jaccard truth, not none and not all
    assert(r.getAs[Long]("recall_bp") > 2000L && r.getAs[Long]("recall_bp") < 10000L,
      s"recall outside the plausible S-curve band: $r")
  }

  test("winnow: planted near-dups are paired, pairs share real fingerprints") {
    val rows = SparkEntry.queries("q_dedup_winnow")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("shared") >= 2L)
    }
    // the dedup corpus plants doc_id+100000 (first token dropped) — a
    // shared suffix far longer than the w+k−1 = 6-token winnowing
    // guarantee, so the overwhelming majority must be paired (a doc can
    // escape only when its suffix fingerprints are df-capped away)
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val docs = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val found = docs.count(id => pairs((id, id + 100000L)))
    assert(found * 10 >= docs.length * 9,
      s"only $found/${docs.length} planted winnow pairs found")
  }

  test("tfidf cosine: planted near-dups score near 1, scores bounded, pairs canonical") {
    val rows = SparkEntry.queries("q_doc_sim_tfidf")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val c = r.getAs[Double]("cos")
      assert(c >= 0.90 && c <= 1.000001, s"cos out of range: $r")
    }
    // planted mutations drop one token of ~dozens — weighted cosine of
    // the pair must be very high, and most planted pairs must survive
    // both the LSH candidate stage and the 0.90 verify threshold
    val planted = rows.filter(r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 100000L)
    assert(planted.length * 10 >= 500 * 8, s"only ${planted.length}/500 planted pairs scored")
    // a short doc can lose a high-idf token to the mutation, so the
    // floor is the output threshold; the bulk must still score ≥0.97
    val high = planted.count(_.getAs[Double]("cos") >= 0.97)
    assert(high * 10 >= planted.length * 7,
      s"only $high/${planted.length} planted pairs scored >= 0.97")
  }

  test("ks drift: bounds, one row per source, and a planted shift is detected") {
    val rows = SparkEntry.queries("q_ks_drift")(spark, sf).collect()
    Scratch.release(spark)
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == nSrc)
    rows.foreach { r =>
      val ks = r.getAs[Long]("ks_bp")
      assert(ks >= 0L && ks <= 10000L, s"ks_bp out of [0,1]: $r")
    }
    // same generator for every source ⇒ no source should look like a
    // different distribution (KS well below the rejection region)
    assert(rows.forall(_.getAs[Long]("ks_bp") < 5000L))
    // sanity of the statistic itself on a planted shift: doubling one
    // source's lengths must push ITS ks far above the undrifted ones
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.expr(
          "CASE WHEN source = 'src0' THEN n_chars * 2 ELSE n_chars END").as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("ks_drift").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val drifted = SparkEntry.queries("q_ks_drift")(spark, dir).collect()
    Scratch.release(spark)
    val m = drifted.map(r => r.getAs[String]("source") -> r.getAs[Long]("ks_bp")).toMap
    val rest = m.filterNot(_._1 == "src0").values
    assert(m("src0") > 2L * rest.max,
      s"planted drift not separated: src0=${m("src0")} max-rest=${rest.max}")
  }

  test("mix upsample: every doc's copy count follows the integer epoch formula") {
    val rows = SparkEntry.queries("q_mix_upsample")(spark, sf).collect()
    Scratch.release(spark)
    val langCounts = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val maxc = langCounts.values.max
    val bpByLang = langCounts.map { case (l, n) =>
      l -> math.min(maxc * 10000L / n, 40000L)
    }
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size.toLong == langCounts.values.sum,
      "every doc must appear at least once (epochs >= 1)")
    byDoc.foreach { case (id, rs) =>
      val lang = rs.head.getAs[String]("lang")
      val bp = bpByLang(lang)
      assert(rs.forall(_.getAs[Long]("epochs_bp") == bp))
      val want = bp / 10000L +
        (if ((id * 2654435761L) % 4294967296L % 10000L < bp % 10000L) 1L else 0L)
      assert(rs.length.toLong == want, s"doc $id ($lang): ${rs.length} copies != $want")
      assert(rs.map(_.getAs[Long]("copy")).sorted.toSeq == (1L to want),
        s"doc $id: copy ids not 1..$want")
    }
    // the mixture actually levels IN EXPECTATION: the Knuth hash
    // realizes the fractional epoch per doc, so a lang's total lands
    // within a few-sigma binomial band of the target, not exactly on it
    val perLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) => l -> rs.length }
    // only languages whose weight did NOT hit the 4-epoch cap can level
    // to maxc; a capped lang targets 4*count by design
    val upsampled = langCounts.filter { case (_, n) =>
      n < maxc && maxc * 10000L / n < 40000L
    }.keys
    upsampled.foreach { l =>
      val tol = math.max(5.0, 4.0 * math.sqrt(langCounts(l).toDouble))
      assert(math.abs(perLang(l) - maxc.toInt) <= tol,
        s"lang $l leveled to ${perLang(l)} vs target $maxc (tol $tol)")
    }
  }

  test("delta dedup: planted near-dups all match the corpus, novel docs mostly don't") {
    val rows = SparkEntry.queries("q_dedup_delta")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    val even = rows.filter(r => (r.getAs[Long]("delta_id") - 400000L) % 2 == 0)
    val odd = rows.filter(r => (r.getAs[Long]("delta_id") - 400000L) % 2 == 1)
    assert(even.nonEmpty && odd.nonEmpty)
    // first-token-dropped mutations share nearly every 3-shingle with
    // their source — the 4×2 banding must catch essentially all of them
    val evenHit = even.count(_.getAs[Long]("n_matches") > 0)
    assert(evenHit >= even.length * 95 / 100,
      s"planted recall $evenHit/${even.length}")
    // token-reversed docs share no 3-shingle with any corpus doc except
    // degenerate short texts (a 1-token doc reverses to itself)
    val oddHit = odd.count(_.getAs[Long]("n_matches") > 0)
    assert(oddHit <= odd.length * 30 / 100,
      s"novel false-match rate $oddHit/${odd.length}")
    // matches point INTO the corpus id space, never at delta ids
    rows.foreach { r =>
      val fm = r.getAs[Long]("first_match")
      assert(fm == -1L || fm < 400000L, s"match outside corpus: $r")
      assert((fm == -1L) == (r.getAs[Long]("n_matches") == 0L), s"flag mismatch: $r")
    }
  }

  test("snapshot diff: class counts match the planted crawl-change rule exactly") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf).collect()
    Scratch.release(spark)
    val byStatus = rows.map(r => r.getAs[String]("status") -> r).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val removed = docs.count(_._1 % 10 == 7)
    // a %10==3 doc only CHANGES if the first-token drop alters the text
    // (single-token docs mutate to themselves)
    val changed = docs.count { case (id, t) => id % 10 == 3 && t.contains(' ') }
    val added = docs.count(_._1 % 10 == 1)
    assert(byStatus("removed").getAs[Long]("n_docs") == removed.toLong)
    assert(byStatus("changed").getAs[Long]("n_docs") == changed.toLong)
    assert(byStatus("added").getAs[Long]("n_docs") == added.toLong)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong + added,
      "classes must partition v1 ∪ v2-new")
    // added ids live in the +500000 namespace
    assert(byStatus("added").getAs[Long]("min_id") >= 500000L)
  }

  test("mix temperature: shares normalize, T=0.5 flattens toward uniform") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.length >= 2)
    // floors: Σ share ∈ (10000 − |langs|, 10000]
    Seq("raw_bp", "temp_bp").foreach { c =>
      val tot = rows.map(_.getAs[Long](c)).sum
      assert(tot > 10000L - rows.length && tot <= 10000L, s"$c sums to $tot")
    }
    // temperature flattens: every minority lang (raw < uniform) gains
    // share, every majority lang loses it
    val uniform = 10000L / rows.length
    rows.foreach { r =>
      val (raw, temp) = (r.getAs[Long]("raw_bp"), r.getAs[Long]("temp_bp"))
      if (raw < uniform - 50) assert(temp > raw, s"minority lang not upweighted: $r")
      if (raw > uniform + 50) assert(temp < raw, s"majority lang not downweighted: $r")
      // exact scalar recheck: floor(sqrt(n)·1e4 / Σ sqrt(n_k) in lang order)
    }
    val sorted = rows.sortBy(_.getAs[String]("lang"))
    val w = sorted.map(r => math.sqrt(r.getAs[Long]("n_docs").toDouble)).foldLeft(0.0)(_ + _)
    sorted.foreach { r =>
      val expect = math.floor(
        math.sqrt(r.getAs[Long]("n_docs").toDouble) * 10000.0 / w).toLong
      assert(r.getAs[Long]("temp_bp") == expect, s"temp_bp mismatch: $r")
    }
  }

  test("span corruption: every doc's hashes match an independent scalar re-implementation") {
    val rows = SparkEntry.queries("q_span_corrupt")(spark, sf).collect()
    Scratch.release(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == docs.size, "one row per doc")
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val B = queries.CorpusQueries.CorruptBlock.toInt
    val L = queries.CorpusQueries.CorruptSpan.toInt
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id).split(" ", -1)
      def off(blk: Int): Int =
        (java.lang.Long.parseLong(md5hex(s"$id#$blk").take(8), 16) % (B - L + 1)).toInt
      val inspan = toks.indices.map { p =>
        val rel = p % B; val o = off(p / B); rel >= o && rel < o + L
      }
      val blocks = toks.indices.filter(inspan).map(_ / B).distinct.sorted
      val sent = blocks.zipWithIndex.map { case (b, i) => b -> s"<extra_id_${i + 1}>" }.toMap
      val input = toks.indices.flatMap { p =>
        if (!inspan(p)) Some(toks(p))
        else if (p % B == off(p / B)) Some(sent(p / B)) // span head = sentinel slot
        else None
      }.mkString(" ")
      val target = blocks.flatMap(b =>
        sent(b) +: toks.indices.filter(p => inspan(p) && p / B == b).map(toks)).mkString(" ")
      assert(r.getAs[Long]("n_spans") == blocks.length.toLong, s"n_spans: doc $id")
      assert(r.getAs[String]("input_hash") == md5hex(input), s"input hash: doc $id")
      assert(r.getAs[String]("target_hash") == md5hex(target), s"target hash: doc $id")
      // corruption rate ~= L/B of maskable tokens
      assert(r.getAs[Long]("n_in") ==
        toks.length - inspan.count(identity) + blocks.length, s"n_in: doc $id")
    }
  }
}
