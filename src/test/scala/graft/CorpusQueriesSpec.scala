package graft

import org.apache.spark.sql.functions._

import graft.queries.CorpusQueries

/** Invariant tests for the corpus-curation pack (round 5): the oracle
  * hash-check proves engine parity; these pin the SEMANTICS the oracle
  * can't state — caps respected, assignments well-formed, quantization
  * in range and invertible within absmax error bounds.
  */
class CorpusQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("decontaminate: flags only train-split docs, with positive overlap") {
    val r = q("q_decontaminate")
    assert(r.filter(col("n_shared") < 1 || col("n_test_docs") < 1).count() === 0)
    // every flagged id must hash into the train bucket (< 80)
    val bad = r.filter(
      pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100)) >= 80)
    assert(bad.count() === 0, "non-train doc flagged as contaminated")
  }

  test("bm25_topk: every probe present with dense ranks 1..k and non-increasing scores") {
    val k = CorpusQueries.Bm25K
    val r = q("q_bm25_topk").cache()
    val per = r.groupBy("probe_id").agg(count(lit(1)).as("n"),
      max("rk").as("mx"), min("rk").as("mn"))
    // every probe must appear at all — a probe silently dropped by a
    // join bug would otherwise just be absent from the per-probe frame
    assert(per.count() === CorpusQueries.Bm25Probes.toLong)
    assert(per.filter(col("n") =!= k || col("mx") =!= k || col("mn") =!= 1).count() === 0,
      s"each probe must have exactly ranks 1..$k")
    // scores non-increasing with rank (the ORDER BY is score DESC)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy("rk")
    assert(r.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("score")).count() === 0)
    // every retrieved doc must share ≥1 of the probe's first-5 query
    // terms — the inverted-index join can only emit true candidates
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val qterms = docs.filter(col("doc_id") < CorpusQueries.Bm25Probes)
      .select(col("doc_id").as("probe_id"),
        slice(col("toks"), 1, CorpusQueries.Bm25QTerms).as("qt"))
    assert(r.join(qterms, Seq("probe_id")).join(docs, Seq("doc_id"))
      .filter(!arrays_overlap(col("qt"), col("toks"))).count() === 0)
    // (no self-retrieval pin: with common-word queries BM25's length
    // normalization legitimately ranks shorter docs above the probe doc)
    r.unpersist()
  }

  test("bm25_upsert: merged df equals a full recount; ranks well-formed") {
    val k = CorpusQueries.Bm25K
    val r = q("q_bm25_upsert").cache()
    val per = r.groupBy("probe_id").agg(count(lit(1)).as("n"),
      max("rk").as("mx"), min("rk").as("mn"))
    assert(per.count() > 0, "no upsert probes retrieved")
    assert(per.filter(col("n") =!= k || col("mx") =!= k || col("mn") =!= 1).count() === 0,
      s"each probe must have exactly ranks 1..$k")
    // probe ids live in the delta namespace
    assert(r.filter(col("probe_id") < 700000L).count() === 0)
    // the q() run above just (re)wrote the upserted-terms export: its
    // MERGED (tok, df) must equal a from-scratch recount over the
    // unioned corpus — the incremental-maintenance identity itself
    val exportPath = java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), "graft_bm25_upsert_terms").toString
    val merged = spark.read.parquet(exportPath).select("tok", "df")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % CorpusQueries.Bm25UpsertMod === 0)
      .select((col("doc_id") + 700000L).as("doc_id"),
        expr("substring(text, instr(text, ' ')+1)").as("text"))
    val recount = docs.unionAll(delta)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df2"))
    assert(merged.join(recount, Seq("tok"), "full_outer")
      .filter(col("df").isNull || col("df2").isNull || col("df") =!= col("df2"))
      .count() === 0, "incremental df merge diverges from full recount")
    r.unpersist()
  }

  test("retrieval_ndcg: bounds, exact ratio identity, live signal") {
    val rows = q("q_retrieval_ndcg").collect()
    Scratch.release(spark)
    assert(rows.length == CorpusQueries.NdcgProbes, "one row per probe")
    rows.foreach { r =>
      val (dcg, bp) = (r.getAs[Long]("dcg_e6"), r.getAs[Long]("ndcg_bp"))
      assert(dcg >= 0 && dcg <= CorpusQueries.NdcgIdealE6,
        s"dcg $dcg outside [0, ideal] — a grade landed twice or ideal is wrong")
      assert(bp == dcg * 10000 / CorpusQueries.NdcgIdealE6,
        "ndcg_bp must be the exact integer ratio of its own dcg")
    }
    // the uniform synthetic vocabulary bounds absolute NDCG (documented
    // in the scaladoc); the metric must still carry signal at this SF
    assert(rows.count(_.getAs[Long]("ndcg_bp") > 0) >= 5,
      "NDCG signal lost — relevants never retrieved")
  }

  test("hybrid_retrieval: fused ranks well-formed and rrf reconstructible from leg ranks") {
    val k = CorpusQueries.Bm25K
    val r = q("q_hybrid_retrieval").cache()
    val per = r.groupBy("probe_id").agg(count(lit(1)).as("n"),
      max("rk").as("mx"), min("rk").as("mn"))
    assert(per.count() === CorpusQueries.Bm25Probes.toLong)
    assert(per.filter(col("n") =!= k || col("mx") =!= k || col("mn") =!= 1).count() === 0)
    // every fused row must come from at least one leg, each leg rank
    // within the fusion depth, and the RRF score must equal the formula
    // applied to the emitted leg ranks (0 = absent from that leg)
    val fd = CorpusQueries.FusionDepth
    assert(r.filter(col("rkb") === 0 && col("rkv") === 0).count() === 0)
    assert(r.filter(col("rkb") > fd || col("rkv") > fd).count() === 0)
    val recomputed = expr(
      "CASE WHEN rkb > 0 THEN 1000000 DIV (60 + rkb) ELSE 0 END + " +
        "CASE WHEN rkv > 0 THEN 1000000 DIV (60 + rkv) ELSE 0 END")
    assert(r.filter(col("rrf") =!= recomputed).count() === 0)
    r.unpersist()
  }

  test("sample_balanced: per-source counts capped and ranks dense from 1") {
    val r = q("q_sample_balanced").cache()
    val sizes = r.groupBy("source").agg(count(lit(1)).as("n"), max("rk").as("mx"))
    assert(sizes.filter(col("n") > 20).count() === 0)
    // rk is exactly 1..n within each source (dense, no gaps)
    assert(sizes.filter(col("mx") =!= col("n")).count() === 0)
  }

  test("tfidf_terms: exactly 10 ranked terms per source, scores non-increasing") {
    val r = q("q_tfidf_terms").cache()
    assert(r.groupBy("source").count().filter(col("count") =!= 10).count() === 0)
    val viol = r.as("a").join(r.as("b"),
        col("a.source") === col("b.source") && col("a.rk") === col("b.rk") - 1)
      .filter(col("a.score_bp") < col("b.score_bp"))
    assert(viol.count() === 0, "rank order does not follow score")
  }

  test("quantize: q8 values bounded by ±127 and maxabs positive") {
    val r = q("q_embed_quantize")
      .withColumn("qv", transform(split(col("q8"), ","), x => x.cast("int")))
    assert(r.filter(col("maxabs_r") <= 0).count() === 0)
    assert(r.filter(exists(col("qv"), v => abs(v) > 127)).count() === 0)
    // absmax scaling must saturate: every vector has a ±127 component
    assert(r.filter(!exists(col("qv"), v => abs(v) === 127)).count() === 0)
  }

  test("dedup_chunks: boilerplate header makes every doc have >= 1 dup chunk") {
    val r = q("q_dedup_chunks").cache()
    assert(r.filter(col("n_dup") < 1).count() === 0)
    // exact copies (and their originals) are fully duplicated
    assert(r.filter(col("doc_id") >= 200000L && col("n_dup") =!= col("n_chunks"))
      .count() === 0)
  }

  test("gopher_filter: keep agrees with the fail bitmask") {
    val r = q("q_gopher_filter")
    assert(r.filter((col("fail_mask") === 0) =!= (col("keep") === 1)).count() === 0)
  }

  test("lm_score: ppb scores bounded, zero-bigram docs score zero") {
    val r = q("q_lm_score").cache()
    // freq_ppb of any bigram ≤ 1e9 (count ≤ total), so the mean is too
    assert(r.filter(col("lm_ppb") < 0 || col("lm_ppb") > 1000000000L).count() === 0)
    assert(r.filter(col("n_bigrams") === 0 && col("lm_ppb") =!= 0).count() === 0)
    // the score separates repeated-bigram docs from unique-bigram docs:
    // every doc has n_bigrams ≥ 0 and scored docs have positive score
    assert(r.filter(col("n_bigrams") > 0 && col("lm_ppb") < 0).count() === 0)
    assert(r.count() === 500, "one row per document, zero-bigram docs included")
    r.unpersist()
  }

  test("pack_sequences: every sequence fills the budget except each source's last") {
    val r = q("q_pack_sequences").cache()
    // spans are well-formed and inside their doc
    assert(r.filter(col("tok_len") < 1 || col("tok_start") < 0 ||
      col("tok_start") + col("tok_len") > col("n_tok")).count() === 0)
    // a doc's spans tile the doc exactly: per doc, sum(tok_len) == n_tok
    val perDoc = r.groupBy("doc_id", "n_tok").agg(sum("tok_len").as("covered"))
    assert(perDoc.filter(col("covered") =!= col("n_tok")).count() === 0)
    // per (source, seq): all sequences carry exactly the 512-token
    // budget except the final (possibly partial) one per source
    val perSeq = r.groupBy("source", "seq_id").agg(sum("tok_len").as("fill"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last_id"))
    val nonLast = perSeq.join(lastSeq, "source").filter(col("seq_id") =!= col("last_id"))
    assert(nonLast.filter(col("fill") =!= 512L).count() === 0,
      "non-final sequences must be exactly at the token budget")
    val last = perSeq.join(lastSeq, "source").filter(col("seq_id") === col("last_id"))
    assert(last.filter(col("fill") < 1 || col("fill") > 512L).count() === 0)
    r.unpersist()
  }

  test("pack_sequences golden: manifest equals a sequential driver-side pack") {
    // Independent reimplementation: walk each source's docs in doc_id
    // order with a running token cursor and emit (seq, start, len) spans
    // directly — no windows, no explode. Pins the full manifest (r11;
    // VERDICT r10 #1 asked for a fixture-pinned golden after the
    // driver-vs-local DuckDB hash dispute).
    val B = 512L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ", -1).length.toLong))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cursor = 0L
      rows.sortBy(_._2).flatMap { case (_, id, nTok) =>
        val start = cursor
        cursor += nTok
        (start / B to (cursor - 1) / B).map { seq =>
          val tokStart = math.max(0L, seq * B - start)
          val tokLen = math.min(nTok, (seq + 1) * B - start) - tokStart
          (src, seq, id, nTok, tokStart, tokLen)
        }
      }
    }.sorted
    val got = q("q_pack_sequences").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_len"))).toSeq.sorted
    assert(got === expected)
  }

  // Declared LAST among the bm25 tests on purpose: it builds the index
  // for a synthetic corpus dir, which overwrites the FIXED-path oracle
  // export (per-dir exports keep the Spark side correct; the fixed path
  // is last-build-wins by design — see bm25Index).
  test("bm25 idf floor: a stopword probe term reaches no candidates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_floor").toString
    // 40 docs, every one contains the stopword "zz" (df = N = 40 ⇒
    // idf_e6 = round(ln(1 + 0.5/40.5)·1e6) = 12271 < the 100000 floor).
    // Probes are doc_id < 10; each probe i has distinctive terms p{i}a..
    // p{i}d matched by exactly two candidate docs. Doc 30 shares ONLY
    // the stopword with every probe — without the floor it would be a
    // scored candidate for all 10 probes (idf 12271 > 0); with it, it
    // must reach none.
    val docs =
      (0 until 10).map(i => (i.toLong, s"zz p${i}a p${i}b p${i}c p${i}d")) ++
      (0 until 10).flatMap(i => Seq(
        (10L + 2 * i, s"zz p${i}a p${i}b extra$i"),
        (11L + 2 * i, s"zz p${i}c m$i"))) ++
      Seq((30L, "zz qq rr")) ++
      (31 until 40).map(i => (i.toLong, s"zz f$i g$i"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_bm25_topk")(spark, dir).cache()
    // the export carries the floor's evidence: zz below, p0a above
    val terms = spark.read.parquet(java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_bm25_terms").toString)
    val zz = terms.filter(col("tok") === "zz").select("idf_e6").head().getLong(0)
    val p0a = terms.filter(col("tok") === "p0a").select("idf_e6").head().getLong(0)
    assert(zz < CorpusQueries.Bm25IdfFloorE6, s"zz idf_e6=$zz must be floored")
    assert(p0a >= CorpusQueries.Bm25IdfFloorE6)
    // stopword-only overlap yields NO candidacy; distinctive terms do
    assert(r.filter(col("doc_id") === 30L).count() === 0,
      "doc sharing only the floored stopword must not be scored")
    // per probe: itself + its two distinctive-term matches, nothing else
    val per = r.groupBy("probe_id").agg(count(lit(1)).as("n"))
    assert(per.count() === 10L)
    assert(per.filter(col("n") =!= 3).count() === 0)
    r.unpersist()
  }

  test("bucketedPrefixSum is bit-identical to the naive per-group window") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // ord values chosen to span several 4-wide buckets per group,
    // including empty buckets and a group confined to one bucket
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 5L), ("a", 3L, 7L), ("a", 9L, 1L),
      ("a", 12L, 4L), ("a", 30L, 2L), ("b", 2L, 3L), ("b", 3L, 8L),
      ("c", 0L, 6L), ("c", 7L, 9L), ("c", 8L, 2L), ("c", 21L, 11L))
    val df = rows.toDF("g", "ord", "v")
    val naive = df.withColumn("cum", sum($"v").over(
      Window.partitionBy("g").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bucketed = graft.operators.Ordinals
      .bucketedPrefixSum(df, "g", "ord", "v", "cum", bucketSize = 4L)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("g"), r.getAs[Long]("ord"), r.getAs[Long]("v"), r.getAs[Long]("cum"))
    assert(bucketed.collect().map(key).sorted.toSeq ===
      naive.collect().map(key).sorted.toSeq)
  }

  test("adaptive prefixSum takes the skew branch past smallGroupMax and stays exact") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 5L), ("a", 3L, 7L), ("a", 9L, 1L),
      ("b", 2L, 3L), ("b", 3L, 8L))
    val df = rows.toDF("g", "ord", "v")
    // both branches of the gate must produce the identical frame: force
    // the window branch (huge bound) and the bucketed branch (bound=1,
    // every group "too big") on the same input
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("g"), r.getAs[Long]("ord"), r.getAs[Long]("v"), r.getAs[Long]("cum"))
    val window = graft.operators.Ordinals
      .prefixSum(df, "g", "ord", "v", "cum", smallGroupMax = 1000L)
    val bucketed = graft.operators.Ordinals
      .prefixSum(df, "g", "ord", "v", "cum", smallGroupMax = 1L)
    assert(window.collect().map(key).sorted.toSeq ===
      bucketed.collect().map(key).sorted.toSeq)
    // empty input must not NPE the gate's max-group lookup
    assert(graft.operators.Ordinals
      .prefixSum(df.filter($"v" < 0L), "g", "ord", "v", "cum").count() === 0L)
    // a NULL group key must survive BOTH branches (the bucketed join is
    // null-safe; an equi-join would silently drop the NULL partition)
    val withNull = rows.map { case (g, o, v) => (if (g == "b") null else g, o, v) }
      .toDF("g", "ord", "v")
    val wN = graft.operators.Ordinals
      .prefixSum(withNull, "g", "ord", "v", "cum", smallGroupMax = 1000L)
    val bN = graft.operators.Ordinals
      .prefixSum(withNull, "g", "ord", "v", "cum", smallGroupMax = 1L)
    val keyN = (r: org.apache.spark.sql.Row) =>
      (Option(r.getAs[String]("g")), r.getAs[Long]("ord"), r.getAs[Long]("cum"))
    assert(bN.count() === rows.size.toLong)
    assert(wN.collect().map(keyN).sorted.toSeq === bN.collect().map(keyN).sorted.toSeq)
  }

  test("adaptive prefixSum: non-integral (struct) ord is ordinal-ized past the gate") {
    import org.apache.spark.sql.functions.{col, struct}
    import spark.implicits._
    // a struct order key (q_token_budget's (-quality, id) shape) cannot
    // feed bucketedPrefixSum's `ord DIV bucket` directly — the bucketed
    // branch must ordinal-ize it first and stay bit-identical to the
    // window branch (caught at 100×: the gate only fires past 64k rows)
    val rows = Seq(
      ("a", -9L, 1L, 10L), ("a", -9L, 2L, 5L), ("a", -3L, 3L, 7L),
      ("a", 0L, 4L, 1L), ("b", -5L, 5L, 3L), ("b", 2L, 6L, 8L),
      (null.asInstanceOf[String], -1L, 7L, 6L))
    val df = rows.toDF("g", "nq", "id", "v")
      .withColumn("ord", struct(col("nq"), col("id")))
      .select("g", "ord", "v", "id")
    val key = (r: org.apache.spark.sql.Row) =>
      (Option(r.getAs[String]("g")), r.getAs[Long]("id"), r.getAs[Long]("cum"))
    val w = graft.operators.Ordinals
      .prefixSum(df, "g", "ord", "v", "cum", smallGroupMax = 1000L)
    val b = graft.operators.Ordinals
      .prefixSum(df, "g", "ord", "v", "cum", smallGroupMax = 1L)
    assert(b.count() === rows.size.toLong)
    assert(w.collect().map(key).sorted.toSeq === b.collect().map(key).sorted.toSeq)
    assert(!b.columns.contains("_psord"), "helper column must not leak")
    Scratch.release(spark)
  }

  test("adaptive rankAndCount: ordinal branch is bit-identical to the window branch") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // duplicate values within groups (ties broken by unique id), a
    // single-row group, and a NULL group key — the shapes that differ
    // between a window rank and the global-ordinal re-base
    val rows = Seq(
      ("a", 5L, 1L), ("a", 5L, 2L), ("a", 3L, 3L), ("a", 9L, 4L),
      ("b", 7L, 5L), ("b", 7L, 6L), ("c", 1L, 7L),
      (null.asInstanceOf[String], 4L, 8L), (null.asInstanceOf[String], 2L, 9L))
    val df = rows.toDF("g", "v", "id")
    val key = (r: org.apache.spark.sql.Row) =>
      (Option(r.getAs[String]("g")), r.getAs[Long]("v"), r.getAs[Long]("id"),
        r.getAs[Long]("rn"), r.getAs[Long]("n"))
    val window = graft.operators.Ordinals.rankAndCount(
      df, "g", Seq(col("v"), col("id")), "rn", Some("n"), smallGroupMax = 1000L)
    val ordinal = graft.operators.Ordinals.rankAndCount(
      df, "g", Seq(col("v"), col("id")), "rn", Some("n"), smallGroupMax = 1L)
    assert(window.collect().map(key).sorted.toSeq ===
      ordinal.collect().map(key).sorted.toSeq)
    assert(ordinal.count() === rows.size.toLong) // NULL group survives
    // nName=None path: same columns out of both branches, no stray _n
    val wNone = graft.operators.Ordinals.rankAndCount(
      df, "g", Seq(col("v"), col("id")), "rn", None, smallGroupMax = 1000L)
    val oNone = graft.operators.Ordinals.rankAndCount(
      df, "g", Seq(col("v"), col("id")), "rn", None, smallGroupMax = 1L)
    assert(wNone.columns.sorted.toSeq === oNone.columns.sorted.toSeq)
    val keyR = (r: org.apache.spark.sql.Row) =>
      (Option(r.getAs[String]("g")), r.getAs[Long]("id"), r.getAs[Long]("rn"))
    assert(wNone.collect().map(keyR).sorted.toSeq ===
      oNone.collect().map(keyR).sorted.toSeq)
    // empty input must not NPE the gate
    assert(graft.operators.Ordinals.rankAndCount(
      df.filter($"v" < 0L), "g", Seq(col("v"), col("id")), "rn", Some("n"))
      .count() === 0L)
    graft.Scratch.release(spark)
  }

  test("rm3: expansion is bounded, disjoint from the query, and changes rankings") {
    import graft.queries.CorpusQueries.{Bm25Probes, Bm25QTerms, Rm3FbTerms}
    val probes = Tables.documents(spark, sf).filter(col("doc_id") < Bm25Probes)
      .selectExpr("doc_id AS probe_id",
        s"explode(slice(split(text, ' '), 1, $Bm25QTerms)) AS tok")
      .distinct().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val exp = graft.queries.CorpusQueries.rm3Expansion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(exp.nonEmpty, "no expansion terms mined — the feedback loop is dead")
    exp.groupBy(_._1).foreach { case (p, ts) =>
      assert(ts.length <= Rm3FbTerms, s"probe $p: ${ts.length} expansion terms > FbTerms")
    }
    assert(exp.forall(e => !probes(e)), "an expansion term duplicates a query term")
    val base = q("q_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rm3 = q("q_bm25_rm3").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rm3.keySet == base.keySet, "rm3 lost the 10-per-probe top-k shape")
    assert(rm3 != base, "expanded retrieval is identical to round 1 — expansion inert")
  }

  test("phrase match: equals a full scalar re-implementation; sources always hit") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val probes = docs.filter { case (id, t) => id % 29 == 5 && t.length >= 4 }
      .map { case (_, t) => t(2) + " " + t(3) }.distinct
    val expected = probes.map { ph =>
      // tokens contain no spaces, so a bigram phrase splits to exactly 2
      val parts = ph.split(" ", -1)
      val (t1, t2) = (parts(0), parts(1))
      val perDoc = docs.flatMap { case (id, toks) =>
        val occ = (0 until toks.length - 1)
          .count(i => toks(i) == t1 && toks(i + 1) == t2)
        if (occ > 0) Some(id -> occ.toLong) else None
      }
      ph -> (perDoc.length.toLong, perDoc.map(_._2).sum,
        perDoc.map(_._1).sum, perDoc.map(_._1).min, perDoc.map(_._1).max)
    }.toMap
    val got = q("q_phrase_match").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expected.keySet, "probe phrase sets differ")
    expected.foreach { case (ph, e) =>
      assert(got(ph) == e, s"phrase '$ph': ${got(ph)} != scalar $e")
    }
    // planted guarantee: each phrase's own source doc contains it
    probes.foreach { ph =>
      assert(expected(ph)._1 >= 1L, s"phrase '$ph' lost its source doc")
    }
  }
}
