package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-statistics operators — the vocabulary/redundancy profiling a
  * 100 TB curation pipeline runs before committing to a tokenizer vocab
  * or a dedup budget (reference anchor: the reference profiles its
  * corpus before preprocessing, `preprocessing_agent.py`; these are the
  * published statistics that decision consumes at LLM-corpus scale).
  *
  *  - `q_collocations`: bigram collocation mining — the PMI-style
  *    association statistic behind phrase/vocab induction, as an exact
  *    integer LIFT surrogate: lift = p(xy) / (p(x)·p(y)) =
  *    c_xy·N² / (M·c_x·c_y), emitted in basis points. A cross-engine
  *    `ln` is a libm last-ulp lottery (the DSIR/tf-idf precedent), and
  *    PMI is a monotone transform of lift, so ranking by lift_bp IS
  *    ranking by PMI. The three-stage DIV factorization keeps every
  *    quotient inside BIGINT at 100 TB token counts (stage1 =
  *    c_xy·N DIV c_x ≤ N because c_xy ≤ c_x; stage2 ≤ 1e4·N; the final
  *    product widens through DECIMAL(38,0) — the q_lm_score rule — and
  *    only the bounded quotient casts back).
  *  - `q_ngram_novelty`: corpus-order n-gram novelty curve — per
  *    corpus-order bucket (doc_id scaled into [[NovBuckets]] ranges),
  *    how many 3-token shingles appear for the FIRST time in that
  *    bucket. The declining tail of this curve is the statistic that
  *    sizes how much new data another crawl actually buys (heap's-law
  *    profiling). first-occurrence = min(doc_id) per shingle — one
  *    map-side-combined aggregate on the dedup family's shingle key.
  *
  * Scale shapes: collocations' unigram/bigram models are map-side
  * combined aggregates; the scoring joins are plain equi-joins on the
  * token key (AQE broadcasts the vocab side while it fits, shuffles
  * past that — vocab is NOT assumed broadcastable at web scale);
  * selection is a TakeOrderedAndProject top-k. Novelty shuffles once on
  * the shingle (the exact q_dedup_* shuffle), then aggregates into a
  * ≤[[NovBuckets]]-row frame; the cumulative runs through
  * [[graft.operators.Ordinals.prefixSum]] with the bucket count as the
  * known gate statistic.
  */
object CorpusStatsQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---- bigram collocations by integer lift ----

  /** Minimum bigram instance count — the published collocation floor
    * (rare pairs have unstable association estimates). c_x, c_y ≥
    * MinPair follows for free (every xy instance contains an x and a y).
    */
  private[graft] val MinPair = 5L
  private[graft] val CollocTopK = 100

  private val collocations: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("text"))
    // unigram counts feed the x-join AND the y-join; bigram counts feed
    // the total AND the floor-filtered pair table — both scratch-persisted
    val uc = graft.Scratch.persist(
      docs.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c")))
    val bc = graft.Scratch.persist(
      docs.select(
          explode(call_function("token_shingles_all", col("text"), lit(2))).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c_xy")))
    val n = uc.agg(sum(col("c")).as("n"))
    val m = bc.agg(sum(col("c_xy")).as("m"))
    val pairs = bc.filter(col("c_xy") >= MinPair)
      .select(col("bg"), split(col("bg"), " ").getItem(0).as("x"),
        split(col("bg"), " ").getItem(1).as("y"), col("c_xy"))
    pairs
      .join(uc.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uc.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(m))
      // stage quotients bounded (scaladoc): s1 ≤ n, s2 ≤ 1e4·n/MinPair,
      // lift ≤ s2·(n/m) — all < 2^63 at 10^13-token corpora
      .withColumn("s1",
        expr("CAST((CAST(c_xy AS DECIMAL(38,0)) * n) DIV c_x AS BIGINT)"))
      .withColumn("s2", expr("(s1 * 10000) DIV c_y"))
      .select(col("bg").as("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        expr("CAST((CAST(s2 AS DECIMAL(38,0)) * n) DIV m AS BIGINT)").as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("bigram").asc)
      .limit(CollocTopK)
  }

  private val collocationsSql: String =
    s"""WITH uni AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |uc AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
       |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
       |bi AS (SELECT toks[i] || ' ' || toks[i + 1] AS bg
       |       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |             FROM (SELECT string_split(text, ' ') AS toks FROM documents)
       |             WHERE len(toks) >= 2)),
       |bc AS MATERIALIZED (SELECT bg, CAST(count(*) AS BIGINT) AS c_xy FROM bi GROUP BY bg),
       |mm AS (SELECT CAST(sum(c_xy) AS BIGINT) AS m FROM bc),
       |p AS (SELECT bg, string_split(bg, ' ')[1] AS x, string_split(bg, ' ')[2] AS y, c_xy
       |      FROM bc WHERE c_xy >= $MinPair),
       |j AS (SELECT p.bg, p.c_xy, ux.c AS c_x, uy.c AS c_y
       |      FROM p JOIN uc ux ON ux.tok = p.x JOIN uc uy ON uy.tok = p.y),
       |st AS (SELECT bg, c_xy, c_x, c_y,
       |              CAST((CAST(c_xy AS HUGEINT) * n) // c_x AS BIGINT) AS s1
       |       FROM j CROSS JOIN nn),
       |s2t AS (SELECT bg, c_xy, c_x, c_y, (s1 * 10000) // c_y AS s2 FROM st)
       |SELECT bg AS bigram, c_xy, c_x, c_y,
       |       CAST((CAST(s2 AS HUGEINT) * n) // m AS BIGINT) AS lift_bp
       |FROM s2t CROSS JOIN nn CROSS JOIN mm
       |ORDER BY lift_bp DESC, bigram LIMIT $CollocTopK""".stripMargin

  // ---- corpus-order n-gram novelty curve ----

  private[graft] val NovBuckets = 20L

  private val novelty: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // per-doc DISTINCT 3-token shingles — the dedup family's stream
    val firsts = docs.select(col("doc_id"),
        explode(call_function("token_shingles", col("text"), lit(3))).as("sh"))
      .groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    // scratch-persisted: the ≤20-row bucket table feeds BOTH the
    // cumulative and the total — unpersisted, each consumer re-derives
    // the corpus-wide shingle aggregation (multiply-consumed rule)
    val buckets = graft.Scratch.persist(firsts.crossJoin(broadcast(mx))
      .select(expr(s"(first_doc * $NovBuckets) DIV (mx + 1)").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_ngrams"))
      // non-foldable constant group (the lit(0) fold trap —
      // SketchQueries.quantilesOf); gate stat = bucket count, known ≤ 20
      .withColumn("_g", pmod(col("bucket"), lit(1L))))
    val cum = graft.operators.Ordinals.prefixSum(
      buckets, "_g", "bucket", "new_ngrams", "cum_ngrams",
      knownMaxGroup = Some(NovBuckets))
    val total = cum.agg(sum(col("new_ngrams")).as("total"))
    cum.crossJoin(broadcast(total))
      .select(col("bucket"), col("new_ngrams"), col("cum_ngrams"),
        expr("(new_ngrams * 10000) DIV total").as("novelty_bp"))
  }

  private val noveltySql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
       |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS sh
       |  FROM documents),
       |f AS (SELECT sh, CAST(min(doc_id) AS BIGINT) AS first_doc FROM sh GROUP BY sh),
       |mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mx FROM documents),
       |b AS MATERIALIZED (SELECT (first_doc * $NovBuckets) // (mx + 1) AS bucket,
       |             CAST(count(*) AS BIGINT) AS new_ngrams
       |      FROM f CROSS JOIN mx GROUP BY 1),
       |c AS (SELECT bucket, new_ngrams,
       |             CAST(sum(new_ngrams) OVER (ORDER BY bucket
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ngrams
       |      FROM b),
       |t AS (SELECT CAST(sum(new_ngrams) AS BIGINT) AS total FROM b)
       |SELECT bucket, new_ngrams, cum_ngrams, (new_ngrams * 10000) // total AS novelty_bp
       |FROM c CROSS JOIN t""".stripMargin

  // ---- source-level corpus similarity: minhash estimate + exact arm ----
  // The cross-corpus overlap statistic a mixture pipeline consults
  // before merging crawls: for every source pair, the MinHash-signature
  // Jaccard ESTIMATE (8 md5-window hashes — the dedup family's exact
  // signature construction, collapsed to ONE 8-value signature per
  // source; signatures are constant-size and MERGEABLE by elementwise
  // min, the HLL-register property) next to the EXACT Jaccard over the
  // distinct-shingle sets (the arm that grades the sketch — cheap here
  // because per-shingle join groups are bounded by |sources|). At
  // 100 TB only the signature column survives per corpus; the exact arm
  // is the verification harness.
  private val sourceSim: Q = (s, d) => {
    // persisted: the distinct (source, shingle) set feeds the signature
    // aggregate, the per-source counts, and BOTH sides of the exact
    // intersection join
    val ssh = graft.Scratch.persist(
      Tables.documents(s, d).select(col("source"),
          explode(call_function("token_shingles", col("text"), lit(3))).as("sh"))
        .distinct())
    val mins = (0 to 7).map(k =>
      min(substring(md5(col("sh")), 3 * k + 1, 8)).as(s"mh$k"))
    val sig = ssh.groupBy("source").agg(mins.head, mins.tail: _*)
    val cnt = ssh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = ssh.as("a")
      .join(ssh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    val match8 = (0 to 7).map(k =>
      when(col(s"s1.mh$k") === col(s"s2.mh$k"), 1L).otherwise(0L)).reduce(_ + _)
    // the |sources|²-row inequality join is the accepted tiny-frame
    // BroadcastNestedLoop pattern (PlanSpec stats-frame rule)
    sig.as("s1").join(sig.as("s2"), col("s1.source") < col("s2.source"))
      .select(col("s1.source").as("src_a"), col("s2.source").as("src_b"),
        match8.as("match8"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .join(cnt.select(col("source").as("src_a"), col("n").as("na")), Seq("src_a"))
      .join(cnt.select(col("source").as("src_b"), col("n").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("match8"),
        expr("(match8 * 10000) DIV 8").as("est_bp"),
        expr("(coalesce(inter, 0) * 10000) DIV (na + nb - coalesce(inter, 0))")
          .as("jac_bp"))
  }

  private val sourceSimSql: String = {
    val minsSql = (0 to 7).map(k =>
      s"min(substr(md5(sh), ${3 * k + 1}, 8)) AS mh$k").mkString(", ")
    val match8Sql = (0 to 7).map(k =>
      s"(CASE WHEN s1.mh$k = s2.mh$k THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ssh AS MATERIALIZED (
       |  SELECT DISTINCT source, sh FROM (
       |    SELECT source, unnest(list_distinct(list_transform(
       |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
       |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS sh
       |    FROM documents)),
       |sig AS (SELECT source, $minsSql FROM ssh GROUP BY source),
       |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ssh GROUP BY source),
       |inter AS (
       |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS inter
       |  FROM ssh a JOIN ssh b ON b.sh = a.sh AND a.source < b.source
       |  GROUP BY 1, 2),
       |p AS (SELECT s1.source AS src_a, s2.source AS src_b,
       |             CAST($match8Sql AS BIGINT) AS match8
       |      FROM sig s1 JOIN sig s2 ON s1.source < s2.source)
       |SELECT p.src_a, p.src_b, p.match8, (p.match8 * 10000) // 8 AS est_bp,
       |       (coalesce(i.inter, 0) * 10000)
       |         // (ca.n + cb.n - coalesce(i.inter, 0)) AS jac_bp
       |FROM p LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
       |JOIN cnt ca ON ca.source = p.src_a
       |JOIN cnt cb ON cb.source = p.src_b""".stripMargin
  }

  // ---- per-source vocabulary diversity (r18) ----
  // The template-detection diagnostic a corpus curator runs per source:
  // Simpson concentration of the token distribution (Σc² / N² — the
  // repeat-probability; a boilerplate-heavy source concentrates mass on
  // few types and its index jumps) and the type-token ratio. Both are
  // EXACT integer surrogates — Simpson needs no logs (unlike entropy,
  // which has no tabulable integer form over arbitrary counts), which
  // is why it is the diversity statistic this engine publishes.
  //
  // Scale shape: one token explode → map-side-combined (source, tok)
  // count → per-source rollup over the types table. Deliberately TWO
  // exchanges, not the one-exchange repartition(source) form: source
  // cardinality is tiny (~20), so pre-clustering by source would
  // serialize the token count into |sources| tasks at 100 TB, while
  // the (source, tok) shuffle stays fully parallel and the second
  // exchange moves only the vocabulary-sized type table. Σc² widened
  // through DECIMAL(38,0)/HUGEINT (Σc² < N² overflows BIGINT once a
  // source holds ~3e9 tokens; the dsir precedent).
  private val sourceDiversity: Q = (s, d) => {
    val c = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    c.groupBy("source")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ss"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("CAST((ss * 1000000000) DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
          .as("simpson_e9"),
        expr("(n_types * 1000000) DIV n_tokens").as("ttr_e6"))
      .orderBy("source")
  }

  private val sourceDiversitySql: String =
    """WITH c AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY source, tok)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       CAST((sum(CAST(c AS HUGEINT) * c) * 1000000000)
      |         // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT) AS simpson_e9,
      |       CAST((count(*) * 1000000) // sum(c) AS BIGINT) AS ttr_e6
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_collocations" -> collocations,
    "q_ngram_novelty" -> novelty,
    "q_source_sim" -> sourceSim,
    "q_source_diversity" -> sourceDiversity)

  val oracle: Map[String, String] = Map(
    "q_collocations" -> collocationsSql,
    "q_ngram_novelty" -> noveltySql,
    "q_source_sim" -> sourceSimSql,
    "q_source_diversity" -> sourceDiversitySql)
}
