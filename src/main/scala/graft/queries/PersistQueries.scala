package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IndexStore

/** Durable index persistence as a declared, oracle-checked operator
  * (r17 — VERDICT r16 #1).
  *
  * q_index_persist exercises the full persistence cycle: save the
  * session's built indexes (IVF lists, BM25 postings/lens/totals/idf,
  * PQ codes+codebooks) as parquet artifacts, LOAD them back as
  * servable states, serve the standing q_ann_ivf / q_bm25_topk /
  * q_pq_encode answers from the LOADED states (never the memos), and
  * publish one (artifact, n_rows, checksum) row per served surface —
  * order-independent Σ-md5-prefix checksums over integer-rendered
  * rows (the q_shard_manifest machinery).
  *
  * The DuckDB twin recomputes each checksum from the standing
  * export-replay oracles (q_ann_ivf / q_bm25_topk / q_pq_encode twin
  * SQL verbatim, nested as WITH-subqueries so their CTE names stay
  * scoped), so a drift anywhere in the save → load → serve path —
  * a lost posting, a mis-typed partition column, a df merge error in
  * the terms copy — flips the hash. The fresh-session zero-rebuild
  * guarantee is pinned by IndexStoreSpec (cache counters stay 0).
  *
  * Reference: the index-is-durable-state capability at
  * services/db_service/db_init.sql:23-28 and
  * src/backend/db/models/embedding.py:15-18.
  */
object PersistQueries {

  type Q = (SparkSession, String) => DataFrame

  private def arm(name: String, df: DataFrame, render: Column): DataFrame =
    IndexStore.contentStats(df.select(render.as("_r")))
      .select(lit(name).as("artifact"), col("n_rows"), col("checksum"))

  /** The five served-surface checksum arms over a loaded store state —
    * shared (r18) by q_index_persist (standing store) and
    * q_index_persist_upsert (appended store): identical probes,
    * serving seams, and renders; only the store root differs.
    */
  private def servedArms(s: SparkSession, d: String,
      lx: IndexStore.LoadedIndexes): DataFrame = {
    // cos is the one double: rendered as round(cos·1e6) — cos is
    // already rounded to 6 dp, so the product is integral up to one
    // ulp and both engines land on the same BIGINT
    val ivfServed = VectorQueries.ivfTopkFrom(s, d, lx.ivf)
    val bmServed = CorpusQueries.bm25TopkFrom(s, d,
      lx.bm25Post, lx.bm25Lens, lx.bm25G, lx.bm25TermsPath)
    arm("ann_ivf_topk", ivfServed,
        concat_ws("|", col("probe_id"), col("vec_id"), col("rk"),
          expr("CAST(round(cos * 1000000) AS BIGINT)")))
      .unionAll(arm("bm25_terms", s.read.parquet(lx.bm25TermsPath),
        concat_ws("|", col("tok"), col("df"), col("idf_e6"))))
      .unionAll(arm("bm25_topk", bmServed,
        concat_ws("|", col("probe_id"), col("rk"), col("doc_id"), col("score"))))
      .unionAll(arm("ivf_assigned", lx.ivf.assigned,
        concat_ws("|", col("vec_id"), col("cluster"))))
      .unionAll(arm("pq_codes", VectorQueries.pqEncodeFrom(lx.pq),
        concat_ws("|", col("vec_id"), col("j"), col("code"))))
      .orderBy("artifact")
  }

  private val indexPersist: Q = (s, d) =>
    // save memoized; bench times it as build_index_store
    servedArms(s, d, IndexStore.load(s, IndexStore.save(s, d)))

  /** q_index_persist_upsert (r18 — VERDICT r17 next #1): the SAME five
    * arms served from the APPENDED store — IndexStore.append merges
    * the proven in-memory upsert deltas (IVF +0.05/+200000 vectors,
    * BM25 +700000 mutated docs) into the persisted artifacts as
    * appended files + rewritten bounded frames, never a full-artifact
    * rewrite. The twin recomputes every checksum from a FULL REBUILD
    * over the unioned corpus (assignment replayed from the centroid
    * export, df recounted from the unioned documents, PQ codes from
    * the codebook export), so a lost delta file, a mis-merged df, or a
    * drifted assignment anywhere in the append → load → serve path
    * flips the hash.
    */
  private val indexPersistUpsert: Q = (s, d) =>
    // append memoized; bench times it as build_index_append
    servedArms(s, d, IndexStore.load(s, IndexStore.append(s, d)))

  /** q_index_compact (r18): the SAME five arms served from the
    * COMPACTED store — small-file consolidation of the appended
    * artifacts (one file per IVF list, O(cores) files for
    * postings/lens/codes) that must be a content NO-OP. The twin is
    * q_index_persist_upsert's full-rebuild oracle VERBATIM: compaction
    * that loses, duplicates, or reorders-into-different-values any row
    * flips the hash; file-count shrinkage and manifest-checksum
    * preservation are pinned by IndexStoreSpec.
    */
  private val indexCompact: Q = (s, d) =>
    servedArms(s, d, IndexStore.load(s, IndexStore.compact(s, d)))

  /** Bench artifact hook: forces the three index builds (via their
    * memos) and the store write; reps of q_index_persist then time
    * load + serve only.
    */
  private[graft] val rebuildStore: Q = (s, d) => {
    val root = IndexStore.save(s, d)
    s.read.parquet(java.nio.file.Paths.get(root, "manifest").toString)
  }

  /** Bench artifact hook for the append (r18): clones the standing
    * store and merges the upsert deltas; reps of q_index_persist_upsert
    * then time load + serve only.
    */
  private[graft] val rebuildAppend: Q = (s, d) => {
    val root = IndexStore.append(s, d)
    s.read.parquet(java.nio.file.Paths.get(root, "manifest").toString)
  }

  /** Bench artifact hook for the compaction rewrite (r18). */
  private[graft] val rebuildCompact: Q = (s, d) => {
    val root = IndexStore.compact(s, d)
    s.read.parquet(java.nio.file.Paths.get(root, "manifest").toString)
  }

  // ---- oracle ----

  private def ckArm(name: String, render: String, inner: String): String =
    s"""SELECT '$name' AS artifact, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(CAST(coalesce(sum(h), 0) AS HUGEINT) % ${IndexStore.ChecksumMod} AS BIGINT) AS checksum
       |FROM (SELECT ('0x' || substr(md5($render), 1, 9))::BIGINT AS h FROM ($inner))""".stripMargin

  private def v(c: String) = s"CAST($c AS VARCHAR)"

  private def indexPersistSql: String = {
    val ivfTopk = ckArm("ann_ivf_topk",
      Seq(v("probe_id"), v("vec_id"), v("rk"),
        v("CAST(round(cos * 1000000) AS BIGINT)")).mkString(" || '|' || "),
      VectorQueries.ivfTopkSql)
    val bmTopk = ckArm("bm25_topk",
      Seq(v("probe_id"), v("rk"), v("doc_id"), v("score")).mkString(" || '|' || "),
      CorpusQueries.bm25Sql)
    // terms: df RECOUNTED from the corpus, idf from the standing fixed
    // export — a drift in the saved copy's df or idf flips the hash
    val terms = ckArm("bm25_terms",
      Seq("tok", v("df"), v("idf_e6")).mkString(" || '|' || "),
      s"""WITH post AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY tok)
         |SELECT t.tok AS tok, d.df AS df, t.idf_e6 AS idf_e6
         |FROM '${CorpusQueries.bm25ExportPath}/*.parquet' t JOIN dfr d USING (tok)""".stripMargin)
    val assigned = ckArm("ivf_assigned",
      Seq(v("vec_id"), v("cluster")).mkString(" || '|' || "),
      s"WITH ${VectorQueries.ivfAssignCtes}\nSELECT vec_id, cluster FROM assigned")
    val pqCodes = ckArm("pq_codes",
      Seq(v("vec_id"), v("j"), v("code")).mkString(" || '|' || "),
      VectorQueries.pqEncodeSql)
    s"""SELECT artifact, n_rows, checksum FROM (
       |$ivfTopk
       |UNION ALL
       |$bmTopk
       |UNION ALL
       |$terms
       |UNION ALL
       |$assigned
       |UNION ALL
       |$pqCodes
       |) ORDER BY artifact""".stripMargin
  }

  /** The upsert twin: every arm rebuilt from scratch over the UNIONED
    * corpus/vector set — assignment and encoding replayed from the
    * centroid/codebook exports, df recounted from the unioned
    * documents (only idf, the transcendental, reads the upsert-terms
    * export, per the engine-wide export-replay convention).
    */
  private def indexPersistUpsertSql: String = {
    val ivfTopk = ckArm("ann_ivf_topk",
      Seq(v("probe_id"), v("vec_id"), v("rk"),
        v("CAST(round(cos * 1000000) AS BIGINT)")).mkString(" || '|' || "),
      VectorQueries.ivfTopkSqlOver("assigned_u",
        VectorQueries.upsertAssignedCtes, "vec_id < 5"))
    val bmTopk = ckArm("bm25_topk",
      Seq(v("probe_id"), v("rk"), v("doc_id"), v("score")).mkString(" || '|' || "),
      s"""WITH ${CorpusQueries.bm25UpsertScoredCtesWith(CorpusQueries.standingProbesSql)}
         |SELECT probe_id, rk, doc_id, score FROM (
         |  SELECT probe_id, doc_id, score,
         |         CAST(row_number() OVER (
         |           PARTITION BY probe_id ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         |  FROM scored)
         |WHERE rk <= ${CorpusQueries.Bm25K}""".stripMargin)
    val terms = ckArm("bm25_terms",
      Seq("tok", v("df"), v("idf_e6")).mkString(" || '|' || "),
      s"""WITH ${CorpusQueries.bm25UpsertUnionCtes},
         |post AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM udocs)),
         |dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY tok)
         |SELECT t.tok AS tok, d.df AS df, t.idf_e6 AS idf_e6
         |FROM '${CorpusQueries.bm25UpsertExportPath}/*.parquet' t JOIN dfr d USING (tok)""".stripMargin)
    val assigned = ckArm("ivf_assigned",
      Seq(v("vec_id"), v("cluster")).mkString(" || '|' || "),
      s"""WITH ${VectorQueries.ivfAssignCtes},
         |${VectorQueries.upsertAssignedCtes}
         |SELECT vec_id, cluster FROM assigned_u""".stripMargin)
    val pqCodes = ckArm("pq_codes",
      Seq(v("vec_id"), v("j"), v("code")).mkString(" || '|' || "),
      VectorQueries.pqEncodeSqlOver(
        s"SELECT vec_id, e FROM emb UNION ALL ${VectorQueries.upsertDeltaSelectSql}"))
    s"""SELECT artifact, n_rows, checksum FROM (
       |$ivfTopk
       |UNION ALL
       |$bmTopk
       |UNION ALL
       |$terms
       |UNION ALL
       |$assigned
       |UNION ALL
       |$pqCodes
       |) ORDER BY artifact""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_index_persist" -> indexPersist,
    "q_index_persist_upsert" -> indexPersistUpsert,
    "q_index_compact" -> indexCompact)

  def oracle: Map[String, String] = Map(
    "q_index_persist" -> indexPersistSql,
    "q_index_persist_upsert" -> indexPersistUpsertSql,
    // compaction is a content no-op over the appended store, so the
    // full-rebuild oracle is SHARED verbatim — that identity IS the
    // compaction correctness claim
    "q_index_compact" -> indexPersistUpsertSql)
}
