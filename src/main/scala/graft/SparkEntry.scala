package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-pack query registries. Every key in [[queries]]
  * that is SQL-expressible has a DuckDB twin in [[oracleSql]] with
  * IDENTICAL output column names (the driver's compare sorts columns by
  * name before hashing).
  */
object SparkEntry {

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (TextAnalyticsQueries.queries, TextAnalyticsQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (DedupQueries.queries, DedupQueries.oracle),
      (CorpusQueries.queries, CorpusQueries.oracle),
      (GraphQueries.queries, GraphQueries.oracle),
      (IoQueries.queries, IoQueries.oracle),
      (ExtendedQueries.queries, ExtendedQueries.oracle),
      (IncrementalQueries.queries, IncrementalQueries.oracle),
      (BpeQueries.queries, BpeQueries.oracle),
      (SketchQueries.queries, SketchQueries.oracle),
      (GraphAnalyticsQueries.queries, GraphAnalyticsQueries.oracle),
      (SelectionQueries.queries, SelectionQueries.oracle),
      (CorpusStatsQueries.queries, CorpusStatsQueries.oracle),
      (PersistQueries.queries, PersistQueries.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_act_features")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)

  /** Bench-only artifact builders (r11 — VERDICT r10 #4), in dependency
    * order (NSW builds on the IVF memo). NOT part of [[queries]]: they
    * are not declared operators and must not appear in the Verify dump.
    * Bench runs them cold at the start of each interleaved pass so each
    * one-time build cost (KMeans→Ward tree, depth-partitioned serving
    * table, IVF lists, NSW graphs, E1 pipeline) is timed exactly once
    * per pass, and dependent queries measure query work over the warm
    * memo instead of quintuple-counting the build. The dedup LSH bucket
    * cache is deliberately NOT here: its DuckDB twins recompute the
    * bucketing in-query, so the Spark side must too (fair ratio).
    */
  def benchArtifacts: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "build_graph_tree" -> GraphQueries.rebuildTree,
    "build_graph_depth" -> GraphQueries.rebuildDepthTable,
    "build_ivf_index" -> VectorQueries.rebuildIvf,
    "build_nsw_graph" -> VectorQueries.rebuildNsw,
    "build_hnsw_layers" -> VectorQueries.rebuildHnsw,
    "build_pq_codebooks" -> VectorQueries.rebuildPq,
    "build_bm25_index" -> CorpusQueries.rebuildBm25,
    "build_bm25_upsert" -> CorpusQueries.rebuildBm25Upsert,
    "build_bpe_model" -> BpeQueries.rebuildBpe,
    "build_e1_model" -> IoQueries.rebuildE1,
    "build_pagerank_edges" -> GraphAnalyticsQueries.rebuildEdges,
    // last two: build_index_store reads the ivf/bm25/pq memos built
    // above; build_index_append clones that store and merges the
    // upsert deltas (dependency order)
    "build_index_store" -> PersistQueries.rebuildStore,
    "build_index_append" -> PersistQueries.rebuildAppend,
    "build_index_compact" -> PersistQueries.rebuildCompact)

  /** build_* entry → the declared queries that read its memo. Lives
    * NEXT TO [[benchArtifacts]] so adding an artifact or a consumer is
    * one edit (r12 ADVICE: a hand-maintained copy inside Bench drifts).
    * Bench uses it twice: SPARK_GRAFT_ONLY auto-includes a selected
    * query's builds, and a build skipped under the bounded second pass
    * takes its dependents with it (they would otherwise pay the cold
    * build inline, blowing the cap the skip was enforcing).
    */
  def artifactDeps: Map[String, Set[String]] = Map(
    "build_graph_tree" -> Set("o51_kmeans", "q_ward_dendrogram",
      "q_graph_build", "q_prune_prototypes", "q_cluster_silhouette",
      "q_cluster_keywords",
      "q_graph_children", "q_serve_children_e2", "q_serve_children_pruned",
      "o07_graph_ids"),
    "build_graph_depth" -> Set("q_serve_children_pruned"),
    // build_nsw_graph is itself a dependent of the IVF memo (the NSW
    // graphs are built per IVF list), so it rides in this set too
    "build_ivf_index" -> Set("q_ann_ivf", "q_bitext_mine",
      "q_ann_ivf_upsert", "q_ann_drift",
      "q_ann_recall_ivf", "q_ann_recall_nsw", "q_ann_recall_hnsw",
      "q_hybrid_retrieval_ivf", "q_contrastive_pairs",
      "q_dedup_semantic", "q_knn_eval", "build_nsw_graph",
      "build_index_store", "q_index_persist",
      "build_index_append", "q_index_persist_upsert",
      "build_index_compact", "q_index_compact", "q_stream_ann_serve"),
    // build_hnsw_layers rides build_nsw_graph's memo (layer 0 IS the
    // NSW graph), so it is a dependent of that build too. Convention:
    // every set lists its TRANSITIVE query dependents directly (the
    // SPARK_GRAFT_ONLY closure is single-pass).
    "build_nsw_graph" -> Set("q_ann_recall_nsw", "q_ann_recall_hnsw",
      "build_hnsw_layers"),
    "build_hnsw_layers" -> Set("q_ann_recall_hnsw"),
    "build_pq_codebooks" -> Set("q_pq_encode", "q_ann_recall_pq",
      "build_index_store", "q_index_persist",
      "build_index_append", "q_index_persist_upsert",
      "build_index_compact", "q_index_compact"),
    // build_bm25_upsert merges the delta into the standing index memo,
    // so it is a dependent of build_bm25_index (transitive-listing
    // convention: its query dependent rides both sets)
    "build_bm25_index" -> Set("q_bm25_topk", "q_bm25_rm3", "q_bm25_upsert",
      "q_retrieval_mrr", "q_hybrid_retrieval", "q_hybrid_retrieval_ivf",
      "q_retrieval_ndcg",
      "build_bm25_upsert", "build_index_store", "q_index_persist",
      "build_index_append", "q_index_persist_upsert",
      "build_index_compact", "q_index_compact"),
    "build_bm25_upsert" -> Set("q_bm25_upsert", "q_retrieval_ndcg",
      "build_index_append", "q_index_persist_upsert",
      "build_index_compact", "q_index_compact"),
    "build_index_store" -> Set("q_index_persist",
      "build_index_append", "q_index_persist_upsert",
      "build_index_compact", "q_index_compact"),
    "build_index_append" -> Set("q_index_persist_upsert",
      "build_index_compact", "q_index_compact"),
    "build_index_compact" -> Set("q_index_compact"),
    "build_bpe_model" -> Set("q_tokenize_bpe", "q_bpe_terms",
      "q_bpe_fertility", "q_pack_sequences_bpe", "q_token_windows_bpe"),
    "build_e1_model" -> Set("q_e1_pipeline", "q_e1_features",
      "q_chunk_semantic"),
    "build_pagerank_edges" -> Set("q_graph_pagerank"))

  /** Drop all memoized build artifacts (graph build, IVF index, E1
    * pipeline) so the next invocation pays the full cost — used by Bench
    * at the start of each interleaved pass.
    */
  def clearCaches(): Unit = {
    GraphQueries.clearCache()
    VectorQueries.clearCache()
    IoQueries.clearCache()
    DedupQueries.clearCache()
    CorpusQueries.clearCache()
    BpeQueries.clearCache()
    GraphAnalyticsQueries.clearCache()
    graft.operators.IndexStore.clearCache()
    Scratch.releaseAll()
  }
}
