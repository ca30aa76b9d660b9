package graft.operators.clustering

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end graph construction (E1 tail, SURVEY.md §3): feature
  * scaling (O-50) → distributed KMeans micro-clustering (O-51) → driver
  * Ward over collected centroids (O-52) → rebalance (O-53) → flattened
  * D6 tables with deterministic ids and materialized paths.
  *
  * Scale shape — identical to the reference's own design
  * (graph_creator.py:179-194): the ONLY driver-side data are the ≤800
  * micro-cluster centroids (bounded by `maxMicro`, not by input size)
  * and the per-dim scaling stats (bounded by dimensionality). Membership
  * never leaves the cluster: the movie→leaf assignment is a broadcast
  * join of the KMeans label column against the ≤800-row cluster→leaf
  * map.
  */
object GraphBuild {

  /** Built tables + the build-time `.persist()` handles (`persisted`),
    * so a cache-eviction hook can unpersist what the build cached —
    * dropping the memo entry alone leaves InMemoryRelations in the
    * session CacheManager, where an identical rebuild plan would
    * silently substitute the stale cache (r12 hygiene).
    */
  final case class GraphTables(graph: DataFrame, movies: DataFrame,
      labels: DataFrame, persisted: Seq[DataFrame] = Nil,
      // exported by the o51_kmeans oracle replay (r13, VERDICT r12 #3):
      // per-dim (mu, sigma-adjusted) scaling stats + the final trained
      // centroids — given these exact doubles, scaling and assignment
      // are plain replayable arithmetic
      scaleStats: Array[(Double, Double)] = Array.empty,
      centers: Array[Array[Double]] = Array.empty,
      // PRE-rebalance tree rows (r14): exported so the q_graph_build /
      // q_e1_pipeline oracles can replay rebalance+flatten relationally
      preRows: Seq[TreeOps.PreRow] = Nil)

  /** Per-dim (mu, sigma) with population σ (sklearn ddof=0,
    * graph_creator.py:114); σ == 0 dims are already replaced by 1.0
    * (constant dims scale to exactly 0). 64 rows for 64 dims —
    * independent of row count.
    */
  def scaleStats(df: DataFrame, arrCol: String): Array[(Double, Double)] =
    df.select(posexplode(col(arrCol)))
      .groupBy("pos")
      .agg(avg(col("col").cast("double")).as("mu"),
        stddev_pop(col("col").cast("double")).as("sigma"))
      .orderBy("pos").collect()
      .map { r =>
        val s = r.getDouble(2)
        (r.getDouble(1), if (s == 0.0) 1.0 else s)
      }

  /** Applies pre-computed [[scaleStats]] as one codegen'd zip_with
    * chain: (CAST(x AS DOUBLE) − mu) / sigma — two IEEE ops per dim, the
    * exact sequence the o51 oracle replays from the exported doubles.
    */
  def scaleWith(stats: Array[(Double, Double)], arrCol: String): Column = {
    val mus = array(stats.map(s => lit(s._1)).toSeq: _*)
    val sigmas = array(stats.map(s => lit(s._2)).toSeq: _*)
    zip_with(
      zip_with(transform(col(arrCol), x => x.cast("double")), mus, (x, m) => x - m),
      sigmas, (x, s) => x / s)
  }

  /** O-50 z-score scaling (stats computed inline — see [[scaleStats]]). */
  def scaleFeatures(df: DataFrame, arrCol: String): Column =
    scaleWith(scaleStats(df, arrCol), arrCol)

  /** O-51: k = min(maxMicro, max(100, n/50)) like settings.py:113-121,
    * clamped to n; seed 42 (graph_creator.py:183). Returns per-row
    * cluster labels and the k×dim centroid matrix.
    *
    * Training is SAMPLE-BOUNDED past `sampleFloor` rows (VERDICT r9 #4 —
    * the one super-linear 100× row): full-corpus Lloyd is O(n·k·iters)
    * and the reference's own k formula pushes k to its 800 cap exactly
    * when n grows, so q_graph_build measured 158× wall at 100× data.
    * Same seam as the IVF coarse quantizer ([[graft.operators.AnnIvf]]
    * delegates here): below the floor, the exact historical path —
    * full-corpus Lloyd, bit-identical outputs at every bench SF. Above
    * it, Lloyd runs on a deterministic hash-stride sample (~64 training
    * points per centroid, the FAISS convention; stable under any
    * partitioning) with capped iterations, and only the final label
    * assignment touches the full corpus — one O(n·k) pass instead of
    * ~20. Centroid quality barely moves the downstream Ward tree: the
    * tree is built over the k centroids, and micro-cluster centroids
    * from a 50k+-row sample are statistically indistinguishable from
    * full-corpus ones (ClusteringSpec invariants hold on both paths).
    */
  def microCluster(features: DataFrame, idCol: String, featCol: String,
      maxMicro: Int = 800, sampleFloor: Long = 50000L): (DataFrame, Array[Array[Double]]) = {
    val n = features.count()
    val k = math.max(2, math.min(n, math.min(maxMicro, math.max(100, n / 50))).toInt)
    // Size partitions to the DATA, not the session default: every Lloyd
    // iteration schedules one task per partition, so a small feature
    // frame inheriting a wide parallelism pays ~iterations × partitions
    // of empty-task overhead (profiling: this was most of the E1 tail at
    // sf0.1 — 2.7k rows on 32 partitions). ~50k rows/partition keeps a
    // 100 TB input at thousands of partitions while a thousand-row frame
    // collapses to a few; coalesce on the (persisted) input is a narrow
    // dependency, no shuffle.
    val curParts = features.rdd.getNumPartitions
    val target = math.max(1, math.min(curParts, math.ceil(n / 50000.0).toInt))
    val sized = if (target < curParts) features.coalesce(target) else features
    val trainTarget = math.max(sampleFloor, 64L * k)
    // Final label assignment is the exact nearest-final-centroid rule
    // (AnnIvf.assignNearestArr: Σ(xᵢ−cᵢ)² in index order, strict <,
    // tie → lowest cluster) rather than KMeansModel.transform — r13,
    // VERDICT r12 #3, the same graduation the IVF lists made in r12:
    // MLlib's fastSquaredDistance norm-shortcut is not replayable
    // outside MLlib, while the exact loop is plain arithmetic any
    // engine reproduces bit-for-bit from the exported centroid doubles.
    // Build-time and append-time assignment are now ONE rule everywhere.
    def exactLabels(model: org.apache.spark.ml.clustering.KMeansModel): DataFrame = {
      val cents = model.clusterCenters.map(_.toArray).zipWithIndex
        .map { case (c, i) => (i, c) }
      graft.operators.AnnIvf.assignNearestArr(sized, idCol, featCol, cents)
        .select(col(idCol), col("cluster").cast("int").as("cluster"))
    }
    if (n <= trainTarget) {
      val vecs = sized.withColumn("_fv", array_to_vector(col(featCol)))
      val model = new KMeans().setK(k).setSeed(42)
        .setFeaturesCol("_fv").setPredictionCol("cluster").fit(vecs)
      (exactLabels(model), model.clusterCenters.map(_.toArray))
    } else {
      // ceil: a floor stride can overshoot the target sample by ~2×
      // (n=200k, target=51.2k: floor gives stride 3 → 66k rows)
      val stride = math.max(1L, (n + trainTarget - 1) / trainTarget)
      val sample = sized
        .filter(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
        .withColumn("_fv", array_to_vector(col(featCol)))
        .persist()
      // hash stride is approximate; k can never exceed the sample
      val kk = math.max(2L, math.min(k.toLong, sample.count())).toInt
      // random init (seeded): kmeans||'s candidate passes cost several
      // Lloyd iterations at k=800 (measured 100×: more than half the
      // 57 s train) and buy centroid quality a coarse quantizer doesn't
      // need — FAISS trains IVF quantizers from a random sample the
      // same way. Full-probe recall is init-independent by construction
      // (nProbe == nList scans everything).
      val model = new KMeans().setK(kk).setSeed(42).setMaxIter(10)
        .setInitMode("random")
        .setFeaturesCol("_fv").setPredictionCol("cluster").fit(sample)
      sample.unpersist()
      (exactLabels(model), model.clusterCenters.map(_.toArray))
    }
  }

  /** Full build over an (id, ARRAY<FLOAT>) frame → D6 graph + movie
    * assignment tables.
    */
  def build(emb: DataFrame, idCol: String, arrCol: String,
      maxMicro: Int = 800, maxDepth: Int = 5, maxFanout: Int = 8): GraphTables = {
    val spark = emb.sparkSession
    import spark.implicits._

    // persisted: the input is consumed by the scaling-stats pass and then
    // by KMeans many times over (count, ~20 Lloyd passes, label
    // transform) — without this the ENTIRE upstream lineage (for E1:
    // clean → window → inference → act features) recomputes per pass.
    val input = emb.persist()
    val stats = scaleStats(input, arrCol)
    val scaled = input.select(col(idCol), scaleWith(stats, arrCol).as("scaled"))
      .persist()
    val (labels, centers) = microCluster(scaled, idCol, "scaled", maxMicro)

    val sizes = labels.groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dendro = Ward.linkage(centers)
    val preTree = TreeOps.fromDendro(dendro, sizes)
    val tree = TreeOps.rebalance(preTree, maxDepth = maxDepth, maxFanout = maxFanout)
    val (rows, assign) = TreeOps.flatten(tree)

    val graph = rows.toDF()
      .select(col("id"), col("path"), col("name"), col("tpe").as("type"),
        col("children_count"), col("depth"), col("count"), col("distance"))
    val assignDF = assign.toSeq.toDF("cluster", "graph_id")
    val movies = labels.join(broadcast(assignDF), Seq("cluster"))
      .select(col(idCol).as("movie_id"), col("graph_id"))
    GraphTables(graph, movies, labels, Seq(input, scaled), stats, centers,
      TreeOps.preorder(preTree))
  }

  /** E2 serving (graph_repo.py:92-135): immediate children of a node via
    * the ltree `path ~ 'p.*{1}'` equivalent — prefix + depth predicates,
    * both pushable string filters.
    */
  def childrenOf(graph: DataFrame, nodeId: Long): DataFrame = {
    val parent = graph.filter(col("id") === nodeId)
      .select(col("path").as("ppath"), col("depth").as("pdepth"))
    graph.join(broadcast(parent),
        col("path").startsWith(concat(col("ppath"), lit("."))) &&
          col("depth") === col("pdepth") + 1)
      .select("id", "path", "name", "type", "children_count", "count")
  }
}
