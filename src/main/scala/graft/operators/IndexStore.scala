package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable index persistence (r17 — VERDICT r16 #1).
  *
  * The reference's indexes are durable database state that survives
  * restarts: the HNSW cosine index
  * (src/backend/db/models/embedding.py:15-18,
  * services/db_service/db_init.sql:23-28) and the GiST/btree path
  * indexes (db_init.sql:12-13). The engine's equivalents — IVF lists,
  * BM25 postings/lengths/idf, PQ codes+codebooks — were only
  * session-memoized TrieMaps until r17, so a fresh session paid the
  * full rebuild. This seam writes them as partitioned parquet
  * artifacts under one store root with a small manifest (row counts,
  * shape metadata, order-independent content checksums via the
  * q_shard_manifest machinery) and loads them back into servable index
  * states WITHOUT touching any builder: a fresh SparkSession answers
  * q_ann_ivf / q_bm25_topk / q_pq_encode from the loaded artifacts
  * with zero rebuild jobs (IndexStoreSpec pins this).
  *
  * Scale notes: `ivf_assigned` is written `partitionBy("cluster")` so
  * a probe-time broadcast join prunes to the probed lists' partitions
  * (nProbe/nList of the data) at the SCAN, which is the point of a
  * durable IVF artifact at 100 TB; postings/lens/codes stay
  * multi-file parquet written at the build's parallelism, and terms
  * (vocabulary-sized — unbounded under Heap's law) is hash-partitioned
  * by tok (r18, VERDICT r17 #3). Only the
  * bounded frames (nList centroids, m·k codebooks, the manifest) are
  * single-file.
  */
object IndexStore {

  /** Servable index states reconstructed from a store root — plain
    * DataFrames over the artifact files plus the two bounded driver
    * arrays (PQ codebooks; IVF centroids stay a frame, topK broadcasts
    * it). Nothing here is persisted or memoized: serving reads the
    * artifact, which is the durability story.
    */
  final case class LoadedIndexes(
      ivf: AnnIvf.IvfIndex,
      bm25Post: DataFrame, bm25Lens: DataFrame, bm25G: DataFrame,
      bm25TermsPath: String,
      pq: PqOps.PqIndex,
      manifest: DataFrame)

  private[graft] val ChecksumMod = 2305843009213693951L // 2^61 − 1

  def storeRoot(d: String): String = java.nio.file.Paths
    .get(sys.props("java.io.tmpdir"),
      "graft_index_store_" + graft.Scratch.dirTag(d)).toString

  private def sub(root: String, name: String): String =
    java.nio.file.Paths.get(root, name).toString

  /** Run independent write jobs concurrently from a small driver pool
    * (r18 opt — optimization guide §2.6 "overlap independent jobs":
    * actions are only sequential because the driver calls them
    * sequentially; each artifact write's task tail + committer wait
    * leaves most cores idle, so the next write back-fills them).
    * 3 in flight is enough to fill the tail without the jobs fighting
    * for executors. Exceptions propagate to the caller.
    */
  private def inParallel(works: Seq[() => Unit]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val futs = works.map(w => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = w()
      }))
      futs.foreach { f =>
        // unwrap: Bench's deterministic-failure skip matches on the
        // ORIGINAL exception type (AnalysisException), not the pool's
        // ExecutionException wrapper (r18 review)
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            // a failed write must not leave siblings mutating the store
            // while the caller's finally/retry runs: cancel queued work,
            // wait out the in-flight jobs, then propagate (r18 review)
            futs.foreach(_.cancel(false))
            pool.shutdown()
            val drained = pool.awaitTermination(
              10, java.util.concurrent.TimeUnit.MINUTES)
            val cause = Option(e.getCause).getOrElse(e)
            // a sibling still running past the drain window means the
            // store may be mutating while the caller handles the
            // failure — surface that state with the original exception
            // rather than silently propagating it alone (r19, ADVICE r18)
            if (!drained) cause.addSuppressed(new IllegalStateException(
              "inParallel: sibling write jobs still running after the " +
                "10-minute post-failure drain window; the store may " +
                "still be mutating"))
            throw cause
        }
      }
    } finally pool.shutdown()
  }

  /** (n_rows, checksum) over a frame's `_r` string rendering — Σ 9-hex
    * md5 prefixes, exact via DECIMAL(38,0), published mod 2⁶¹−1 (the
    * q_shard_manifest machinery). Rendering of non-integer columns
    * (to_json arrays) is Spark-deterministic; the manifest is compared
    * Spark-vs-Spark (save vs load), while the cross-engine oracle
    * checksums in PersistQueries render integers only.
    */
  // ONE home for the hash + checksum-sum expressions (r18 review: the
  // append stats job inlined copies; a drift between save's and
  // append's checksum arithmetic fails every post-append verification)
  private val hashExprSql =
    "CAST(conv(substring(md5(_r), 1, 9), 16, 10) AS BIGINT)"
  private def checksumAggSql(hCol: String) =
    s"CAST(coalesce(sum(CAST($hCol AS DECIMAL(38,0))), 0) % $ChecksumMod AS BIGINT)"

  private[graft] def contentStats(rendered: DataFrame): DataFrame =
    rendered.select(expr(hashExprSql).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr(checksumAggSql("h")).as("checksum"))

  private def manifestRow(name: String, df: DataFrame,
      render: org.apache.spark.sql.Column, meta: String): DataFrame =
    contentStats(df.select(render.as("_r")))
      .select(lit(name).as("artifact"), col("n_rows"), col("checksum"),
        lit(meta).as("meta"))

  /** Recompute a loaded artifact's manifest row (the load-integrity
    * check IndexStoreSpec runs; a production load would gate on it).
    */
  private[graft] def recomputedRow(s: SparkSession, root: String,
      name: String): DataFrame = {
    val (df, render, meta) = artifactSpec(s, root, name)
    manifestRow(name, df, render, meta)
  }

  /** artifact name → render column. Split from [[artifactSpec]] (r18)
    * so [[append]] can compute a DELTA frame's stats with the exact
    * render its artifact's manifest rows use — checksum merging is only
    * sound if both sides render identically.
    */
  private def renderColFor(name: String): org.apache.spark.sql.Column =
    name match {
      case "ivf_assigned" => concat_ws("|", col("vec_id"), col("cluster"))
      case "ivf_centroids" => concat_ws("|", col("cluster"), to_json(col("centroid")))
      case "bm25_post" => concat_ws("|", col("doc_id"), col("tok"), col("tf"))
      case "bm25_lens" => concat_ws("|", col("doc_id"), col("len"))
      case "bm25_g" => concat_ws("|", col("n"), col("t"))
      case "bm25_terms" => concat_ws("|", col("tok"), col("df"), col("idf_e6"))
      case "pq_codes" => concat_ws("|", col("vec_id"), to_json(col("codes")))
      case "pq_codebooks" => concat_ws("|", col("j"), col("c"), to_json(col("centroid")))
      case other => throw new IllegalArgumentException(s"unknown artifact $other")
    }

  /** artifact name → (frame over its files, render column, meta). The
    * ONE definition both save (manifest write) and verify (recompute)
    * share, so they can never drift.
    */
  private def artifactSpec(s: SparkSession, root: String,
      name: String): (DataFrame, org.apache.spark.sql.Column, String) =
    (s.read.parquet(sub(root, name)), renderColFor(name), "")

  private[graft] val ArtifactNames = Seq("ivf_assigned", "ivf_centroids",
    "bm25_post", "bm25_lens", "bm25_g", "bm25_terms", "pq_codes",
    "pq_codebooks")

  // save is idempotent per (session, dir): a path string only, nothing
  // persisted — memoized so bench reps of q_index_persist time load +
  // serve, never the writer (build_index_store is the timed build).
  private val savedCache = new graft.SessionCache[String]

  private[graft] def clearCache(): Unit = {
    savedCache.clearAll(); appendedCache.clearAll(); compactedCache.clearAll(); ()
  }

  /** Write the session's built indexes (forcing their builds if not
    * yet memoized) as parquet artifacts under [[storeRoot]], plus the
    * manifest. Returns the root.
    */
  def save(s: SparkSession, d: String): String = savedCache.getOrElseUpdate(s, d) {
    val root = storeRoot(d)
    val ivf = graft.queries.VectorQueries.ivfIndex(s, d)
    val bm = graft.queries.CorpusQueries.bm25Index(s, d)
    val pq = graft.queries.VectorQueries.pqIndex(s, d)
    // partitionBy(cluster): the probe join broadcasts ~nProbe lists, so
    // dynamic partition pruning cuts the artifact scan to the probed
    // lists — the durable form of the in-memory equi-join's selectivity
    val sp = s
    import sp.implicits._
    // the eight artifact writes are independent jobs — overlapped from
    // a small pool (r18 opt, guide §2.6); terms stays hash-partitioned
    // by tok at session parallelism (r18, VERDICT r17 #3 — the old
    // coalesce(1) funneled a vocabulary-sized frame (grows with corpus
    // under Heap's law, unlike nList/m·k) through one task); the loader
    // globs the dir and the manifest checksum is order-independent
    inParallel(Seq(
      () => ivf.assigned.write.mode("overwrite").partitionBy("cluster")
        .parquet(sub(root, "ivf_assigned")),
      () => ivf.centroids.coalesce(1).write.mode("overwrite")
        .parquet(sub(root, "ivf_centroids")),
      () => bm.post.write.mode("overwrite").parquet(sub(root, "bm25_post")),
      () => bm.lens.write.mode("overwrite").parquet(sub(root, "bm25_lens")),
      () => bm.g.coalesce(1).write.mode("overwrite").parquet(sub(root, "bm25_g")),
      () => s.read.parquet(bm.termsPath).repartition(col("tok")).write
        .mode("overwrite").parquet(sub(root, "bm25_terms")),
      () => pq.codes.write.mode("overwrite").parquet(sub(root, "pq_codes")),
      () => (0 until pq.m).flatMap(j => (0 until pq.k).map(c =>
          (j, c, pq.codebooks(j)(c).toSeq)))
        .toDF("j", "c", "centroid")
        .select(col("j"), col("c"),
          col("centroid").cast("array<double>").as("centroid"))
        .coalesce(1).write.mode("overwrite").parquet(sub(root, "pq_codebooks"))))
    // shape metadata rides the relevant artifact's manifest row
    val dim = ivf.centroids.select(size(col("centroid"))).head().getInt(0)
    val nList = ivf.centroids.count()
    val metas = Map(
      "ivf_centroids" -> s"dim=$dim,nlist=$nList",
      "pq_codebooks" -> s"m=${pq.m},k=${pq.k},dsub=${pq.dSub}")
    val manifest = ArtifactNames.map { name =>
      val (df, render, _) = artifactSpec(s, root, name)
      manifestRow(name, df, render, metas.getOrElse(name, ""))
    }.reduce(_.unionAll(_))
    manifest.coalesce(1).write.mode("overwrite").parquet(sub(root, "manifest"))
    root
  }

  /** Reconstruct servable index states from a store root — reads only
    * the artifacts (plus two bounded driver collects: the m·k PQ
    * codebooks; manifest metadata), never a builder or a memo.
    */
  def load(s: SparkSession, root: String): LoadedIndexes = {
    val assigned = s.read.parquet(sub(root, "ivf_assigned"))
      .select(col("vec_id"), col("e"), col("cluster").cast("int").as("cluster"))
    val centroids = s.read.parquet(sub(root, "ivf_centroids"))
    val ivf = AnnIvf.IvfIndex(assigned, centroids, "vec_id")
    val post = s.read.parquet(sub(root, "bm25_post"))
    val lens = s.read.parquet(sub(root, "bm25_lens"))
    val g = s.read.parquet(sub(root, "bm25_g"))
    val codebooks = readCodebooks(s, root)
    val m = codebooks.length
    val k = codebooks(0).length
    val dSub = codebooks(0)(0).length
    val pq = PqOps.PqIndex(codebooks,
      s.read.parquet(sub(root, "pq_codes")), "vec_id", m, k, dSub)
    LoadedIndexes(ivf, post, lens, g, sub(root, "bm25_terms"), pq,
      s.read.parquet(sub(root, "manifest")))
  }

  /** The m·k codebook array from a store root (bounded driver collect,
    * shared by [[load]] and [[append]]'s delta encoding).
    */
  private def readCodebooks(s: SparkSession, root: String): Array[Array[Array[Double]]] = {
    val cbRows = s.read.parquet(sub(root, "pq_codebooks"))
      .select(col("j"), col("c"), col("centroid")).collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val k = cbRows.map(_.getInt(1)).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach { r =>
      codebooks(r.getInt(0))(r.getInt(1)) =
        r.getAs[scala.collection.Seq[Double]](2).toArray
    }
    codebooks
  }

  def appendedRoot(d: String): String = java.nio.file.Paths
    .get(sys.props("java.io.tmpdir"),
      "graft_index_store_up_" + graft.Scratch.dirTag(d)).toString

  private val appendedCache = new graft.SessionCache[String]

  /** Incremental durable-index maintenance (r18 — VERDICT r17 #1, the
    * last capability gap vs the reference's always-updatable Postgres
    * indexes: `db/repositories/graph_repo.py:166-175` inserts
    * embeddings row by row and Postgres maintains the HNSW index of
    * `db_init.sql:23-28`). Merges the PROVEN in-memory upsert paths
    * into the persisted artifacts with NO full-artifact rewrite:
    *
    *  - IVF: the canonical +0.05/+200000 delta is assigned to the
    *    EXISTING centroids (the q_ann_ivf_upsert rule — exact
    *    squared-L2, strict <, tie → lowest cluster) and appended as
    *    NEW files under its `cluster=` partitions; standing files are
    *    untouched (IndexStoreSpec pins this byte-for-byte).
    *  - BM25: delta postings/lengths appended (the q_bm25_upsert
    *    merge); the 1-row totals and the vocabulary-sized terms table
    *    are rewritten — idf is a function of the new corpus size, so
    *    every terms row changes; both are bounded far below the corpus.
    *  - PQ: the delta is encoded with the EXISTING codebooks (frozen
    *    quantizer, the same staleness story as the IVF centroids —
    *    q_ann_drift is the retrain signal) and appended.
    *  - Manifest: append-only artifacts update ARITHMETICALLY — the
    *    checksum is an order-independent Σ mod 2⁶¹−1, so the merged
    *    checksum is (old + delta) mod M computed from DELTA-sized
    *    stats jobs; only the rewritten bounded frames recompute.
    *
    * The append works on a FILE-LEVEL CLONE of the standing store
    * (driver-side Hadoop FileUtil copy, not a Spark job) so the
    * un-appended root keeps serving q_index_persist in the same
    * session; a production deployment appends in place and skips the
    * clone. Returns the appended root, memoized per (session, dir).
    */
  def append(s: SparkSession, d: String): String = appendedCache.getOrElseUpdate(s, d) {
    val src = save(s, d)
    val root = appendedRoot(d)
    val conf = s.sparkContext.hadoopConfiguration
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(conf)
    fs.delete(rp, true)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(src), fs, rp, false, conf)

    val oldManifest = s.read.parquet(sub(root, "manifest"))
      .select("artifact", "n_rows", "checksum", "meta").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

    // IVF + PQ share one delta-vector frame (bounded: |delta| rows).
    // Persists released in the finally — a mid-append failure (e.g. a
    // full disk during a delta write) must not leak cached lineages
    // into the long-lived session (r18 review). EVERY action after the
    // first persist runs inside the try (r19, ADVICE r18: readCodebooks
    // is a .collect() — a failure there previously leaked dVecs and
    // dAssigned), so the vars start null and the finally unpersists
    // whatever was reached.
    val dVecs = graft.queries.VectorQueries.upsertAppended(s, d)
      .select(col("vec_id"),
        graft.functions.VectorOps.toDoubleArr(col("embedding")).as("e"))
      .persist()
    var dAssigned: DataFrame = null
    var dCodes: DataFrame = null
    try {
      val centroids = s.read.parquet(sub(root, "ivf_centroids"))
      dAssigned = AnnIvf.assignNearest(dVecs, "vec_id", centroids).persist()
      dCodes = PqOps.encode(dVecs, "vec_id", "e", readCodebooks(s, root))
        .persist()
      // BM25: the memoized upsert-merge state (build_bm25_upsert) IS
      // the delta + merged frames — postings/lens append (dLens comes
      // FROM the state so the durable lens can never drift from the
      // in-memory lens2), totals + terms (vocab-sized, written at
      // parallelism) rewrite. The six writes target disjoint artifact
      // dirs — overlapped (r18 opt, guide §2.6); the stats job below
      // runs strictly after (it re-reads the rewritten bm25_g/terms).
      val st = graft.queries.CorpusQueries.bm25UpsertState(s, d)
      inParallel(Seq(
        () => dAssigned.write.mode("append").partitionBy("cluster")
          .parquet(sub(root, "ivf_assigned")),
        () => dCodes.write.mode("append").parquet(sub(root, "pq_codes")),
        () => st.dPost.write.mode("append").parquet(sub(root, "bm25_post")),
        () => st.dLens.write.mode("append").parquet(sub(root, "bm25_lens")),
        () => st.g2.coalesce(1).write.mode("overwrite").parquet(sub(root, "bm25_g")),
        () => s.read.parquet(st.termsPath).repartition(col("tok")).write
          .mode("overwrite").parquet(sub(root, "bm25_terms"))))

      // ONE stats job for all six changing manifest rows (r18 opt —
      // guide §1.2 "don't pay a driver wave per scalar"): the four
      // delta frames (append arithmetic) and the two rewritten bounded
      // artifacts (full recompute over the new files) union into a
      // single tagged aggregation instead of six sequential .head()
      // actions. Renders go through renderColFor, the same column the
      // standing manifest rows used — checksum merging stays sound.
      val statSources: Seq[(String, DataFrame)] = Seq(
        "ivf_assigned" -> dAssigned,
        "bm25_post" -> st.dPost,
        "bm25_lens" -> st.dLens,
        "pq_codes" -> dCodes,
        "bm25_g" -> s.read.parquet(sub(root, "bm25_g")),
        "bm25_terms" -> s.read.parquet(sub(root, "bm25_terms")))
      val statRows = statSources.map { case (name, df) =>
          df.select(renderColFor(name).as("_r"))
            .select(lit(name).as("artifact"), expr(hashExprSql).as("h"))
        }.reduce(_.unionAll(_))
        .groupBy("artifact")
        .agg(count(lit(1)).as("n_rows"),
          expr(checksumAggSql("h")).as("checksum"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val appended = Set("ivf_assigned", "bm25_post", "bm25_lens", "pq_codes")
      val rewritten = Set("bm25_g", "bm25_terms")
      val sp = s
      import sp.implicits._
      val rows = ArtifactNames.map { name =>
        val (oldN, oldC, meta) = oldManifest(name)
        if (appended(name)) {
          // an EMPTY delta contributes no group row — (0, 0), the same
          // no-op the old per-frame global aggregate produced (r18
          // review: Map.apply crashed on a dir with an empty delta)
          val (dn, dc) = statRows.getOrElse(name, (0L, 0L))
          (name, oldN + dn, (oldC + dc) % ChecksumMod, meta)
        } else if (rewritten(name)) {
          val (n, c) = statRows.getOrElse(name, (0L, 0L))
          (name, n, c, meta)
        } else (name, oldN, oldC, meta)
      }
      rows.toDF("artifact", "n_rows", "checksum", "meta")
        .coalesce(1).write.mode("overwrite").parquet(sub(root, "manifest"))
    } finally {
      dVecs.unpersist()
      if (dAssigned != null) dAssigned.unpersist()
      if (dCodes != null) dCodes.unpersist()
    }
    root
  }

  def compactedRoot(d: String): String = java.nio.file.Paths
    .get(sys.props("java.io.tmpdir"),
      "graft_index_store_cp_" + graft.Scratch.dirTag(d)).toString

  private val compactedCache = new graft.SessionCache[String]

  /** Small-file compaction of an appended store (r18 — the third leg
    * of the durable-index lifecycle: save → append → COMPACT → serve,
    * the Iceberg/Delta `rewrite_data_files` maintenance analog). Every
    * [[append]] adds delta-sized files; after enough batches the
    * per-list/per-scan file count, not the data, dominates open-file
    * and footer overhead. Compaction rewrites ONLY the four
    * append-accumulating artifacts, consolidated:
    *
    *  - `ivf_assigned`: repartition by `cluster` then partitionBy —
    *    each list lands wholly in one shuffle partition, so exactly
    *    ONE file per `cluster=` partition (build + k appends → 1).
    *  - `bm25_post` / `bm25_lens` / `pq_codes`: rehashed to the
    *    session's shuffle parallelism — file count becomes O(cores),
    *    independent of how many appends accumulated.
    *
    * Content is byte-for-byte preserved BY CONSTRUCTION, so the
    * bounded artifacts and the MANIFEST are file-copied unchanged —
    * the existing checksums must still verify over the rewritten
    * files, which is exactly what IndexStoreSpec (and a production
    * compactor's post-write gate) recomputes. q_index_compact serves
    * from the compacted root and shares q_index_persist_upsert's
    * full-rebuild oracle verbatim: compaction that changes ANY served
    * answer or checksum flips the hash.
    */
  def compact(s: SparkSession, d: String): String = compactedCache.getOrElseUpdate(s, d) {
    val src = append(s, d)
    val root = compactedRoot(d)
    val conf = s.sparkContext.hadoopConfiguration
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(conf)
    fs.delete(rp, true)
    fs.mkdirs(rp)
    for (name <- Seq("ivf_centroids", "pq_codebooks", "bm25_g", "bm25_terms",
        "manifest"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(sub(src, name)), fs,
        new org.apache.hadoop.fs.Path(sub(root, name)), false, conf)
    // the four consolidation rewrites are independent jobs — overlapped
    // (r18 opt, guide §2.6)
    inParallel(Seq(
      () => s.read.parquet(sub(src, "ivf_assigned"))
        .repartition(col("cluster")).write.mode("overwrite")
        .partitionBy("cluster").parquet(sub(root, "ivf_assigned")),
      () => s.read.parquet(sub(src, "bm25_post")).repartition(col("doc_id"))
        .write.mode("overwrite").parquet(sub(root, "bm25_post")),
      () => s.read.parquet(sub(src, "bm25_lens")).repartition(col("doc_id"))
        .write.mode("overwrite").parquet(sub(root, "bm25_lens")),
      () => s.read.parquet(sub(src, "pq_codes")).repartition(col("vec_id"))
        .write.mode("overwrite").parquet(sub(root, "pq_codes"))))
    root
  }
}
