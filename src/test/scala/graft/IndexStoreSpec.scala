package graft

/** Durable index persistence (r17 — VERDICT r16 #1): a FRESH
  * SparkSession must answer q_ann_ivf / q_bm25_topk / q_pq_encode from
  * the loaded parquet artifacts — identical rows to the standing
  * session's memo-served answers — with ZERO builder rebuilds (the
  * builder memo caches of the fresh session stay empty), and the
  * manifest's content checksums must match a recompute over the loaded
  * files (the integrity gate a production load runs before serving).
  */
class IndexStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fresh session serves ivf/bm25/pq from the loaded artifact, zero rebuilds") {
    // standing session: build the memos, compute the reference answers
    val standingIvf = SparkEntry.queries("q_ann_ivf")(spark, sf).collect().toSet
    val standingBm = SparkEntry.queries("q_bm25_topk")(spark, sf).collect().toSet
    val standingPq = SparkEntry.queries("q_pq_encode")(spark, sf).collect().toSet
    val root = operators.IndexStore.save(spark, sf)

    // the restart: a fresh session with no memo state of its own
    val s2 = spark.newSession()
    val lx = operators.IndexStore.load(s2, root)
    val servedIvf = queries.VectorQueries.ivfTopkFrom(s2, sf, lx.ivf)
      .collect().toSet
    val servedBm = queries.CorpusQueries.bm25TopkFrom(s2, sf,
      lx.bm25Post, lx.bm25Lens, lx.bm25G, lx.bm25TermsPath).collect().toSet
    val servedPq = queries.VectorQueries.pqEncodeFrom(lx.pq).collect().toSet
    assert(servedIvf == standingIvf, "loaded IVF serve diverges")
    assert(servedBm == standingBm, "loaded BM25 serve diverges")
    assert(servedPq == standingPq, "loaded PQ serve diverges")

    // zero rebuild: serving never touched a builder — the fresh
    // session's memo caches hold nothing
    assert(queries.VectorQueries.ivfCacheCount(s2) == 0, "IVF was rebuilt")
    assert(queries.VectorQueries.pqCacheCount(s2) == 0, "PQ was rebuilt")
    assert(queries.CorpusQueries.bm25CacheCount(s2) == 0, "BM25 was rebuilt")
  }

  test("manifest checksums match a recompute over the loaded artifacts") {
    val root = operators.IndexStore.save(spark, sf)
    val man = spark.read.parquet(root + "/manifest").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(man.keySet == operators.IndexStore.ArtifactNames.toSet)
    operators.IndexStore.ArtifactNames.foreach { name =>
      val rec = operators.IndexStore.recomputedRow(spark, root, name).head()
      assert(rec.getLong(1) == man(name).getAs[Long]("n_rows"),
        s"$name row count drifted between save and load")
      assert(rec.getLong(2) == man(name).getAs[Long]("checksum"),
        s"$name content checksum drifted between save and load")
    }
    // shape metadata rides the relevant rows
    assert(man("ivf_centroids").getAs[String]("meta").contains("dim=") &&
      man("ivf_centroids").getAs[String]("meta").contains("nlist="))
    assert(man("pq_codebooks").getAs[String]("meta").contains("m=") &&
      man("pq_codebooks").getAs[String]("meta").contains("dsub="))
  }

  // ---- incremental append (r18 — VERDICT r17 next #1) ----

  private def dataFiles(dir: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val rel = base.relativize(p).toString
        if (rel.endsWith(".parquet")) out(rel) = java.nio.file.Files.size(p)
      }
    }
    out.toMap
  }

  test("append adds delta files only — every standing data file survives byte-identical") {
    val src = operators.IndexStore.save(spark, sf)
    val root = operators.IndexStore.append(spark, sf)
    // the append-only artifacts: pre-append (= standing store) files
    // must all still exist at the same size, plus new delta files
    for (name <- Seq("ivf_assigned", "bm25_post", "bm25_lens", "pq_codes")) {
      val before = dataFiles(src + "/" + name)
      val after = dataFiles(root + "/" + name)
      assert(before.nonEmpty, s"$name: standing store has no files")
      before.foreach { case (rel, size) =>
        assert(after.get(rel).contains(size),
          s"$name: standing file $rel was rewritten or lost by append")
      }
      assert(after.size > before.size,
        s"$name: append added no delta files")
    }
  }

  test("appended manifest rows equal the arithmetic merge AND a full recompute") {
    val root = operators.IndexStore.append(spark, sf)
    val man = spark.read.parquet(root + "/manifest").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(man.keySet == operators.IndexStore.ArtifactNames.toSet)
    // the stored (arithmetically merged) rows must equal an independent
    // full recompute over the appended files — proves the merge lost
    // nothing and the delta render matched the artifact render
    operators.IndexStore.ArtifactNames.foreach { name =>
      val rec = operators.IndexStore.recomputedRow(spark, root, name).head()
      assert(rec.getLong(1) == man(name).getAs[Long]("n_rows"),
        s"$name: merged row count != full recompute")
      assert(rec.getLong(2) == man(name).getAs[Long]("checksum"),
        s"$name: merged checksum != full recompute")
    }
    // and the appended store is strictly bigger on the append-only
    // artifacts than the standing one
    val src = operators.IndexStore.save(spark, sf)
    val srcMan = spark.read.parquet(src + "/manifest").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    for (name <- Seq("ivf_assigned", "bm25_post", "bm25_lens", "pq_codes"))
      assert(man(name).getAs[Long]("n_rows") > srcMan(name),
        s"$name: append added no rows")
  }

  test("compaction shrinks file counts while preserving every manifest checksum") {
    val aroot = operators.IndexStore.append(spark, sf)
    val croot = operators.IndexStore.compact(spark, sf)
    // consolidated: strictly fewer (or equal) data files on every
    // append-accumulating artifact, strictly fewer in total
    val names = Seq("ivf_assigned", "bm25_post", "bm25_lens", "pq_codes")
    val before = names.map(n => dataFiles(aroot + "/" + n).size)
    val after = names.map(n => dataFiles(croot + "/" + n).size)
    names.lazyZip(before).lazyZip(after).foreach { (n, b, a) =>
      assert(a <= b, s"$n: compaction grew the file count ($b -> $a)")
    }
    assert(after.sum < before.sum,
      s"compaction consolidated nothing (${before.sum} -> ${after.sum})")
    // content no-op: the COPIED manifest still verifies over the
    // rewritten files — the compactor's post-write gate
    operators.IndexStore.ArtifactNames.foreach { name =>
      val man = spark.read.parquet(croot + "/manifest")
        .collect().map(r => r.getString(0) -> r).toMap.apply(name)
      val rec = operators.IndexStore.recomputedRow(spark, croot, name).head()
      assert(rec.getLong(1) == man.getAs[Long]("n_rows"),
        s"$name: compaction changed the row count")
      assert(rec.getLong(2) == man.getAs[Long]("checksum"),
        s"$name: compaction changed the content checksum")
    }
  }

  test("fresh session serves from the APPENDED store with zero rebuilds") {
    val root = operators.IndexStore.append(spark, sf)
    val standing = SparkEntry.queries("q_index_persist_upsert")(spark, sf)
      .collect().toSet
    val s2 = spark.newSession()
    val lx = operators.IndexStore.load(s2, root)
    val servedIvf = queries.VectorQueries.ivfTopkFrom(s2, sf, lx.ivf).collect()
    assert(servedIvf.nonEmpty)
    assert(queries.VectorQueries.ivfCacheCount(s2) == 0, "IVF was rebuilt")
    assert(queries.VectorQueries.pqCacheCount(s2) == 0, "PQ was rebuilt")
    assert(queries.CorpusQueries.bm25CacheCount(s2) == 0, "BM25 was rebuilt")
    assert(standing.nonEmpty)
  }
}
