package graft

import org.apache.spark.sql.functions._

/** E1 end-to-end pipeline invariants over the sf0.001 testdata. */
class PipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("E1: clean→window→infer→features→tree holds the reference invariants") {
    val t = Pipeline.e1(spark, sf)
    val g = t.graph.collect()
    val root = g.find(_.getAs[Long]("id") == 1L).get

    // docs surviving the <numActs window filter == movies in the tree
    val docs = Tables.documents(spark, sf)
    val eligible = docs
      .select(col("doc_id"),
        size(split(graft.functions.TextClean.cleanSubtitles(col("text")), " ")).as("n"))
      .filter(greatest(ceil(col("n") / 24.0), lit(1)) >= 3)
      .count()
    assert(root.getAs[Long]("count") == eligible,
      s"root count ${root.getAs[Long]("count")} != eligible docs $eligible")
    assert(t.movies.count() == eligible)
    assert(g.map(_.getAs[Int]("depth")).max <= 5)
    val leafSum = g.filter(_.getAs[String]("type") == "leaf")
      .map(_.getAs[Long]("count")).sum
    assert(leafSum == eligible, "leaves must partition the movies")
    // every movie's graph_id is a leaf in the graph table
    val leafIds = g.filter(_.getAs[String]("type") == "leaf")
      .map(_.getAs[Long]("id")).toSet
    val badAssign = t.movies.collect()
      .count(r => !leafIds.contains(r.getAs[Long]("graph_id")))
    assert(badAssign == 0)
  }

  test("E1 with the ONNX backend: the O-55 seam composes in the full DAG (r8 #5)") {
    // same pipeline, model swapped via the e1 parameter — the structural
    // invariants must be model-independent (eligibility, tree bounds,
    // leaf partitioning depend on windowing/clustering, not scores)
    val t = Pipeline.e1(spark, sf,
      model = () => new graft.operators.Inference.OnnxModel())
    val g = t.graph.collect()
    val root = g.find(_.getAs[Long]("id") == 1L).get
    val movies = t.movies.count()
    assert(root.getAs[Long]("count") == movies)
    assert(g.map(_.getAs[Int]("depth")).max <= 5)
    val leafSum = g.filter(_.getAs[String]("type") == "leaf")
      .map(_.getAs[Long]("count")).sum
    assert(leafSum == movies, "leaves must partition the movies")
  }

  test("semantic chunking: counts are consistent, boundaries segment real docs") {
    val rows = SparkEntry.queries("q_chunk_semantic")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nc) = (r.getAs[Long]("n_windows"), r.getAs[Long]("n_chunks"))
      assert(nc >= 1L && nc <= nw, s"chunk count out of range: $r")
      // a doc with b boundaries has b+1 chunks; their window ids are
      // positive, so the checksum is zero iff there are no boundaries
      assert((nc == 1L) == (r.getAs[Long]("boundary_sum") == 0L), s"checksum: $r")
      val mc = r.getAs[Double]("min_cos")
      // 2.0 is the no-pair sentinel (single-window doc)
      assert((mc >= -1.000001 && mc <= 1.000001) || (mc == 2.0 && nw == 1L), s"min_cos: $r")
      // boundary definition: the doc's minimum pair cosine decides
      if (nw > 1L) assert((nc > 1L) == (mc < queries.IoQueries.ChunkCosMin),
        s"boundary rule: $r")
    }
    // the threshold sits near the corpus p25 of PAIR cosines, so a
    // meaningful fraction of docs splits and a meaningful fraction
    // stays whole (measured 35% split at sf0.001) — both degenerate
    // extremes (nothing splits / everything splits) are bugs
    val split = rows.count(_.getAs[Long]("n_chunks") > 1L)
    assert(split * 5 >= rows.length && split * 10 <= rows.length * 9,
      s"degenerate segmentation: $split/${rows.length} docs split")
  }

  test("e1 features: the wide (DECIMAL) face is bit-identical to the LONG face") {
    // bench SFs never cross the widening gate (maxCnt > 1e5), so the
    // DECIMAL path is pinned here against the LONG path on a synthetic
    // quantized-window frame with uneven acts and boundary e4 values
    import spark.implicits._
    val labels = graft.operators.Inference.EmotionLabels
    val rows = for {
      doc <- 1L to 7L
      w <- 1L to (3 + doc % 4)
    } yield (doc, w, ((doc * 31 + w * 17) % 3 + 1).toInt)
    val base = rows.toDF("doc_id", "window_id", "_act")
    val df = labels.zipWithIndex.foldLeft(base) { case (acc, (m, i)) =>
      acc.withColumn(s"${m}_e4",
        expr(s"(doc_id * 997 + window_id * ${131 + i * 7}) % 10001"))
    }
    val long = graft.queries.IoQueries.e1FeatureFrame(df, labels, wide = false)
    val wide = graft.queries.IoQueries.e1FeatureFrame(df, labels, wide = true)
    assert(long.columns.toSeq === wide.columns.toSeq)
    assert(long.schema === wide.schema,
      "wide face must CAST every output back to BIGINT")
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(long.collect().map(key).sorted.toSeq ===
      wide.collect().map(key).sorted.toSeq)
  }
}
