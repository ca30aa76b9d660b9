package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.clustering.GraphBuild

/** IVF (inverted-file) approximate nearest neighbour over an embedding
  * column — the "coarse quantizer + probe few lists" scale path for
  * O-56, complementing the exact brute-force baseline (`o56_ann_topk`)
  * and the sign-LSH bucket join (`q_dedup_embed`).
  *
  * Index: KMeans centroids partition the corpus into nList inverted
  * lists (`cluster` column — at rest this would be the partition key of
  * the index table, so a probe reads only its lists' files). Search:
  * each probe scores the nList centroids (tiny, broadcast), keeps its
  * `nProbe` nearest lists, and scans ONLY vectors in those lists via an
  * equi-join on the list id — corpus touched ≈ nProbe/nList of the data,
  * which is the entire point at 100 TB.
  *
  * With nProbe == nList this degrades to exact brute force (asserted in
  * tests); smaller nProbe trades recall for a proportional scan cut.
  */
object AnnIvf {

  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame, idCol: String)

  /** Build the inverted lists: (id, e, cluster) + a centroid table. */
  def buildIndex(emb: DataFrame, idCol: String, arrCol: String,
      nList: Int): IvfIndex = {
    require(!Seq("e", "probe_id", "pv", "cluster").contains(idCol),
      s"idCol '$idCol' collides with an internal column name")
    val spark = emb.sparkSession
    import spark.implicits._
    // persisted: KMeans iterates this frame ~20x, and the inverted-list
    // join consumes it again — an index build reads the corpus once
    val doubled = emb.select(col(idCol), VectorOps.toDoubleArr(col(arrCol)).as("e"))
      .persist()
    val (labels, centers) = GraphBuild.microCluster(doubled, idCol, "e", maxMicro = nList)
    val cents = centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cluster", "centroid")
      .select(col("cluster"), col("centroid").cast("array<double>").as("centroid"))
    // the materialized index: persisted so every topK call scans the
    // (small) lists table, not the original corpus lineage twice
    IvfIndex(doubled.join(labels, idCol).persist(), cents, idCol)
  }

  /** Append new vectors WITHOUT a rebuild (index maintenance for a
    * continuously refreshed corpus): each new vector is assigned to its
    * nearest EXISTING centroid — broadcast of the tiny centroid table +
    * a per-id argmin, no KMeans, no full-corpus pass — and unioned into
    * the inverted lists with a generation marker. At 100 TB this is the
    * only affordable ingest path: a rebuild re-clusters the whole
    * corpus; an append touches only the arriving batch. Recall for
    * appended vectors degrades as they drift from the frozen centroids —
    * [[assignDrift]] is the retrain signal.
    */
  def appendToIndex(index: IvfIndex, newVecs: DataFrame, arrCol: String): IvfIndex = {
    val nv = newVecs.select(col(index.idCol),
      VectorOps.toDoubleArr(col(arrCol)).as("e"))
    val assignedNew = nv.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", VectorOps.l2DistanceNative(col("e"), col("centroid")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(index.idCol).orderBy(col("cdist"), col("cluster"))))
      .filter(col("crk") === 1)
      .select(col(index.idCol), col("e"), col("cluster"), lit(1).as("gen"))
    index.copy(assigned = withGen(index.assigned).unionByName(assignedNew))
  }

  // builds carry no generation column; appended rows are gen=1
  private def withGen(assigned: DataFrame): DataFrame =
    if (assigned.columns.contains("gen")) assigned
    else assigned.withColumn("gen", lit(0))

  /** Staleness metric: per-generation count + mean distance to the
    * owning centroid. When the appended generation's mean assign
    * distance drifts above the build generation's, the frozen coarse
    * quantizer no longer represents the corpus — the retrain trigger a
    * production deployment would alert on.
    */
  def assignDrift(index: IvfIndex): DataFrame =
    withGen(index.assigned).join(broadcast(index.centroids), Seq("cluster"))
      .groupBy(col("gen").cast("long").as("gen"))
      .agg(count(lit(1)).as("n"),
        avg(VectorOps.l2DistanceNative(col("e"), col("centroid"))).as("mean_dist"))

  /** Cosine top-k per probe, scanning only the nProbe nearest lists. */
  def topK(index: IvfIndex, probes: DataFrame, probeId: String,
      probeVec: String, k: Int, nProbe: Int): DataFrame = {
    val p = probes.select(col(probeId).as("probe_id"),
      VectorOps.toDoubleArr(col(probeVec)).as("pv"))
    // 1. probe × centroids (centroids are tiny → broadcast), keep nProbe
    val lists = p.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", VectorOps.l2DistanceNative(col("pv"), col("centroid")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cdist"), col("cluster"))))
      .filter(col("crk") <= nProbe)
      .select("probe_id", "pv", "cluster")
    // 2. equi-join on the list id — only the probed lists are scanned
    lists.join(index.assigned, Seq("cluster"))
      .select(col("probe_id"), col(index.idCol),
        (round(VectorOps.cosineSimilarityNative(col("e"), col("pv")), 6) + lit(0.0)).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("cos").desc, col(index.idCol))).cast("long"))
      .filter(col("rk") <= k)
  }
}
