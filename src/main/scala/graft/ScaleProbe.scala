package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for SCALE.md: measures a scale lever directly instead of
  * arguing it. `runMain graft.ScaleProbe <sfDir> <bits,bits,...>` runs
  * the multi-probe embedding near-dup pair generator at each sign-LSH
  * bit width and prints wall seconds + pair counts — demonstrating that
  * growing the bucket count with the corpus (constant occupancy)
  * restores linear candidate work where a FIXED bucket count is
  * quadratic (n²/2^bits candidate pairs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "nsw") println(nswProbe(spark, dir))
    else println(bitsProbe(spark, dir, mode))
    spark.stop()
  }

  private def bitsProbe(spark: SparkSession, dir: String, arg: String): String =
    arg.split(",").map(_.trim.toInt).map { b =>
      // cold per width: drop the memoized bucket table
      graft.queries.DedupQueries.clearCache()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val pairs = graft.queries.DedupQueries.embedPairsMp(spark, dir, b).count()
      val dt = (System.nanoTime() - t0) / 1e9
      f"""{"bits":$b,"pairs":$pairs,"sec":$dt%.3f}"""
    }.mkString("[", ",", "]")

  /** NSW scale probe (`runMain graft.ScaleProbe <sfDir> nsw`): IVF+NSW
    * build and bounded-walk search timed separately over the dir's
    * embeddings, with recall@10 vs the exact scan of the probed lists.
    * nList grows with the corpus (≈500 vectors/list), so the per-list
    * graph build stays constant-size — the claim SCALE.md records.
    */
  private def nswProbe(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIvf, AnnNsw}
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val nList = math.max(4, (n / 500).toInt)
    var t0 = System.nanoTime()
    val ivf = AnnIvf.buildIndex(emb, "vec_id", "embedding", nList)
    val nsw = AnnNsw.buildGraph(ivf, m = 8)
    nsw.graph.queryExecution.toRdd.foreachPartition(_ => ())
    val buildS = (System.nanoTime() - t0) / 1e9
    val probes = emb.limit(100).select(col("vec_id").as("pid"), col("embedding"))
      .persist()
    probes.count()
    t0 = System.nanoTime()
    val walk = AnnNsw.topK(nsw, probes, "pid", "embedding",
      k = 10, nProbe = 2, efSearch = 64)
      .select("probe_id", "vec_id").collect().map(_.toSeq).toSet
    val searchS = (System.nanoTime() - t0) / 1e9
    val exact = AnnIvf.topK(ivf, probes, "pid", "embedding",
      k = 10, nProbe = 2)
      .select("probe_id", "vec_id").collect().map(_.toSeq).toSet
    val recallBp = walk.intersect(exact).size * 10000L / math.max(1, exact.size)
    f"""{"n":$n,"nList":$nList,"build_sec":$buildS%.3f,"search_sec":$searchS%.3f,"recall_bp":$recallBp}"""
  }
}
