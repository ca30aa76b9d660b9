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
    val bits = args(1).split(",").map(_.trim.toInt)
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
    val out = bits.map { b =>
      // cold per width: drop the memoized bucket table
      graft.queries.DedupQueries.clearCache()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val pairs = graft.queries.DedupQueries.embedPairsMp(spark, dir, b).count()
      val dt = (System.nanoTime() - t0) / 1e9
      f"""{"bits":$b,"pairs":$pairs,"sec":$dt%.3f}"""
    }
    println(out.mkString("[", ",", "]"))
    spark.stop()
  }
}
