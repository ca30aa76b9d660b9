package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan fan-out for CPU-bound per-row kernels.
  *
  * The bench testdata tables are single sub-MB parquet files — one row
  * group, so Spark's file-split math gives the scan ONE partition no
  * matter the conf, and a narrow explode/kernel chain over it (shingle
  * hashing, bigram emission) runs its entire map side on one core while
  * 31 idle. [[spread]] round-robins such a scan out to the session's
  * default parallelism BEFORE the kernel — the shuffled payload is the
  * raw scan projection (sub-MB here), a cost three orders below the
  * kernel work it parallelizes.
  *
  * GROW-ONLY: inputs already at or above the session parallelism pass
  * through untouched, so at cluster scale — where a real corpus scan
  * arrives thousands of partitions wide — this is a no-op and can never
  * coalesce a wide table onto few executors.
  */
object Scans {

  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
