package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-bucket guard for bucketed candidate generators (MinHash bands,
  * shingle postings, LSH buckets).
  *
  * Every dedup/ANN candidate generator here is a self-equi-join on a
  * bucket key, which is n_b² pairs PER BUCKET: one boilerplate-heavy
  * bucket of a million postings is 10¹² pairs — the single way these
  * otherwise-linear plans go quadratic at 100 TB. The guard bounds each
  * bucket to `maxDf` postings BEFORE the join (deterministic keep:
  * lowest ids), so the worst bucket contributes maxDf² pairs and the
  * join's total work is ≤ buckets × maxDf².
  *
  * Dropping postings in a hot bucket is the standard trade (the Jaccard
  * query's df≤10 shingle cap is the same move, DedupQueries.scala): a
  * bucket that hot is boilerplate, and its members still pair with each
  * other through their OTHER bands/shingles — near-dup recall for
  * non-boilerplate pairs is unaffected (asserted on an adversarial
  * corpus in ScaleOpsSpec).
  *
  * Scale shape: one PARTITIONED window over the bucket key — same
  * shuffle the join needs anyway, no extra exchange, never a global
  * sort.
  */
object BucketCap {

  def cap(postings: DataFrame, bucketCols: Seq[String], idCol: String,
      maxDf: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val buckets: Seq[Column] = bucketCols.map(col)
    postings
      .withColumn("_df_rn", row_number().over(
        Window.partitionBy(buckets: _*).orderBy(col(idCol))))
      .filter(col("_df_rn") <= maxDf)
      .drop("_df_rn")
  }
}
