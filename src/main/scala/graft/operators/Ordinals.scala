package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Scale-safe global ordinals.
  *
  * The reference needs a total row order in two places: resume offsets
  * (preprocessing_agent.py:388-397) and positional zips
  * (graph_creator.py:187-189). The naive Spark translation —
  * `row_number().over(Window.orderBy(...))` with no partitioning — funnels
  * the whole table through ONE task (the `WindowExec: No Partition
  * Defined` warning), which is a scale-killer at 100 TB.
  *
  * This is the classic two-pass zipWithIndex pattern instead:
  *   1. range-partition + sort within partitions on the order keys, so
  *      partition i holds strictly lower keys than partition i+1;
  *   2. `RDD.zipWithIndex` — one lightweight job to count rows per
  *      partition, then per-partition offsets are added in parallel.
  * No single-partition stage ever exists; the sort is the same shuffle a
  * global `orderBy` would do.
  *
  * Precondition: the order keys must be a total order (include a unique
  * tie-break column) or ordinals within ties are nondeterministic.
  */
object Ordinals {

  /** Appends `name` = 1-based global ordinal (BIGINT) under `order`. */
  def withGlobalOrdinal(df: DataFrame, name: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(StructField(name, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }
}
