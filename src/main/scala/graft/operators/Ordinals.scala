package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, expr, lit, max, min, row_number, sum}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField}

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

  /** Adaptive per-group prefix sum (VERDICT r10 #3's corpus-shape
    * switch): the plain per-group running window when EVERY group is
    * small enough that its whole-group window task is bounded (≤
    * `smallGroupMax` rows — one task sorting 64k rows is cheap and the
    * single-window plan avoids [[bucketedPrefixSum]]'s extra aggregate
    * + join), and the bucketed two-level form — bit-identical by
    * construction and by test — once ANY group exceeds it (a 100 TB
    * corpus with O(10) sources would otherwise funnel through O(10)
    * window tasks). The gate costs one `groupBy(part).count()` over a
    * single column — negligible next to the prefix sum it protects,
    * and the same corpus statistic an optimizer would consult.
    *
    * The gate aggregates `df.select(part)` so Catalyst prunes every
    * other column out of the count job (in the pack query the value
    * column is a tokenization — the gate must not pay it); the window
    * branch consumes `df` exactly once, so only the bucketed branch
    * (two consumers) persists the input.
    */
  def prefixSum(df: DataFrame, part: String, ord: String,
      valueCol: String, name: String, smallGroupMax: Long = 65536L,
      knownMaxGroup: Option[Long] = None): DataFrame = {
    // callers that hold the statistic in the graft.Stats catalog pass
    // it through and skip the gate's count job (the rankAndCount
    // precedent). Any sound UPPER bound is safe: both branches are
    // bit-identical, the gate is purely a physical-shape choice.
    val maxGroup = knownMaxGroup.getOrElse(
      df.select(col(part)).groupBy(col(part)).count()
        .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0))
    if (maxGroup <= smallGroupMax) {
      val w = Window.partitionBy(col(part)).orderBy(col(ord))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(name, sum(col(valueCol)).over(w))
    } else {
      // bucketedPrefixSum's bucket key is `ord DIV bucketSize`, so it
      // needs a non-negative integral ord. A non-integral order key
      // (e.g. q_token_budget's (-quality_bp, doc_id) struct) is first
      // ordinal-ized under (part, ord) — the global ordinal is positive,
      // unique, and ascends with ord within every part, so the bucketed
      // sum over it is the identical prefix sum. Caught by the 100×
      // rehearsal: the struct ord hit the gate only past 64k rows.
      val integral = df.schema(ord).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
      if (integral)
        bucketedPrefixSum(graft.Scratch.persist(df), part, ord, valueCol, name)
      else
        bucketedPrefixSum(
          graft.Scratch.persist(
            withGlobalOrdinal(df, "_psord", col(part), col(ord))),
          part, "_psord", valueCol, name).drop("_psord")
    }
  }

  /** Adaptive per-group rank (VERDICT r14 #2's corpus-shape switch for
    * RANK, the analog of [[prefixSum]]): appends `rnName` = row_number
    * within `part` under `order` (which MUST include a unique tie-break
    * column — same total-order precondition as [[withGlobalOrdinal]])
    * and, when `nName` is set, the group size; both BIGINT.
    *
    * Plain two-window form while EVERY group fits one bounded window
    * task (≤ `smallGroupMax` rows — the count window rides the rank's
    * existing exchange+sort, A/B-measured faster than a groupBy-count
    * broadcast join at bench SFs). Past the gate — an O(5-10)-cardinality
    * partition key at 100× funnels n/5 rows through ONE sort task — the
    * rank becomes a range-partitioned global ordinal over
    * (part, order...) (distributed sort + zipWithIndex, no
    * single-partition stage) re-based per group by a broadcast
    * min-ordinal join: bit-identical to the window because the ordinal
    * is taken under the same total order, so within a group
    * `ordinal − min(ordinal) + 1` IS the row_number. The gate is the
    * same one-column count [[prefixSum]] uses.
    */
  def rankAndCount(df: DataFrame, part: String, order: Seq[Column],
      rnName: String, nName: Option[String],
      smallGroupMax: Long = 65536L,
      knownMaxGroup: Option[Long] = None): DataFrame = {
    // callers that already hold the group-size table (q_outliers_mad
    // derives n per group anyway) pass the max through and skip the
    // gate's count job
    val maxGroup = knownMaxGroup.getOrElse(
      df.select(col(part)).groupBy(col(part)).count()
        .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0))
    if (maxGroup <= smallGroupMax) {
      val w = Window.partitionBy(col(part))
      val ranked = df.withColumn(rnName,
        row_number().over(w.orderBy(order: _*)).cast(LongType))
      nName.fold(ranked)(n => ranked.withColumn(n, count(lit(1)).over(w)))
    } else {
      // two consumers (offsets + re-base join) — persist the ordinal pass
      val withOrd = graft.Scratch.persist(
        withGlobalOrdinal(df, "_gord", (col(part) +: order): _*))
      val offs = withOrd.groupBy(col(part))
        .agg(min(col("_gord")).as("_goff"),
          count(lit(1)).as(nName.getOrElse("_n_drop")))
        .withColumnRenamed(part, "_part_r")
      // null-safe on the group key for parity with the window branch
      // (same reasoning as bucketedPrefixSum)
      withOrd.join(broadcast(offs), col(part) <=> col("_part_r"))
        .withColumn(rnName, col("_gord") - col("_goff") + lit(1L))
        .drop("_gord", "_goff", "_part_r",
          nName.fold("_n_drop")(_ => "_gone"))
    }
  }

  /** Appends `name` = inclusive running Σ`valueCol` (BIGINT) within each
    * `part` group ordered by `ord` — the prefix-sum analog of
    * [[withGlobalOrdinal]], safe when one group dominates.
    *
    * A plain `sum().over(Window.partitionBy(part).orderBy(ord))` puts a
    * whole group in ONE window task, so parallelism = group count — a
    * scale-killer for a corpus with O(10) sources (VERDICT r10 on
    * q_pack_sequences). Here the prefix sum is hierarchical:
    *   1. `bucket = ord DIV bucketSize` — order-aligned with `ord`, so a
    *      per-(part, bucket) running sum is a window over ≤bucketSize
    *      rows, and a single giant group fans out across its buckets;
    *   2. per-(part, bucket) TOTALS get an exclusive per-part running
    *      offset via a window over bucket rows only — rows/bucketSize of
    *      them, e.g. 10^10 docs at B=4096 → a 2.4M-tiny-row worst task
    *      instead of a 10^10-row one;
    *   3. offsets join back on (part, bucket) — an aggregate-sized frame
    *      AQE broadcasts.
    * All-integer and order-deterministic, so the result is bit-identical
    * to the naive window (the DuckDB twins keep the 1-window SQL form).
    *
    * Preconditions: `ord` is a non-negative integral column, unique
    * within its group; `valueCol` is BIGINT.
    */
  def bucketedPrefixSum(df: DataFrame, part: String, ord: String,
      valueCol: String, name: String, bucketSize: Long = 4096L): DataFrame = {
    val bucketed = df.withColumn("_bkt", expr(s"$ord DIV $bucketSize"))
    val inBucket = Window.partitionBy(col(part), col("_bkt")).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val beforeBucket = Window.partitionBy(col(part)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col(part), col("_bkt"))
      .agg(sum(col(valueCol)).as("_bt"))
      .withColumn("_off", coalesce(sum(col("_bt")).over(beforeBucket), lit(0L)))
      .select(col(part), col("_bkt"), col("_off"))
    // null-safe on the group key: an equi-join would silently DROP rows
    // whose `part` is NULL, while the window branch (and a SQL
    // PARTITION BY) keeps a NULL partition — the two branches must stay
    // bit-identical on any input. `_bkt` is non-null by the `ord`
    // precondition, so a plain equality suffices there.
    val off = offsets
      .withColumnRenamed(part, "_part_r").withColumnRenamed("_bkt", "_bkt_r")
    bucketed
      .withColumn("_local", sum(col(valueCol)).over(inBucket))
      .join(off, col(part) <=> col("_part_r") && col("_bkt") === col("_bkt_r"))
      .withColumn(name, col("_local") + col("_off"))
      .drop("_bkt", "_local", "_off", "_part_r", "_bkt_r")
  }
}
