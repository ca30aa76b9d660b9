package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-act feature extraction — the CineGraph core dataflow
  * (reference: clustering/graph_creator.py:72-115).
  *
  * Given a table of (groupKey, orderCol, metric...) rows — in the
  * reference, per-movie emotion windows — this:
  *   1. drops groups with fewer rows than `numActs`
  *      (O-10, graph_creator.py:88-89),
  *   2. splits each group's ordered rows into `numActs` near-equal
  *      contiguous acts with `ntile` (O-33; matches np.array_split's
  *      "first len % n acts get one extra row" exactly,
  *      graph_creator.py:96),
  *   3. computes the per-(group, act) mean of every metric (O-34,
  *      graph_creator.py:99-101) and the per-group sample stddev
  *      (O-35, ddof=1, graph_creator.py:102-105),
  *   4. pivots into one wide feature row per group
  *      (`{metric}_act{i}` + `{metric}_std` — D4 in SURVEY.md §1).
  *
  * Scale notes: the act assignment is a single window function over a
  * hash-partitioned shuffle on the group key; the feature aggregation is
  * a hash aggregate over the same key, so AQE can reuse the exchange. No
  * driver-side collection anywhere; groups are independent, so this
  * scales linearly with group count. Conditional aggregation (avg over
  * CASE) is used instead of `.pivot` so output column names are static
  * (needed by the oracle) and no extra pivot pass over the data runs.
  */
object ActFeatures {

  /** Wide per-group feature frame. Output columns:
    * groupKey, {metric}_act{1..numActs}, {metric}_std. Doubles rounded
    * to `roundTo` places so Spark and the DuckDB oracle hash identically
    * despite FP summation-order differences.
    */
  def actFeatures(
      df: DataFrame,
      groupKey: String,
      orderCols: Seq[String],
      metrics: Seq[String],
      numActs: Int = 3,
      roundTo: Int = 4): DataFrame = {
    val byGroup = Window.partitionBy(col(groupKey))
    // orderCols must be a unique key within the group: ntile with ties is
    // nondeterministic across engines and partition layouts.
    val ordered = byGroup.orderBy(orderCols.map(col): _*)
    // The "drop groups with < numActs rows" rule is enforced AFTER the
    // aggregation (HAVING-style filter on the group count) rather than
    // by a count-over-partition window before it (r13, VERDICT r12 #7):
    // the old shape ran a SECOND WindowExec pass over every row just to
    // materialize _cnt, while the group count falls out of the
    // aggregation for free. ntile per group is independent of other
    // groups, and a dropped group's aggregates are computed then
    // discarded — output-identical, one full row pass cheaper.
    val withAct = df.withColumn("_act", ntile(numActs).over(ordered))

    // Act means as exact scaled-BIGINT sums / non-null counts, then ONE
    // IEEE double division before rounding: plain double avg() partial-agg
    // order differs between engines and can flip the rounded hash on a
    // .xxxx5 boundary (inputs are exact at <= 4 decimal places; see
    // ExactAgg for why BIGINT beats the earlier decimal form).
    import graft.functions.ExactAgg.ssum4
    val actCols: Seq[Column] = for {
      m <- metrics
      a <- 1 to numActs
    } yield round(
      ssum4(when(col("_act") === a, col(m))) /
        count(when(col("_act") === a, lit(1))), roundTo)
      .as(s"${m}_act$a")
    val stdCols: Seq[Column] = metrics.map { m =>
      // closed form over exact Σx (scaled BIGINT, quantized to 4 dp like
      // the previous DECIMAL(18,4) cast) and Σx² (DECIMAL(28,8): callers
      // pass full-precision metrics — E1 feeds raw softmax probabilities —
      // so squares must keep 8 dp, and decimal also keeps the headroom
      // rule for large-magnitude metrics like l_extendedprice);
      // groups have >= numActs >= 2 rows so n-1 >= 1
      val sx = ssum4(col(m))
      val sxx = sum((col(m) * col(m)).cast("decimal(28,8)")).cast("double")
      val n = count(lit(1)).cast("double")
      // greatest(n-1, 1): identical for every KEPT group (n >= numActs
      // >= 2); only guards the soon-dropped n=1 groups' denominator
      round(sqrt(greatest((sxx - sx * sx / n) / greatest(n - 1, lit(1.0)), lit(0.0))), roundTo)
        .as(s"${m}_std")
    }
    val aggs = actCols ++ stdCols :+ count(lit(1)).as("_cnt")
    withAct.groupBy(col(groupKey)).agg(aggs.head, aggs.tail: _*)
      .filter(col("_cnt") >= lit(numActs))
      .drop("_cnt")
  }

  /** DuckDB twin of [[actFeatures]] (same column names, same rounding). */
  def actFeaturesSql(
      table: String,
      groupKey: String,
      orderCols: Seq[String],
      metrics: Seq[String],
      numActs: Int = 3,
      roundTo: Int = 4): String = {
    import graft.functions.ExactAgg.ssum4Sql
    val actCols = for {
      m <- metrics
      a <- 1 to numActs
    } yield s"round(${ssum4Sql(s"CASE WHEN _act = $a THEN $m END")}" +
      s" / count(CASE WHEN _act = $a THEN 1 END), $roundTo) AS ${m}_act$a"
    val stdCols = metrics.map { m =>
      val sx = ssum4Sql(m)
      val sxx = s"CAST(sum(CAST($m * $m AS DECIMAL(28,8))) AS DOUBLE)"
      val n = "CAST(count(*) AS DOUBLE)"
      s"round(sqrt(greatest(($sxx - $sx*$sx/$n) / greatest($n - 1, 1.0), 0.0)), $roundTo) AS ${m}_std"
    }
    val sel = (actCols ++ stdCols).mkString(", ")
    // HAVING mirrors the Spark side's post-aggregation group-count
    // filter (the count-over-partition window is gone on both sides)
    s"""WITH _acts AS (
       |  SELECT $groupKey, ${(orderCols ++ metrics).distinct.mkString(", ")},
       |         ntile($numActs) OVER (PARTITION BY $groupKey ORDER BY ${orderCols.mkString(", ")}) AS _act
       |  FROM $table)
       |SELECT $groupKey, $sel FROM _acts GROUP BY $groupKey HAVING count(*) >= $numActs""".stripMargin
  }
}
