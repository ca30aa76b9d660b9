package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ordinals, SkewJoin}

/** Extended relational surface (SURVEY §2.5/§2.6 "come free from Spark
  * built-ins"): rollup, anti join, and an as-of join — the ops the
  * reference never needed but a user of this engine gets, each with a
  * genuine cross-engine oracle.
  */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame

  /** ROLLUP aggregation levels; NULL level markers coalesced to
    * sentinels so both engines emit identical scalar rows.
    */
  private val rollupQ: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .rollup("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("bucket"), lit(-1L)).as("bucket"),
        col("n"), col("sum_value"))

  /** CUBE: all grouping combinations, same sentinel convention. */
  private val cubeQ: Q = (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("total"))

  /** Windowed moving aggregate: trailing 7-row mean of value per user —
    * partitioned rows-frame window (scale-safe), decimal sums so the
    * frame aggregation order can't flip the rounded hash.
    */
  private val movingQ: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-6, Window.currentRow)
    Tables.events(s, d)
      .withColumn("mov_avg",
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double") /
          count(lit(1)).over(w), 4) + lit(0.0))
      .select("user_id", "event_id", "mov_avg")
  }

  /** Anti join: customers with no high-value order (left_anti; the
    * unfiltered variant is vacuously empty in this data).
    */
  private val antiQ: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** AS-OF (backward) join: for every event, the most recent 'click'
    * timestamp by the same user at or before it. Spark lacks a native
    * as-of join; the scalable formulation is a per-user window carrying
    * `last(click_ts, ignoreNulls)` — one shuffle on user_id, no range
    * join explosion. The oracle uses DuckDB's NATIVE `ASOF JOIN`, so the
    * two different algorithms must agree on the semantics.
    */
  private val asofQ: Q = (s, d) => {
    // Two precision rules make the engines agree exactly:
    //  1. compare at µs — Spark reads the parquet TIMESTAMP(NANOS) as a
    //     ns long while DuckDB TRUNCATES to a µs timestamp on read, so
    //     an as-of comparison at ns precision can include/exclude a
    //     click differently at µs boundaries. Floor-divide FIRST (pmod
    //     form, exact for negative epochs too), window on the µs value.
    //  2. RANGE frame (not ROWS): ASOF's `e.ts >= c.ts` includes a click
    //     at the SAME timestamp regardless of tie-break order; within a
    //     tie every non-null click value is identical, so
    //     ignoreNulls-last is deterministic despite unspecified peer
    //     order.
    // integer DIV end-to-end: `/` would cast the ~1.7e18 ns long to
    // double and lose the low digits; pmod first keeps floor semantics
    // for negative epochs
    val tsUs = expr("(ts - pmod(ts, 1000L)) DIV 1000L")
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", tsUs)
      .withColumn("click_us", when(col("event_type") === "click", col("ts_us")))
      .withColumn("last_click_us", last(col("click_us"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("last_click_us"))
  }

  /** Bucketed co-located join: both sides written bucketed+sorted by
    * the join key, then joined WITHOUT any Exchange (the bucket layout
    * IS the shuffle, paid once at write time — the 100 TB pattern for
    * repeated joins on the same key). The oracle is the plain join, so
    * correctness of the bucket routing is hash-checked; the no-shuffle
    * property is asserted in ScaleOpsSpec.
    *
    * The bucketed-table WRITE is memoized per (session, dir) — it is
    * table PREPARATION, amortized over every later join exactly as in
    * production, so bench reps time the co-located JOIN, not a rewrite
    * of the same two tables 5× (VERDICT r7 "what's wrong" #4; the write
    * path itself stays timed under `q_parquet_compact`). Deliberately
    * NOT in `SparkEntry.clearCaches`: like the events time-split, the
    * layout is input staging, not query work.
    */
  private val bucketedTables = new graft.SessionCache[(String, String)]

  private val bucketedQ: Q = (s, d) => {
    val (t1, t2) = bucketedTables.getOrElseUpdate(s, d) {
      // dirTag for collision-proofing; dots stripped (illegal in table names)
      val suffix = graft.Scratch.dirTag(d).replaceAll("[^a-zA-Z0-9_]", "_")
      val (n1, n2) = (s"graft_ord_$suffix", s"graft_cust_$suffix")
      Seq(n1, n2).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val dir = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (dir.isDirectory) { dir.listFiles().foreach(_.delete()); dir.delete() }
      }
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(n1)
      Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(n2)
      (n1, n2)
    }
    s.table(t1).join(s.table(t2), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
  }

  /** Exact per-group DISCRETE quantiles (p50/p90/p99): the row at ordinal
    * ceil(p·n) in (value, event_id) order — pure integer index semantics,
    * so unlike interpolated percentile_cont (engine-specific FP
    * interpolation) the result is a real data value and hash-stable
    * cross-engine. Scale: one partitioned window per group (no global
    * window) + a broadcast 3-row quantile frame; the approximate
    * alternative at 100 TB is percentile_approx, traded here for
    * exactness the oracle can check.
    */
  private val quantQ: Q = (s, d) => {
    import s.implicits._
    val byType = Window.partitionBy("event_type")
    val e = Tables.events(s, d)
      .withColumn("rn", row_number().over(byType.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
    e.crossJoin(broadcast(Seq(50L, 90L, 99L).toDF("p_bp")))
      .filter(expr("rn = (p_bp * n + 99) DIV 100"))
      .select(col("event_type"), col("p_bp"), col("value").as("q_value"))
  }

  /** RANGE (interval-containment) join: events × derived campaign
    * periods, `ts BETWEEN start AND end`. A naive range join is a
    * BroadcastNestedLoop/cartesian at scale; the scale-correct Spark
    * shape is BUCKET + RESIDUAL: explode each period into the hour
    * buckets it covers (bounded fan-out = interval length / bucket
    * width), equi-join events on their hour bucket (hash-partitionable),
    * then apply the exact bounds as a residual filter. The oracle is
    * DuckDB's native BETWEEN join, so the bucket routing + residual must
    * reproduce exact containment semantics.
    *
    * Timestamps: parquet TIMESTAMP(NANOS) → compare at µs (the asofQ
    * rule — DuckDB truncates to µs on read); pmod-first floor division.
    */
  private val rangeQ: Q = (s, d) => {
    val HrUs = 3600000000L
    val ev = Tables.events(s, d)
      .withColumn("ts_us", expr("(ts - pmod(ts, 1000L)) DIV 1000L"))
      .withColumn("hb", expr(s"(ts_us - pmod(ts_us, ${HrUs}L)) DIV ${HrUs}L"))
    val minHr = ev.agg(min(expr(s"ts_us - pmod(ts_us, ${HrUs}L)")).as("min_hr_us"))
    // 10 deterministic 2.5-hour campaign periods, one every 5 hours,
    // offset 30 min into the hour so the bucket bounds are NOT aligned —
    // the residual predicate genuinely filters rows, proving the bucket
    // join alone is not doing the work.
    val periods = s.range(10).toDF("period_id")
      .crossJoin(broadcast(minHr))
      .withColumn("start_us", col("min_hr_us") + col("period_id") * (5 * HrUs) + lit(1800000000L))
      .withColumn("end_us", col("start_us") + lit(9000000000L))
      .withColumn("hb", explode(sequence(
        expr(s"start_us DIV ${HrUs}L"), expr(s"end_us DIV ${HrUs}L"))))
      .select("period_id", "start_us", "end_us", "hb")
    ev.join(broadcast(periods), Seq("hb"))
      .filter(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .groupBy("period_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Salted skew join, declared: events (fact) × event-type dim through
    * [[SkewJoin.saltedJoin]] — the manual remedy for a hot key when the
    * build side can't broadcast and AQE's runtime skew split doesn't
    * apply (it only rewrites sort-merge joins). The salt spreads each
    * key over 8 (key, salt) tasks; the oracle is the PLAIN join, so the
    * hash check proves salting is result-invariant.
    */
  private val skewQ: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"), col("event_id"))
    val dim = ev.select("event_type").distinct()
      .withColumn("wt", length(col("event_type")).cast("long"))
    SkewJoin.saltedJoin(ev, dim, "event_type", salts = 8,
      Seq("event_type", "event_id"), Seq("wt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max(col("wt")).as("wt"))
  }

  /** PIVOT: per-user-bucket event counts, one column per event type.
    * The value list is EXPLICIT (`pivot(col, values)`) — the two-pass
    * "discover distinct values on the driver" form is a collect() the
    * 100 TB path doesn't need when the domain is known. Missing
    * (bucket, type) combos surface as null → coalesced to 0, matching
    * the oracle's FILTERed counts.
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def pivoted(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .groupBy("bucket")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))

  private val pivotQ: Q = (s, d) => {
    val p = pivoted(s, d)
    p.select(col("bucket") +:
      EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  /** UNPIVOT (melt): the pivot output folded back to long form —
    * `unpivot` is the Spark 3.4+ built-in (a Catalyst Expand, per-row,
    * no shuffle). The oracle is the PLAIN groupBy count, so the
    * pivot→unpivot round-trip is proven lossless by hash equality.
    */
  private val unpivotQ: Q = (s, d) =>
    pivoted(s, d)
      .unpivot(Array(col("bucket")), EventTypes.map(col).toArray, "event_type", "n")
      .filter(col("n").isNotNull && col("n") > 0)
      .select(col("bucket"), col("event_type"), col("n"))

  /** Set operations: INTERSECT / EXCEPT (distinct semantics) — engine
    * API surface the relational pack didn't cover. Spark plans both as
    * aggregate + hash join (left-semi / left-anti over distinct), so
    * they inherit the same shuffle shape as the joins. Converters
    * buyers-and-clickers / clickers-never-buying, with a unique-key
    * ORDER-independent output (plain user_id set).
    */
  private val intersectQ: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  private val exceptQ: Q = (s, d) => {
    val ev = Tables.events(s, d)
    // right side restricted to HIGH-VALUE purchasers — the unrestricted
    // set contains every clicker in this data, which would make EXCEPT
    // vacuously empty (a hash check that can't fail proves nothing)
    ev.filter(col("event_type") === "click").select("user_id")
      .except(ev.filter(col("event_type") === "purchase" && col("value") > 95)
        .select("user_id"))
  }

  /** Ordered event-sequence funnel: per user, the earliest view, the
    * earliest click strictly AFTER that view, the earliest purchase
    * strictly after that click — `stage` = how deep the user got. Each
    * stage is a filtered scan (event_type pushed to parquet) + min-agg +
    * equi-join against the previous stage's one-row-per-user table; the
    * per-stage tables shrink monotonically, so at scale this is three
    * pruned scans and two small-side joins, never a per-user sort.
    * Timestamps emitted in µs (ns LONG DIV 1000 == the twin's
    * epoch_ns // 1000) per the engine ts convention.
    */
  private val funnelQ: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .select(col("user_id"),
        expr("t1 DIV 1000").as("t1_us"),
        expr("t2 DIV 1000").as("t2_us"),
        expr("t3 DIV 1000").as("t3_us"),
        (lit(1L) + when(col("t2").isNotNull, 1L).otherwise(0L)
          + when(col("t3").isNotNull, 1L).otherwise(0L)).as("stage"))
  }

  /** Weekly cohort retention: cohort = a user's first active week (ns
    * epoch DIV week), cell (cohort_week, week_offset) = users from that
    * cohort active `offset` weeks later. One distinct (user, week) pass
    * + a min-per-user cohort agg + one equi-join — all integer
    * bucketing, order-independent everywhere.
    */
  private val WeekNs = 604800000000000L
  private val retentionQ: Q = (s, d) => {
    val wk = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts DIV ${WeekNs}L").as("w")).distinct()
    val cohort = wk.groupBy("user_id").agg(min("w").as("cw"))
    wk.join(cohort, "user_id")
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Single-pass column profiler — the data-quality sweep (rows, nulls,
    * exact distinct, min/max per column) every large-corpus pipeline
    * runs before training. ONE aggregate over one scan computes all
    * 5 columns × 4 metrics (multi-count-distinct plans as a single
    * Expand + two-stage partial aggregate — one shuffle of map-side
    * combined distinct sets, the scale-correct profiling shape), then a
    * `stack` projection pivots the metric row into one row per column.
    * min/max are emitted as 40-code-point string prefixes so the output
    * schema is uniform across column types; the corpus is printable
    * ASCII (pinned since r13), so Spark's UTF-16 string ordering and
    * DuckDB's byte-wise collation agree.
    */
  private val profileCols = Seq("doc_id", "text", "lang", "source", "n_chars")
  private val profileQ: Q = (s, d) => {
    val df = Tables.documents(s, d)
    val aggs = count(lit(1)).as("n") +: profileCols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        substring(min(col(c)).cast("string"), 1, 40).as(s"${c}_mn"),
        substring(max(col(c)).cast("string"), 1, 40).as(s"${c}_mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = profileCols
      .map(c => s"'$c', ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx").mkString(", ")
    one.select(col("n"), expr(s"stack(${profileCols.size}, $stackArgs)")
        .as(Seq("col", "n_nonnull", "n_distinct", "min_s", "max_s")))
      .select(col("col"), col("n").as("n_rows"),
        (col("n") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  private val profileSql: String = profileCols.map { c =>
    s"""SELECT '$c' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  substr(CAST(min($c) AS VARCHAR), 1, 40) AS min_s,
       |  substr(CAST(max($c) AS VARCHAR), 1, 40) AS max_s
       |FROM documents""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ---- robust outlier detection (median / MAD) ----
  // The data-QC primitive that survives the outliers it hunts: flag
  // events whose |value − median| exceeds 3·MAD, per event type.
  // Medians are PICKED, not computed — rank by (value, event_id) and
  // take rn = ceil(n/2) (the q_quantiles rule), so no FP aggregation
  // exists anywhere: dev = abs(value − med) and the 3·MAD compare are
  // single IEEE ops on identical doubles in both engines. Two
  // partitioned rank windows + two broadcast joins of the 5-row
  // median/MAD tables; the deviation frame is Scratch-persisted (feeds
  // the MAD ranking and the final count).
  /** Deterministic median PICK per event_type: rank by (valCol,
    * event_id), keep rn = ceil(n/2) — the q_quantiles rule at p=50,
    * shared by the median and MAD passes so the percentile-pick rule
    * lives in one place. The rank goes through the adaptive
    * [[graft.operators.Ordinals.rankAndCount]] gate (VERDICT r14 #2):
    * event_type has O(5) distinct values, so past 64k rows/group the
    * naive partitioned window is one task sorting n/5 rows — the gate
    * switches to the range-partitioned global-ordinal rank there
    * (bit-identical; the twin keeps the plain-window SQL). The group
    * size n comes from the caller's shared 5-row count table
    * (broadcast), and the gate statistic is passed through — neither
    * pays a per-ranking job.
    */
  private def medianPick(df: DataFrame, valCol: String, outCol: String,
      cnts: DataFrame, maxGroup: Long): DataFrame = {
    Ordinals.rankAndCount(df, "event_type",
        Seq(col(valCol), col("event_id")), "rn", None,
        knownMaxGroup = Some(maxGroup))
      .join(broadcast(cnts), Seq("event_type"))
      .filter(expr("rn = (50 * n + 99) DIV 100"))
      .select(col("event_type"), col(valCol).as(outCol))
  }

  private val madQ: Q = (s, d) => {
    // ONE exchange for the whole query (r15): events are hash-partitioned
    // on event_type up front, so both rank sorts, the deviation join
    // (broadcast), and the final aggregate all run exchange-free on the
    // persisted partitioning. The 5-row group-count table is computed
    // once and reused as the ceil(n/2) filter's n (broadcast join) AND
    // as the adaptive rank gate's statistic — the old shape paid a
    // count-over-window pass inside each ranking plus a gate job per
    // rank (r15 A/B: min 0.90 → 0.49 s at sf0.1).
    val e = graft.Scratch.persist(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"))
        .repartition(col("event_type")))
    val cnts = e.groupBy("event_type").agg(count(lit(1)).as("n"))
    // the gate statistic is catalog state (Stats doc) — one job per
    // (session, dir), not one per rep
    val maxGroup = graft.Stats.scalar(s, d, "events.event_type:maxGroup")(
      cnts.agg(coalesce(max(col("n")), lit(0L))).head().getLong(0))
    val med = medianPick(e, "value", "med", cnts, maxGroup)
    val dev = graft.Scratch.persist(
      e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med"))))
    val mad = medianPick(dev, "dev", "mad", cnts, maxGroup)
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"),
        (round(max(col("med")), 6) + lit(0.0)).as("med_r"),
        (round(max(col("mad")), 6) + lit(0.0)).as("mad_r"))
  }

  // ---- Spearman rank correlation (integer closed form) ----
  // Per-source rank correlation between document length (n_chars) and
  // lexical diversity (distinct-token count) — the data-analysis
  // primitive behind every "does X correlate with quality" check a
  // curation pipeline runs. Deterministic-rank variant: ties broken by
  // doc_id (average-rank Spearman needs FP midpoints; this integer
  // variant is the hash-checkable analog). rho = 1 − 6Σd²/(n(n²−1)) in
  // basis points; both sides of the division are widened through
  // DECIMAL(38,0)/HUGEINT because n³ overflows BIGINT past ~2M rows
  // per group — real at corpus scale; the penalty term is all-positive
  // so Spark DIV == DuckDB // and the signed subtraction happens after.
  // One shuffle on source; the two rankings are two sorts over the
  // same exchange.
  private val rankCorrQ: Q = (s, d) => {
    val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
      col("n_chars"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("ndist"))
    // both rankings through the adaptive rank gate (VERDICT r14 #2) —
    // source has O(5-10) distinct values, the same vacuous-partition
    // shape as medianPick; below 64k rows/group the two windows share
    // one exchange, past it each rank is a distributed range sort. The
    // shared gate statistic is memoized catalog state (Stats doc).
    val maxG = graft.Stats.scalar(s, d, "documents.source:maxGroup")(
      Tables.documents(s, d).select(col("source")).groupBy("source").count()
        .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0))
    val ranked = Ordinals.rankAndCount(
      Ordinals.rankAndCount(base, "source",
        Seq(col("n_chars"), col("doc_id")), "r1", None,
        knownMaxGroup = Some(maxG)),
      "source", Seq(col("ndist"), col("doc_id")), "r2", None,
      knownMaxGroup = Some(maxG))
    // the SUM itself is widened, not just the ratio: Σd² reaches
    // n(n²−1)/3, past BIGINT at ~3M rows/group — aggregating in long
    // and casting after would overflow exactly in the regime the
    // widening exists for. sum_d2 is therefore not emitted (it has no
    // BIGINT-safe output type at scale); n and rho_bp are.
    ranked.select(col("source"), col("r1"), col("r2"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST((r1-r2)*(r1-r2) AS DECIMAL(38,0))")).as("sum_d2"))
      .select(col("source"), col("n"),
        expr("10000L - CAST((sum_d2 * 60000) DIV " +
          "greatest(CAST(n AS DECIMAL(38,0))*n*n - n, 1) AS BIGINT)").as("rho_bp"))
  }

  // ---- two-sample Kolmogorov–Smirnov drift per source ----
  // Distribution-shift monitoring for a corpus assembled from many
  // sources: for each source, the two-sample KS statistic between its
  // doc-length distribution and the rest of the corpus,
  // D = max_x |F_s(x) − F_rest(x)| — the standard drift alarm a 100 TB
  // ingest pipeline runs per-source per-batch.
  //
  // Exact integer formulation: D's numerator is evaluated at every
  // observed length x (a step function attains its max at jump points)
  // as |cum_s(x)·n_rest − cum_rest(x)·n_s| — cross-multiplied so no
  // division happens before the final basis points. Products reach N²
  // (past BIGINT at ~3e9 docs), so they widen through
  // DECIMAL(38,0)/HUGEINT and only ks_bp casts back — the q_rank_corr
  // widening rule.
  //
  // Scale shape: the evaluation grid is |sources| × |distinct lengths| —
  // VALUE-DOMAIN bounded (lengths are bounded by the max doc size),
  // independent of corpus row count; the per-source cumulative counts
  // ride `Ordinals.prefixSum`'s adaptive gate, so a degenerate domain
  // (millions of distinct lengths in O(10) source groups) takes the
  // range-partitioned two-level form instead of funneling.
  /** The shared drift frame: per (source, observed length x) the
    * cross-multiplied CDF deviation `diff` = |cum_s·(n−n_s) −
    * cum_rest·n_s| (DECIMAL-widened), with n_s/n along for the ride —
    * the common core of the KS (max over x) and W1 (gap-weighted sum
    * over x) statistics (r17).
    */
  private def driftDiffs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
    val xs = docs.select(col("n_chars").as("x")).distinct()
    val srcs = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val tot = docs.agg(count(lit(1)).as("n"))
    val c = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumnRenamed("n_chars", "x")
    val grid = xs.crossJoin(broadcast(srcs.select(col("source"))))
      .join(c, Seq("source", "x"), "left")
      .select(col("source"), col("x"), coalesce(col("c"), lit(0L)).as("c"))
    // both gate stats are |distinct lengths| (every source's grid slice
    // and the one-group cumAll frame have exactly that many rows) —
    // catalog-memoized, skips two per-execution count jobs
    val nx = graft.Stats.scalar(s, d, "documents.n_chars:ndistinct")(
      Tables.documents(s, d).select("n_chars").distinct().count())
    val cumS = Ordinals.prefixSum(grid, "source", "x", "c", "cum_s",
      knownMaxGroup = Some(nx))
    val cx = docs.groupBy(col("n_chars").as("x")).agg(count(lit(1)).as("ca"))
      .withColumn("_g", pmod(col("x"), lit(1L)))
    val cumAll = Ordinals.prefixSum(cx, "_g", "x", "ca", "cum_all",
      knownMaxGroup = Some(nx))
      .select(col("x"), col("cum_all"))
    cumS.join(cumAll, Seq("x"))
      .join(broadcast(srcs), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("diff", expr(
        "abs(CAST(cum_s AS DECIMAL(38,0)) * (n - n_s) " +
          "- CAST(cum_all - cum_s AS DECIMAL(38,0)) * n_s)"))
  }

  private val ksDriftQ: Q = (s, d) =>
    driftDiffs(s, d)
      .groupBy("source", "n_s", "n")
      .agg(max(col("diff")).as("dmax"))
      .select(col("source"), col("n_s"), expr(
        "CAST((dmax * 10000) DIV greatest(CAST(n_s AS DECIMAL(38,0)) * (n - n_s), 1) AS BIGINT)")
        .as("ks_bp"))

  // ---- W1 (earth-mover) drift per source (r17) ----
  // The INTEGRAL companion of the KS max: W1(F_s, F_rest) =
  // ∫|F_s − F_rest| dx — KS fires on one sharp localized shift, W1 on
  // broad low-amplitude drift KS under-weights; monitoring stacks run
  // both. Exact integers: on a step-function pair the integral is
  // Σ_jump diff(x)·(next_x − x) with the SAME cross-multiplied diff as
  // KS (the last jump contributes 0 — both CDFs are 1 there — so the
  // null-lead row drops out losslessly). Normalized by
  // n_s·(n−n_s)·(xmax−xmin) ⇒ w1_bp ∈ [0, 10⁴], all operands
  // non-negative, DECIMAL-widened end to end. The gap window is
  // per-source (partitioned); everything downstream of the shared
  // drift frame is |sources|×|distinct lengths| — value-domain
  // bounded, corpus-size independent.
  private val w1DriftQ: Q = (s, d) => {
    val wSrc = Window.partitionBy("source").orderBy("x")
    driftDiffs(s, d)
      .withColumn("gap", lead(col("x"), 1).over(wSrc) - col("x"))
      .filter(col("gap").isNotNull)
      .groupBy("source", "n_s", "n")
      // span = (xmax − xmin) derived from the drift frame itself
      // (ADVICE r17 #2 — a separate documents scan for it was one
      // corpus pass per rep): the gap filter drops each source's
      // max-x row, so max(x + gap) recovers the global max while
      // min(x) is untouched; the grid carries EVERY distinct x per
      // source, so per-source min/max == global min/max.
      .agg(sum(expr("diff * gap")).as("area"),
        (max(col("x") + col("gap")) - min(col("x"))).as("span"))
      .select(col("source"), col("n_s"), expr(
        "CAST((area * 10000) DIV greatest(CAST(n_s AS DECIMAL(38,0)) * (n - n_s) * span, 1) AS BIGINT)")
        .as("w1_bp"))
  }

  private val w1DriftSql: String =
    """WITH xs AS (SELECT DISTINCT n_chars AS x FROM documents),
      |srcs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |sp AS (SELECT CAST(max(n_chars) - min(n_chars) AS BIGINT) AS span FROM documents),
      |c AS (SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
      |      FROM documents GROUP BY source, n_chars),
      |grid AS (
      |  SELECT s.source, xs.x, coalesce(c.c, 0) AS c
      |  FROM xs CROSS JOIN srcs s
      |  LEFT JOIN c ON c.source = s.source AND c.x = xs.x),
      |cum AS (
      |  SELECT source, x, CAST(sum(c) OVER (PARTITION BY source ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
      |  FROM grid),
      |ca AS (
      |  SELECT x, CAST(sum(ca) OVER (ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
      |  FROM (SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS ca
      |        FROM documents GROUP BY n_chars)),
      |dd AS (
      |  SELECT cum.source, cum.x, s.n_s, t.n,
      |         abs(CAST(cum.cum_s AS HUGEINT) * (t.n - s.n_s)
      |           - CAST(ca.cum_all - cum.cum_s AS HUGEINT) * s.n_s) AS diff,
      |         lead(cum.x) OVER (PARTITION BY cum.source ORDER BY cum.x) - cum.x AS gap
      |  FROM cum JOIN ca USING (x) JOIN srcs s USING (source) CROSS JOIN tot t)
      |SELECT source, n_s,
      |       CAST((sum(diff * gap) * 10000)
      |         // greatest(CAST(n_s AS HUGEINT) * (n - n_s) * (SELECT span FROM sp), 1) AS BIGINT)
      |         AS w1_bp
      |FROM dd WHERE gap IS NOT NULL
      |GROUP BY source, n_s, n""".stripMargin

  private val ksDriftSql: String =
    """WITH xs AS (SELECT DISTINCT n_chars AS x FROM documents),
      |srcs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |c AS (SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
      |      FROM documents GROUP BY source, n_chars),
      |grid AS (
      |  SELECT s.source, xs.x, coalesce(c.c, 0) AS c
      |  FROM xs CROSS JOIN srcs s
      |  LEFT JOIN c ON c.source = s.source AND c.x = xs.x),
      |cum AS (
      |  SELECT source, x, CAST(sum(c) OVER (PARTITION BY source ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
      |  FROM grid),
      |ca AS (
      |  SELECT x, CAST(sum(ca) OVER (ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
      |  FROM (SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS ca
      |        FROM documents GROUP BY n_chars))
      |SELECT source, n_s,
      |       CAST((max(abs(CAST(cum_s AS HUGEINT) * (n - n_s)
      |              - CAST(cum_all - cum_s AS HUGEINT) * n_s)) * 10000)
      |         // greatest(CAST(n_s AS HUGEINT) * (n - n_s), 1) AS BIGINT) AS ks_bp
      |FROM cum
      |JOIN ca USING (x) JOIN srcs USING (source) CROSS JOIN tot
      |GROUP BY source, n_s, n""".stripMargin

  // ---- k-anonymity release with one-level generalization (r16) ----
  // The data-release audit a corpus publisher runs before sharing
  // per-group statistics: quasi-identifier = (lang, source, 100-char
  // length bucket). Groups meeting k are released at level 0; the
  // suppressed remainder is GENERALIZED up the hierarchy (source and
  // bucket collapse to '*'/-1) and re-tested per lang at level 1; what
  // still misses k pools into one global level-2 residue row. Counts
  // only — a pure two-aggregate cascade over one scan, map-side
  // combined, deterministic at any corpus size; the sentinel columns
  // keep one uniform schema across levels (the q_rollup convention).
  //
  // The level-2 residue row is EXEMPT from the k floor BY DESIGN
  // (ADVICE r16 #2): its count equals total_corpus − Σ(released n),
  // and the corpus cardinality is public in this release model (every
  // shard manifest / profile query publishes it), so the residue is
  // derivable from the release whether or not the row is printed —
  // suppressing it would hide nothing while breaking the exact
  // partition-of-the-corpus accounting the audit relies on.
  // CurationOpsSpec pins this argument: residue == total − released.
  private val KAnonK = 10L

  private val kanonQ: Q = (s, d) => {
    val g = graft.Scratch.persist(Tables.documents(s, d)
      .groupBy(col("lang"), col("source"),
        expr("n_chars DIV 100").as("len_bucket"))
      .agg(count(lit(1)).as("n")))
    val fine = g.filter(col("n") >= KAnonK)
      .select(col("lang"), col("source"), col("len_bucket"), col("n"),
        lit(0L).as("level"))
    val sup = g.filter(col("n") < KAnonK)
    val mid = graft.Scratch.persist(
      sup.groupBy("lang").agg(sum(col("n")).as("n")))
    val midRel = mid.filter(col("n") >= KAnonK)
      .select(col("lang"), lit("*").as("source"), lit(-1L).as("len_bucket"),
        col("n"), lit(1L).as("level"))
    val residue = mid.filter(col("n") < KAnonK)
      .agg(sum(col("n")).as("n")).filter(col("n").isNotNull)
      .select(lit("*").as("lang"), lit("*").as("source"),
        lit(-1L).as("len_bucket"), col("n"), lit(2L).as("level"))
    fine.unionAll(midRel).unionAll(residue)
  }

  private val kanonSql: String =
    s"""WITH g AS MATERIALIZED (
       |  SELECT lang, source, n_chars // 100 AS len_bucket,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY lang, source, len_bucket),
       |mid AS MATERIALIZED (
       |  SELECT lang, CAST(sum(n) AS BIGINT) AS n
       |  FROM g WHERE n < $KAnonK GROUP BY lang)
       |SELECT lang, source, len_bucket, n, CAST(0 AS BIGINT) AS level
       |FROM g WHERE n >= $KAnonK
       |UNION ALL
       |SELECT lang, '*' AS source, CAST(-1 AS BIGINT) AS len_bucket, n,
       |       CAST(1 AS BIGINT) AS level
       |FROM mid WHERE n >= $KAnonK
       |UNION ALL
       |SELECT '*' AS lang, '*' AS source, CAST(-1 AS BIGINT) AS len_bucket,
       |       CAST(n AS BIGINT) AS n, CAST(2 AS BIGINT) AS level
       |FROM (SELECT sum(n) AS n FROM mid WHERE n < $KAnonK)
       |WHERE n IS NOT NULL""".stripMargin

  // ---- Z-order data layout audit (r17) ----
  // The data-LAYOUT lever behind every 100 TB scan-pruning story
  // (Delta/Iceberg OPTIMIZE ZORDER BY): interleave the bits of two
  // scaled dimensions so files cluster in BOTH, then measure what the
  // layout buys — for 16 equal-width range probes per dimension, how
  // many file bounding boxes ([min,max] per dim per file, exactly what
  // parquet footers publish) must be read under (a) the z-order layout
  // vs (b) a single-dimension sort. The x-sort prunes x-probes
  // perfectly and y-probes not at all; z-order pays a small x premium
  // to make BOTH dims prunable — the published √-tradeoff, here as a
  // hash-checked integer metric (`skip_bp` = share of file reads
  // avoided). All arithmetic is integer: dims scale to 8 bits by
  // (k·256) DIV (max+1) (operands positive ⇒ trunc == floor), the
  // interleave is 16 unrolled literal terms (the q_dedup_cdc
  // literal-unroll precedent), file ids are equal-WIDTH z/bx ranges —
  // no global sort, no window; the per-file stats are one
  // map-side-combined groupBy over a 128-row output, so the audit
  // itself is a single-scan job at any corpus size.
  private val ZFiles = 64
  private val ZProbes = 16

  /** The 8+8-bit Morton interleave as engine-portable SQL: x bits land
    * on odd positions, y bits on even. `div` is `DIV` (Spark) / `//`
    * (DuckDB).
    */
  private[graft] def zExpr(div: String): String =
    (0 to 7).map(i =>
      s"((bx $div ${1 << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"((by $div ${1 << i}) % 2) * ${1L << (2 * i)}").mkString(" + ")

  private val zorderQ: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
    val mx = li.agg(max(col("l_partkey")).as("mpk"), max(col("l_suppkey")).as("msk"))
    val f = li.crossJoin(broadcast(mx))
      .select(expr("(l_partkey * 256) DIV (mpk + 1)").as("bx"),
        expr("(l_suppkey * 256) DIV (msk + 1)").as("by"))
      .withColumn("z", expr(zExpr("DIV")))
      .select(col("bx"), col("by"),
        expr(s"z DIV ${65536 / ZFiles}").as("zf"),
        expr(s"bx DIV ${256 / ZFiles}").as("xf"))
    // per (layout, file) bounding boxes — the parquet-footer stats
    val lf = f.select(explode(array(
        struct(lit("zorder").as("layout"), col("zf").as("file")),
        struct(lit("xsort").as("layout"), col("xf").as("file")))).as("a"),
        col("bx"), col("by"))
      .groupBy(col("a.layout").as("layout"), col("a.file").as("file"))
      .agg(min(col("bx")).as("minx"), max(col("bx")).as("maxx"),
        min(col("by")).as("miny"), max(col("by")).as("maxy"))
    val nf = lf.groupBy("layout").agg(countDistinct(col("file")).as("n_files"))
    val pr = s.range(ZProbes).select(col("id").as("t"))
      .select(explode(array(lit("x"), lit("y"))).as("dim"),
        (col("t") * (256 / ZProbes)).as("lo"),
        (col("t") * (256 / ZProbes) + (256 / ZProbes - 1)).as("hi"))
    lf.crossJoin(broadcast(pr))
      .filter(when(col("dim") === "x", col("minx") <= col("hi") && col("maxx") >= col("lo"))
        .otherwise(col("miny") <= col("hi") && col("maxy") >= col("lo")))
      .groupBy("layout", "dim").agg(count(lit(1)).as("files_touched"))
      .join(nf, Seq("layout"))
      .select(col("layout"), col("dim"), col("n_files"), col("files_touched"),
        expr(s"(($ZProbes * n_files - files_touched) * 10000) DIV ($ZProbes * n_files)")
          .as("skip_bp"))
      .orderBy("layout", "dim")
  }

  private val zorderSql: String =
    s"""WITH mx AS (SELECT max(l_partkey) AS mpk, max(l_suppkey) AS msk FROM lineitem),
       |b AS (SELECT (l_partkey * 256) // (mpk + 1) AS bx,
       |             (l_suppkey * 256) // (msk + 1) AS by
       |      FROM lineitem CROSS JOIN mx),
       |f AS MATERIALIZED (
       |  SELECT bx, by, z // ${65536 / ZFiles} AS zf, bx // ${256 / ZFiles} AS xf
       |  FROM (SELECT bx, by, ${zExpr("//")} AS z FROM b)),
       |lf AS MATERIALIZED (
       |  SELECT layout, file, min(bx) AS minx, max(bx) AS maxx,
       |         min(by) AS miny, max(by) AS maxy
       |  FROM (SELECT 'zorder' AS layout, zf AS file, bx, by FROM f
       |        UNION ALL SELECT 'xsort' AS layout, xf AS file, bx, by FROM f)
       |  GROUP BY layout, file),
       |nf AS (SELECT layout, CAST(count(DISTINCT file) AS BIGINT) AS n_files
       |       FROM lf GROUP BY layout),
       |pr AS (SELECT dim, t * ${256 / ZProbes} AS lo,
       |              t * ${256 / ZProbes} + ${256 / ZProbes - 1} AS hi
       |       FROM (SELECT unnest(generate_series(0, ${ZProbes - 1})) AS t)
       |       CROSS JOIN (SELECT unnest(['x', 'y']) AS dim)),
       |t AS (SELECT layout, dim, CAST(count(*) AS BIGINT) AS files_touched
       |      FROM lf CROSS JOIN pr
       |      WHERE CASE WHEN dim = 'x' THEN minx <= hi AND maxx >= lo
       |                 ELSE miny <= hi AND maxy >= lo END
       |      GROUP BY layout, dim)
       |SELECT layout, dim, n_files, files_touched,
       |       (($ZProbes * n_files - files_touched) * 10000) // ($ZProbes * n_files) AS skip_bp
       |FROM t JOIN nf USING (layout)
       |ORDER BY layout, dim""".stripMargin

  // ---- hourly-series autocorrelation (r17) ----
  // The time-series health check an event pipeline runs before trusting
  // traffic-derived features: lag-1..6 autocorrelation of the hourly
  // event-count series per type (daily/periodic structure shows as
  // acf peaks; a flat series means the counts are noise). The series is
  // the DENSE hour grid (missing hours are real zeros — computing acf
  // over only observed hours silently rewrites the series), built from
  // one map-side-combined (type, hour) count + a bounded
  // types × generate_series grid. Everything downstream of that count
  // operates on the bounded series, not the corpus — at any scale the
  // event stream is touched exactly once.
  //
  // Oracle parity: the BIASED acf estimator (divisor-T autocovariance —
  // the psd one, so |γ_l| ≤ γ_0 and the published shifted ratio stays
  // in [0, 2e4]) with the global mean multiplied through by T²:
  // num_l = T²·Σxy − T·S·(Σx_head + Σy_tail) + (T−l)·S², den = T²·Sxx −
  // T·S² — exact BIGINT at every bench SF; the final basis-point step
  // publishes (num+den)·10⁴ DIV den (all operands NON-NEGATIVE by the
  // psd bound, so trunc == floor cross-engine; a raw num DIV would mix
  // Spark's trunc with negative values) widened through DECIMAL(38,0)/
  // HUGEINT (the dsir precedent — 100× hourly counts overflow the bp
  // product in BIGINT).
  private[graft] val AcfMaxLag = 6

  private val autocorrQ: Q = (s, d) => {
    val hourExpr = expr("(ts - pmod(ts, 3600000000000L)) DIV 3600000000000L")
    // the ONLY corpus-sized pass: one map-side-combined (type, hour)
    // count. NOT persisted (r18 opt): the persist's cache-population
    // barrier cost ~0.17 s/rep locally, and the two downstream
    // consumers (type set + sparse→dense join) are gone — the dense
    // grid is rebuilt from a per-type bounded hour→count map instead
    // (one consumption, no join), so the stream is still touched
    // exactly once and nothing re-scans.
    val counts =
      Tables.events(s, d).groupBy(col("event_type"), hourExpr.as("h"))
        .agg(count(lit(1)).as("x"))
    // hour-range bounds from the Stats catalog (r18 — the
    // q_sketch_quantiles gate precedent): a data property of the dir,
    // memoized once instead of a broadcast-subquery job per rep. ONE
    // aggregate action populates both keys (r18 review: two separate
    // .head()s paid two serial waves on the cold path).
    def bothBounds(): (Long, Long) = {
      val r = counts.agg(min(col("h")), max(col("h"))).head()
      (r.getLong(0), r.getLong(1))
    }
    lazy val computed = bothBounds()
    val minh = graft.Stats.scalar(s, d, "events.hour:min")(computed._1)
    val maxh = graft.Stats.scalar(s, d, "events.hour:max")(computed._2)
    // Dense series per type WITHOUT a grid join (r18 opt — guide §2.4):
    // the sparse counts collapse to ONE bounded hour→count map per type
    // (map size = the hour span, a value-domain bound independent of
    // corpus size — the same bound the old types × generate_series grid
    // carried), then the dense grid explodes out of sequence() with
    // element_at lookups. One consumption of the counts subtree — the
    // old shape consumed it twice (type set + left join), which needed
    // either a persist (a cache-population barrier per rep) or a second
    // corpus scan. The explode is a narrow Generate, so the per-type
    // partitioning flows through to the window and the final aggregate:
    // two exchanges end to end.
    val dense = counts.groupBy("event_type")
      .agg(map_from_entries(collect_list(struct(col("h"), col("x")))).as("m"))
      .select(col("event_type"), col("m"),
        explode(sequence(lit(minh), lit(maxh))).as("h"))
      .select(col("event_type"), col("h"),
        coalesce(element_at(col("m"), col("h")), lit(0L)).as("x"))
    // Lag pairs as lead(x, l) columns over ONE per-type window (VERDICT
    // r17 #2 — the old broadcast-lags self-join + separate stats agg +
    // re-join spent ~5 serial waves on a 3,600-row series): on the
    // DENSE grid, lead(x, l) is null exactly for the last l rows, so
    // count/sum over the lead columns reproduce the join's per-lag
    // n/sxy/sxh/syt bit-for-bit. The window's event_type hash
    // partitioning satisfies the groupBy's clustering (subset rule), so
    // pairs AND stats ride one exchange; the bounded per-type stack
    // unpivot is exchange-free behind the aggregate.
    val w = Window.partitionBy("event_type").orderBy("h")
    val withLeads = (1 to AcfMaxLag).foldLeft(dense)((df, l) =>
      df.withColumn(s"y$l", lead(col("x"), l).over(w)))
    val aggCols =
      Seq(count(lit(1)).as("bigt"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("sxx")) ++
      (1 to AcfMaxLag).flatMap(l => Seq(
        count(col(s"y$l")).as(s"n$l"),
        sum(col("x") * col(s"y$l")).as(s"sxy$l"),
        sum(when(col(s"y$l").isNotNull, col("x"))).as(s"sxh$l"),
        sum(col(s"y$l")).as(s"syt$l")))
    val st = withLeads.groupBy("event_type").agg(aggCols.head, aggCols.tail: _*)
    // num/den widened through DECIMAL(38,0) and cast back to BIGINT for
    // output (ADVICE r17 #1 — raw BIGINT bigt²·sxy wraps silently past
    // ~100× where DuckDB raises; the INTERMEDIATES are safe to 10¹⁹
    // inside DECIMAL(38,0), while the published BIGINT num/den columns
    // carry a documented ~9.2e18 output bound — past ~1000× hourly
    // volume the columns would need e-rescaling, a face change, not a
    // silent wrap). The n > 0 filter reproduces the twin's pair-JOIN
    // semantics exactly: a lag with no pairs (dense span ≤ lag) emits
    // NO row in both engines (r18 review — the stack unpivot alone
    // would emit n=0/NULL rows the join never produces).
    st.select(col("event_type"), col("bigt"), col("s"), col("sxx"),
        expr(s"stack($AcfMaxLag, " + (1 to AcfMaxLag).map(l =>
          s"CAST($l AS BIGINT), n$l, sxy$l, sxh$l, syt$l").mkString(", ") +
          ") AS (lag, n, sxy, sxh, syt)"))
      .filter(col("n") > 0)
      .select(col("event_type"), col("lag"), col("n"),
        expr("CAST(CAST(bigt AS DECIMAL(38,0))*bigt*sxy " +
          "- CAST(bigt AS DECIMAL(38,0))*s*(sxh + syt) " +
          "+ CAST(n AS DECIMAL(38,0))*s*s AS BIGINT)").as("num"),
        expr("CAST(CAST(bigt AS DECIMAL(38,0))*bigt*sxx " +
          "- CAST(bigt AS DECIMAL(38,0))*s*s AS BIGINT)").as("den"))
      .select(col("event_type"), col("lag"), col("n"), col("num"), col("den"),
        expr("CAST((CAST(num + den AS DECIMAL(38,0)) * 10000) DIV greatest(den, 1) AS BIGINT)")
          .as("acf1p_bp"))
      .orderBy("event_type", "lag")
  }

  private val autocorrSql: String =
    s"""WITH c AS MATERIALIZED (
       |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
       |         CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |bo AS (SELECT min(h) AS minh, max(h) AS maxh FROM c),
       |dense AS MATERIALIZED (
       |  SELECT g.event_type, g.h, coalesce(c.x, 0) AS x
       |  FROM (SELECT t.event_type, u.h
       |        FROM (SELECT DISTINCT event_type FROM c) t
       |        CROSS JOIN (SELECT unnest(generate_series(minh, maxh)) AS h FROM bo) u) g
       |  LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h),
       |st AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS bigt,
       |         CAST(sum(x) AS BIGINT) AS s, CAST(sum(x*x) AS BIGINT) AS sxx
       |  FROM dense GROUP BY event_type),
       |p AS (
       |  SELECT a.event_type, l.lag, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
       |         CAST(sum(a.x) AS BIGINT) AS sxh, CAST(sum(b.x) AS BIGINT) AS syt
       |  FROM dense a
       |  CROSS JOIN (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag) l
       |  JOIN dense b ON b.event_type = a.event_type AND b.h = a.h + l.lag
       |  GROUP BY a.event_type, l.lag),
       |nd AS (
       |  SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, p.n,
       |         CAST(CAST(bigt AS HUGEINT)*bigt*sxy
       |           - CAST(bigt AS HUGEINT)*s*(sxh + syt)
       |           + CAST(n AS HUGEINT)*s*s AS BIGINT) AS num,
       |         CAST(CAST(bigt AS HUGEINT)*bigt*sxx
       |           - CAST(bigt AS HUGEINT)*s*s AS BIGINT) AS den
       |  FROM p JOIN st USING (event_type))
       |SELECT event_type, lag, n, num, den,
       |       CAST((CAST(num + den AS HUGEINT) * 10000) // greatest(den, 1) AS BIGINT) AS acf1p_bp
       |FROM nd ORDER BY event_type, lag""".stripMargin

  // ---- DP count release: the two-sided geometric mechanism (r17) ----
  // q_kanon's sibling on the privacy shelf: released per-(lang, source)
  // doc counts under the DISCRETE Laplace (two-sided geometric)
  // mechanism of Ghosh-Roughgarden-Sundararajan — the canonical
  // ε-DP mechanism for counting queries. ε = ln 2 (α = 1/2) is chosen
  // so every CDF value is an exact dyadic rational: the inverse-CDF
  // thresholds ×3·2³² are exact BIGINTs, tabulated ONCE here and
  // interpolated verbatim into both engines (the q_retrieval_ndcg
  // tabulated-log2 precedent — no transcendental ever crosses the
  // engine boundary). The noise draw is the deterministic Knuth-hash
  // surrogate over the group's min doc_id (the engine-wide seeded-
  // determinism discipline; a production deployment swaps the seed
  // source for real randomness at this one seam), clamped at ±8 (tail
  // mass 2·⅓·2⁻⁸ ≈ 0.26%), release floored at 0. One
  // map-side-combined aggregation; the mechanism is per-group scalar
  // arithmetic — nothing beyond the groupBy touches the corpus.
  private[graft] val dpNoiseCase: String = {
    val neg = (-8 to -1).map(k => s"WHEN 3 * u < ${1L << (33 + k)} THEN ($k)")
    val pos = (0 to 7).map(k =>
      s"WHEN 3 * u < ${3L * (1L << 32) - (1L << (32 - k))} THEN $k")
    (neg ++ pos).mkString("CASE ", " ", " ELSE 8 END")
  }

  private val dpReleaseQ: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("seed"))
      // widened through DECIMAL(38,0): seed·2654435761 passes 2⁶³ once
      // min doc_ids reach ~3.5e9 (Spark would wrap silently where
      // DuckDB raises — the dsir/autocorr widening precedent)
      .withColumn("u",
        expr("CAST((CAST(seed AS DECIMAL(38,0)) * 2654435761) % 4294967296 AS BIGINT)"))
      .select(col("lang"), col("source"),
        expr(s"CAST(greatest(n + ($dpNoiseCase), 0) AS BIGINT)").as("released"))
      .orderBy("lang", "source")

  private val dpReleaseSql: String =
    s"""WITH g AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
       |         CAST(min(doc_id) AS BIGINT) AS seed
       |  FROM documents GROUP BY lang, source),
       |u AS (SELECT lang, source, n,
       |      CAST((CAST(seed AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS u FROM g)
       |SELECT lang, source,
       |       CAST(greatest(n + ($dpNoiseCase), 0) AS BIGINT) AS released
       |FROM u ORDER BY lang, source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_w1_drift" -> w1DriftQ,
    "q_dp_release" -> dpReleaseQ,
    "q_autocorr" -> autocorrQ,
    "q_zorder_layout" -> zorderQ,
    "q_kanon" -> kanonQ,
    "q_ks_drift" -> ksDriftQ,
    "q_outliers_mad" -> madQ,
    "q_rank_corr" -> rankCorrQ,
    "q_profile" -> profileQ,
    "q_funnel" -> funnelQ,
    "q_retention" -> retentionQ,
    "q_intersect" -> intersectQ,
    "q_except" -> exceptQ,
    "q_pivot" -> pivotQ,
    "q_unpivot" -> unpivotQ,
    "q_skew_join" -> skewQ,
    "q_range_join" -> rangeQ,
    "q_quantiles" -> quantQ,
    "q_rollup" -> rollupQ,
    "q_cube" -> cubeQ,
    "q_moving_avg" -> movingQ,
    "q_anti_join" -> antiQ,
    "q_asof_join" -> asofQ,
    "q_bucketed_join" -> bucketedQ)

  val oracle: Map[String, String] = Map(
    "q_w1_drift" -> w1DriftSql,
    "q_dp_release" -> dpReleaseSql,
    "q_autocorr" -> autocorrSql,
    "q_zorder_layout" -> zorderSql,
    "q_kanon" -> kanonSql,
    "q_ks_drift" -> ksDriftSql,
    "q_outliers_mad" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |ranked AS (SELECT event_id, event_type, value,
        |       row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |       count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |med AS (SELECT event_type, value AS med FROM ranked WHERE rn = (50*n+99)//100),
        |dev AS (SELECT e.event_id, e.event_type, m.med, abs(e.value - m.med) AS dev
        |        FROM e JOIN med m USING (event_type)),
        |dr AS (SELECT event_type, dev,
        |       row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS drn,
        |       count(*) OVER (PARTITION BY event_type) AS n FROM dev),
        |mad AS (SELECT event_type, dev AS mad FROM dr WHERE drn = (50*n+99)//100)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN d.dev > m.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       round(max(d.med), 6) + 0.0 AS med_r,
        |       round(max(m.mad), 6) + 0.0 AS mad_r
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type""".stripMargin,
    "q_rank_corr" ->
      """WITH base AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS ndist
        |  FROM documents),
        |rk AS (SELECT source,
        |        CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS r1,
        |        CAST(row_number() OVER (PARTITION BY source ORDER BY ndist, doc_id) AS BIGINT) AS r2
        |       FROM base),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |               sum((r1-r2)*(r1-r2)) AS sum_d2
        |        FROM rk GROUP BY source)
        |SELECT source, n,
        |       10000 - CAST((CAST(sum_d2 AS HUGEINT) * 60000)
        |         // greatest(CAST(n AS HUGEINT)*n*n - n, 1) AS BIGINT) AS rho_bp
        |FROM agg""".stripMargin,
    "q_profile" -> profileSql,
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
        |  FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1
        |  GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
        |  FROM events e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2
        |  GROUP BY e.user_id)
        |SELECT t1.user_id, t1 // 1000 AS t1_us, t2 // 1000 AS t2_us,
        |       t3 // 1000 AS t3_us,
        |       1 + CAST(t2 IS NOT NULL AS BIGINT)
        |         + CAST(t3 IS NOT NULL AS BIGINT) AS stage
        |FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)""".stripMargin,
    "q_retention" ->
      s"""WITH wk AS (
         |  SELECT DISTINCT user_id, epoch_ns(ts) // $WeekNs AS w FROM events),
         |cohort AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id)
         |SELECT cw AS cohort_week, w - cw AS week_offset,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM wk JOIN cohort USING (user_id)
         |GROUP BY cw, w - cw""".stripMargin,
    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95""".stripMargin,
    "q_pivot" -> {
      val cols = EventTypes.map(t =>
        s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t").mkString(", ")
      s"SELECT user_id % 10 AS bucket, $cols FROM events GROUP BY user_id % 10"
    },
    "q_unpivot" ->
      """SELECT user_id % 10 AS bucket, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id % 10, event_type""".stripMargin,
    "q_skew_join" ->
      """SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(max(length(e.event_type)) AS BIGINT) AS wt
        |FROM events e
        |JOIN (SELECT DISTINCT event_type FROM events) d
        |  ON e.event_type = d.event_type
        |GROUP BY e.event_type""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |mn AS (SELECT min(ts_us - ts_us % 3600000000) AS min_hr_us FROM e),
        |periods AS (
        |  SELECT k AS period_id,
        |         min_hr_us + k*5*3600000000 + 1800000000 AS start_us,
        |         min_hr_us + k*5*3600000000 + 1800000000 + 9000000000 AS end_us
        |  FROM (SELECT unnest(generate_series(0, 9)) AS k) CROSS JOIN mn)
        |SELECT CAST(period_id AS BIGINT) AS period_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM periods p JOIN e ON e.ts_us BETWEEN p.start_us AND p.end_us
        |GROUP BY period_id""".stripMargin,
    "q_quantiles" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, CAST(p_bp AS BIGINT) AS p_bp, value AS q_value
        |FROM r CROSS JOIN (SELECT unnest([50, 90, 99]) AS p_bp) p
        |WHERE rn = (p_bp * n + 99) // 100""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(bucket, -1) AS bucket, n, sum_value
        |FROM (
        |  SELECT event_type, user_id % 10 AS bucket, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY ROLLUP(event_type, user_id % 10))""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority, n, total
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |  FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority))""".stripMargin,
    "q_moving_avg" ->
      """SELECT user_id, event_id,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,4)))
        |                    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) + 0.0 AS mov_avg
        |FROM events""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, epoch_us(c.ts) AS last_click_us
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin,
    "q_bucketed_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin)
}
