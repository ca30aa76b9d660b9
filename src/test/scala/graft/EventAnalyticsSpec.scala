package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the r14 event-sequence and whole-graph analytics
  * queries over the sf0.001 testdata — the laws the oracle hash can't
  * state directly (sequential funnel semantics recomputed independently,
  * cohort partition identities, triangle multiplicity, PageRank
  * determinism under re-execution).
  */
class EventAnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- q_funnel ----

  test("funnel: stage counts nulls, stage timestamps strictly increase") {
    val rows = run("q_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t1 = r.getAs[Long]("t1_us")
      val t2 = Option(r.getAs[Any]("t2_us")).map(_.asInstanceOf[Long])
      val t3 = Option(r.getAs[Any]("t3_us")).map(_.asInstanceOf[Long])
      val stage = r.getAs[Long]("stage")
      assert(stage == 1L + t2.size + t3.size, s"stage mismatch: $r")
      t2.foreach(v => assert(v > t1, s"t2 !> t1: $r"))
      // t3 implies t2 (stage 3 requires a click before the purchase)
      t3.foreach { v => assert(t2.nonEmpty, s"t3 without t2: $r"); assert(v > t2.get) }
    }
    Scratch.release(spark)
  }

  test("funnel: matches an independent sequential recomputation per user") {
    // the engine computes the funnel with min-aggs + shrinking joins;
    // this recomputes it by literally scanning each user's ordered
    // event list — the semantics the query CLAIMS, derived differently
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("ts")))
      .groupBy(_._1)
    val expected = ev.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(_._3)
      val t1 = sorted.collectFirst { case (_, "view", t) => t }
      t1.map { v =>
        val t2 = sorted.collectFirst { case (_, "click", t) if t > v => t }
        val t3 = t2.flatMap(c => sorted.collectFirst { case (_, "purchase", t) if t > c => t })
        uid -> (v / 1000, t2.map(_ / 1000), t3.map(_ / 1000))
      }
    }
    val got = run("q_funnel").collect().map { r =>
      r.getAs[Long]("user_id") -> (r.getAs[Long]("t1_us"),
        Option(r.getAs[Any]("t2_us")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("t3_us")).map(_.asInstanceOf[Long]))
    }.toMap
    assert(got.keySet == expected.keySet, "funnel user set != users with a view")
    expected.foreach { case (uid, e) =>
      assert(got(uid) == e, s"user $uid: got ${got(uid)}, expected $e")
    }
    Scratch.release(spark)
  }

  // ---- q_retention ----

  test("retention: cells partition the distinct (user, week) stream") {
    val cells = run("q_retention").collect()
    assert(cells.forall(_.getAs[Long]("week_offset") >= 0L))
    val total = cells.map(_.getAs[Long]("n_users")).sum
    val userWeeks = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts DIV 604800000000000").as("w"))
      .distinct().count()
    assert(total == userWeeks,
      s"sum of cells $total != distinct user-weeks $userWeeks")
    // offset-0 cells partition the user population: every user is in
    // exactly one cohort and is active in their own first week
    val offset0 = cells.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(offset0 == users, s"offset-0 total $offset0 != user count $users")
    Scratch.release(spark)
  }

  // ---- q_graph_pagerank ----

  test("pagerank: deterministic under re-execution, ranks positive and ordered") {
    val a = run("q_graph_pagerank").collect().map(r => (r.getLong(0), r.getLong(1)))
    Scratch.release(spark)
    val b = run("q_graph_pagerank").collect().map(r => (r.getLong(0), r.getLong(1)))
    Scratch.release(spark)
    assert(a.sameElements(b), "re-execution changed the top-20")
    assert(a.length == 20)
    assert(a.forall(_._2 > 0L))
    // descending by rank with the node tie-break == already sorted
    assert(a.sameElements(a.sortBy { case (n, r) => (-r, n) }))
  }

  // ---- q_graph_triangles ----

  test("triangles: every triangle lands on exactly three nodes") {
    val counts = run("q_graph_triangles").collect().map(_.getAs[Long]("tri_count"))
    Scratch.release(spark)
    assert(counts.forall(_ > 0L))
    assert(counts.sum % 3 == 0,
      s"per-node counts sum to ${counts.sum}, not a multiple of 3")
  }

  // ---- q_graph_kcore ----

  test("kcore: bounded peel equals the true fixpoint core at bench SF") {
    val got = run("q_graph_kcore").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("degree")).toMap
    // independent driver-side peel to the TRUE fixpoint over the same
    // (bounded) LSH pair list — proves the fixed round count has
    // converged here, so the declared query IS the 2-core
    val pairs = queries.DedupQueries.minhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    Scratch.release(spark)
    var adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val alive = adj.filter(_._2.size >= 2).keySet
      val next = adj.collect {
        case (n, ns) if alive(n) => n -> ns.filter(alive)
      }.filter(_._2.size >= 2)
      changed = next.size != adj.size
      adj = next
    }
    val want = adj.map { case (n, ns) => n -> ns.size.toLong }
    assert(got == want,
      s"bounded peel diverges from the fixpoint core (${got.size} vs ${want.size} nodes)")
    assert(got.nonEmpty, "2-core is empty — the invariant test lost its signal")
  }

  // ---- q_link_predict ----

  test("link predict: candidates are non-edges, identity holds, siblings dominate") {
    val rows = run("q_link_predict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { case (a, b, cn, da, db, jac) =>
      assert(a < b, "pair not canonical")
      assert(jac == cn * 10000 / (da + db - cn), "jaccard identity broke")
      assert(cn >= 1 && cn <= math.min(da, db))
    }
    // none of the predicted pairs may already be an edge
    val edges = graft.queries.DedupQueries.bandPairs(
      graft.queries.DedupQueries.minhashBands(
        graft.queries.GraphAnalyticsQueries.linkCorpus(spark, sf)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Scratch.release(spark)
    rows.foreach { case (a, b, _, _, _, _) =>
      assert(!edges((a, b)), s"predicted pair ($a,$b) is already an edge")
    }
    // the planted signal: two fragments of the same base doc, connected
    // through it but themselves missed by the banding
    val siblings = rows.count { case (a, b, _, _, _, _) =>
      b - a == 100000L && a >= 800000L
    }
    assert(siblings * 10 >= rows.length * 9,
      s"only $siblings/${rows.length} predictions are sibling fragments")
  }

  // ---- q_autocorr ----

  test("autocorr: equals a full scalar recomputation; shifted ratio stays in [0, 2e4]") {
    val hours = Tables.events(spark, sf)
      .selectExpr("event_type", "(ts - pmod(ts, 3600000000000L)) DIV 3600000000000L AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val (minh, maxh) = (hours.map(_._2).min, hours.map(_._2).max)
    val bigT = maxh - minh + 1
    val counts = hours.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = hours.map(_._1).distinct.sorted.flatMap { et =>
      val x = (minh to maxh).map(h => counts.getOrElse(et -> h, 0L)).toArray
      val (s0, sxx) = (x.sum, x.map(v => v * v).sum)
      val den = bigT * bigT * sxx - bigT * s0 * s0
      (1L to 6L).map { l =>
        val n = bigT - l
        val idx = 0 until (bigT - l).toInt
        val sxy = idx.map(t => x(t) * x(t + l.toInt)).sum
        val sxh = idx.map(x(_)).sum
        val syt = idx.map(t => x(t + l.toInt)).sum
        val num = bigT * bigT * sxy - bigT * s0 * (sxh + syt) + n * s0 * s0
        val bp = ((BigInt(num) + BigInt(den)) * 10000 / BigInt(den max 1L)).toLong
        (et, l) -> (n, num, den, bp)
      }
    }.toMap
    val got = run("q_autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, e) =>
      assert(got(k) == e, s"$k: ${got(k)} != scalar $e")
    }
    // the psd bound that keeps every DIV operand non-negative
    got.values.foreach { case (_, num, den, bp) =>
      assert(num.abs <= den, "|num| > den — the biased-estimator bound broke")
      assert(bp >= 0L && bp <= 20000L)
    }
  }

  // ---- q_zorder_layout ----

  test("zorder: interleave expr is the Morton bijection over the full 8+8-bit grid") {
    import spark.implicits._
    def morton(bx: Int, by: Int): Long =
      (0 to 7).map(i => (((bx >> i) & 1).toLong << (2 * i + 1)) |
        (((by >> i) & 1).toLong << (2 * i))).sum
    val got = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("bx", "by")
      .withColumn("z", expr(graft.queries.ExtendedQueries.zExpr("DIV")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 65536)
    got.foreach { case ((x, y), z) =>
      assert(z == morton(x.toInt, y.toInt), s"($x,$y) -> $z != morton")
    }
    assert(got.values.toSet.size == 65536, "interleave is not a bijection")
  }

  test("zorder: x-sort is x-optimal; z-order makes y prunable too") {
    val rows = run("q_zorder_layout").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 4)
    // the single-dim sort is the best possible layout for its own dim
    assert(rows(("xsort", "x"))._2 <= rows(("zorder", "x"))._2,
      "x-sort lost to z-order on its own dimension")
    // ... and z-order buys y-pruning the x-sort cannot have
    assert(rows(("zorder", "y"))._2 < rows(("xsort", "y"))._2,
      "z-order did not improve y-probe pruning")
    rows.foreach { case (k, (nf, touched, skip)) =>
      assert(nf > 0 && touched >= 1 && touched <= 16 * nf, s"$k: bounds violated")
      assert(skip == (16 * nf - touched) * 10000 / (16 * nf), s"$k: skip_bp identity")
    }
  }
}
