package graft

import org.apache.spark.sql.functions._

/** Invariants of the r14 additions the hash-parity gate can't express:
  * SemDeDup's recall against the PLANTED near-dup pairs (the declared
  * result is whatever pairs share a cluster — this pins how many planted
  * pairs that finds), and the MMR greedy-selection laws (monotone pick
  * scores, diversity, candidate membership).
  */
class RerankDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("semantic dedup: finds nearly all planted pairs, keeper is the original") {
    val rows = SparkEntry.queries("q_dedup_semantic")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty)
    // every reported pair is a real near-dup above the threshold
    rows.foreach { r =>
      assert(r.getAs[Double]("cos") >= 0.98, s"pair below threshold: $r")
    }
    // the planted corpus is (v, v+100000) twins: drop = the mutated copy,
    // keep = its source. SemDeDup misses only pairs straddling a cluster
    // boundary — recall >= 95% of the 500 planted pairs at sf0.001.
    val planted = rows.filter(r =>
      r.getAs[Long]("drop_id") == r.getAs[Long]("keep_id") + 100000L)
    assert(planted.length >= 475,
      s"SemDeDup found only ${planted.length}/500 planted pairs")
    assert(rows.length == planted.length,
      "unexpected non-planted pair above 0.98 in the synthetic corpus")
  }

  test("mmr: k picks per probe, distinct, from the candidate pool, scores non-increasing") {
    val sel = SparkEntry.queries("q_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("step"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    Scratch.release(spark)
    val byProbe = sel.groupBy(_._1)
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (p, picks) =>
      assert(picks.length == 8, s"probe $p: expected 8 picks")
      assert(picks.map(_._3).distinct.length == 8, s"probe $p: repeated pick")
      // greedy law: the pool only shrinks and maxsim only grows as S
      // grows, so each step's best score cannot exceed the previous
      val ordered = picks.sortBy(_._2).map(_._4).toSeq
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(b <= a + 1e-9, s"probe $p: pick scores increased $a -> $b")
      }
    }
  }

  test("mmr: first pick is the relevance argmax; later picks trade rel for diversity") {
    val sf001 = sf
    val sel = SparkEntry.queries("q_mmr_rerank")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("step"), r.getAs[Long]("vec_id")))
    Scratch.release(spark)
    // recompute the exact top-1 per probe independently
    val emb = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), graft.functions.VectorOps.toDoubleArr(col("embedding")).as("e"))
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("e").as("pv"))
    val top1 = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.cosineSimilarityNative(col("e"), col("pv")).as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(col("c").desc, col("vec_id"))))
      .filter(col("rk") === 1)
      .select("probe_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sel.filter(_._2 == 1L).foreach { case (p, _, v) =>
      assert(top1(p) == v, s"probe $p: first MMR pick $v != relevance argmax ${top1(p)}")
    }
  }

  test("quantile sketch: exact arm matches a local sort; bin brackets it") {
    import spark.implicits._
    // skewed synthetic distribution with known quantiles
    val vals = ((1 to 900).map(_ => 10L) ++ (1 to 90).map(_ => 100L) ++
      (1 to 10).map(_ => 1000L))
    val out = graft.queries.SketchQueries.quantilesOf(vals.toDF("tc")).collect()
      .map(r => r.getAs[Long]("q_bp") ->
        (r.getAs[Long]("exact_q"), r.getAs[Long]("est_lo"), r.getAs[Long]("est_hi")))
      .toMap
    Scratch.release(spark)
    val sorted = vals.sorted
    def exactQ(bp: Long): Long = sorted(((bp * vals.length + 9999) / 10000 - 1).toInt)
    Seq(5000L, 9000L, 9900L).foreach { bp =>
      val (ex, lo, hi) = out(bp)
      assert(ex == exactQ(bp), s"q$bp: exact $ex != ${exactQ(bp)}")
      assert(lo <= ex && ex <= hi, s"q$bp: [$lo,$hi] does not bracket $ex")
    }
  }
}
