package graft

/** Invariants of the corpus-statistics pack that the hash-parity gate
  * can't express directly: the lift surrogate's monotone-PMI and
  * count-consistency properties, and the novelty curve's conservation
  * and monotone-cumulative structure.
  */
class CorpusStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("collocations: floors hold, lift is count-consistent, order is total") {
    val rows = SparkEntry.queries("q_collocations")(spark, sf).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty && rows.length <= queries.CorpusStatsQueries.CollocTopK)
    rows.foreach { r =>
      val cxy = r.getAs[Long]("c_xy")
      val cx = r.getAs[Long]("c_x")
      val cy = r.getAs[Long]("c_y")
      assert(cxy >= queries.CorpusStatsQueries.MinPair)
      // every xy instance contains an x instance and a y instance
      assert(cx >= cxy && cy >= cxy, s"marginal < joint: $r")
      assert(r.getAs[Long]("lift_bp") >= 0L)
    }
    // ranked: lift descending with the bigram tie-break
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (la, lb) = (a.getAs[Long]("lift_bp"), b.getAs[Long]("lift_bp"))
        assert(la > lb || (la == lb &&
          a.getAs[String]("bigram") < b.getAs[String]("bigram")))
      case _ =>
    }
    // lift floor-factorization sanity on one row: recompute from the
    // emitted counts with exact BigInt arithmetic (staged floors)
    val docs = Tables.documents(spark, sf)
    import org.apache.spark.sql.functions._
    val n = docs.select(explode(split(col("text"), " "))).count()
    val m = docs.select(explode(
      call_function("token_shingles_all", col("text"), lit(2)))).count()
    rows.take(5).foreach { r =>
      val s1 = BigInt(r.getAs[Long]("c_xy")) * n / r.getAs[Long]("c_x")
      val s2 = s1 * 10000 / r.getAs[Long]("c_y")
      assert((s2 * n / m).toLong == r.getAs[Long]("lift_bp"), s"lift mismatch: $r")
    }
  }

  test("source sim: all pairs present and canonical, estimate granular, exact arm checks out") {
    val rows = SparkEntry.queries("q_source_sim")(spark, sf).collect()
    Scratch.release(spark)
    val nSources = Tables.documents(spark, sf).select("source").distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2, "one row per source pair")
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"), s"non-canonical: $r")
      val m8 = r.getAs[Long]("match8")
      assert(m8 >= 0L && m8 <= 8L)
      assert(r.getAs[Long]("est_bp") == m8 * 10000 / 8)
      val j = r.getAs[Long]("jac_bp")
      assert(j >= 0L && j <= 10000L, s"jaccard out of range: $r")
    }
    // exact arm re-derivation for the lexicographically first pair
    import org.apache.spark.sql.functions._
    val ssh = Tables.documents(spark, sf).select(col("source"),
        explode(call_function("token_shingles", col("text"), lit(3))).as("sh"))
      .distinct().collect().map(r => r.getString(0) -> r.getString(1))
    val first = rows.minBy(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
    val sa = ssh.filter(_._1 == first.getAs[String]("src_a")).map(_._2).toSet
    val sb = ssh.filter(_._1 == first.getAs[String]("src_b")).map(_._2).toSet
    val inter = (sa & sb).size.toLong
    assert(first.getAs[Long]("jac_bp") ==
      inter * 10000 / (sa.size + sb.size - inter), s"exact arm: $first")
  }

  test("novelty: buckets conserve the distinct-shingle total, cumulative is the running sum") {
    val rows = SparkEntry.queries("q_ngram_novelty")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("bucket")).collect()
    Scratch.release(spark)
    assert(rows.nonEmpty && rows.length <= queries.CorpusStatsQueries.NovBuckets)
    import org.apache.spark.sql.functions._
    val exact = Tables.documents(spark, sf)
      .select(explode(call_function("token_shingles", col("text"), lit(3))).as("sh"))
      .agg(count_distinct(col("sh"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("new_ngrams")).sum == exact,
      "bucket counts must partition the distinct-shingle set")
    assert(rows.last.getAs[Long]("cum_ngrams") == exact)
    var running = 0L
    rows.foreach { r =>
      running += r.getAs[Long]("new_ngrams")
      assert(r.getAs[Long]("cum_ngrams") == running)
      assert(r.getAs[Long]("bucket") >= 0L &&
        r.getAs[Long]("bucket") < queries.CorpusStatsQueries.NovBuckets)
      // denominator = the grand total (== exact, asserted above)
      assert(r.getAs[Long]("novelty_bp") ==
        r.getAs[Long]("new_ngrams") * 10000 / exact)
    }
  }
}
