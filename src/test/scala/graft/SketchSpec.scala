package graft

import org.apache.spark.sql.functions._

import graft.queries.SketchQueries

/** Invariants of the sketch family (SketchQueries) that the DuckDB
  * hash-parity gate can't express: HLL estimation error on a corpus of
  * KNOWN cardinality, the CMS no-underestimate guarantee, and the Bloom
  * no-false-negative guarantee on a PLANTED cross-split duplicate (the
  * declared corpus has no cross-split exact dups, so true_positives = 0
  * there and the guarantee would otherwise go untested).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll: 50k known-distinct values estimate within 3 sigma (6.5% * 3)") {
    val n = 50000
    val tok = (1 to n).map(i => s"value_$i").toDF("sh")
    val est = SketchQueries.hllEstimate(SketchQueries.hllRegistersOf(tok))
    assert(math.abs(est - n) / n.toDouble < 0.195,
      s"HLL estimate $est too far from $n")
  }

  test("hll: duplicated stream estimates the DISTINCT count, not the row count") {
    val tok = (1 to 2000).flatMap(i => Seq.fill(25)(s"v$i")).toDF("sh")
    val est = SketchQueries.hllEstimate(SketchQueries.hllRegistersOf(tok))
    assert(math.abs(est - 2000) / 2000.0 < 0.195,
      s"HLL estimate $est should track 2000 distinct, not 50000 rows")
  }

  test("cms: never underestimates, and never exceeds the stream size") {
    // zipfian-ish: value i appears ceil(600/i) times
    val tok = (1 to 300).flatMap(i => Seq.fill(600 / i + 1)(s"t$i")).toDF("sh")
    val total = tok.count()
    val rows = SketchQueries.heavyHittersOf(tok)
      .select("exact_cnt", "cms_est").as[(Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (exact, est) =>
      assert(est >= exact, s"CMS underestimated: $est < $exact")
      assert(est <= total, s"CMS estimate $est exceeds stream size $total")
    }
  }

  test("bloom: planted cross-split duplicate is never a false negative") {
    // doc_id 11 is a test doc under the Knuth split; give train docs 1
    // and 2 the same text -> both MUST be bloom-positive AND
    // true-positive. Filler train docs are distinct.
    val bucket = (id: Long) => id * 2654435761L % 4294967296L % 100
    assert(bucket(11L) >= 90 && bucket(1L) < 90 && bucket(2L) < 90)
    val docs = (Seq((11L, "shared secret text"), (1L, "shared secret text"),
      (2L, "shared secret text")) ++
      (12L to 60L).filter(bucket(_) < 90).map(i => (i, s"filler doc $i")))
      .toDF("doc_id", "text")
    val r = SketchQueries.bloomSummary(docs)
      .select("bloom_positives", "true_positives").as[(Long, Long)].head()
    assert(r._2 == 2, s"expected exactly the two planted dups as true positives, got $r")
    assert(r._1 >= r._2, s"bloom positives must cover all true positives: $r")
  }

  test("bloom: bits formula is pow2ceil(8n) with a 512 floor") {
    assert(SketchQueries.bloomBitsFor(0) == 512)
    assert(SketchQueries.bloomBitsFor(64) == 512)
    assert(SketchQueries.bloomBitsFor(65) == 1024)
    assert(SketchQueries.bloomBitsFor(128) == 1024)
    assert(SketchQueries.bloomBitsFor(500) == 4096)
    assert(SketchQueries.bloomBitsFor(1L << 40) == (1L << 43))
  }

  test("streaming hll: multi-batch complete-mode registers equal the batch sketch") {
    val sf = "/root/testdata/sf0.001"
    // the mergeability claim made concrete: 3 genuine micro-batches
    // (enforced inside the twin) must finish in EXACTLY the batch state
    val streamed = graft.streaming.StreamingTwins.hllRegisters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SketchQueries.hllRegistersOf(
      Tables.events(spark, sf)
        .select(col("user_id").cast("string").as("sh")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"streamed registers diverge from batch: ${streamed.size} vs ${batch.size}")
  }
}
