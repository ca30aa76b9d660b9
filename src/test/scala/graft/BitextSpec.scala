package graft

import org.apache.spark.sql.functions._

/** q_bitext_mine (r18 — VERDICT r17 next #8): the margin-based
  * aligned-pair criterion must RECOVER the planted alignments — corpus
  * B is the +0.05/+200000 perturbed replica of corpus A, so for every
  * probe x the aligned counterpart is x+200000 by construction, and
  * the margin (cos vs the two neighborhoods' mean) should rank it
  * first. Measured: 50/50 planted-top-1 at sf0.001, sf0.01 AND sf0.1
  * with min margin ≥ 2.0× the neighborhood mean — this spec pins the
  * sf0.001 behavior (the sf0.1 replication is part of the round's
  * Verify protocol).
  */
class BitextSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every probe's top-margin pair is its planted +200000 counterpart") {
    val rows = SparkEntry.queries("q_bitext_mine")(spark, sf)
      .filter(col("mrk") === 1L).collect()
    assert(rows.length == queries.VectorQueries.BitextProbes,
      "a probe lost all its candidate pairs")
    rows.foreach { r =>
      val probe = r.getAs[Long]("probe_id")
      val cand = r.getAs[Long]("vec_id")
      assert(cand == probe + 200000L,
        s"probe $probe mined $cand, not its planted counterpart")
    }
  }

  test("planted pairs stand out: margin at least 1.5x the neighborhood mean") {
    val minMargin = SparkEntry.queries("q_bitext_mine")(spark, sf)
      .filter(col("mrk") === 1L)
      .agg(min(col("margin_bp"))).head().getLong(0)
    assert(minMargin >= 15000L, s"weakest mined margin $minMargin bp")
  }

  test("margins are well-formed: positive, and mrk densely ranks each probe") {
    val df = SparkEntry.queries("q_bitext_mine")(spark, sf)
    assert(df.filter(col("margin_bp") <= 0).count() == 0)
    // mrk is 1..n per probe with no gaps
    val bad = df.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), max(col("mrk")).as("mx"), min(col("mrk")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
      .count()
    assert(bad == 0, "mrk is not a dense 1..n ranking per probe")
  }
}
