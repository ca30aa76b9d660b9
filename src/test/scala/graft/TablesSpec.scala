package graft

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Environment-drift guard (VERDICT r9 #3): the r9 round went RED because
  * the driver regenerated `/root/testdata` with `events.ts` as parquet
  * TIMESTAMP(MICROS) instead of TIMESTAMP(NANOS), silently bypassing the
  * `nanosAsLong` conf and breaking 11 queries at analysis time. This
  * suite pins the POST-normalization schema of every TESTDATA table so
  * the next silent data change fails one named test instead of 11
  * queries — and proves the `Tables.normalizeEventTs` seam handles both
  * physical layouts (µs TIMESTAMP[_NTZ] and ns LONG) identically.
  */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("events.ts normalizes to a ns-epoch LONG regardless of physical type") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === LongType,
      s"post-seam events.ts must be a ns LONG, got ${df.schema("ts").dataType}")
    // ns magnitude sanity: an epoch-µs value mistakenly passed through
    // unscaled would be ~1e15; a real ns epoch for any plausible date is
    // >1e17 (≈ 1973 in ns). Catches a missing *1000 either way.
    val ts = df.selectExpr("min(ts)", "max(ts)").head()
    assert(ts.getLong(0) > 100000000000000000L, s"min ts ${ts.getLong(0)} not ns-scale")
    assert(ts.getLong(1) < 4102444800L * 1000000000L, "max ts past year 2100 — double-scaled?")
  }

  test("normalizeEventTs: µs TIMESTAMP_NTZ and ns LONG layouts agree") {
    import spark.implicits._
    val base = 1700000000L // 2023-11-14T22:13:20Z
    val micros = Seq(base * 1000000L + 123456L, base * 1000000L + 999999L)
    // synthetic µs/NTZ flip: same instants as naive timestamps vs ns longs
    val ntz = micros.map(u => Timestamp.valueOf(
        java.time.LocalDateTime.ofEpochSecond(u / 1000000L, (u % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC)))
      .toDF("ts").select($"ts".cast(TimestampNTZType).as("ts"))
    val ns = micros.map(_ * 1000L).toDF("ts")
    val fromNtz = Tables.normalizeEventTs(ntz).as[Long].collect().sorted.toSeq
    val fromNs = Tables.normalizeEventTs(ns).as[Long].collect().sorted.toSeq
    assert(fromNtz == fromNs, s"$fromNtz vs $fromNs")
    assert(fromNtz == micros.map(_ * 1000L).sorted)
  }

  test("normalizeEventTs rejects an unexpected ts type loudly") {
    import spark.implicits._
    val bad = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("all TESTDATA tables load with their expected column names") {
    val expected = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("region" -> Tables.region, "nation" -> Tables.nation,
        "events" -> Tables.events, "documents" -> Tables.documents,
        "embeddings" -> Tables.embeddings)
    expected.foreach { case (name, cols) =>
      val got = loaders(name)(spark, dir).columns.toSet
      assert(cols.subsetOf(got), s"$name missing ${cols -- got}")
    }
  }

  test("planted-namespace offsets have headroom over the real id ranges") {
    // The dedup/upsert/phash packs plant synthetic rows at id + k·100000
    // (k = 1..7 across the query packs). The semantics silently break if
    // a regen ever pushes real ids past the smallest offset (ADVICE r15
    // #2) — this canary fails FIRST, naming the seam to fix (derive the
    // offsets from max(id) instead of widening them).
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { sf =>
      val maxDoc = Tables.documents(spark, sf)
        .agg(max(col("doc_id"))).head().getLong(0)
      val maxVec = Tables.embeddings(spark, sf)
        .agg(max(col("vec_id"))).head().getLong(0)
      // 10× headroom under the smallest namespace offset: a planted id
      // must never collide with a real id OR a neighboring namespace
      assert(maxDoc < 10000L, s"$sf doc_id range $maxDoc crowds the +100000 namespaces")
      assert(maxVec < 10000L, s"$sf vec_id range $maxVec crowds the +100000 namespaces")
    }
  }
}
