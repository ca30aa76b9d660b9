package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "a" * 100,                      // multiple exact-ish chunks
    "b" * 64,                       // exactly one chunk
    "c" * 65,                       // one byte over
    "short",
    "one two three four five six seven eight nine ten",
    "x")

  private def df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("chunk concatenation reconstructs the input (preprocessing_agent.py:370-374)") {
    val back = Chunker.chunkChars(df, "text", 64, Seq("doc_id"))
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("chunk_id"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val joined = back.join(df, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(joined == 0)
  }

  test("chunk count and size bounds") {
    val counts = Chunker.chunkChars(df, "text", 64, Seq("doc_id"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = math.max(1, math.ceil(t.length / 64.0).toLong)
      assert(counts(i.toLong) == expect, s"doc $i")
    }
    val oversize = Chunker.chunkChars(df, "text", 64, Seq("doc_id"))
      .filter(length(col("chunk")) > 64).count()
    assert(oversize == 0)
  }

  test("edge cases: empty text yields one empty chunk/window, never zero rows") {
    val edf = Seq((0L, "")).toDF("doc_id", "text")
    val chunks = Chunker.chunkChars(edf, "text", 64, Seq("doc_id")).collect()
    assert(chunks.length == 1 && chunks(0).getAs[String]("chunk") == "")
    val wins = Chunker.slidingTokenWindows(edf, "text", 4, 2, Seq("doc_id")).collect()
    assert(wins.length == 1 && wins(0).getAs[Long]("window_end") == 1L,
      "split('') is [''] — one token, one window")
  }

  test("window count == ceil(n/stride) and reference bounds (model.py:89-105)") {
    val w = Chunker.slidingTokenWindows(df, "text", 4, 2, Seq("doc_id"))
    val counts = w.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.split(" ", -1).length
      assert(counts(i.toLong) == math.max(1, math.ceil(n / 2.0).toLong), s"doc $i")
    }
    // window_end = min(start + size, n); start = id*stride
    val bad = w.join(df.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
      .filter(col("window_start") =!= col("window_id") * 2 ||
        col("window_end") =!= least(col("window_start") + 4, col("n")))
      .count()
    assert(bad == 0)
  }
}
