package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Path, Paths}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Whole-file text source + text sink (O-2, O-5; SURVEY.md §2.1).
  *
  * The reference reads one `Title_Year.txt` per movie with the key
  * encoded in the filename (emotion_analysis/model.py:189-215,
  * scraping/scraper.py:137-153) and writes cleaned text back the same
  * way (preprocessing_agent.py:326-331). The Spark shape:
  * `spark.read.option("wholetext", true).text(dir)` + `input_file_name()`
  * parsed with `regexp_extract` — one task per file, no shuffle, scales
  * with file count.
  */
object TextFiles {

  /** O-5 text sink: one `doc_<id>__<source>.txt` per row, written from
    * the executors via foreachPartition (the per-movie file layout the
    * reference uses; engine-internal bulk data would be parquet).
    *
    * Cluster-safe: all IO goes through the Hadoop [[FileSystem]] resolved
    * from `outDir`'s scheme, so executors on different hosts land files in
    * the SAME shared filesystem (HDFS/S3A/file:) instead of each writing
    * its own local disk. The key is sanitized to `[A-Za-z0-9._-]` — a `/`
    * or other separator in a raw key would both break the write path and
    * defeat the `doc_(\d+)__([^/]+)` recovery regex on read.
    *
    * The sanitization is LOSSY BY DESIGN, mirroring the reference's own
    * `Title_Year.txt` slugging (scraper.py `_save`: spaces → `_`): keys
    * differing only in unsafe characters collide, and a read-back
    * recovers the slug, not the original. The lossless round-trip
    * contract (o02) therefore requires filename-safe keys; keys that
    * need exact recovery belong in a columnar sink, not filenames.
    */
  def writeTextFiles(df: DataFrame, idCol: String, keyCol: String,
      textCol: String, outDir: String): Unit = {
    val hconf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new HPath(outDir)
    // idempotent sink: clear stale files from previous runs, or the
    // subsequent directory scan would read them too
    val fs = dir.getFileSystem(hconf.value)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val projected = df.select(col(idCol).cast("string"),
      regexp_replace(col(keyCol).cast("string"), "[^A-Za-z0-9._-]", "_"),
      col(textCol))
    // Parallel writers: a narrow upstream (e.g. a one-file parquet scan)
    // would otherwise funnel every per-file create through ONE task —
    // measured 4.6 s vs 0.9 s for 500 files at local[32]. Already-wide
    // inputs keep their partitioning (no extra shuffle at scale).
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (projected.rdd.getNumPartitions < par) projected.repartition(par)
      else projected
    spread
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val d = new HPath(outDir)
        // Skip the client-side .crc twin on checksummed filesystems
        // (LocalFileSystem wraps every create in a second checksum-file
        // create — pure per-file metadata overhead for a text sink;
        // HDFS/S3A are not ChecksumFileSystems and pass through).
        val efs = d.getFileSystem(hconf.value) match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case other => other
        }
        rows.foreach { r =>
          val p = new HPath(d, s"doc_${r.getString(0)}__${r.getString(1)}.txt")
          val out = efs.create(p, true)
          try out.write(r.getString(2).getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }
  }

  /** O-2 whole-file scan: each file is ONE row; the filename key is
    * recovered with regexp_extract on input_file_name (O-26's inverse
    * split, graph_creator.py:292-302).
    */
  def readWholeFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .withColumn("_file", input_file_name())
      .select(
        regexp_extract(col("_file"), "doc_(\\d+)__([^/]+)\\.txt$", 1)
          .cast("long").as("doc_id"),
        regexp_extract(col("_file"), "doc_(\\d+)__([^/]+)\\.txt$", 2).as("source"),
        col("value").as("text"))

  /** Round-trip helper for the declared query: sink documents to a
    * scratch dir once, read them back whole. The scratch dir is keyed by
    * the input dir so sf0.001/sf0.01 runs don't collide. Capped at 500
    * docs (same cap in the oracle) — the operator under test is the
    * file-per-row layout, not the filesystem's small-file throughput.
    */
  def roundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 500)
    val out: Path = Paths.get(sys.props("java.io.tmpdir"),
      "graft_wholefile_" + graft.Scratch.dirTag(sfDir))
    writeTextFiles(docs, "doc_id", "source", "text", out.toString)
    readWholeFiles(spark, out.toString)
  }
}
