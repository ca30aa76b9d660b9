package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** O-1 paged-ingest DataSourceV2 source: partition planning, column
  * pruning pushdown, determinism, edge ranges.
  */
class IngestSourceSpec extends SparkSpec {

  private def read(start: Long, end: Long, perPage: Long, parts: Int): DataFrame =
    spark.read.format("graft.sources.ingest.PagedIngestSource")
      .option("startPage", start).option("endPage", end)
      .option("perPage", perPage).option("numPartitions", parts)
      .load()

  test("one InputPartition per page range, ceil-chunked like the reference") {
    assert(read(1, 40, 25, 8).rdd.getNumPartitions == 8)
    // 5 pages over 4 partitions -> chunk 2 -> 3 ranges
    assert(read(1, 5, 10, 4).rdd.getNumPartitions == 3)
    // more partitions than pages degrades to one page per partition
    assert(read(1, 3, 10, 16).rdd.getNumPartitions == 3)
  }

  test("row count and determinism across runs") {
    val df = read(1, 40, 25, 8)
    assert(df.count() == 40L * 25)
    val a = df.orderBy("movie_id").collect()
    val b = read(1, 40, 25, 8).orderBy("movie_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("column pruning is pushed into the source scan") {
    val pruned = read(1, 10, 20, 2).select("page", "url")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    val readCols = scan.scan.readSchema().fieldNames.toSet
    assert(readCols == Set("page", "url"),
      s"source materialized unrequested columns: $readCols")
  }

  test("empty and single-page ranges") {
    assert(read(5, 4, 10, 4).count() == 0)
    val one = read(7, 7, 3, 4)
    assert(one.count() == 3)
    assert(one.agg(min("movie_id"), max("movie_id")).head().toSeq == Seq(18L, 20L))
  }

  test("link text exercises the year/no-year split") {
    val df = read(1, 2, 25, 2)
    val noYear = df.filter(col("movie_id") % 7 === 0).select("link_text").collect()
    assert(noYear.nonEmpty && noYear.forall(!_.getString(0).contains("(")))
    val withYear = df.filter(col("movie_id") % 7 =!= 0).select("link_text").head()
    assert(withYear.getString(0).matches(""".*\(\d{4}\)$"""))
  }
}
