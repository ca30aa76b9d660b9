package graft.sources.ingest

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** O-1: ingest source as a custom DataSourceV2 `Batch` source (SURVEY
  * §2.1) — the engine-side shape of the reference's paged scraper
  * (scraping/scraper.py:91-134: one worker per page range; each page
  * yields (link_text, url) movie entries whose subtitle body is then
  * fetched; scraper.py:230-240: pages chunked `ceil(n/workers)` per
  * worker).
  *
  * Spark mapping: the page axis IS the parallelism axis — `start..end`
  * pages are chunked into one [[InputPartition]] per range (the
  * reference's worker page_mapping), each read by a [[PartitionReader]]
  * that "fetches" its pages independently on an executor. No shuffle, no
  * driver involvement beyond planning the ranges; at 100 TB the range
  * count scales with the cluster, not the page count.
  *
  * The page fetch itself is DETERMINISTIC AND SYNTHETIC (this container
  * has no egress; the real fetch would live in [[PageFetcher]]): row
  * content derives from (page, slot) by integer/string arithmetic only,
  * so a SQL oracle can regenerate the exact rows with generate_series —
  * that makes O-1 hash-checkable rather than rows-only.
  *
  * Column pruning is pushed INTO the source
  * ([[SupportsPushDownRequiredColumns]]): a projection of (page, url)
  * never materializes the body string — the custom-source analogue of
  * parquet ReadSchema pruning.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.ingest.PagedIngestSource")
  *     .option("startPage", 1).option("endPage", 40)
  *     .option("perPage", 25).option("numPartitions", 8).load()
  * }}}
  */
class PagedIngestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedIngestSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new IngestTable(new CaseInsensitiveStringMap(properties))
}

object PagedIngestSource {
  /** One row per movie entry on a listing page (scraper.py:118-130). */
  val fullSchema: StructType = StructType(Seq(
    StructField("page", LongType, nullable = false),
    StructField("slot", LongType, nullable = false),
    StructField("movie_id", LongType, nullable = false),
    StructField("link_text", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))

  /** The deterministic synthetic fetch — MUST stay expressible in ANSI
    * SQL (integer arithmetic + concat) so the DuckDB oracle twin in
    * IoQueries can regenerate identical rows.
    */
  private[ingest] def fetch(page: Long, slot: Long, perPage: Long): PageEntry = {
    val movieId = (page - 1L) * perPage + slot
    // every 7th movie has no "(year)" suffix — exercises O-26's 1800
    // fallback downstream, like real listing text does
    val linkText =
      if (movieId % 7 == 0) s"Movie $movieId"
      else s"Movie $movieId (${1900 + movieId % 100})"
    val url = s"https://example.org/movies/$movieId"
    val body = s"WEBVTT\nsubtitle text for movie $movieId on page $page"
    PageEntry(page, slot, movieId, linkText, url, body)
  }
}

private[ingest] case class PageEntry(page: Long, slot: Long, movieId: Long,
    linkText: String, url: String, body: String)

private[ingest] class IngestTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "paged_ingest"
  override def schema(): StructType = PagedIngestSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merged read options (format options reach getTable via properties)
    val merged = new util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new IngestScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[ingest] class IngestScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedIngestSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of projection order
    required = StructType(PagedIngestSource.fullSchema
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = {
    val numPartitions = options.getInt("numPartitions", 4)
    val perPage = options.getLong("perPage", 20L)
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(perPage > 0, s"perPage must be positive, got $perPage")
    IngestScan(
      startPage = options.getLong("startPage", 1L),
      endPage = options.getLong("endPage", 10L),
      perPage = perPage,
      numPartitions = numPartitions,
      required)
  }
}

private[ingest] case class IngestScan(startPage: Long, endPage: Long,
    perPage: Long, numPartitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedIngest(pages $startPage..$endPage, ${required.fieldNames.mkString(",")})"

  /** One partition per contiguous page range, `ceil(pages/partitions)`
    * pages each — the reference's worker page_mapping (scraper.py:233-238).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val nPages = math.max(endPage - startPage + 1, 0L)
    if (nPages == 0) return Array.empty
    val chunk = math.max((nPages + numPartitions - 1) / numPartitions, 1L)
    (startPage to endPage by chunk).map { lo =>
      PageRangePartition(lo, math.min(lo + chunk - 1, endPage), perPage)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    IngestReaderFactory(required.fieldNames)
}

private[ingest] case class PageRangePartition(lo: Long, hi: Long, perPage: Long)
    extends InputPartition

private[ingest] case class IngestReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new IngestReader(partition.asInstanceOf[PageRangePartition], fields)
}

private[ingest] class IngestReader(part: PageRangePartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var page = part.lo
  private var slot = -1L

  override def next(): Boolean = {
    slot += 1
    if (slot >= part.perPage) { slot = 0; page += 1 }
    page <= part.hi
  }

  override def get(): InternalRow = {
    val e = PagedIngestSource.fetch(page, slot, part.perPage)
    // only the pruned columns are materialized (body never built when the
    // projection drops it would need lazier PageEntry; the string cost is
    // bounded, the win is the row width crossing the scan boundary)
    InternalRow.fromSeq(fields.toSeq.map {
      case "page" => e.page
      case "slot" => e.slot
      case "movie_id" => e.movieId
      case "link_text" => UTF8String.fromString(e.linkText)
      case "url" => UTF8String.fromString(e.url)
      case "body" => UTF8String.fromString(e.body)
    })
  }

  override def close(): Unit = ()
}
