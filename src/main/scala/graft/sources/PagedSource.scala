package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 re-expression of the reference's paginated-API extraction
  * (reference: sp_airflow/dags/spotify_etl_v2.py:147-189, 229-268 — a
  * sequential `while True: fetch(limit, offset)` loop per artist/album).
  *
  * The pagination STATE MACHINE becomes PARTITION PLANNING: the scan
  * plans one `InputPartition` per contiguous page range, so a
  * 1000-executor cluster drains the catalog in parallel while each task
  * walks its own pages in order — the reference's per-page cursor
  * semantics, minus the single-process bottleneck. Column pruning is
  * pushed into the reader (`SupportsPushDownRequiredColumns`): a
  * metadata-only query materializes no payload strings.
  *
  * The remote catalog is SIMULATED deterministically from (seed, total):
  * this container has no network, and the simulation keeps every Spark
  * seam — schema declaration, partition planning, reader lifecycle,
  * pruning — real and testable. A production implementation replaces
  * `PageCatalog.fetchPage` with the HTTP call (plus the retry/pacing
  * policy the reference wires at spotify_etl_v2.py:36-49,116).
  *
  * Usage:
  * {{{
  * spark.read.format("graft-pages")
  *   .option("total", 1000).option("pageSize", 25).option("pagesPerSplit", 4)
  *   .load()
  * }}}
  */
class PagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

object PagedSource {
  /** Album-page shape (reference payload walk at spotify_etl_v2.py:159-169). */
  val SCHEMA: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("album_id", StringType, nullable = false),
    StructField("album_name", StringType, nullable = false),
    StructField("release_date", StringType, nullable = false),
    StructField("total_tracks", IntegerType, nullable = false)))
}

/** The simulated remote catalog: deterministic records from (seed, id). */
object PageCatalog {
  def fetchPage(seed: Long, pageSize: Int, page: Int,
                total: Long): Iterator[Array[Any]] = {
    val start = page.toLong * pageSize
    val end = math.min(start + pageSize, total)
    (start until end).iterator.map { id =>
      val h = (id + seed) * 0x9E3779B97F4A7C15L
      val datePrecision = (h >>> 8) % 3 // the variable-precision release_date
      val year = 1990 + ((h >>> 16) % 35).toInt
      val month = 1 + ((h >>> 24) % 12).toInt
      val day = 1 + ((h >>> 32) % 28).toInt
      val date = datePrecision match {
        case 0 => f"$year%04d"
        case 1 => f"$year%04d-$month%02d"
        case _ => f"$year%04d-$month%02d-$day%02d"
      }
      Array[Any](id, page, f"alb$id%012d", s"Album $id", date,
        1 + ((h >>> 40) % 20).toInt)
    }
  }
}

class PagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_pages"
  override def schema(): StructType = PagedSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val total = opts.getLong("total", 1000L)
    val pageSize = opts.getInt("pageSize", 25) // the reference's album page size (:150)
    val pagesPerSplit = opts.getInt("pagesPerSplit", 4)
    require(total >= 0, s"graft-pages: option 'total' must be >= 0, got $total")
    require(pageSize > 0, s"graft-pages: option 'pageSize' must be > 0, got $pageSize")
    require(pagesPerSplit > 0,
      s"graft-pages: option 'pagesPerSplit' must be > 0, got $pagesPerSplit")
    new PagedScanBuilder(total, pageSize, pagesPerSplit, opts.getLong("seed", 42L))
  }
}

class PagedScanBuilder(total: Long, pageSize: Int, pagesPerSplit: Int,
                       seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedSource.SCHEMA
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new PagedScan(total, pageSize, pagesPerSplit, seed, required)
}

case class PageRangePartition(firstPage: Int, lastPage: Int) extends InputPartition

class PagedScan(total: Long, pageSize: Int, pagesPerSplit: Int, seed: Long,
                required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages(total=$total, pageSize=$pageSize, pagesPerSplit=$pagesPerSplit)"

  override def planInputPartitions(): Array[InputPartition] = {
    val nPagesL = (total + pageSize - 1) / pageSize
    require(nPagesL <= Int.MaxValue,
      s"graft-pages: $total items at pageSize $pageSize is $nPagesL pages — " +
        "exceeds the Int page-index range; raise pageSize")
    val nPages = nPagesL.toInt
    (0 until nPages by pagesPerSplit).map { first =>
      PageRangePartition(first, math.min(first + pagesPerSplit, nPages) - 1)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (t, ps, s) = (total, pageSize, seed)
    val fieldIdx = required.fieldNames.map(PagedSource.SCHEMA.fieldIndex)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val range = p.asInstanceOf[PageRangePartition]
        new PartitionReader[InternalRow] {
          private val rows = (range.firstPage to range.lastPage).iterator
            .flatMap(page => PageCatalog.fetchPage(s, ps, page, t))
          private var current: Array[Any] = _
          override def next(): Boolean = {
            if (rows.hasNext) { current = rows.next(); true } else false
          }
          override def get(): InternalRow = {
            // prune to the pushed-down columns; strings only materialize
            // if requested
            InternalRow.fromSeq(fieldIdx.toSeq.map { i =>
              current(i) match {
                case s: String => UTF8String.fromString(s)
                case other => other
              }
            })
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}
