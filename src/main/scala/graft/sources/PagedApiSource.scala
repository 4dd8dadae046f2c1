package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** B1 — paginated source scan as a proper DataSource V2 connector.
  *
  * The reference walks the Directory API page by page in one goroutine,
  * throttled to 4 req/s (main.go:193-218, 100-102) — pagination there is a
  * *serial* concern. Here each page is an [[InputPartition]], so a
  * 1000-executor cluster fetches 1000 pages concurrently and Spark's
  * scheduler handles retry/locality; per-partition rate limiting would sit
  * inside the reader where the transport call goes.
  *
  * The transport is STUBBED (this container has no egress): rows are
  * deterministic fakes derived from (page, index) — the same pattern as
  * [[graft.operators.Multimodal.decodeStub]]. The connector surface
  * (TableProvider → ScanBuilder → Batch → PartitionReaderFactory →
  * PartitionReader) is the real production shape; a live implementation
  * replaces only [[PagedApiPartitionReader]]'s row synthesis with an HTTP
  * call using `page` as the page token.
  *
  * Usage:
  *   spark.read.format("graft.sources.PagedApiSource")
  *     .option("pages", 8).option("pageSize", 250).load()
  */
class PagedApiSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApiSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive case-preserved here (unlike inferSchema's map).
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedApiTable(opts.getInt("pages", 4), opts.getInt("pagesize", 100))
  }
}

object PagedApiSource {
  val schema: StructType = StructType(Seq(
    StructField("email", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("isExternal", BooleanType, nullable = false)))
}

private class PagedApiTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged_api(pages=$pages, pageSize=$pageSize)"
  override def schema(): StructType = PagedApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedApiSource.schema
      override def toBatch: Batch = this
      // One partition per API page — the pagination boundary IS the
      // parallelism boundary.
      override def planInputPartitions(): Array[InputPartition] =
        (0 until pages).map(p => PagedApiPartition(p, pageSize): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val p = partition.asInstanceOf[PagedApiPartition]
          new PagedApiPartitionReader(p.page, p.pageSize)
        }
    }
}

private case class PagedApiPartition(page: Int, pageSize: Int) extends InputPartition

/** One "API page" of deterministic fake directory rows. A live reader
  * performs the HTTP fetch (with local rate limiting) here. */
private class PagedApiPartitionReader(page: Int, pageSize: Int)
  extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < pageSize }
  override def get(): InternalRow = {
    val n = page * pageSize + i
    InternalRow(
      UTF8String.fromString(s"user$n@domain.example"),
      page, i, n % 7 == 0)
  }
  override def close(): Unit = ()
}
