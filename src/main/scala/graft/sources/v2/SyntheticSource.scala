package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 custom source — the runtime counterpart of the reference's
  * `custom_datasource` load operator (generators/load/custom_datasource.py:
  * register a custom DataSource class, then `spark.read.format(name)`).
  * Usage: `spark.read.format("graft.sources.v2.SyntheticSource")
  * .option("rows", n).option("partitions", p).load()`.
  *
  * Deterministic synthetic rows (id, bucket, payload) split evenly across
  * `partitions` input partitions — each partition generates its own range,
  * so the source scales horizontally with zero driver state.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("partitions", "4").toInt)
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

private class SyntheticTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + partitions - 1) / partitions)
        (0 until partitions).map { p =>
          SyntheticPartition(p.toLong * per, math.min(rows, (p + 1).toLong * per))
        }.filter(p => p.start < p.end).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val sp = partition.asInstanceOf[SyntheticPartition]
          new PartitionReader[InternalRow] {
            private var i = sp.start - 1
            override def next(): Boolean = { i += 1; i < sp.end }
            override def get(): InternalRow =
              InternalRow(i, (i % 10).toInt, UTF8String.fromString(s"row-$i"))
            override def close(): Unit = ()
          }
        }
    }
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition
