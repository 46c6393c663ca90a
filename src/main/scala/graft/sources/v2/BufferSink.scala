package graft.sources.v2

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 custom sink — the runtime counterpart of the reference's
  * `sink_type: custom` write operator (generators/write/sinks/
  * custom_sink.py:14,64: register a user DataSink class, then
  * `writeStream.format(sink_name)`). Here the user supplies a classpath
  * `TableProvider` with `SupportsWrite`; this class is the reference
  * implementation demonstrating the full two-phase commit protocol (the
  * write-side mirror of [[SyntheticSource]]): per-task writers buffer rows
  * and surrender them in a `WriterCommitMessage`; the DRIVER-side commit
  * publishes all messages at once, so partial task output is never visible —
  * the shape any real V2 sink (HTTP, JDBC, queue) must follow.
  *
  * Rows land in a JVM-local registry keyed by the `buffer` option; batch and
  * streaming (epoch-committed) writes are both supported.
  */
class BufferSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BufferTable(properties.asScala.getOrElse("buffer", "default"))
}

object BufferSink {
  private val buffers =
    new java.util.concurrent.ConcurrentHashMap[String, util.List[Seq[Any]]]()
  // committed epochs per buffer: the streaming commit can REPLAY an epoch
  // (driver dies after publish, before the checkpoint commit log records
  // it) — re-publishing the same epoch would duplicate its rows, and this
  // class is the exactly-once reference shape a real V2 sink copies
  private val epochs =
    new java.util.concurrent.ConcurrentHashMap[String, util.Set[java.lang.Long]]()

  def rows(buffer: String): Seq[Seq[Any]] =
    Option(buffers.get(buffer)).map(_.asScala.toSeq).getOrElse(Nil)

  def clear(buffer: String): Unit = {
    buffers.remove(buffer): Unit
    epochs.remove(buffer): Unit
  }

  private[v2] def publish(buffer: String, rows: Seq[Seq[Any]]): Unit = {
    buffers.computeIfAbsent(buffer,
      _ => util.Collections.synchronizedList(new util.ArrayList[Seq[Any]]()))
      .addAll(rows.asJava): Unit
  }

  /** Idempotent per-epoch publish: first commit of (buffer, epoch) wins,
    * replays are no-ops — the txn-identity dedup every exactly-once sink
    * needs (the TableStore change-log's (flow, batch) precedent). */
  private[v2] def publishEpoch(buffer: String, epochId: Long,
      rows: => Seq[Seq[Any]]): Unit = {
    val seen = epochs.computeIfAbsent(buffer,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]())
    if (seen.add(epochId)) publish(buffer, rows)
  }
}

private class BufferTable(buffer: String) extends Table with SupportsWrite {
  override def name(): String = s"buffer($buffer)"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BufferBatchWrite(buffer, info.schema())
        override def toStreaming: StreamingWrite = new BufferStreamingWrite(buffer, info.schema())
      }
    }
}

private class BufferBatchWrite(buffer: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    BufferWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case BufferCommit(rs) => BufferSink.publish(buffer, rs) }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class BufferStreamingWrite(buffer: String, schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    BufferWriterFactory(schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    BufferSink.publishEpoch(buffer, epochId,
      messages.toSeq.flatMap { case BufferCommit(rs) => rs })
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private case class BufferWriterFactory(schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BufferDataWriter(schema)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new BufferDataWriter(schema)
}

private class BufferDataWriter(schema: StructType) extends DataWriter[InternalRow] {
  private val buf = mutable.ArrayBuffer[Seq[Any]]()
  override def write(r: InternalRow): Unit =
    buf += r.toSeq(schema).map { case s: UTF8String => s.toString; case v => v }
  override def commit(): WriterCommitMessage = BufferCommit(buf.toSeq)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

private case class BufferCommit(rows: Seq[Seq[Any]]) extends WriterCommitMessage
