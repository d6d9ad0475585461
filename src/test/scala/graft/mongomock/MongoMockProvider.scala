package graft.mongomock

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY in-process double for the MongoDB Spark connector: a
  * DataSourceV2 `TableProvider` registered (test classpath only, via
  * META-INF/services) under the connector's short name `mongodb`, so
  * `Sinks.writeMongo`'s `format("mongodb").mode(Overwrite).save()`
  * executes Spark's REAL DSv2 write path — V1→V2 mode mapping,
  * truncate-capability negotiation, writer-factory serialization to
  * tasks, per-partition writers, driver-side commit — and this double
  * records what crossed the boundary for the contract test to assert.
  *
  * The real connector jar cannot resolve in this environment (zero
  * egress, COURSIER_MODE=offline, no jar on disk — checked `/` and the
  * coursier cache), so the wire protocol itself stays untested here;
  * everything up to the connector API surface is now executed, not
  * string-asserted. */
object MongoMock {
  case class Recorded(options: Map[String, String], truncated: Boolean,
                      schema: StructType, productIds: Seq[String], nRows: Long)
  @volatile var last: Option[Recorded] = None
  def reset(): Unit = { last = None }
}

case class IdsMessage(ids: Seq[String], n: Long) extends WriterCommitMessage

class MongoMockProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mongodb"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MongoMockTable(schema)
}

class MongoMockTable(tableSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "mongomock"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MongoMockWriteBuilder(info)
}

class MongoMockWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncated = false
  // V1 SaveMode.Overwrite arrives here as truncate() — the semantics the
  // reference's delete_many({}) expects
  override def truncate(): WriteBuilder = { truncated = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val opts = {
        val it = info.options.entrySet().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
        b.result()
      }
      new MongoMockBatchWrite(info.schema(), opts, truncated)
    }
  }
}

class MongoMockBatchWrite(schema: StructType, options: Map[String, String],
                          truncated: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MongoMockWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ids = messages.collect { case m: IdsMessage => m }
    MongoMock.last = Some(MongoMock.Recorded(
      options, truncated, schema,
      ids.flatMap(_.ids).toSeq.sorted, ids.map(_.n).sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class MongoMockWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MongoMockWriter(schema)
}

class MongoMockWriter(schema: StructType) extends DataWriter[InternalRow] {
  private val idIdx = schema.fieldNames.indexOf("product_id")
  private val ids = Seq.newBuilder[String]
  private var n = 0L
  override def write(row: InternalRow): Unit = {
    if (idIdx >= 0 && !row.isNullAt(idIdx))
      ids += row.getUTF8String(idIdx).toString
    n += 1
  }
  override def commit(): WriterCommitMessage = IdsMessage(ids.result(), n)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
