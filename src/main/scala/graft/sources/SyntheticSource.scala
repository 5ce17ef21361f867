package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic KV source — the Spark form of the reference's
  * custom-source extension points: InputInitializer computes splits in the
  * AM (tez-api/.../runtime/api/InputInitializer.java, run by
  * RootInputInitializerManager, tez-dag/.../dag/RootInputInitializerManager.java:81),
  * and KVDataGen manufactures deterministic test records
  * (tez-runtime-library/src/test/.../testutils/KVDataGen.java:32-66).
  *
  * Here split planning = [[SyntheticBatch.planInputPartitions]]: `rows`
  * split into `numPartitions` contiguous ranges, each generated
  * deterministically executor-side (seeded per partition — no driver data,
  * no shuffle, scales to any row count).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SyntheticSource")
  *   .option("rows", "100000").option("partitions", "32")
  *   .load()   // schema: k long, cat string, v double
  * }}}
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("cat", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** Deterministic row i (same formula any engine could replay). */
  def row(i: Long): (Long, String, Double) =
    (i, "cat" + (i * 2654435761L % 97 % 8), (i * 31 % 1000) / 10.0)
}

private class SyntheticTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SyntheticSource.schema
        override def toBatch: Batch = new SyntheticBatch(rows, parts)
      }
    }
}

private class SyntheticBatch(rows: Long, parts: Int) extends Batch {
  /** Split planning ≅ InputInitializer.initialize: contiguous ranges. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + parts - 1) / parts
    (0 until parts).map { p =>
      SyntheticPartition(p * per, math.min((p + 1) * per, rows)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val sp = partition.asInstanceOf[SyntheticPartition]
        new PartitionReader[InternalRow] {
          private var i = sp.start - 1
          override def next(): Boolean = { i += 1; i < sp.end }
          override def get(): InternalRow = {
            val (k, cat, v) = SyntheticSource.row(i)
            InternalRow(k, UTF8String.fromString(cat), v)
          }
          override def close(): Unit = ()
        }
      }
    }
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition
