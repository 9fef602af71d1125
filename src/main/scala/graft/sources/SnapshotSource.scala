package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.operators.WriteOps.SnapshotTable

/** DataSource V2 connector exposing the manifest-committed
  * [[graft.operators.WriteOps.SnapshotTable]] as a Spark TABLE — both a
  * batch source and a MICRO-BATCH STREAMING source in which each
  * snapshot VERSION is a unit of progress (the Delta-source shape:
  * `readStream.format("graft-snapshot").option("root", ...)`).
  *
  *  - Offsets are VERSION NUMBERS. A batch (start, end] serves, for
  *    every version in the range, that version's FRESH files — the
  *    manifest-pointer diff against its parent, computed from METADATA
  *    alone (no listing, no footer reads). The very first served
  *    version contributes all of its files, so a stream started at the
  *    default `startingVersion` 0 replays the full table then tails
  *    new commits — exactly Delta's starting-version contract.
  *  - A version that REWRITES a partition (upsert/optimize) re-emits
  *    that partition's fresh files in full — the documented
  *    `ignoreChanges` semantics of lakehouse streaming sources;
  *    append-shaped tables (fresh partitions per commit, e.g. the
  *    [[SnapshotTable.commitIfNew]] sink's daily partitions) emit
  *    exactly their appends.
  *  - Schema comes from the head manifest's RECORDED schema (zero
  *    footer sampling); files predating a column null-fill it by NAME
  *    lookup, so evolution composes.
  *  - Each fresh file is one [[InputPartition]] read on an executor
  *    through parquet-mr's Group API — rows never pass through the
  *    driver, and a 1000-file commit fans out 1000-wide. At 100 TB the
  *    per-trigger planning cost is O(|versions in range| × touched
  *    partitions) manifest lines.
  *  - Offsets are committed by Structured Streaming's checkpoint; a
  *    restart resumes from the last committed version. Vacuuming past
  *    a stream's resume point fails LOUDLY (the manifest is gone), the
  *    same contract time travel gives.
  *
  * Supported column types (everything the snapshot write path emits):
  * long/int/short/byte, double/float, string, boolean, date,
  * timestamp (micros). */
class SnapshotSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val r = options.get("root")
    require(r != null, "graft-snapshot needs .option(\"root\", <table root>)")
    r
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = rootOf(options)
    val vs = SnapshotTable.versions(root)
    require(vs.nonEmpty, s"no committed versions under $root")
    SnapshotTable.tableSchema(root, vs.max).getOrElse(
      throw new IllegalStateException(
        s"version ${vs.max} of $root records no schema"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SnapshotSourceTable(schema,
      properties.getOrDefault("root", properties.get("path")))
}

private[sources] class SnapshotSourceTable(tableSchema: StructType,
    root: String) extends Table with SupportsRead {
  override def name(): String = s"graft_snapshot($root)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SnapshotScan(root, tableSchema,
        Option(options.get("startingVersion")).map(_.toInt).getOrElse(0))
    }
}

private[sources] class SnapshotScan(root: String, schema: StructType,
    startingVersion: Int) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-snapshot $root from v$startingVersion"

  private def readerFactory(): PartitionReaderFactory =
    new GroupRowReaderFactory(schema.json, new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration))

  /** Batch read = the HEAD version's full file list. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SnapshotTable.files(root, SnapshotTable.versions(root).max)
        .map(f => SnapshotFilePartition(f): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      readerFactory()
  }

  override def toMicroBatchStream(ckpt: String): MicroBatchStream =
    new SnapshotMicroBatchStream(root, startingVersion, readerFactory())
}

/** Offset = "all versions ≤ v have been served". */
private[sources] case class VersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

private[sources] class SnapshotMicroBatchStream(root: String,
    startingVersion: Int, factory: PartitionReaderFactory)
    extends MicroBatchStream {

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)

  override def latestOffset(): Offset =
    VersionOffset(SnapshotTable.versions(root).max)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toInt)

  /** Version v's fresh files: the manifest diff against its parent —
    * metadata only. v = 0 (or the stream's first served version with
    * no parent manifest retained) contributes its full list. */
  private def freshFiles(v: Int): Seq[String] = {
    val cur = SnapshotTable.files(root, v)
    if (v == 0) cur
    else cur.diff(SnapshotTable.files(root, v - 1))
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    ((s + 1) to e).flatMap { v =>
      // the first served version replays in full (its own fresh files
      // ARE the full list only at v=0; a later starting version serves
      // its commit's changes, Delta's startingVersion contract)
      freshFiles(v)
    }.map(f => SnapshotFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class SnapshotFilePartition(path: String)
    extends InputPartition

/** Executor-side parquet→InternalRow reader over parquet-mr's Group
  * API (the public example read path — no Spark-private internals).
  * Column lookup is BY NAME so pre-evolution files null-fill columns
  * they predate; types cover the snapshot write path's flat schemas. */
private[sources] class GroupRowReaderFactory(schemaJson: String,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val path = p.asInstanceOf[SnapshotFilePartition].path
    new PartitionReader[InternalRow] {
      import org.apache.parquet.example.data.Group
      import org.apache.parquet.hadoop.ParquetReader
      import org.apache.parquet.hadoop.example.GroupReadSupport

      private val reader: ParquetReader[Group] =
        ParquetReader.builder(new GroupReadSupport(), new HPath(path))
          .withConf(conf.value).build()
      private var cur: Group = _

      override def next(): Boolean = {
        cur = reader.read()
        cur != null
      }

      override def get(): InternalRow = {
        val g = cur
        val gt = g.getType
        val vals = schema.fields.map { f =>
          if (!gt.containsField(f.name)) null // pre-evolution file
          else {
            val i = gt.getFieldIndex(f.name)
            if (g.getFieldRepetitionCount(i) == 0) null // SQL NULL
            else f.dataType match {
              case LongType | TimestampType | TimestampNTZType =>
                g.getLong(i, 0)
              case IntegerType | DateType => g.getInteger(i, 0)
              case ShortType => g.getInteger(i, 0).toShort
              case ByteType => g.getInteger(i, 0).toByte
              case DoubleType => g.getDouble(i, 0)
              case FloatType => g.getFloat(i, 0)
              case BooleanType => g.getBoolean(i, 0)
              case StringType =>
                UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
              case dt => throw new UnsupportedOperationException(
                s"graft-snapshot source does not read ${dt.simpleString}" +
                s" (column '${f.name}')")
            }
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = reader.close()
    }
  }
}
