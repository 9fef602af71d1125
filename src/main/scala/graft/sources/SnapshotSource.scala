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
    new SnapshotScanBuilder(root, tableSchema,
      Option(options.get("startingVersion")).map(_.toInt).getOrElse(0))
}

/** Pushdown surface of the connector.
  *
  *  - FILTERS: comparison filters on stat-indexed columns fold into
  *    per-column conjunctive [lo, hi] bounds used ONLY for manifest-
  *    stats FILE PRUNING (strict predicates conservatively widen to
  *    inclusive bounds); every filter is returned as a post-scan
  *    residual, so Spark re-evaluates exactly — pushdown can never
  *    change results, only the files opened. `pushedFilters` reports
  *    what pruning consumed (visible in explain).
  *  - COLUMNS: the required schema reaches the parquet reader as a
  *    real projection (`parquet.read.schema`), so unprojected columns
  *    are never materialized — `SELECT k FROM …` reads one column's
  *    pages, the scan-efficiency contract a wide 100 TB table needs. */
private[sources] class SnapshotScanBuilder(root: String,
    full: StructType, startingVersion: Int) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var ranges: Map[String, (Any, Any)] = Map.empty

  private def comparable(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
         _: String => true
    case _ => false
  }

  private def tighten(c: String, lo: Any, hi: Any): Unit = {
    // keep the NEWEST bound per side: all pushed conjuncts re-apply
    // post-scan, so any sound bound works — last-write is sound
    val (l0, h0) = ranges.getOrElse(c, (null, null))
    ranges += c -> (if (lo != null) lo else l0, if (hi != null) hi else h0)
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val used = filters.filter {
      case EqualTo(c, v) if comparable(v) => tighten(c, v, v); true
      case GreaterThan(c, v) if comparable(v) => tighten(c, v, null); true
      case GreaterThanOrEqual(c, v) if comparable(v) =>
        tighten(c, v, null); true
      case LessThan(c, v) if comparable(v) => tighten(c, null, v); true
      case LessThanOrEqual(c, v) if comparable(v) =>
        tighten(c, null, v); true
      case _ => false
    }
    pushed = used
    filters // EVERYTHING re-evaluates post-scan (file-granular pruning)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SnapshotScan(root, required,
    startingVersion, ranges.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) })
}

private[sources] class SnapshotScan(root: String, schema: StructType,
    startingVersion: Int,
    ranges: Seq[(String, Any, Any)] = Nil) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-snapshot $root from v$startingVersion" +
      (if (ranges.isEmpty) ""
       else ranges.map { case (c, lo, hi) => s"$c in [$lo, $hi]" }
         .mkString(" pruned by ", " and ", ""))

  private def readerFactory(): PartitionReaderFactory =
    new GroupRowReaderFactory(schema.json, new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration))

  /** Batch read = the HEAD version's file list, manifest-stat-pruned
    * by the pushed ranges. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SnapshotTable.statEntries(root, SnapshotTable.versions(root).max)
        .filter(SnapshotTable.entryMatches(_, ranges))
        .map(e => SnapshotFilePartition(e.path): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      readerFactory()
  }

  override def toMicroBatchStream(ckpt: String): MicroBatchStream =
    new SnapshotMicroBatchStream(root, startingVersion, readerFactory(),
      ranges)
}

/** Offset = "all versions ≤ v have been served". */
private[sources] case class VersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

private[sources] class SnapshotMicroBatchStream(root: String,
    startingVersion: Int, factory: PartitionReaderFactory,
    ranges: Seq[(String, Any, Any)] = Nil)
    extends MicroBatchStream {

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)

  override def latestOffset(): Offset =
    VersionOffset(SnapshotTable.versions(root).max)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toInt)

  /** Version v's fresh entries: the manifest diff against its parent —
    * metadata only. v = 0 contributes its full list. */
  private def freshEntries(v: Int) = {
    val cur = SnapshotTable.statEntries(root, v)
    if (v == 0) cur
    else {
      val parent = SnapshotTable.files(root, v - 1).toSet
      cur.filterNot(e => parent.contains(e.path))
    }
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    ((s + 1) to e).flatMap { v =>
      // the first served version replays in full (its own fresh files
      // ARE the full list only at v=0; a later starting version serves
      // its commit's changes, Delta's startingVersion contract)
      freshEntries(v).filter(SnapshotTable.entryMatches(_, ranges))
    }.map(e => SnapshotFilePartition(e.path): InputPartition).toArray
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
      import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
      import org.apache.parquet.hadoop.api.ReadSupport
      import org.apache.parquet.hadoop.example.GroupReadSupport
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.MessageType

      /** REAL column pruning: project the file's OWN fields (footer
        * schema, so types match verbatim) down to the required names —
        * parquet then skips the unprojected columns' pages entirely.
        * Files lacking every required column (pre-evolution under a
        * narrow projection, or a count(*) empty schema) read
        * unprojected: rows still count, fields null-fill. */
      private val readConf = {
        val c = new org.apache.hadoop.conf.Configuration(conf.value)
        val fr = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(path), conf.value))
        val fileSchema =
          try fr.getFooter.getFileMetaData.getSchema finally fr.close()
        val names = schema.fieldNames.toSet
        val kept = fileSchema.getFields.asScala.filter(t =>
          names.contains(t.getName))
        if (kept.nonEmpty && kept.size < fileSchema.getFieldCount)
          c.set(ReadSupport.PARQUET_READ_SCHEMA,
            new MessageType(fileSchema.getName, kept.asJava).toString)
        c
      }

      private val reader: ParquetReader[Group] =
        ParquetReader.builder(new GroupReadSupport(), new HPath(path))
          .withConf(readConf).build()
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
