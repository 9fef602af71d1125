package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.WriteOps.SnapshotTable

/** METADATA TABLES over a snapshot root — the Iceberg pattern
  * (`SELECT * FROM cat.db.tbl.history` / `.files` / `.partitions`,
  * Delta's DESCRIBE HISTORY / DETAIL as queryable relations):
  *
  *  - `<table>.history`    — one row per version: commit timestamp,
  *                            partition/file/byte counts.
  *  - `<table>.files`      — one row per live data file of a version.
  *  - `<table>.partitions` — per-partition file/byte rollup.
  *
  * The catalog resolves them in [[SnapshotCatalog.loadTable]] AFTER
  * real tables — a genuine table named `files` under a namespace dir
  * always wins; the metadata fallback only fires when the multi-part
  * identifier's last segment names a metadata view of an EXISTING
  * snapshot table. `VERSION AS OF` pins `files`/`partitions` to that
  * version's manifest (history is the whole lineage by definition and
  * refuses the pin).
  *
  * Scale: every row here is MANIFEST metadata — O(versions ×
  * partitions) top-manifest lines plus the per-partition m-files, the
  * same driver-side material every commit already reads. At 100 TB
  * (millions of data files) `files` is the largest at one row per
  * manifest LINE — still metadata-scale, served as a driver-local
  * scan exactly like the commit path that wrote it. */
object SnapshotMetadataTables {

  val names: Set[String] = Set("history", "files", "partitions")

  def table(kind: String, root: String, tableName: String,
      pinned: Option[Int]): Table = kind match {
    case "history" =>
      require(pinned.isEmpty,
        "history is the whole lineage — VERSION AS OF does not apply")
      new MetaTable(s"$tableName.history", historySchema,
        () => historyRows(root))
    case "files" =>
      new FilesTable(s"$tableName.files", root, pinned)
    case "partitions" =>
      new MetaTable(s"$tableName.partitions", partitionsSchema,
        () => partitionsRows(root, pinned))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table '$other' (have ${names.mkString(", ")})")
  }

  private val historySchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("commit_ts", TimestampType, nullable = true),
    StructField("n_partitions", IntegerType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  private val filesSchema = StructType(Seq(
    StructField("pt_year", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  private val partitionsSchema = StructType(Seq(
    StructField("pt_year", IntegerType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  private def entriesOf(root: String,
      v: Int): Seq[(Int, Seq[SnapshotTable.FileEntry])] =
    SnapshotTable.partitionStatEntries(root, v,
      SnapshotTable.pointers(root, v).keys.toSeq)

  private def headOr(root: String, pinned: Option[Int]): Int = {
    val vs = SnapshotTable.versions(root)
    require(vs.nonEmpty, s"no snapshot table at $root")
    pinned match {
      case Some(v) =>
        require(vs.contains(v),
          s"version $v is unavailable (vacuumed or never committed)")
        v
      case None => vs.max
    }
  }

  private def historyRows(root: String): Array[InternalRow] =
    SnapshotTable.versions(root).map { v =>
      val parts = entriesOf(root, v)
      val files = parts.flatMap(_._2)
      new GenericInternalRow(Array[Any](
        v,
        SnapshotTable.commitTs(root, v).map(_ * 1000L).orNull,
        parts.length, files.length.toLong,
        files.map(_.bytes).sum)): InternalRow
    }.toArray

  private def partitionsRows(root: String,
      pinned: Option[Int]): Array[InternalRow] =
    entriesOf(root, headOr(root, pinned)).map { case (y, es) =>
      new GenericInternalRow(Array[Any](
        y, es.length.toLong, es.map(_.bytes).sum)): InternalRow
    }.toArray

  /** `files` served as a DISTRIBUTED scan — one [[InputPartition]] per
    * PARTITION MANIFEST (m-file), rows parsed executor-side: the
    * driver touches only the version's TOP manifest (O(partitions)
    * pointer lines), so a millions-of-files table stays plannable —
    * the per-file rows never materialize driver-side. `history` and
    * `partitions` stay driver-local (their row counts are O(versions)
    * and O(partitions), the same material every commit reads). */
  private final class FilesTable(tableName: String, root: String,
      pinned: Option[Int]) extends Table with SupportsRead {
    import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}

    override def name(): String = tableName
    override def schema(): StructType = filesSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan with Batch {
          override def readSchema(): StructType = filesSchema
          override def toBatch: Batch = this
          override def description(): String = s"$tableName (manifest)"
          // resolved at scan build, like every metadata read
          override def planInputPartitions(): Array[InputPartition] = {
            val v = headOr(root, pinned)
            SnapshotTable.pointers(root, v).toSeq.sortBy(_._1)
              .map { case (y, m) =>
                FilesMetaPartition(y, m): InputPartition
              }.toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new FilesMetaReaderFactory(
              new org.apache.spark.util.SerializableConfiguration(
                org.apache.spark.sql.SparkSession.active.sparkContext
                  .hadoopConfiguration))
        }
      }
  }

  private case class FilesMetaPartition(ptYear: Int, manifest: String)
      extends org.apache.spark.sql.connector.read.InputPartition

  /** Executor-side m-file line parser (`path \t bytes [\t stats]` —
    * [[SnapshotTable]]'s fmtEntry shape; paths are generated names,
    * never containing tabs). */
  private final class FilesMetaReaderFactory(
      conf: org.apache.spark.util.SerializableConfiguration)
      extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

    override def createReader(p: InputPartition)
        : PartitionReader[InternalRow] = {
      val fp = p.asInstanceOf[FilesMetaPartition]
      new PartitionReader[InternalRow] {
        private val path = new org.apache.hadoop.fs.Path(fp.manifest)
        private val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(
            path.getFileSystem(conf.value).open(path),
            java.nio.charset.StandardCharsets.UTF_8))
        private var cur: String = _
        override def next(): Boolean = {
          cur = in.readLine()
          while (cur != null && cur.isEmpty) cur = in.readLine()
          cur != null
        }
        override def get(): InternalRow = {
          val t = cur.split('\t')
          new GenericInternalRow(Array[Any](
            fp.ptYear, UTF8String.fromString(t(0)),
            if (t.length >= 2) t(1).toLong else -1L))
        }
        override def close(): Unit = in.close()
      }
    }
  }

  /** A read-only driver-local table: rows re-read from the manifests
    * at SCAN BUILD (a query sees the lineage as of its own planning,
    * like any metadata read). */
  private final class MetaTable(tableName: String, schema0: StructType,
      makeRows: () => Array[InternalRow]) extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = schema0
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          private val data = makeRows()
          override def rows(): Array[InternalRow] = data
          override def readSchema(): StructType = schema0
        }
      }
  }
}
