package graft.backend.rdb

import java.sql.{Date, Timestamp}

import graft.backend.TablePartition
import graft.core.SqlProcessorException

/** Renders Scala values as SQL literals for derived columns and partition
  * filters (reference sql_dialect/__init__.py:17-73). Kept pluggable the
  * same way: a caller can pre-empt the default rendering for
  * warehouse-specific types. */
class SqlExpr(
    valueToSqlExpr: Any => Option[String] = _ => None,
    partitionColConverter: String => String = identity,
    partitionExprConverter: (String, String) => Option[String] = (_, _) => None,
    columnTypeConverter: (String, String, String) => Option[String] =
      (_, _, _) => None) {

  def convertPartitionCol(col: String): String = partitionColConverter(col)

  /** Warehouse-side partition transform, e.g. BigQuery `partition by
    * date(ts)` (reference sql_dialect/__init__.py:37-40). */
  def partitionExpr(dialect: String, col: String): String =
    partitionExprConverter(dialect, col).getOrElse(col)

  /** Per-warehouse column type mapping for generated DDL (reference
    * sql_dialect/__init__.py:75-92); defaults to the declared type. */
  def columnType(dialect: String, col: String, colType: String): String =
    columnTypeConverter(dialect, col, colType).getOrElse(colType)

  def forValue(value: Any): String = valueToSqlExpr(value).getOrElse {
    value match {
      case null => "null"
      case s: String => "'" + s.replace("'", "''") + "'"
      case b: Boolean => b.toString
      case n @ (_: Int | _: Long | _: Short | _: Byte | _: Float |
          _: Double | _: BigDecimal) => n.toString
      case n: java.math.BigDecimal => n.toPlainString
      case ts: Timestamp =>
        s"cast('${ts.toString.stripSuffix(".0")}' as timestamp)"
      case d: Date => s"cast('$d' as date)"
      case d: java.time.LocalDate => s"cast('$d' as date)"
      case other => throw new SqlProcessorException(
        s"cannot render a SQL literal for value=$other of type ${other.getClass}")
    }
  }
}

/** Everything warehouse-specific about running the step language over
  * JDBC: DDL text, partition strategy and its capability flags (reference
  * sql_dialect/__init__.py:94-201). [[RdbBackend]] is written purely
  * against this trait; adding a warehouse means adding a dialect.
  *
  * Partition strategy space (mirrors the reference's three models):
  *  - native range partitions managed per-partition ([[PostgresDialect]]);
  *  - engine-managed partitions + an external partition-metadata table
  *    because `insert` cannot carry static partition values
  *    ([[ClickHouseDialect]]);
  *  - plain columns + the metadata table, for engines with no partition
  *    DDL at all ([[DerbyDialect]] — the live, embedded test target).
  */
trait SqlDialect {
  def sqlExpr: SqlExpr

  // --- capability flags (reference sql_dialect/__init__.py:98-108) ---
  /** Partitions spring into being on insert (no create-partition DDL). */
  def createPartitionAutomatically: Boolean
  /** Engine persists partition values itself; false ⇒ the backend keeps a
    * partition-metadata table. */
  def supportStaticPartition: Boolean
  /** Partition columns are recoverable from engine metadata. */
  def supportNativePartition: Boolean
  /** A partition can be moved wholesale between same-shaped tables. */
  def supportMoveIndividualPartition: Boolean
  /** `drop schema` requires the schema to be empty first (Derby). */
  def dropDbRequiresEmpty: Boolean = false

  // --- schema/view/table DDL ---
  def createDbSql(db: String): String
  def useDbSql(db: String): String
  def dropDbSql(db: String): Seq[String]
  def createViewSql(name: String, selectSql: String): String
  def dropViewSql(name: String): String
  def createTableSql(name: String, selectSql: String): String
  def dropTableSql(table: String): Seq[String]
  def renameTableSql(fromTable: String, toTable: String): String
  def createTableLikeSql(targetTable: String, sourceTable: String,
      partitions: Seq[TablePartition]): String
  def createTableWithPartitionsSql(tableName: String,
      cols: Seq[(String, String)], partitions: Seq[TablePartition]): String

  // --- query shapes ---
  /** Bounded read of a composed select (LIMIT vs FETCH FIRST). */
  def selectLimitSql(selectSql: String, n: Int): String

  // --- partition lifecycle ---
  def createPartitionSql(targetTable: String, partitions: Seq[TablePartition],
      ifNotExists: Boolean = false): String
  def deletePartitionSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String]
  def insertDataSql(tableName: String, colNamesExpr: String,
      selectSql: String, partitions: Seq[TablePartition]): Seq[String]
  def movePartitionSqls(targetTable: String, tempTable: String,
      partitions: Seq[TablePartition]): Seq[String]
  /** (sql, parser) recovering partition column names from engine metadata;
    * only meaningful when [[supportNativePartition]]. */
  def nativePartitionsSql(tableName: String)
      : (String, Seq[Seq[Any]] => Seq[String])

  // --- partition-metadata table (dialects without static partitions) ---
  def createPtMetaTableSql(db: String): Seq[String]
  def insertPtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String]
  def deletePtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String]

  protected def requireSinglePartition(partitions: Seq[TablePartition]): TablePartition = {
    if (partitions.length != 1)
      throw new SqlProcessorException(
        s"only single-column partitioning is supported, found: " +
        partitions.map(_.field).mkString(","))
    partitions.head
  }

  protected def ptValue(p: TablePartition): Any =
    p.value.getOrElse(throw new SqlProcessorException(
      s"partition value required for ${p.field} but was dynamic"))

  protected def splitDbTable(tableName: String): (String, String) = {
    val i = tableName.indexOf('.')
    if (i < 0) throw new SqlProcessorException(
      s"table name must be of format DB.TABLE, got $tableName")
    (tableName.substring(0, i), tableName.substring(i + 1))
  }
}

/** Shared plumbing for dialects that track partitions in a metadata table
  * (`db_name, table_name, partition_value, last_modified_time`) because
  * the engine cannot answer "which partitions exist" itself (reference
  * rdb.py:390-394 + clickhouse.py:168-196). */
trait PtMetaTableSupport { self: SqlDialect =>
  def partitionsTableName: String

  def ptMetaCols: Seq[(String, String)]

  def insertPtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    if (partitions.isEmpty) return Nil
    val p = requireSinglePartition(partitions)
    val (db, table) = splitDbTable(tableName)
    Seq(s"insert into $partitionsTableName values " +
      s"('$db', '$table', '${ptValue(p)}', ${nowExpr})")
  }

  def deletePtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val (db, table) = splitDbTable(tableName)
    val ptFilter = partitions.headOption.map(p =>
      s" and partition_value = '${ptValue(p)}'").getOrElse("")
    Seq(s"delete from $partitionsTableName where db_name = '$db' " +
      s"and table_name = '$table'$ptFilter")
  }

  protected def nowExpr: String = "current_timestamp"
}

/** Dialects whose partition-metadata table lives PER DATASET (one
  * `<db>.__table_partitions__` per target dataset, no db_name column)
  * instead of one global table — BigQuery's isolation unit is the
  * dataset (reference rdb.py:621 creates the meta table per target
  * dataset on every save for non-static-partition dialects). The backend
  * keys its ensure-once memo and its partition-value lookups by dataset
  * for these dialects. */
trait DatasetPtMetaSupport { self: SqlDialect =>
  /** The metadata table for one dataset. */
  def ptMetaTable(db: String): String
}
