package graft.backend.rdb

import graft.backend.TablePartition
import graft.core.SqlProcessorException

/** Apache Derby (embedded) — the live, in-JVM integration target for the
  * RDB backend. Derby has no partition DDL at all, so partitions are plain
  * columns plus the partition-metadata table, and partition overwrite is a
  * keyed `delete` + `insert` — the simplest point in the dialect design
  * space, and the one every JDBC engine can fall back to.
  *
  * Derby-isms handled here: no `if not exists` anywhere (the backend
  * existence-checks first), `drop schema ... restrict` only after the
  * schema is emptied ([[dropDbRequiresEmpty]]), `fetch first n rows only`
  * instead of `limit`, and `rename table` takes an unqualified new name.
  */
final class DerbyDialect(
    val sqlExpr: SqlExpr = new SqlExpr(),
    val partitionsTableName: String = "dataplat.easy_sql_table_partitions")
    extends SqlDialect with PtMetaTableSupport {

  def createPartitionAutomatically: Boolean = true
  def supportStaticPartition: Boolean = false
  def supportNativePartition: Boolean = false
  def supportMoveIndividualPartition: Boolean = false
  override def dropDbRequiresEmpty: Boolean = true

  def createDbSql(db: String): String = s"create schema $db"
  def useDbSql(db: String): String = s"set schema $db"
  def dropDbSql(db: String): Seq[String] = Seq(s"drop schema $db restrict")

  def createViewSql(name: String, selectSql: String): String =
    s"create view $name as $selectSql"
  def dropViewSql(name: String): String = s"drop view $name"

  def createTableSql(name: String, selectSql: String): String =
    // Derby cannot CTAS with data; the backend creates-with-data via
    // `as ... with no data` + insert (see RdbBackend.materializeTable)
    s"create table $name as $selectSql with no data"
  def dropTableSql(table: String): Seq[String] =
    Seq(s"drop table $table") ++ deletePtMetadataSql(table, Nil)
  def renameTableSql(fromTable: String, toTable: String): String = {
    val pureTo =
      if (toTable.contains(".")) toTable.substring(toTable.indexOf('.') + 1)
      else toTable
    s"rename table $fromTable to $pureTo"
  }
  def createTableLikeSql(targetTable: String, sourceTable: String,
      partitions: Seq[TablePartition]): String =
    s"create table $targetTable as select * from $sourceTable with no data"
  def createTableWithPartitionsSql(tableName: String,
      cols: Seq[(String, String)], partitions: Seq[TablePartition]): String = {
    // partition columns are ordinary columns here
    val colsExpr = cols.map { case (n, t) => s"$n $t" }.mkString(",\n")
    s"create table $tableName (\n$colsExpr\n)"
  }

  def selectLimitSql(selectSql: String, n: Int): String =
    s"select * from ($selectSql) limit_q fetch first $n rows only"

  def createPartitionSql(targetTable: String, partitions: Seq[TablePartition],
      ifNotExists: Boolean): String =
    throw new SqlProcessorException(
      "Derby partitions are created automatically on insert")
  def deletePartitionSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val p = requireSinglePartition(partitions)
    Seq(s"delete from $tableName where ${p.field} = " +
      sqlExpr.forValue(ptValue(p))) ++
      deletePtMetadataSql(tableName, partitions)
  }
  def insertDataSql(tableName: String, colNamesExpr: String,
      selectSql: String, partitions: Seq[TablePartition]): Seq[String] = {
    val insert = s"insert into $tableName($colNamesExpr) $selectSql"
    if (partitions.isEmpty) Seq(insert)
    else insert +: (deletePtMetadataSql(tableName, partitions) ++
      insertPtMetadataSql(tableName, partitions))
  }
  def movePartitionSqls(targetTable: String, tempTable: String,
      partitions: Seq[TablePartition]): Seq[String] =
    throw new SqlProcessorException("Derby cannot move partitions")
  def nativePartitionsSql(tableName: String)
      : (String, Seq[Seq[Any]] => Seq[String]) =
    throw new SqlProcessorException("Derby has no native partitions")

  def ptMetaCols: Seq[(String, String)] = Seq(
    "db_name" -> "varchar(128)", "table_name" -> "varchar(128)",
    "partition_value" -> "varchar(256)", "last_modified_time" -> "timestamp")
  def createPtMetaTableSql(db: String): Seq[String] = {
    val colsExpr = ptMetaCols.map { case (n, t) => s"$n $t" }.mkString(", ")
    Seq(s"create table $partitionsTableName ($colsExpr)")
  }
}

/** PostgreSQL — SQL generation mirroring the reference's range-partition
  * protocol (sql_dialect/postgres.py:34-222): one child table per
  * partition value, overwritten by building a constrained `__temp` child
  * off to the side and attaching it, so readers of other partitions are
  * never disturbed. String-tested (no server in this environment); the
  * statement sequences ARE the observable behavior.
  */
final class PostgresDialect(val sqlExpr: SqlExpr = new SqlExpr())
    extends SqlDialect {

  def createPartitionAutomatically: Boolean = false
  def supportStaticPartition: Boolean = true
  def supportNativePartition: Boolean = true
  def supportMoveIndividualPartition: Boolean = true

  /** Child-table naming + the half-open range bound for one value: a
    * string value v spans [v, v + "_") and an int value n spans [n, n+1)
    * (reference postgres.py:17-31). */
  private final case class RangePt(field: String, value: Any) {
    val (valueExpr, nextExpr) = value match {
      case s: String => (s"'$s'", s"'${s}_'")
      case i: Int => (i.toString, (i + 1).toString)
      case l: Long => (l.toString, (l + 1).toString)
      case other => throw new SqlProcessorException(
        s"postgres range partitions need string or integer values, got $other")
    }
    def childTable(table: String): String =
      s"${table}__${value.toString.toLowerCase.replace("-", "_")}"
  }
  private def rangePt(partitions: Seq[TablePartition]): RangePt = {
    val p = requireSinglePartition(partitions)
    RangePt(p.field, ptValue(p))
  }

  def createDbSql(db: String): String = s"create schema if not exists $db"
  def useDbSql(db: String): String = s"set search_path='$db'"
  def dropDbSql(db: String): Seq[String] =
    Seq(s"drop schema if exists $db cascade")

  def createViewSql(name: String, selectSql: String): String =
    s"create view $name as $selectSql"
  def dropViewSql(name: String): String = s"drop view $name cascade"

  def createTableSql(name: String, selectSql: String): String =
    s"create table $name as $selectSql"
  def dropTableSql(table: String): Seq[String] =
    Seq(s"drop table if exists $table")
  def renameTableSql(fromTable: String, toTable: String): String = {
    val pureTo =
      if (toTable.contains(".")) toTable.substring(toTable.indexOf('.') + 1)
      else toTable
    s"alter table $fromTable rename to $pureTo"
  }
  def createTableLikeSql(targetTable: String, sourceTable: String,
      partitions: Seq[TablePartition]): String = {
    val base = s"create table $targetTable " +
      s"(like $sourceTable including constraints)"
    if (partitions.isEmpty) base
    else s"$base partition by range(${requireSinglePartition(partitions).field})"
  }
  def createTableWithPartitionsSql(tableName: String,
      cols: Seq[(String, String)], partitions: Seq[TablePartition]): String = {
    val colsExpr = cols.map { case (n, t) => s"$n $t" }.mkString(",\n")
    val ptExpr =
      if (partitions.isEmpty) ""
      else s" partition by range(${partitions.head.field})"
    s"create table $tableName (\n$colsExpr\n)$ptExpr"
  }

  def selectLimitSql(selectSql: String, n: Int): String =
    s"select * from ($selectSql) limit_q limit $n"

  def createPartitionSql(targetTable: String, partitions: Seq[TablePartition],
      ifNotExists: Boolean): String = {
    val pt = rangePt(partitions)
    val ine = if (ifNotExists) "if not exists " else ""
    s"create table ${ine}${pt.childTable(targetTable)} " +
      s"partition of $targetTable " +
      s"for values from (${pt.valueExpr}) to (${pt.nextExpr})"
  }
  def deletePartitionSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] =
    Seq(s"drop table if exists ${rangePt(partitions).childTable(tableName)}")
  def insertDataSql(tableName: String, colNamesExpr: String,
      selectSql: String, partitions: Seq[TablePartition]): Seq[String] =
    Seq(s"insert into $tableName($colNamesExpr) $selectSql")
  def movePartitionSqls(targetTable: String, tempTable: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    // detach the freshly-written child from the __temp parent, rename it
    // into place, attach to the real parent — constant-time per partition
    val pt = rangePt(partitions)
    val tempChild = pt.childTable(tempTable)
    val targetChild = pt.childTable(targetTable)
    Seq(
      s"drop table if exists $targetChild",
      s"alter table $tempTable detach partition $tempChild",
      renameTableSql(tempChild, targetChild),
      s"alter table $targetTable attach partition $targetChild " +
        s"for values from (${pt.valueExpr}) to (${pt.nextExpr})")
  }
  def nativePartitionsSql(tableName: String)
      : (String, Seq[Seq[Any]] => Seq[String]) = {
    val (db, table) = splitDbTable(tableName)
    val sql =
      s"""select pg_catalog.pg_get_partkeydef(c.oid)
         |from pg_class c join pg_namespace n on n.oid = c.relnamespace
         |where n.nspname='$db' and c.relname='$table'""".stripMargin
    def parse(rows: Seq[Seq[Any]]): Seq[String] = {
      val v = rows.headOption.flatMap(_.headOption).orNull
      if (v == null) Nil
      else {
        val s = v.toString
        if (!s.toUpperCase.startsWith("RANGE (") || !s.endsWith(")"))
          throw new SqlProcessorException(s"unable to parse partition key: $s")
        s.substring("RANGE (".length, s.length - 1).split(",").map(_.trim).toSeq
      }
    }
    (sql, parse)
  }

  def createPtMetaTableSql(db: String): Seq[String] = Nil
  def insertPtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = Nil
  def deletePtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = Nil
}

/** ClickHouse — SQL generation mirroring the reference's MergeTree +
  * partition-metadata-table protocol (sql_dialect/clickhouse.py:23-209):
  * MergeTree partitions are engine-managed (no static partition clause on
  * insert), so every mutation keeps `dataplat.__table_partitions__` in
  * sync, and whole partitions move between same-shaped tables with
  * `alter table ... move partition`. String-tested like the reference's
  * own clickhouse_test.py.
  */
final class ClickHouseDialect(
    val sqlExpr: SqlExpr = new SqlExpr(),
    val partitionsTableName: String = "dataplat.__table_partitions__")
    extends SqlDialect with PtMetaTableSupport {

  def createPartitionAutomatically: Boolean = true
  def supportStaticPartition: Boolean = false
  def supportNativePartition: Boolean = true
  def supportMoveIndividualPartition: Boolean = true

  def createDbSql(db: String): String = s"create database if not exists $db"
  def useDbSql(db: String): String = s"use $db"
  def dropDbSql(db: String): Seq[String] = Seq(
    s"drop database if exists $db",
    s"alter table $partitionsTableName delete where db_name = '$db'")

  def createViewSql(name: String, selectSql: String): String =
    s"create view $name as $selectSql"
  def dropViewSql(name: String): String = s"drop table $name"

  def createTableSql(name: String, selectSql: String): String =
    s"create table $name engine=MergeTree order by tuple() as $selectSql"
  def dropTableSql(table: String): Seq[String] =
    s"drop table if exists $table" +: deletePtMetadataSql(table, Nil)
  def renameTableSql(fromTable: String, toTable: String): String =
    s"rename table $fromTable to $toTable"
  def createTableLikeSql(targetTable: String, sourceTable: String,
      partitions: Seq[TablePartition]): String =
    s"create table if not exists $targetTable as $sourceTable"
  def createTableWithPartitionsSql(tableName: String,
      cols: Seq[(String, String)], partitions: Seq[TablePartition]): String = {
    val colsExpr = cols.map { case (n, t) => s"$n $t" }.mkString(",\n")
    val ptExpr = partitions match {
      case Nil => ""
      case Seq(p) => s"partition by ${p.field}"
      case ps => s"partition by tuple(${ps.map(_.field).mkString(", ")})"
    }
    s"create table if not exists $tableName (\n$colsExpr\n)\n" +
      s"engine=MergeTree\n$ptExpr\norder by tuple() " +
      "settings allow_nullable_key=1"
  }

  def selectLimitSql(selectSql: String, n: Int): String =
    s"select * from ($selectSql) limit_q limit $n"

  def createPartitionSql(targetTable: String, partitions: Seq[TablePartition],
      ifNotExists: Boolean): String =
    throw new SqlProcessorException(
      "ClickHouse partitions are created automatically on insert")
  def deletePartitionSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val p = requireSinglePartition(partitions)
    val ptExpr = s"tuple(${sqlExpr.forValue(ptValue(p))})"
    s"alter table $tableName drop partition $ptExpr" +:
      deletePtMetadataSql(tableName, partitions)
  }
  def insertDataSql(tableName: String, colNamesExpr: String,
      selectSql: String, partitions: Seq[TablePartition]): Seq[String] = {
    val insert = s"insert into $tableName($colNamesExpr) $selectSql"
    if (partitions.isEmpty) Seq(insert)
    else {
      partitions.foreach(ptValue) // no dynamic values on the insert path
      insert +: (deletePtMetadataSql(tableName, partitions) ++
        insertPtMetadataSql(tableName, partitions))
    }
  }
  def movePartitionSqls(targetTable: String, tempTable: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val moves = partitions.map(p =>
      s"alter table $tempTable move partition '${ptValue(p)}' " +
        s"to table $targetTable")
    moves ++ deletePtMetadataSql(targetTable, partitions) ++
      insertPtMetadataSql(targetTable, partitions)
  }
  def nativePartitionsSql(tableName: String)
      : (String, Seq[Seq[Any]] => Seq[String]) = {
    def parse(rows: Seq[Seq[Any]]): Seq[String] = {
      val ddl = rows.headOption.flatMap(_.headOption)
        .map(_.toString).getOrElse("")
      ddl.split("\n").collectFirst {
        case l if l.startsWith("PARTITION BY (") =>
          l.substring("PARTITION BY (".length, l.length - 1)
            .split(",").map(_.trim).toSeq
        case l if l.startsWith("PARTITION BY ") =>
          Seq(l.substring("PARTITION BY ".length).trim)
      }.getOrElse(Nil)
    }
    (s"show create table $tableName", parse)
  }

  def ptMetaCols: Seq[(String, String)] = Seq(
    "db_name" -> "String", "table_name" -> "String",
    "partition_value" -> "String", "last_modified_time" -> "DateTime")
  def createPtMetaTableSql(db: String): Seq[String] = {
    val colsExpr = ptMetaCols.map { case (n, t) => s"$n $t" }.mkString(",\n")
    Seq(
      s"create database if not exists ${splitDbTable(partitionsTableName)._1}",
      s"create table if not exists $partitionsTableName (\n$colsExpr\n)\n" +
        "engine=MergeTree\npartition by db_name\norder by tuple() " +
        "settings allow_nullable_key=1")
  }
  override protected def nowExpr: String = "now()"
}
