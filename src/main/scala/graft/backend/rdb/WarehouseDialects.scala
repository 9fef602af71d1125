package graft.backend.rdb

import graft.backend.TablePartition
import graft.core.SqlProcessorException

/** BigQuery — SQL generation mirroring the reference's dataset-scoped
  * protocol (backend/sql_dialect/bigquery.py:18-198). The BigQuery-isms:
  * every table must be dataset-qualified (there is no `use db`, so
  * [[useDbSql]] degenerates to `select 1`); multi-statement partition
  * mutations ride inside one `BEGIN TRANSACTION ... COMMIT TRANSACTION`
  * script so the data delete and the partition-metadata upkeep commit
  * atomically; the partition-metadata table is PER DATASET
  * (`<db>.__table_partitions__`, clustered by table_name, no db_name
  * column) because datasets are the isolation unit; and partition columns
  * can carry a warehouse-side transform (`partition by date(ts)`) supplied
  * through the pluggable [[SqlExpr]] hook, mirroring
  * `SqlExpr.bigquery_partition_expr`.
  *
  * String-tested (no service in this environment) — the statement
  * sequences ARE the observable behavior, the same pattern the reference
  * uses for ClickHouse.
  */
final class BigQueryDialect(
    val defaultDataset: String = "dataplat",
    val sqlExpr: SqlExpr = new SqlExpr())
    extends SqlDialect with DatasetPtMetaSupport {

  def ptMetaTable(db: String): String = s"$db.__table_partitions__"

  def createPartitionAutomatically: Boolean = true
  def supportStaticPartition: Boolean = false
  def supportNativePartition: Boolean = true
  def supportMoveIndividualPartition: Boolean = false

  private def qualified(table: String): String =
    if (table.contains(".")) table else s"$defaultDataset.$table"
  private def requireQualified(table: String): (String, String) = {
    if (!table.contains(".")) throw new SqlProcessorException(
      s"BigQuery table must be qualified with a dataset: $table")
    splitDbTable(table)
  }
  private def transaction(statements: Seq[String]): String =
    ("BEGIN TRANSACTION;" +: statements.map(s =>
      if (s.endsWith(";")) s else s + ";") :+ "COMMIT TRANSACTION;")
      .mkString("\n")

  def createDbSql(db: String): String = s"create schema if not exists $db"
  /** No `use <db>` exists; tables are always dataset-qualified. */
  def useDbSql(db: String): String = "select 1"
  def dropDbSql(db: String): Seq[String] =
    Seq(s"drop schema if exists $db cascade")

  def createViewSql(name: String, selectSql: String): String =
    s"create view if not exists ${qualified(name)} as $selectSql"
  def dropViewSql(name: String): String =
    s"drop view if exists ${qualified(name)}"

  def createTableSql(name: String, selectSql: String): String =
    s"create table if not exists ${qualified(name)} as $selectSql"
  def dropTableSql(table: String): Seq[String] = {
    val (db, pure) = requireQualified(table)
    Seq(s"drop table if exists $db.$pure",
      s"delete $db.__table_partitions__ where table_name = '$pure'")
  }
  def renameTableSql(fromTable: String, toTable: String): String = {
    val pureTo =
      if (toTable.contains(".")) toTable.substring(toTable.indexOf('.') + 1)
      else toTable
    s"alter table if exists ${qualified(fromTable)} rename to $pureTo"
  }
  def createTableLikeSql(targetTable: String, sourceTable: String,
      partitions: Seq[TablePartition]): String =
    s"create table ${qualified(targetTable)} like ${qualified(sourceTable)}"
  def createTableWithPartitionsSql(tableName: String,
      cols: Seq[(String, String)], partitions: Seq[TablePartition]): String = {
    val colsExpr = cols.map { case (n, t) =>
      s"$n ${sqlExpr.columnType("bigquery", n, t)}" }.mkString(",\n")
    val ptExpr = partitions match {
      case Nil => ""
      case Seq(p) =>
        s"partition by ${sqlExpr.partitionExpr("bigquery", p.field)}"
      case _ => throw new SqlProcessorException(
        "BigQuery only supports single-column partitioning")
    }
    s"create table if not exists ${qualified(tableName)} (\n$colsExpr\n)\n$ptExpr\n"
  }

  def selectLimitSql(selectSql: String, n: Int): String =
    s"select * from ($selectSql) limit_q limit $n"

  def createPartitionSql(targetTable: String, partitions: Seq[TablePartition],
      ifNotExists: Boolean): String =
    throw new SqlProcessorException(
      "BigQuery partitions are created automatically on insert")
  def deletePartitionSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val (db, pure) = requireQualified(tableName)
    val p = requireSinglePartition(partitions)
    Seq(transaction(Seq(
      s"delete $db.$pure where ${p.field} = '${ptValue(p)}'") ++
      deletePtMetadataSql(tableName, partitions)))
  }
  def insertDataSql(tableName: String, colNamesExpr: String,
      selectSql: String, partitions: Seq[TablePartition]): Seq[String] = {
    requireQualified(tableName)
    val insert = s"insert into $tableName($colNamesExpr) $selectSql"
    if (partitions.isEmpty) Seq(insert)
    else {
      partitions.foreach(ptValue) // dynamic values cannot reach this path
      Seq(transaction(insert +:
        (deletePtMetadataSql(tableName, partitions) ++
          insertPtMetadataSql(tableName, partitions))))
    }
  }
  def movePartitionSqls(targetTable: String, tempTable: String,
      partitions: Seq[TablePartition]): Seq[String] =
    throw new SqlProcessorException("BigQuery cannot move partitions")
  def nativePartitionsSql(tableName: String)
      : (String, Seq[Seq[Any]] => Seq[String]) = {
    val (db, pure) =
      if (tableName.contains(".")) splitDbTable(tableName)
      else (defaultDataset, tableName)
    val sql = s"select ddl from $db.INFORMATION_SCHEMA.TABLES " +
      s"where table_name = '$pure'"
    def parse(rows: Seq[Seq[Any]]): Seq[String] = {
      val ddl = rows.headOption.flatMap(_.headOption)
        .map(_.toString).getOrElse("")
      ddl.split("\n").collectFirst {
        case l if l.startsWith("PARTITION BY ") =>
          Seq(l.substring("PARTITION BY ".length).stripSuffix(";").trim)
      }.getOrElse(Nil)
    }
    (sql, parse)
  }

  def createPtMetaTableSql(db: String): Seq[String] = Seq(
    s"""create table if not exists $db.__table_partitions__(
       |table_name string, partition_value string, last_modified_time timestamp)
       |cluster by table_name""".stripMargin)
  def insertPtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    if (partitions.isEmpty) return Nil
    val (db, pure) = requireQualified(tableName)
    val p = requireSinglePartition(partitions)
    Seq(s"insert into $db.__table_partitions__ values " +
      s"('$pure', '${ptValue(p)}', CURRENT_TIMESTAMP())")
  }
  def deletePtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val (db, pure) = requireQualified(tableName)
    val ptFilter = partitions.headOption.map(p =>
      s" and partition_value = '${ptValue(p)}'").getOrElse("")
    Seq(s"delete $db.__table_partitions__ " +
      s"where table_name = '$pure'$ptFilter")
  }
}

/** MaxCompute (ODPS) — SQL generation for the Hive-lineage warehouse
  * (backend/maxcompute.py:120-307): the save protocol is the familiar
  * `insert overwrite|into table t partition (pt='v', dyn)` with static
  * values carried ON the insert — the same protocol SparkBackend
  * implements natively — so this is the one dialect where
  * [[supportStaticPartition]] is true and the metadata table vanishes.
  * Temp state is `create or replace view` (the reference materializes each
  * step as an ODPS view), partitions are listed natively
  * (`show partitions`), and whole-partition moves are unsupported.
  */
final class MaxComputeDialect(val sqlExpr: SqlExpr = new SqlExpr())
    extends SqlDialect {

  def createPartitionAutomatically: Boolean = true
  def supportStaticPartition: Boolean = true
  def supportNativePartition: Boolean = true
  def supportMoveIndividualPartition: Boolean = false

  def createDbSql(db: String): String = s"create project if not exists $db"
  def useDbSql(db: String): String = s"use $db"
  def dropDbSql(db: String): Seq[String] =
    Seq(s"drop project if exists $db")

  def createViewSql(name: String, selectSql: String): String =
    s"create or replace view $name as $selectSql"
  def dropViewSql(name: String): String = s"drop view if exists $name"

  def createTableSql(name: String, selectSql: String): String =
    s"create table if not exists $name as $selectSql"
  def dropTableSql(table: String): Seq[String] =
    Seq(s"drop table if exists $table")
  def renameTableSql(fromTable: String, toTable: String): String = {
    val pureTo =
      if (toTable.contains(".")) toTable.substring(toTable.indexOf('.') + 1)
      else toTable
    s"alter table $fromTable rename to $pureTo"
  }
  def createTableLikeSql(targetTable: String, sourceTable: String,
      partitions: Seq[TablePartition]): String =
    s"create table if not exists $targetTable like $sourceTable"
  def createTableWithPartitionsSql(tableName: String,
      cols: Seq[(String, String)], partitions: Seq[TablePartition]): String = {
    val ptNames = partitions.map(_.field).toSet
    val colsExpr = cols.filterNot(c => ptNames.contains(c._1))
      .map { case (n, t) => s"$n $t" }.mkString(",\n")
    val ptExpr =
      if (partitions.isEmpty) ""
      else {
        val ptCols = partitions.map(p => s"${p.field} string").mkString(", ")
        s"\npartitioned by ($ptCols)"
      }
    s"create table if not exists $tableName (\n$colsExpr\n)$ptExpr"
  }

  def selectLimitSql(selectSql: String, n: Int): String =
    s"select * from ($selectSql) limit_q limit $n"

  def createPartitionSql(targetTable: String, partitions: Seq[TablePartition],
      ifNotExists: Boolean): String = {
    val p = requireSinglePartition(partitions)
    val ine = if (ifNotExists) "if not exists " else ""
    s"alter table $targetTable add ${ine}partition " +
      s"(${p.field}='${ptValue(p)}')"
  }
  def deletePartitionSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = {
    val p = requireSinglePartition(partitions)
    Seq(s"alter table $tableName drop if exists partition " +
      s"(${p.field}='${ptValue(p)}')")
  }
  /** Static partition values ride on the insert itself — the Hive/Spark
    * protocol; dynamic partitions are simply trailing select columns. */
  def insertDataSql(tableName: String, colNamesExpr: String,
      selectSql: String, partitions: Seq[TablePartition]): Seq[String] = {
    val ptExpr =
      if (partitions.isEmpty) ""
      else {
        val fields = partitions.map(p => p.value match {
          case Some(v) => s"${p.field}='$v'"
          case None => p.field
        }).mkString(",")
        s" partition ($fields)"
      }
    Seq(s"insert into table $tableName$ptExpr $selectSql")
  }
  def movePartitionSqls(targetTable: String, tempTable: String,
      partitions: Seq[TablePartition]): Seq[String] =
    throw new SqlProcessorException("MaxCompute cannot move partitions")
  def nativePartitionsSql(tableName: String)
      : (String, Seq[Seq[Any]] => Seq[String]) = {
    // `show partitions` rows look like pt=20210101/region=cn — the
    // partition COLUMNS are the keys of the first row's spec.
    def parse(rows: Seq[Seq[Any]]): Seq[String] =
      rows.headOption.flatMap(_.headOption).map(_.toString) match {
        case Some(spec) if spec.nonEmpty =>
          spec.split("/").toSeq.map(_.split("=")(0).trim)
        case _ => Nil
      }
    (s"show partitions $tableName", parse)
  }

  def createPtMetaTableSql(db: String): Seq[String] = Nil
  def insertPtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = Nil
  def deletePtMetadataSql(tableName: String,
      partitions: Seq[TablePartition]): Seq[String] = Nil
}
