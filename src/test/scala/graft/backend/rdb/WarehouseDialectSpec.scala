package graft.backend.rdb

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.TablePartition
import graft.core.SqlProcessorException

/** Generated-SQL assertions for the BigQuery and MaxCompute dialects —
  * same pattern as [[DialectSpec]]: with no live service in this sandbox,
  * the statement sequences are the observable behavior. */
class WarehouseDialectSpec extends AnyFunSuite {

  private val bq = new BigQueryDialect(defaultDataset = "dw")
  private val mc = new MaxComputeDialect()

  private def pt(field: String, value: Any) =
    TablePartition(field, Some(value))

  test("bigquery: there is no use-db; tables qualify with the dataset") {
    assert(bq.useDbSql("dw") === "select 1")
    assert(bq.createTableSql("t1", "select 1") ===
      "create table if not exists dw.t1 as select 1")
    assert(bq.createViewSql("other.v1", "select 1") ===
      "create view if not exists other.v1 as select 1")
  }

  test("bigquery: partition mutations are one atomic transaction script") {
    val sqls = bq.insertDataSql("dw.orders", "id, dt",
      "select id, dt from src", Seq(pt("dt", "2021-01-01")))
    assert(sqls.length === 1)
    val script = sqls.head
    assert(script.startsWith("BEGIN TRANSACTION;"))
    assert(script.endsWith("COMMIT TRANSACTION;"))
    assert(script.contains(
      "insert into dw.orders(id, dt) select id, dt from src;"))
    assert(script.contains("delete dw.__table_partitions__ " +
      "where table_name = 'orders' and partition_value = '2021-01-01';"))
    assert(script.contains("insert into dw.__table_partitions__ values " +
      "('orders', '2021-01-01', CURRENT_TIMESTAMP());"))
  }

  test("bigquery: delete partition pairs the data and metadata deletes") {
    val sqls = bq.deletePartitionSql("dw.orders", Seq(pt("dt", "2021-01-01")))
    assert(sqls.length === 1)
    assert(sqls.head.contains("delete dw.orders where dt = '2021-01-01';"))
    assert(sqls.head.contains("BEGIN TRANSACTION;"))
  }

  test("bigquery: unqualified tables are rejected on mutation paths") {
    assertThrows[SqlProcessorException](
      bq.insertDataSql("orders", "id", "select 1", Seq(pt("dt", "x"))))
    assertThrows[SqlProcessorException](bq.dropTableSql("orders"))
  }

  test("bigquery: metadata table is per dataset with no db_name column") {
    val ddl = bq.createPtMetaTableSql("dw")
    assert(ddl.length === 1)
    assert(ddl.head.contains("dw.__table_partitions__"))
    assert(ddl.head.contains("cluster by table_name"))
    assert(!ddl.head.contains("db_name"))
  }

  test("bigquery: partition key parser reads INFORMATION_SCHEMA ddl") {
    val (sql, parse) = bq.nativePartitionsSql("dw.orders")
    assert(sql ===
      "select ddl from dw.INFORMATION_SCHEMA.TABLES where table_name = 'orders'")
    assert(parse(Seq(Seq(
      "CREATE TABLE dw.orders (\nid INT64\n)\nPARTITION BY dt;"))) === Seq("dt"))
    assert(parse(Seq(Seq("CREATE TABLE dw.orders (\nid INT64\n)"))) === Nil)
  }

  test("bigquery: partition expr hook lands in generated DDL") {
    val expr = new SqlExpr(partitionExprConverter =
      (d, c) => if (d == "bigquery" && c == "ts") Some("date(ts)") else None)
    val dialect = new BigQueryDialect("dw", expr)
    val ddl = dialect.createTableWithPartitionsSql("dw.t",
      Seq("id" -> "INT64", "ts" -> "timestamp"), Seq(pt("ts", "2021-01-01")))
    assert(ddl.contains("partition by date(ts)"))
  }

  test("bigquery: rename keeps the dataset and strips it from the target") {
    assert(bq.renameTableSql("dw.a", "dw.b") ===
      "alter table if exists dw.a rename to b")
  }

  test("bigquery: no partition moves, flags match the dataset model") {
    assert(bq.createPartitionAutomatically && bq.supportNativePartition &&
      !bq.supportStaticPartition && !bq.supportMoveIndividualPartition)
    assertThrows[SqlProcessorException](
      bq.movePartitionSqls("dw.a", "dw.b", Seq(pt("dt", "x"))))
  }

  test("maxcompute: static partition values ride on the insert") {
    assert(mc.insertDataSql("dw.orders", "id, amount",
      "select id, amount from src", Seq(pt("dt", "2021-01-01"))) ===
      Seq("insert into table dw.orders partition (dt='2021-01-01') " +
        "select id, amount from src"))
  }

  test("maxcompute: hybrid partition spec mixes static and dynamic") {
    val sqls = mc.insertDataSql("dw.orders", "id",
      "select id, region from src",
      Seq(pt("dt", "2021-01-01"), TablePartition("region", None)))
    assert(sqls === Seq("insert into table dw.orders " +
      "partition (dt='2021-01-01',region) select id, region from src"))
  }

  test("maxcompute: partitioned DDL excludes partition cols from the body") {
    val ddl = mc.createTableWithPartitionsSql("dw.orders",
      Seq("id" -> "bigint", "dt" -> "string"), Seq(pt("dt", "2021-01-01")))
    assert(ddl.contains("partitioned by (dt string)"))
    assert(!ddl.substring(0, ddl.indexOf("partitioned")).contains("dt string"))
  }

  test("maxcompute: partition lifecycle is alter-table add/drop") {
    assert(mc.createPartitionSql("dw.orders", Seq(pt("dt", "2021-01-01")),
      ifNotExists = true) ===
      "alter table dw.orders add if not exists partition (dt='2021-01-01')")
    assert(mc.deletePartitionSql("dw.orders", Seq(pt("dt", "2021-01-01"))) ===
      Seq("alter table dw.orders drop if exists partition (dt='2021-01-01')"))
  }

  test("maxcompute: show-partitions parser splits the partition spec") {
    val (sql, parse) = mc.nativePartitionsSql("dw.orders")
    assert(sql === "show partitions dw.orders")
    assert(parse(Seq(Seq("dt=20210101/region=cn"))) === Seq("dt", "region"))
    assert(parse(Nil) === Nil)
  }

  test("maxcompute: temp state is create-or-replace views, no meta table") {
    assert(mc.createViewSql("v1", "select 1") ===
      "create or replace view v1 as select 1")
    assert(mc.supportStaticPartition && mc.createPartitionAutomatically)
    assert(mc.createPtMetaTableSql("dw") === Nil)
  }
}
