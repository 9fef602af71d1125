package graft.backend.rdb

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.TablePartition
import graft.core.SqlProcessorException

/** Generated-SQL assertions for the server-backed dialects — the same
  * testing pattern the reference uses for ClickHouse
  * (sql_dialect/clickhouse_test.py): the statement sequences ARE the
  * observable behavior of a dialect. */
class DialectSpec extends AnyFunSuite {

  private val pg = new PostgresDialect()
  private val ch = new ClickHouseDialect()
  private val derby = new DerbyDialect()

  private def pt(field: String, value: Any) =
    TablePartition(field, Some(value))

  test("postgres: range child table naming and bounds for string values") {
    val sql = pg.createPartitionSql("dw.orders", Seq(pt("dt", "2021-01-01")))
    assert(sql ===
      "create table dw.orders__2021_01_01 partition of dw.orders " +
      "for values from ('2021-01-01') to ('2021-01-01_')")
  }

  test("postgres: integer partition values span [n, n+1)") {
    val sql = pg.createPartitionSql("dw.orders", Seq(pt("year", 2021)),
      ifNotExists = true)
    assert(sql ===
      "create table if not exists dw.orders__2021 partition of dw.orders " +
      "for values from (2021) to (2022)")
  }

  test("postgres: partition overwrite drops only the affected child") {
    assert(pg.deletePartitionSql("dw.orders", Seq(pt("dt", "2021-01-01"))) ===
      Seq("drop table if exists dw.orders__2021_01_01"))
  }

  test("postgres: move sequence detaches, renames, attaches") {
    val sqls = pg.movePartitionSqls("dw.orders", "dw.orders__temp",
      Seq(pt("dt", "2021-01-01")))
    assert(sqls === Seq(
      "drop table if exists dw.orders__2021_01_01",
      "alter table dw.orders__temp detach partition dw.orders__temp__2021_01_01",
      "alter table dw.orders__temp__2021_01_01 rename to orders__2021_01_01",
      "alter table dw.orders attach partition dw.orders__2021_01_01 " +
        "for values from ('2021-01-01') to ('2021-01-01_')"))
  }

  test("postgres: native partition key parser handles RANGE defs") {
    val (sql, parse) = pg.nativePartitionsSql("dw.orders")
    assert(sql.contains("pg_get_partkeydef"))
    assert(parse(Seq(Seq("RANGE (dt)"))) === Seq("dt"))
    assert(parse(Seq(Seq(null))) === Nil)
    assertThrows[SqlProcessorException](parse(Seq(Seq("LIST (dt)"))))
  }

  test("postgres: capability flags match the range-partition model") {
    assert(pg.supportStaticPartition && pg.supportNativePartition &&
      pg.supportMoveIndividualPartition && !pg.createPartitionAutomatically)
  }

  test("clickhouse: create table carries MergeTree + partition clause") {
    val sql = ch.createTableWithPartitionsSql("dw.orders",
      Seq("id" -> "Int64", "dt" -> "String"), Seq(pt("dt", "2021-01-01")))
    assert(sql.contains("engine=MergeTree"))
    assert(sql.contains("partition by dt"))
    assert(sql.contains("allow_nullable_key=1"))
  }

  test("clickhouse: every mutation keeps the metadata table in sync") {
    val sqls = ch.insertDataSql("dw.orders", "id, dt",
      "select id, dt from src", Seq(pt("dt", "2021-01-01")))
    assert(sqls.length === 3)
    assert(sqls(0) === "insert into dw.orders(id, dt) select id, dt from src")
    assert(sqls(1).startsWith(
      "delete from dataplat.__table_partitions__") ||
      sqls(1).startsWith("alter table") ||
      sqls(1).contains("__table_partitions__"))
    assert(sqls(2).contains("insert into dataplat.__table_partitions__"))
  }

  test("clickhouse: drop partition uses tuple expr and clears metadata") {
    val sqls = ch.deletePartitionSql("dw.orders", Seq(pt("dt", "2021-01-01")))
    assert(sqls.head ===
      "alter table dw.orders drop partition tuple('2021-01-01')")
    assert(sqls(1).contains("partition_value = '2021-01-01'"))
  }

  test("clickhouse: partition key parser reads SHOW CREATE output") {
    val (sql, parse) = ch.nativePartitionsSql("dw.orders")
    assert(sql === "show create table dw.orders")
    assert(parse(Seq(Seq("CREATE TABLE x\nPARTITION BY dt\nORDER BY y"))) ===
      Seq("dt"))
    assert(parse(Seq(Seq("CREATE TABLE x\nPARTITION BY (a, b)\nORDER BY y"))) ===
      Seq("a", "b"))
    assert(parse(Seq(Seq("CREATE TABLE x\nORDER BY y"))) === Nil)
  }

  test("derby: partition mutations are keyed deletes + metadata upkeep") {
    val sqls = derby.deletePartitionSql("dw.orders", Seq(pt("dt", "2021-01-01")))
    assert(sqls.head === "delete from dw.orders where dt = '2021-01-01'")
    assert(sqls(1).contains("easy_sql_table_partitions"))
  }

  test("derby: bounded reads use fetch first") {
    assert(derby.selectLimitSql("select * from t", 5) ===
      "select * from (select * from t) limit_q fetch first 5 rows only")
  }

  test("single-column partitioning is enforced everywhere") {
    val two = Seq(pt("a", 1), pt("b", 2))
    assertThrows[SqlProcessorException](pg.createPartitionSql("t", two))
    assertThrows[SqlProcessorException](ch.deletePartitionSql("d.t", two))
    assertThrows[SqlProcessorException](derby.deletePartitionSql("d.t", two))
  }

  test("sql literals render with proper quoting per type") {
    val e = new SqlExpr()
    assert(e.forValue("o'brien") === "'o''brien'")
    assert(e.forValue(42) === "42")
    assert(e.forValue(4.5) === "4.5")
    assert(e.forValue(null) === "null")
    assert(e.forValue(java.sql.Date.valueOf("2021-01-01")) ===
      "cast('2021-01-01' as date)")
  }
}
