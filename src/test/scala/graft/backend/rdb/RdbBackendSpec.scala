package graft.backend.rdb

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.backend.{SaveMode, TableMeta, TablePartition}
import graft.core.SqlProcessorException

/** Live integration of the RDB backend against embedded Derby — the
  * JDBC analogue of the reference's rdb_itest.py, runnable in-JVM with
  * zero services. */
class RdbBackendSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var backend: RdbBackend = _

  override def beforeAll(): Unit =
    backend = new RdbBackend("jdbc:derby:memory:rdbspec;create=true")

  override def afterAll(): Unit = backend.close()

  private def pt(field: String, value: Any) =
    TablePartition(field, Some(value))

  test("execSql composes lazily; collect/count/first push down") {
    val t = backend.execSql(
      "select * from (values (1, 'a'), (2, 'b'), (3, 'c')) v(id, name)")
    assert(t.fieldNames === Seq("id", "name"))
    assert(t.count() === 3)
    assert(!t.isEmpty)
    assert(t.limit(2).collectRows().length === 2)
    val first = backend.execSql(
      "select * from (values (7, 'x')) v(id, name)").firstRow
    assert(first === Seq(7, "x"))
  }

  test("withColumnExpr appends a derived column without materializing") {
    val t = backend.execSql("select * from (values (2)) v(id)")
      .withColumnExpr("doubled", "id * 2")
    assert(t.fieldNames === Seq("id", "doubled"))
    assert(t.collectRows() === Seq(Seq(2, 4)))
  }

  test("temp tables are session-schema views; replacement is refused") {
    val t = backend.execSql("select * from (values (1)) v(id)")
    backend.createTempTable(t, "temp_a")
    assert(backend.tempTables().contains("temp_a"))
    assert(backend.execSql(
      s"select id from ${backend.tempSchema}.temp_a").count() === 1)
    assertThrows[SqlProcessorException](
      backend.createTempTable(t, "temp_a"))
  }

  test("createEmptyTable answers the processor's probes without a query") {
    val e = backend.createEmptyTable()
    assert(e.fieldNames === Nil)
    assert(e.isEmpty)
    assert(e.collectRows() === Nil)
  }

  test("saveTable auto-creates the target from the staged shape") {
    backend.createTempTable(backend.execSql(
      "select * from (values (1, 'a'), (2, 'b')) v(id, name)"), "src_create")
    backend.saveTable(TableMeta("src_create"), TableMeta("dw.t_created"),
      SaveMode.Overwrite, createTargetTable = true)
    assert(backend.tableExists(TableMeta("dw.t_created")))
    assert(backend.execSql("select * from dw.t_created").count() === 2)
  }

  test("saveTable without create on a missing target fails") {
    backend.createTempTable(backend.execSql(
      "select * from (values (1)) v(id)"), "src_missing")
    assertThrows[SqlProcessorException](
      backend.saveTable(TableMeta("src_missing"), TableMeta("dw.t_missing"),
        SaveMode.Overwrite, createTargetTable = false))
  }

  test("append adds rows; whole-table overwrite replaces them") {
    backend.createTempTable(backend.execSql(
      "select * from (values (10, 'x')) v(id, name)"), "src_a1")
    backend.saveTable(TableMeta("src_a1"), TableMeta("dw.t_modes"),
      SaveMode.Overwrite, createTargetTable = true)
    backend.createTempTable(backend.execSql(
      "select * from (values (11, 'y')) v(id, name)"), "src_a2")
    backend.saveTable(TableMeta("src_a2"), TableMeta("dw.t_modes"),
      SaveMode.Append, createTargetTable = false)
    assert(backend.execSql("select * from dw.t_modes").count() === 2)
    backend.createTempTable(backend.execSql(
      "select * from (values (12, 'z')) v(id, name)"), "src_a3")
    backend.saveTable(TableMeta("src_a3"), TableMeta("dw.t_modes"),
      SaveMode.Overwrite, createTargetTable = false)
    val rows = backend.execSql("select id, name from dw.t_modes").collectRows()
    assert(rows === Seq(Seq(12, "z")))
  }

  // Derby types bare VALUES literals as fixed-width CHAR; cast like a
  // real ETL select would so the auto-created table is VARCHAR
  private def castedRows(rows: String): String =
    s"select id, cast(name as varchar(32)) as name, " +
    s"cast(dt as varchar(10)) as dt from (values $rows) v(id, name, dt)"

  test("static-partition overwrite touches only the addressed partition") {
    // seed two partitions
    backend.createTempTable(backend.execSql(
      castedRows("(1, 'keep', '2021-01-01'), (2, 'old', '2021-01-02')")),
      "src_p1")
    backend.saveTable(TableMeta("src_p1"),
      TableMeta("dw.t_parts", Seq(TablePartition("dt"))),
      SaveMode.Overwrite, createTargetTable = true)
    assert(backend.partitionValues(TableMeta("dw.t_parts")) ===
      Seq("2021-01-01", "2021-01-02"))

    // static overwrite of 2021-01-02 only — 2021-01-01 must survive
    backend.createTempTable(backend.execSql(
      "select id, cast(name as varchar(32)) as name " +
      "from (values (3, 'new')) v(id, name)"), "src_p2")
    backend.saveTable(TableMeta("src_p2"),
      TableMeta("dw.t_parts", Seq(pt("dt", "2021-01-02"))),
      SaveMode.Overwrite, createTargetTable = false)

    val rows = backend.execSql(
      "select id, name, dt from dw.t_parts order by id").collectRows()
    assert(rows === Seq(
      Seq(1, "keep", "2021-01-01"), Seq(3, "new", "2021-01-02")))
    // metadata table still lists both partitions exactly once
    assert(backend.partitionValues(TableMeta("dw.t_parts")) ===
      Seq("2021-01-01", "2021-01-02"))
  }

  test("dynamic-partition overwrite rewrites only partitions in the source") {
    backend.createTempTable(backend.execSql(
      castedRows("(4, 'replaced', '2021-01-01')")), "src_p3")
    backend.saveTable(TableMeta("src_p3"),
      TableMeta("dw.t_parts", Seq(TablePartition("dt"))),
      SaveMode.Overwrite, createTargetTable = false)
    val rows = backend.execSql(
      "select id, name, dt from dw.t_parts order by id").collectRows()
    // 2021-01-02 from the previous test untouched; 2021-01-01 replaced
    assert(rows === Seq(
      Seq(3, "new", "2021-01-02"), Seq(4, "replaced", "2021-01-01")))
  }

  test("staged source gains missing static partition columns as literals") {
    backend.createTempTable(backend.execSql(
      "select id, cast(name as varchar(32)) as name " +
      "from (values (5, 'lit')) v(id, name)"), "src_p4")
    backend.saveTable(TableMeta("src_p4"),
      TableMeta("dw.t_parts", Seq(pt("dt", "2021-01-03"))),
      SaveMode.Append, createTargetTable = false)
    val rows = backend.execSql(
      "select id, name, dt from dw.t_parts where dt = '2021-01-03'")
      .collectRows()
    assert(rows === Seq(Seq(5, "lit", "2021-01-03")))
  }

  test("verifySchema requires target columns to be covered") {
    backend.createTempTable(backend.execSql(
      "select * from (values (1)) v(id)"), "vs_narrow")
    backend.verifySchema(TableMeta("vs_narrow"),
      TableMeta("vs_narrow"))
    assertThrows[SqlProcessorException](
      backend.verifySchema(TableMeta("vs_narrow"), TableMeta("dw.t_modes")))
  }

  test("createTableWithData ingests fixtures and records partitions") {
    backend.createTableWithData("fx.orders",
      Seq(Seq(1, "a", "2021-01-01"), Seq(2, "b", "2021-01-02")),
      Seq(RdbCol("id", "int"), RdbCol("name", "varchar(64)"),
        RdbCol("dt", "varchar(10)")),
      Seq(TablePartition("dt")))
    assert(backend.execSql("select * from fx.orders").count() === 2)
    assert(backend.partitionValues(TableMeta("fx.orders")) ===
      Seq("2021-01-01", "2021-01-02"))
  }

  test("decimal results normalize to double for comparisons") {
    val rows = backend.execSql(
      "select cast(1.5 as decimal(10,2)) as d from sysibm.sysdummy1")
      .collectRows()
    assert(rows.head.head === 1.5)
  }

  test("clean drops the session schema and every temp view in it") {
    val b2 = new RdbBackend("jdbc:derby:memory:rdbspec;create=true")
    b2.createTempTable(b2.execSql("select * from (values (1)) v(id)"), "v1")
    b2.createTempTable(
      b2.execSql(s"select id from ${b2.tempSchema}.v1"), "v2")
    assert(b2.tempTables().toSet === Set("v1", "v2"))
    b2.clean()
    assert(!b2.dbExists(b2.tempSchema))
  }
}
