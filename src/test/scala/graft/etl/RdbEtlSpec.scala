package graft.etl

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.backend.TableMeta
import graft.backend.rdb.RdbBackend

/** The full step language driven against embedded Derby through the
  * backend-generic [[SqlProcessor]] — the Scala analogue of the
  * reference's rdb_itest.py: same ETL text shape as the Spark specs,
  * different engine, zero services. */
class RdbEtlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var backend: RdbBackend = _

  override def beforeAll(): Unit =
    backend = new RdbBackend("jdbc:derby:memory:rdbetl;create=true")

  override def afterAll(): Unit = backend.close()

  test("variables, temp, check and output steps run end-to-end on Derby") {
    val etl =
      """-- backend: postgres
        |
        |-- target=variables
        |select 2 as product_count, 'append' as "__save_mode__"
        |  from sysibm.sysdummy1
        |
        |-- target=temp.products
        |select id, cast(trim(name) as varchar(32)) as name,
        |       cast(dt as varchar(10)) as dt
        |  from (values (1, 'apple', '2021-01-01'),
        |               (2, 'pear',  '2021-01-01')) v(id, name, dt)
        |
        |-- target=check.product_count_matches
        |select count(1) as actual, cast('${product_count}' as int) as expected
        |  from products
        |
        |-- target=log.loaded_products
        |select count(1) as n from products
        |
        |-- target=variables
        |select '1' as "__create_output_table__" from sysibm.sysdummy1
        |
        |-- target=output.dw.products
        |select id, name, dt from products
        |""".stripMargin

    val p = new SqlProcessor(backend, etl)
    p.run()

    assert(backend.tableExists(TableMeta("dw.products")))
    val rows = backend.execSql(
      "select id, name, dt from dw.products order by id").collectRows()
    assert(rows === Seq(
      Seq(1, "apple", "2021-01-01"), Seq(2, "pear", "2021-01-01")))
  }

  test("static partition output + partition funcs via the metadata table") {
    val etl =
      """-- backend: postgres
        |
        |-- target=variables
        |select '1' as "__create_output_table__",
        |       '2021-01-02' as "__partition__dt"
        |  from sysibm.sysdummy1
        |
        |-- target=temp.day2
        |select id, cast(name as varchar(32)) as name
        |  from (values (3, 'plum')) v(id, name)
        |
        |-- target=output.dw.fruit_by_day
        |select id, name from day2
        |
        |-- target=check.partition_registered
        |select case when 1=1 then 'ok' end as actual,
        |       'ok' as expected from sysibm.sysdummy1,
        |       (values 1) guard(x)
        |""".stripMargin

    val p = new SqlProcessor(backend, etl)
    p.run()

    val rows = backend.execSql(
      "select id, name, dt from dw.fruit_by_day").collectRows()
    assert(rows === Seq(Seq(3, "plum", "2021-01-02")))
    // RdbFuncs resolve partitions from the metadata table
    assert(p.funcRunner.runFunc(
      "partition_exists(dw.fruit_by_day, 2021-01-02)", p.varsContext) ===
      true)
    assert(p.funcRunner.runFunc(
      "get_first_partition(dw.fruit_by_day)", p.varsContext) === "2021-01-02")
    assert(p.funcRunner.runFunc(
      "partition_not_exists(dw.fruit_by_day, 2021-01-03)", p.varsContext) ===
      true)
  }

  test("a failing check surfaces as a step failure on the RDB path too") {
    val etl =
      """-- target=check.always_fails
        |select 1 as actual, 2 as expected from sysibm.sysdummy1
        |""".stripMargin
    val p = new SqlProcessor(backend, etl)
    val e = intercept[graft.core.SqlProcessorException](p.run())
    assert(e.getMessage.contains("always_fails"))
  }

  test("the step-through debugger drives an RDB session") {
    val etl =
      """-- target=variables
        |select 7 as seed from sysibm.sysdummy1
        |-- target=temp.nums
        |select seed_q.n * ${seed} as v from (values 1, 2, 3) seed_q(n)
        |-- target=log.total
        |select sum(v) as total from nums
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("dbg_rdb", ".sql")
    java.nio.file.Files.write(f, etl.getBytes("UTF-8"))
    val dbg = new SqlProcessorDebugger(f.toString, backend)
    assert(dbg.steps.length === 3)
    dbg.stepOn() // variables
    assert(dbg.vars("seed") === "7")
    dbg.stepOn() // temp view
    assert(dbg.tempViews.contains("nums"))
    assert(dbg.sqlTable(
      s"select sum(v) from ${backend.tempSchema}.nums")
      .collectRows().head.head.toString === "42")
    dbg.run()
    assert(dbg.isFinished)
    // DataFrame-typed sql() is a Spark-only convenience
    assertThrows[graft.core.SqlProcessorException](dbg.sql("select 1"))
  }

  test("column funcs expand over JDBC metadata") {
    val p = new SqlProcessor(backend, "-- target=temp.unused\nselect 1 as x from sysibm.sysdummy1")
    val expr = p.funcRunner.runFunc(
      "all_cols_without_one_expr(dw.products, dt)", p.varsContext)
    assert(expr === "dw.products.id, dw.products.name")
  }
}
