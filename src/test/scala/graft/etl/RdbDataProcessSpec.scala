package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.DataProcess
import graft.backend.rdb.RdbBackend

/** The CLI run path (`-- backend: postgres` header → RdbBackend from the
  * configured JDBC url) — composition of DataProcess + SqlProcessor +
  * RdbBackend, mirroring how the reference dispatches non-Spark backends
  * in data_process.py/backend_processor.py. */
class RdbDataProcessSpec extends AnyFunSuite {

  test("an rdb-headed ETL runs through DataProcess.run against Derby") {
    val etl =
      """-- backend: postgres
        |-- prepare-sql: create schema fixtures
        |-- prepare-sql: create table fixtures.seeds (id int, kind varchar(16))
        |-- prepare-sql: insert into fixtures.seeds values (1, 'basil'), (2, 'mint')
        |
        |-- target=variables
        |select '1' as "__create_output_table__" from sysibm.sysdummy1
        |
        |-- target=temp.herbs
        |select id, kind from fixtures.seeds
        |
        |-- target=check.has_rows
        |select count(1) as actual, 2 as expected from herbs
        |
        |-- target=output.garden.herbs
        |select id, kind from herbs
        |""".stripMargin

    sys.props("graft.etl.jdbc.url") = "jdbc:derby:memory:rdbcli;create=true"
    try {
      val p = DataProcess.run(etl, Map.empty, dryRun = false).get
      assert(p.reporter != null)
      // assert through a fresh connection: the output table outlives the
      // run's temp schema
      val probe = new RdbBackend("jdbc:derby:memory:rdbcli;create=true")
      try {
        val rows = probe.execSql(
          "select id, kind from garden.herbs order by id").collectRows()
        assert(rows === Seq(Seq(1, "basil"), Seq(2, "mint")))
      } finally probe.close()
    } finally sys.props.remove("graft.etl.jdbc.url")
  }

  test("rdb backends without a configured url fail with a clear message") {
    val e = intercept[IllegalArgumentException] {
      DataProcess.run("-- backend: clickhouse\n-- target=temp.t\nselect 1",
        Map.empty, dryRun = false)
    }
    assert(e.getMessage.contains("JDBC url"))
  }

  test("unknown backends are rejected up front") {
    val e = intercept[Exception] {
      DataProcess.run("-- backend: oracle\n-- target=temp.t\nselect 1",
        Map.empty, dryRun = false)
    }
    assert(e.getMessage.contains("unsupported backend"))
  }
}
