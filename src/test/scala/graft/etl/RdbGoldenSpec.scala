package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.rdb.RdbBackend

/** The golden-data protocol on the RDB leg: JSON cases (same format the
  * Spark tester consumes) run against embedded Derby through the
  * backend-generic dry-run path. */
class RdbGoldenSpec extends AnyFunSuite {

  private val caseJson =
    """[{
      |  "name": "rollup case on derby",
      |  "sql_file_content": "-- backend: postgres\n-- target=variables\nselect '1' as \"__create_output_table__\" from sysibm.sysdummy1\n-- target=temp.priced\nselect id, price from sales where price > ${min_price}\n-- target=output.dw.priced_sales\nselect id, price from priced",
      |  "vars": {"min_price": "10"},
      |  "inputs": [{
      |    "name": "sales",
      |    "columns": ["id", "price"],
      |    "column_types": ["int", "double"],
      |    "values": [[1, 5.0], [2, 15.5], [3, 20.0]]
      |  }],
      |  "outputs": [{
      |    "name": "dw.priced_sales",
      |    "columns": ["id", "price"],
      |    "column_types": ["int", "double"],
      |    "values": [[2, 15.5], [3, 20.0]]
      |  }]
      |}]""".stripMargin

  test("a JSON golden case passes against Derby") {
    val backend = new RdbBackend("jdbc:derby:memory:rdbgold;create=true")
    try {
      val cases = GoldenDataTester.parseCases(caseJson)
      val result = GoldenDataTester.runCase(backend, cases.head)
      assert(result.failures === Nil)
      assert(result.passed)
    } finally backend.close()
  }

  test("a wrong expectation fails with a diff, not an error") {
    val backend = new RdbBackend("jdbc:derby:memory:rdbgold2;create=true")
    try {
      val bad = caseJson.replace("[[2, 15.5], [3, 20.0]]", "[[2, 15.5]]")
      val cases = GoldenDataTester.parseCases(bad)
      val result = GoldenDataTester.runCase(backend, cases.last)
      assert(!result.passed)
      assert(result.failures.exists(_.contains("dw.priced_sales")))
    } finally backend.close()
  }
}
