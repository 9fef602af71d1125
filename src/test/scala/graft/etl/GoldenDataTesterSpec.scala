package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class GoldenDataTesterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sample etl golden case passes (reference test/sample_etl.spark.json)") {
    // the reference case verbatim, with the ETL inlined (prepare-sql
    // stripped: inputs come from the case's INPUT block)
    val json = """
[
  {
    "name": "test for sample etl",
    "sql_file_content": "-- target=variables\nselect true as __create_output_table__\n-- target=variables\nselect 1 as a\n-- target=log.a\nselect '${a}' as a\n-- target=check.should_equal\nselect 1 as actual, 1 as expected\n-- target=temp.result\nselect\n    ${a} as id, ${a} + 1 as val\nunion all\nselect id, val from sample.test\n-- target=output.sample.result\nselect * from result",
    "vars": {},
    "includes": {},
    "inputs": [
      { "columns": "[\"id\", \"val\"]",
        "column_types": "[\"int\", \"string\"]",
        "name": "sample.test",
        "values": ["[1, \"1\"]"] }
    ],
    "outputs": [
      { "columns": "[\"id\", \"val\"]",
        "column_types": "[\"int\", \"string\"]",
        "name": "sample.result",
        "values": ["[1, \"1\"]", "[1, \"2\"]"] }
    ]
  }
]
"""
    spark.sql("create database if not exists sample")
    spark.sql("drop table if exists sample.test")
    val results = GoldenDataTester.parseCases(json)
      .map(GoldenDataTester.runCase(spark, _))
    assert(results.forall(_.passed), results.flatMap(_.failures).mkString("; "))
  }

  test("golden case failure is reported, not thrown") {
    val json = """
{ "name": "failing case",
  "sql_file_content": "-- target=temp.result\nselect 42 as x\n-- target=output.db.out\nselect * from result",
  "vars": {"__create_output_table__": "true"},
  "inputs": [],
  "outputs": [
    { "columns": ["x"], "column_types": ["int"], "name": "db.out",
      "values": [[41]] }
  ]
}
"""
    val r = GoldenDataTester.parseCases(json)
      .map(GoldenDataTester.runCase(spark, _))
    assert(r.length == 1 && !r.head.passed)
    assert(r.head.failures.head.contains("db.out"))
  }

  test("typed fixtures: arrays, dates, nulls") {
    val json = """
{ "name": "typed case",
  "sql_file_content": "-- target=temp.result\nselect id, size(tags) as n_tags, d from src\n-- target=output.db.typed_out\nselect * from result",
  "vars": {"__create_output_table__": "true"},
  "inputs": [
    { "columns": ["id", "tags", "d"],
      "column_types": ["bigint", "array<string>", "date"],
      "name": "src",
      "values": [[1, "a|b|c", "2024-05-01"], [2, "x", "2024-05-02"],
                 [3, "null", "2024-05-03"]] }
  ],
  "outputs": [
    { "columns": ["id", "n_tags", "d"],
      "column_types": ["bigint", "int", "date"],
      "name": "db.typed_out",
      "values": [[1, 3, "2024-05-01"], [2, 1, "2024-05-02"],
                 [3, -1, "2024-05-03"]] }
  ]
}
"""
    // size(null array) = -1 in legacy spark; ensure consistent conf
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    val r = GoldenDataTester.parseCases(json)
      .map(GoldenDataTester.runCase(spark, _))
    spark.conf.unset("spark.sql.ansi.enabled")
    spark.conf.unset("spark.sql.legacy.sizeOfNull")
    assert(r.head.passed, r.head.failures.mkString("; "))
  }

  test("array cells keep multiplicity: [1,1,2] vs [2,1] must fail") {
    def mk(expected: String) = s"""
{ "name": "array multiplicity",
  "sql_file_content": "-- target=temp.result\\nselect array(1, 1, 2) as xs\\n-- target=output.db.arr_mult_out\\nselect * from result",
  "vars": {"__create_output_table__": "true"},
  "inputs": [],
  "outputs": [
    { "columns": ["xs"], "column_types": ["array<int>"],
      "name": "db.arr_mult_out", "values": [["$expected"]] }
  ]
}
"""
    // same multiset, different order -> pass (order-insensitive by design)
    val ok = GoldenDataTester.parseCases(mk("2|1|1"))
      .map(GoldenDataTester.runCase(spark, _))
    assert(ok.head.passed, ok.head.failures.mkString("; "))
    // an element dropped -> FAIL (a Set compare would silently pass this)
    val bad = GoldenDataTester.parseCases(mk("2|1"))
      .map(GoldenDataTester.runCase(spark, _))
    assert(!bad.head.passed)
  }
}
