package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import graft.core.SqlProcessorException

class StepFactorySpec extends AnyFunSuite {

  test("config line parsing: type, name, condition") {
    val c1 = StepConfig.fromConfigLine("-- target=temp.result", 1)
    assert(c1.stepType == "temp" && c1.name.contains("result") &&
      c1.condition.isEmpty)

    val c2 = StepConfig.fromConfigLine(
      "-- target=temp.result, if=f1(1, ${a})", 2)
    assert(c2.stepType == "temp" && c2.name.contains("result") &&
      c2.condition.contains("f1(1, ${a})"))

    val c3 = StepConfig.fromConfigLine("-- target=variables", 3)
    assert(c3.stepType == "variables" && c3.name.isEmpty)

    val c4 = StepConfig.fromConfigLine(
      "-- target=check.check(1, 2), if=f1(1, ${a})", 4)
    assert(c4.stepType == "check" && c4.name.contains("check(1, 2)") &&
      c4.condition.contains("f1(1, ${a})"))
    assert(c4.isTargetNameAFunc)

    val c5 = StepConfig.fromConfigLine("-- target=output.db.tbl", 5)
    assert(c5.stepType == "output" && c5.name.contains("db.tbl"))

    intercept[SqlProcessorException] {
      StepConfig.fromConfigLine("-- target=bogus.x", 6)
    }
    intercept[SqlProcessorException] {
      StepConfig.fromConfigLine("-- target=temp.x, if=not a func", 7)
    }
  }

  test("splits sql into steps, drops semicolons, keeps bodies") {
    val sql = """-- backend: spark
-- target=variables
select 1 as a;
-- target=temp.x
select ${a} as v
from t;

-- target=log.x
select * from x
"""
    val steps = new StepFactory().createFromSql(sql)
    assert(steps.length == 3)
    assert(steps(0).targetConfig.get.stepType == "variables")
    assert(steps(0).selectSql.contains("select 1 as a"))
    assert(steps(1).targetConfig.get.name.contains("x"))
    assert(steps(1).selectSql.contains("select ${a} as v\nfrom t"))
    assert(steps(2).targetConfig.get.stepType == "log")
  }

  test("include resolution from map, recursive + dedup") {
    val inc = Map(
      "snippets/a.sql" -> "-- target=variables\nselect 1 as a",
      "snippets/b.sql" -> "-- include=snippets/a.sql\n-- target=temp.b\nselect ${a} as v")
    val steps = new StepFactory(includes = inc)
      .createFromSql("-- include=snippets/b.sql\n-- target=log.l\nselect 1")
    assert(steps.map(_.targetConfig.get.stepType) ==
      Seq("variables", "temp", "log"))

    val dedup = new StepFactory(includes = inc, skipDuplicateInclude = true)
      .createFromSql(
        "-- include=snippets/a.sql\n-- include=snippets/a.sql\n-- target=log.l\nselect 1")
    assert(dedup.count(_.targetConfig.get.stepType == "variables") == 1)
  }

  test("header config parsing") {
    val cfg = EasySqlConfig.fromSql(
      """-- backend: spark
        |-- config: spark.master=local[2]
        |-- config: easy_sql.etl_type=streaming
        |-- inputs: db.a, db.b
        |-- outputs: db.out
        |-- prepare-sql: create database if not exists sample
        |-- target=temp.t
        |select 1""".stripMargin)
    assert(cfg.backend == "spark")
    assert(cfg.backendConf == Seq("spark.master=local[2]"))
    assert(cfg.easySqlConf == Seq("etl_type=streaming"))
    assert(cfg.isStreaming)
    assert(cfg.inputTables == Seq("db.a", "db.b"))
    assert(cfg.outputTables == Seq("db.out"))
    assert(cfg.prepareSqlList ==
      Seq("create database if not exists sample"))
    assert(cfg.tables.toSet == Set("db.a", "db.b", "db.out"))
  }
}
