package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.backend.SparkBackend
import graft.core.Coerce

object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
  }
}

class SqlProcessorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  private def runSql(sql: String, resultTable: String,
      funcs: Map[String, Seq[Any] => Any] = Map.empty,
      variables: Map[String, Any] = Map.empty): Seq[Seq[Any]] = {
    val spark = TestSpark.spark
    val p = new SqlProcessor(new SparkBackend(spark), sql, variables)
    p.registerFuncs(funcs)
    p.run()
    spark.sql(s"select * from $resultTable").collect()
      .map(_.toSeq).toSeq
  }

  private val concat: Seq[Any] => Any = ps => ps.map(Coerce.toStr).mkString("")

  test("full step pipeline: templates, vars, funcs, check, broadcast " +
      "(reference sql_processor_test.py:15-81)") {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")).toDF("id", "type")
      .createOrReplaceTempView("target")

    val sql = """
-- target=template.test_a
select
    *
from target
where
    type = 'a';
-- target=variables
select 1 as a
-- target=variables
select '${f2(1, 2)}' as b
-- target=log.b
select '${b}' as b
-- target=log.test_log
select 1 as t
-- target=check.test_check
select 1 as actual, 1 as expected
-- target=check.check(1, 2), if=f1(1, ${a})
-- target=template.test_b
select
    id as id,
    #{type} as type
from target
where
    type = #{type};
-- target=template.test_c
select
    id as id,
    #{type2} as type
from target
where
    type = #{type1};

-- target=broadcast.test_result
select * from (
    @{test_a()}
) -- comment
--
union all
select * from (
    @{test_b(type='b')}
)
union all
select * from (
    @{test_c(type1='c', type2='${c}')}
)
"""
    val rows = runSql(sql, "test_result",
      funcs = Map(
        "check" -> (ps => ps.forall(p => Coerce.truthy(p))),
        "f1" -> (ps => ps.forall(p => Coerce.truthy(p))),
        "f2" -> concat),
      variables = Map("c" -> "c"))
    assert(rows.map(r => (r(0), r(1))).sortBy(_.toString) ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("var replace with conditions (reference sql_processor_test.py:96-112)") {
    val sql = """
-- target=variables
select 1 as a
, 2 as aa
-- target=variables
select '${f1(${a}, 2)}, ${a}' as b
-- target=variables, if=bool()
select '1' as b
-- target=temp.result, if=f1(,)
select '${b}-${aa}-dont-run' as b
-- target=temp.result
select '${b}-${aa}' as b
"""
    val rows = runSql(sql, "result", funcs = Map("f1" -> concat))
    assert(rows == Seq(Seq("12, 1-2")))
  }

  test("list variables (reference sql_processor_test.py:83-93)") {
    val spark = TestSpark.spark
    val p = new SqlProcessor(new SparkBackend(spark), """
-- target=list_variables
select explode(array(1, 2, 3)) as a
-- target=list_variables
select explode(array('1', '2', '3')) as b
""")
    p.run()
    assert(p.varsContext.listVars("a") == Seq(1, 2, 3))
    assert(p.varsContext.listVars("b") == Seq("1", "2", "3"))
  }

  test("template with vars mixed (reference sql_processor_test.py:131-141)") {
    val rows = runSql("""
-- target=template.temp1
select #{a} as a, #{b} as b, #{c} as c, ${d} as d
-- target=cache.result
@{temp1(a=1, b=2,c=3)}
""", "result", variables = Map("d" -> "4"))
    assert(rows == Seq(Seq(1, 2, 3, 4)))
  }

  test("template referenced twice with different args") {
    val rows = runSql("""
-- target=template.temp1
#{a} as #{an}, #{b} as #{bn}
-- target=cache.result
select @{temp1(a=1, an=a, b=2, bn=b)},
@{temp1(a=3, an=c, b=4, bn=d)}
""", "result")
    assert(rows == Seq(Seq(1, 2, 3, 4)))
  }

  test("template in template") {
    val rows = runSql("""
-- target=template.temp1
1 as a, #{b} as b
-- target=template.temp2
select @{temp1(b=${b})}
-- target=cache.result
@{temp2}
""", "result", variables = Map("b" -> "2"))
    assert(rows == Seq(Seq(1, 2)))
  }

  test("no-arg template with and without parens") {
    val rows = runSql("""
-- target=template.templ
select 1 as a
-- target=cache.result
@{templ} union all @{templ()}
""", "result")
    assert(rows == Seq(Seq(1), Seq(1)))
  }

  test("sample ETL end-to-end with output table " +
      "(reference test/sample_etl.spark.sql, SURVEY §7.2)") {
    val spark = TestSpark.spark
    spark.sql("create database if not exists sample")
    spark.sql("drop table if exists sample.test")
    spark.sql("drop table if exists sample.result")
    spark.sql("create table sample.test using parquet as " +
      "select 1 as id, '1' as val")

    val sql = """-- backend: spark
-- target=variables
select true as __create_output_table__
-- target=variables
select 1 as a
-- target=log.a
select '${a}' as a
-- target=check.should_equal
select 1 as actual, 1 as expected
-- target=temp.result
select
    ${a} as id, ${a} + 1 as val
union all
select id, val from sample.test
-- target=output.sample.result
select * from result
-- target=log.sample_result
select * from sample.result
"""
    val p = new SqlProcessor(new SparkBackend(spark), sql)
    p.run()
    val rows = spark.sql("select id, val from sample.result")
      .collect().map(r => (r.get(0), Coerce.toStr(r.get(1)))).sortBy(_._2)
    assert(rows.toSeq == Seq((1, "1"), (1, "2")))
  }

  test("output with static partition and append mode") {
    val spark = TestSpark.spark
    spark.sql("create database if not exists sample")
    spark.sql("drop table if exists sample.pt_out")

    def etl(day: String, mode: String) = s"""
-- target=variables
select true as __create_output_table__,
       '$day' as __partition__data_date,
       '$mode' as __save_mode__
-- target=output.sample.pt_out
select ${if (day == "2024-01-01") "1 as id, 'x' as v"
         else "2 as id, 'y' as v"}
"""
    new SqlProcessor(new SparkBackend(spark), etl("2024-01-01", "overwrite")).run()
    new SqlProcessor(new SparkBackend(spark), etl("2024-01-02", "overwrite")).run()
    val parts = spark.sql("show partitions sample.pt_out").collect().map(_.getString(0))
    assert(parts.toSet ==
      Set("data_date=2024-01-01", "data_date=2024-01-02"))
    // overwrite same partition: still 2 rows total
    new SqlProcessor(new SparkBackend(spark), etl("2024-01-02", "overwrite")).run()
    assert(spark.table("sample.pt_out").count() == 2)
    // append into existing partition
    new SqlProcessor(new SparkBackend(spark), etl("2024-01-02", "append")).run()
    assert(spark.table("sample.pt_out").count() == 3)
  }

  test("dry run writes to _output temp view instead of table") {
    val spark = TestSpark.spark
    spark.sql("create database if not exists sample")
    spark.sql("drop table if exists sample.dry_out")
    val p = new SqlProcessor(new SparkBackend(spark), """
-- target=variables
select true as __create_output_table__
-- target=output.sample.dry_out
select 5 as id
""")
    p.run(dryRun = true)
    assert(!spark.catalog.tableExists("sample", "dry_out"))
    val outViews = spark.catalog.listTables("default").collect()
      .filter(t => t.isTemporary && t.name.matches("dry_out_[0-9a-f]+_output"))
    assert(outViews.length == 1)
    assert(spark.table(outViews.head.name).collect().map(_.getInt(0)).toSeq == Seq(5))
  }

  test("template args with special chars via vars " +
      "(sql_processor_test.py:111-122)") {
    // parens/commas can't appear literally in template args; routing
    // them through variables is the documented idiom
    val sql = """-- target=variables
select 'abc(),' as a,
       '1 as col1, 2 as col2, \'col-3\' as col3' as other_cols
-- target=template.templ
select #{a} as a, #{b} as b, #{c} as c, #{other_cols}
-- target=temp.result
@{templ(a='${a}', b=2, c='3', other_cols=${other_cols})}"""
    new SqlProcessor(new SparkBackend(spark), sql).run()
    val row = spark.table("result").collect().head
    assert(row.getString(0) == "abc(),")
    assert(row.getInt(1) == 2)
    assert(row.getString(2) == "3")
    assert(row.getInt(3) == 1 && row.getInt(4) == 2)
    assert(row.getString(5) == "col-3")
  }

  test("task report renders machine-readable JSON with step timing") {
    val p = new SqlProcessor(new SparkBackend(spark),
      "-- target=temp.rep_t\nselect 1 as a")
    p.run()
    val json = p.reporter.reportAsJson("task-42")
    assert(json.contains("\"task_id\": \"task-42\""))
    assert(json.contains("\"status\": \"SUCCEEDED\""))
    assert(json.contains("\"execution_time\":"))
  }

  test("check failure modes raise (sql_processor_test.py:306-314)") {
    val failSqls = Seq(
      "-- target=check.test_check\nselect 1 as actual, 0 as expected",
      "-- target=check.test_check\nselect 1 as actual, 1 as expected1",
      "-- target=check.test_check\n" +
        "select 1 as actual, 0 as expected where 1=0")
    failSqls.foreach { sql =>
      intercept[graft.core.SqlProcessorException] {
        new SqlProcessor(new SparkBackend(spark), sql).run()
      }
    }
  }

  test("empty log target logs no-data without failing " +
      "(sql_processor_test.py:316-318)") {
    new SqlProcessor(new SparkBackend(spark),
      "-- target=log.no_data\nselect 1 as actual, 0 as expected where 1=0")
      .run()
  }

  test("output errors: missing table/create flag, missing dbname " +
      "(sql_processor_test.py:320-326)") {
    intercept[Exception] {
      new SqlProcessor(new SparkBackend(spark),
        "-- target=output.t.some_missing_table\nselect 1 as a, 0 as b").run()
    }
    intercept[Exception] {
      new SqlProcessor(new SparkBackend(spark),
        "-- target=output.some_table\nselect 1 as actual, 0 as expected")
        .run()
    }
  }

  test("action step executes raw sql (sql_processor_test.py:328-340)") {
    spark.sql("create database if not exists t")
    val backend = new SparkBackend(spark)
    new SqlProcessor(backend,
      "-- target=variables\nselect true as __create_output_table__\n" +
      "-- target=output.t.some_table\nselect 1 as a, 0 as b\n" +
      "-- target=action.some_action\ndrop table t.some_table").run()
    assert(!spark.catalog.tableExists("t", "some_table"))
  }

  test("static partition value appears in dry-run output too " +
      "(sql_processor_test.py:342-356)") {
    val backend = new SparkBackend(spark)
    val before = backend.tempTables().toSet
    new SqlProcessor(backend,
      "-- target=variables\nselect 20200101 as __partition__dt\n" +
      "-- target=output.t.result\nselect 1 as a, 2 as b").run(dryRun = true)
    val out = backend.tempTables().filterNot(before)
      .filter(t => t.startsWith("result_") && t.endsWith("_output"))
    assert(out.length == 1)
    val row = spark.sql(s"select * from ${out.head}").collect().head
    assert(row.getInt(0) == 1 && row.getInt(1) == 2 &&
      row.getString(2) == "20200101")
  }

  test("trailing sql-less func targets run (sql_processor_test.py:245-258)") {
    var c = 0
    val backend = new SparkBackend(spark)
    val p = new SqlProcessor(backend,
      "-- target=temp.result\nselect 1 as a\n" +
      "-- target=func.t_count(a, ${b})\n" +
      "-- target=func.t_count(a, ${b})",
      variables = Map("b" -> "2"))
    p.registerFuncs(Map("t_count" -> (_ => { c += 1; () })))
    p.run()
    assert(spark.table("result").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(c == 2)
  }

  test("skip_all and exception handler") {
    val spark = TestSpark.spark
    var handled = false
    val p = new SqlProcessor(new SparkBackend(spark), """
-- target=variables
select 1 as a
-- target=check.fails
select 1 as actual, 2 as expected
""", Map("__exception_handler__" -> "handler()"))
    p.registerFuncs(Map("handler" -> (_ => { handled = true; "" })))
    p.run()
    assert(handled)

    val p2 = new SqlProcessor(new SparkBackend(spark), """
-- target=check.fails
select 1 as actual, 2 as expected
""", Map("__skip_all__" -> "true"))
    p2.run() // no exception because everything is skipped
  }

  test("ETL steps drive the snapshot catalog: DDL, INSERT, CALL, " +
      "metadata read — the lakehouse surface inside the step language") {
    val spark = TestSpark.spark
    val base = java.nio.file.Files
      .createTempDirectory("g_etl_cat").toString
    val cat = "getl_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    // the backend execs step SQL verbatim, so catalog DDL/DML,
    // maintenance CALLs, and metadata tables all work as plain steps —
    // the same reason the reference's Spark backend surfaces whatever
    // SQL the engine supports (easy_sql backend exec_sql passthrough)
    new SqlProcessor(new SparkBackend(spark), s"""
-- target=action.create_table
create table $cat.m (k bigint, pt_year int, v double)

-- target=action.load
insert into $cat.m values (1, 2023, 1.5), (2, 2024, 2.5)

-- target=action.maintain
call $cat.system.optimize(table => 'm')

-- target=temp.m_parts
select pt_year, n_files from $cat.m.partitions
""").run()
    val rows = spark.sql(
      "select pt_year, n_files from m_parts order by pt_year")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows === Seq((2023, 1L), (2024, 1L)))
  }
}
