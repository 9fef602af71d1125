package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class DataProcessSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("CLI-equivalent run: prepare-sql + header config + vars " +
      "(reference sample_etl.spark.sql through data_process)") {
    val sql = """-- backend: spark
-- config: easy_sql.etl_type=batch
-- prepare-sql: drop database if exists dp_sample cascade
-- prepare-sql: create database dp_sample
-- prepare-sql: create table dp_sample.test using parquet as select 1 as id, '1' as val

-- target=variables
select true as __create_output_table__

-- target=variables
select ${base_a} as a

-- target=check.should_equal
select 1 as actual, 1 as expected

-- target=temp.result
select
    ${a} as id, ${a} + 1 as val
union all
select id, cast(val as int) as val from dp_sample.test

-- target=output.dp_sample.result
select * from result
"""
    graft.DataProcess.run(sql, graft.DataProcess.parseVars("base_a=1"),
      dryRun = false, existingSession = Some(spark))
    val rows = spark.sql("select id, val from dp_sample.result")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._2)
    assert(rows.toSeq == Seq((1, 1), (1, 2)))
  }

  test("report sink: CLI run lands per-step status JSON at --report-path") {
    val report = java.nio.file.Files.createTempDirectory("graft_report")
      .resolve("task_report.json")
    val sql = """-- backend: spark
-- target=variables
select 7 as a
-- target=temp.report_probe
select ${a} as id
-- target=check.should_equal
select 1 as actual, 1 as expected
"""
    graft.DataProcess.run(sql, Map.empty, dryRun = false,
      existingSession = Some(spark),
      reportPath = Some(report.toString),
      reportTaskId = Some("spec_task_1"))
    assert(java.nio.file.Files.exists(report))
    val json = new String(java.nio.file.Files.readAllBytes(report), "UTF-8")
    assert(json.contains(""""task_id": "spec_task_1""""))
    // one entry per step, each with a terminal status + timing
    assert(json.split("\"status\": \"SUCCEEDED\"").length - 1 == 3)
    assert(json.contains(""""execution_time""""))
    assert(json.contains("check passed"))

    // a failing step still ships the report, with FAILED recorded
    val report2 = report.resolveSibling("task_report_fail.json")
    intercept[Exception] {
      graft.DataProcess.run(
        "-- backend: spark\n-- target=temp.bad\nselect no_such_col from nowhere\n",
        Map.empty, dryRun = false, existingSession = Some(spark),
        reportPath = Some(report2.toString))
    }
    val json2 = new String(java.nio.file.Files.readAllBytes(report2), "UTF-8")
    assert(json2.contains(""""status": "FAILED""""))
  }

  test("report sinks: a failed run still posts to BOTH file and ES sinks") {
    // stub ES: capture method/path/body of every request (port 0 = any)
    val received =
      new java.util.concurrent.CopyOnWriteArrayList[(String, String, String)]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.add((ex.getRequestMethod, ex.getRequestURI.getPath, body))
      val resp = """{"result": "created"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(201, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val report = java.nio.file.Files
        .createTempDirectory("graft_report_es").resolve("r.json")
      val clock = () => java.time.Instant.parse("2024-06-01T08:30:00Z")
      intercept[Exception] {
        graft.DataProcess.run(
          "-- backend: spark\n-- target=temp.bad\nselect broken(\n",
          Map.empty, dryRun = false, existingSession = Some(spark),
          reportPath = Some(report.toString),
          reportTaskId = Some("spec_es_task"),
          reportSinks =
            Seq(new EsReportSink(base, "graft_spec", now = clock)))
      }
      // file sink got the FAILED report
      val fileJson =
        new String(java.nio.file.Files.readAllBytes(report), "UTF-8")
      assert(fileJson.contains(""""status": "FAILED""""))
      // ES sink got the reference-shaped document at the prefixed index
      assert(received.size == 1)
      val (method, path, body) = received.get(0)
      assert(method == "POST")
      assert(path == "/graft_spec_task_report/_doc")
      assert(body.contains(""""task_id": "spec_es_task""""))
      assert(body.contains("FAILED"))
      assert(body.contains(""""created_at": "2024-06-01 08:30:00""""))
    } finally server.stop(0)
  }

  test("report sinks: ES failure fails a successful run but tries late") {
    // server that always 500s: the ETL itself succeeds, so the sink
    // failure must surface as the run failure (reference EsService.post
    // raises on non-ok) — but only AFTER the file sink also shipped
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val report = java.nio.file.Files
        .createTempDirectory("graft_report_es2").resolve("r.json")
      val e = intercept[RuntimeException] {
        graft.DataProcess.run(
          "-- backend: spark\n-- target=temp.fine\nselect 1 as x\n",
          Map.empty, dryRun = false, existingSession = Some(spark),
          reportPath = Some(report.toString),
          reportSinks = Seq(new EsReportSink(base)))
      }
      assert(e.getMessage.contains("task report shipping failed"))
      // the healthy file sink still shipped before the error surfaced
      val fileJson =
        new String(java.nio.file.Files.readAllBytes(report), "UTF-8")
      assert(fileJson.contains(""""status": "SUCCEEDED""""))
    } finally server.stop(0)
  }

  test("vars parsing url-decodes values") {
    assert(graft.DataProcess.parseVars("a=1,b=x%20y") ==
      Map("a" -> "1", "b" -> "x y"))
  }

  test("non-spark backend is rejected") {
    intercept[IllegalArgumentException] {
      graft.DataProcess.run("-- backend: postgres\n-- target=temp.x\nselect 1",
        Map.empty, dryRun = true, existingSession = Some(spark))
    }
  }

  test("partition functions over a partitioned table") {
    spark.sql("create database if not exists pf")
    spark.sql("drop table if exists pf.events_pt")
    spark.sql("""create table pf.events_pt using parquet
      partitioned by (dt) as
      select 1 as id, '2024-01-01' as dt union all
      select 2 as id, '2024-01-02' as dt""")

    val backend = new graft.backend.SparkBackend(spark)
    val vc = new graft.core.VarsContext()
    val runner = new graft.core.FuncRunner(
      graft.core.FuncRunner.systemFuncs ++
        graft.functions.SparkFuncs.all(backend, vc))
    vc.init(runner)

    assert(runner.runFunc("partition_exists(pf.events_pt, 2024-01-01)", vc)
      == true)
    assert(runner.runFunc("partition_not_exists(pf.events_pt, 2024-03-01)", vc)
      == true)
    assert(runner.runFunc("get_first_partition(pf.events_pt)", vc)
      == "2024-01-01")
    assert(runner.runFunc("get_last_partition(pf.events_pt)", vc)
      == "2024-01-02")
    assert(runner.runFunc("previous_partition_exists(pf.events_pt, 2024-01-02)", vc)
      == true)
    assert(runner.runFunc("get_partition_col(pf.events_pt)", vc) == "dt")
    assert(runner.runFunc("has_partition_col(pf.events_pt)", vc) == true)
    assert(runner.runFunc(
      "get_partition_values_as_joined_str(pf.events_pt)", vc)
      == "'2024-01-01', '2024-01-02'")
    assert(runner.runFunc("is_first_partition(pf.events_pt, 2024-01-01)", vc)
      == true)

    // ensure_* family are check-funcs: Boolean result, tables first,
    // partition value last (funcs_common.py:131-139)
    assert(runner.runFunc(
      "ensure_partition_exists(pf.events_pt, 2024-01-01)", vc) == true)
    assert(runner.runFunc(
      "ensure_partition_exists(pf.events_pt, 2024-03-01)", vc) == false)
    // or-first variant: a value BEFORE the first partition passes
    assert(runner.runFunc(
      "ensure_partition_or_first_partition_exists(pf.events_pt, 2023-06-01)",
      vc) == true)
    // ...but a value after the last partition still fails
    assert(runner.runFunc(
      "ensure_partition_or_first_partition_exists(pf.events_pt, 2025-01-01)",
      vc) == false)
    assert(runner.runFunc(
      "ensure_table_partition_exists(step, 2024-01-02, pf.events_pt)", vc)
      == true)
    assert(runner.runFunc(
      "ensure_dwd_partition_exists(step, pf.events_pt, 2024-01-01)", vc)
      == true)
    assert(runner.runFunc(
      "ensure_table_partition_exists(step, 2025-01-01, pf.events_pt)", vc)
      == false)
  }

  test("column functions generate select lists") {
    spark.sql("select 1 as a, 2 as b, 3 as c").createOrReplaceTempView("cf_t")
    val backend = new graft.backend.SparkBackend(spark)
    val vc = new graft.core.VarsContext()
    val runner = new graft.core.FuncRunner(
      graft.functions.SparkFuncs.all(backend, vc))
    vc.init(runner)
    assert(runner.runFunc("all_cols_without_one_expr(cf_t, b)", vc) ==
      "cf_t.a, cf_t.c")
    assert(runner.runFunc(
      "all_cols_prefixed_with_exclusion_expr(cf_t, p_, c)", vc) ==
      "cf_t.a as `p_a`, cf_t.b as `p_b`")
  }

  test("set_config / set_parallelism / run_etl flink-parity funcs") {
    val backend = new graft.backend.SparkBackend(spark)
    val vc = new graft.core.VarsContext()
    val runner = new graft.core.FuncRunner(
      graft.functions.SparkFuncs.all(backend, vc))
    vc.init(runner)

    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      runner.runFunc("set_config(spark.sql.cbo.enabled, true)", vc)
      assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
      runner.runFunc("set_parallelism(6)", vc)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "6")
      intercept[graft.core.SqlProcessorException] {
        runner.runFunc("set_parallelism(lots)", vc)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)

    val etl = java.nio.file.Files.createTempFile("graft_sub_etl", ".sql")
    java.nio.file.Files.write(etl,
      "-- target=temp.sub_etl_out\nselect 42 as x\n".getBytes("UTF-8"))
    runner.runFunc(s"run_etl($etl)", vc)
    assert(spark.table("sub_etl_out").collect().head.getInt(0) == 42)
  }
}
