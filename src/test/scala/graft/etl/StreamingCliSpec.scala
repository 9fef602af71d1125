package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the CLI streaming route (DataProcess.runStreaming) the
  * end-to-end gate doesn't pin: header parsing errors fail fast with
  * actionable messages, `${var}` substitution reaches source and sink
  * paths, and multiple sources register. */
class StreamingCliSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("a streaming ETL without a source declaration fails fast") {
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- target=output.sink.t
select 1 as a
-- target=func.execute_streaming_inserts()
"""
    val e = intercept[IllegalArgumentException](
      graft.DataProcess.run(etl, Map.empty, dryRun = false,
        existingSession = Some(spark)))
    assert(e.getMessage.contains("streaming_source"), e.getMessage)
  }

  test("a malformed streaming_source spec names the offending value") {
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- config: easy_sql.streaming_source=no_colon_here
-- target=output.sink.t
select 1 as a
-- target=func.execute_streaming_inserts()
"""
    val e = intercept[IllegalArgumentException](
      graft.DataProcess.run(etl, Map.empty, dryRun = false,
        existingSession = Some(spark)))
    assert(e.getMessage.contains("no_colon_here"), e.getMessage)
  }

  test("--dry-run on a streaming ETL validates the header but starts " +
      "nothing: no sink dirs, no checkpoints, None returned") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("g_cli_dry")
    val srcDir = root.resolve("src").toString
    (1L to 5L).toDF("id").coalesce(1).write.parquet(srcDir)
    val sink = root.resolve("out").toString
    val etl = s"""-- backend: spark
-- config: easy_sql.etl_type=streaming
-- config: easy_sql.streaming_source=src_a:$srcDir
-- config: easy_sql.streaming_sink_dir=$sink
-- target=output.sink.t
select id from src_a
-- target=func.execute_streaming_inserts()
"""
    val res = graft.DataProcess.run(etl, Map.empty, dryRun = true,
      existingSession = Some(spark))
    assert(res.isEmpty, "streaming run should return None")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(sink)),
      "dry-run wrote the sink dir")
    // and dry-run still fails fast on a bad header (validation is real)
    val bad = etl.replace(s"src_a:$srcDir", "no_colon_here")
    val e = intercept[IllegalArgumentException](
      graft.DataProcess.run(bad, Map.empty, dryRun = true,
        existingSession = Some(spark)))
    assert(e.getMessage.contains("no_colon_here"), e.getMessage)
    // unsupported step types are caught at validation too
    val badStep = etl.replace("-- target=output.sink.t",
      "-- target=check.some_check")
    val e2 = intercept[IllegalArgumentException](
      graft.DataProcess.run(badStep, Map.empty, dryRun = true,
        existingSession = Some(spark)))
    assert(e2.getMessage.contains("not supported in streaming mode"),
      e2.getMessage)
  }

  test("vars substitute into source and sink paths; two sources " +
      "register; the drained sinks carry both sources' rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("g_cli_stream")
    val aDir = root.resolve("a").toString
    val bDir = root.resolve("b").toString
    (1L to 5L).toDF("id").coalesce(1).write.parquet(aDir)
    (6L to 9L).toDF("id").coalesce(1).write.parquet(bDir)
    val sink = root.resolve("out").toString
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- config: easy_sql.streaming_source=src_a:${dir_a}
-- config: easy_sql.streaming_source=src_b:${dir_b}
-- config: easy_sql.streaming_sink_dir=${sink_dir}
-- target=output.sink.from_a
select id from src_a
-- target=output.sink.from_b
select id from src_b
-- target=func.execute_streaming_inserts()
"""
    graft.DataProcess.run(etl,
      Map("dir_a" -> aDir, "dir_b" -> bDir, "sink_dir" -> sink)
        ++ Map.empty,
      dryRun = false, existingSession = Some(spark))
    // two sources → statement-set ineligible → per-insert queries with
    // the flat append layout
    val gotA = spark.read.parquet(s"$sink/sink__from_a")
      .collect().map(_.getLong(0)).toSet
    val gotB = spark.read.parquet(s"$sink/sink__from_b")
      .collect().map(_.getLong(0)).toSet
    assert(gotA === (1L to 5L).toSet)
    assert(gotB === (6L to 9L).toSet)
  }
}
