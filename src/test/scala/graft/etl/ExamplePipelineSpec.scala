package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.backend.SparkBackend

/** The examples/curate_documents.sql pipeline run end-to-end on driver
  * testdata: quality filter -> exact dedup -> MinHash near-dup drop ->
  * curated output, with the engine's check step live.
  */
class ExamplePipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("curation example runs; output is deduped and never larger") {
    val docs = graft.operators.Tables.documents(
      spark, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("documents")

    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/curate_documents.sql")), "UTF-8")
    val backend = new SparkBackend(spark)
    new SqlProcessor(backend, sql).run(dryRun = true)

    val outView = backend.tempTables()
      .find(_.matches("documents_[0-9a-f]+_output"))
    assert(outView.isDefined, s"no curated output view in ${backend.tempTables()}")
    val curated = spark.table(outView.get)

    val nIn = docs.count()
    val nOut = curated.count()
    assert(nOut > 0 && nOut <= nIn)
    // exact duplicates are gone
    val hashes = curated.select(md5(lower(trim(col("text"))))).collect()
    assert(hashes.map(_.getString(0)).distinct.length == hashes.length)
    // quality gate held
    assert(curated.agg(min(size(split(lower(trim(col("text"))), " "))))
      .collect()(0).getInt(0) >= 5)
  }

  test("streaming example commits its queued sink and filters correctly") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ex_stream")
      .toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_ex_sink")
      .toString
    val batch = graft.operators.Tables.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(srcDir)

    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/streaming_events.sql")), "UTF-8")
    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)
    val runner = new graft.streaming.StreamingEtl(spark, sql,
      sources = Map("events_stream" -> stream), sinkDir = sinkDir)
    val queries = runner.run()
    assert(queries.length == 1)
    queries.foreach { q => q.processAllAvailable(); q.stop() }

    val written = spark.read.parquet(s"$sinkDir/sink__purchases")
    val expected = batch.filter(col("value") > 10.0 &&
      col("event_type") === "purchase")
    assert(written.count() == expected.count() && written.count() > 0)
  }
}
