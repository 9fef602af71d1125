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

  test("golden case: curation example semantics on a crafted corpus") {
    // dogfood the golden-data tester on the engine's own example. The
    // corpus is built so every pipeline stage fires deterministically:
    //  - doc 2 is an exact dup of doc 1 (hash stage drops it);
    //  - doc 3 is a ROTATION of doc 1's cyclic text — rotations of a
    //    cyclic token string have the SAME 3-gram shingle set, hence
    //    identical minhash signatures and guaranteed band collision,
    //    so the LSH stage drops it without any probabilistic luck;
    //  - doc 4 fails the min-token gate, doc 6 the alpha-ratio gate;
    //  - doc 7 passes both but is one 2-gram repeated (top2_frac = 1.0),
    //    so the repetition gate drops it.
    import GoldenDataTester._
    val etl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/curate_documents.sql")), "UTF-8")
    val docs = TableFixture("documents",
      Seq("doc_id", "text"), Seq("bigint", "string"),
      Seq(
        Seq(1L, "alpha beta gamma alpha beta gamma"),
        Seq(2L, "alpha beta gamma alpha beta gamma"),
        Seq(3L, "beta gamma alpha beta gamma alpha"),
        Seq(4L, "too short"),
        Seq(5L, "delta epsilon zeta eta theta iota kappa"),
        Seq(6L, "12345 67890 13579 24680 99999"),
        Seq(7L, "spam spam spam spam spam spam spam")))
    val expected = TableFixture("curated.documents",
      Seq("doc_id", "text", "n_tokens"),
      Seq("bigint", "string", "int"),
      Seq(
        Seq(1L, "alpha beta gamma alpha beta gamma", 6),
        Seq(5L, "delta epsilon zeta eta theta iota kappa", 7)))
    val r = runCase(spark, TestCase("curation golden", etl,
      Map.empty, Map.empty, Seq(docs), Seq(expected)))
    assert(r.passed, r.failures.mkString("; "))
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
    // the watermark rides in on the source view — every SQL branch
    // (including both sides of the stream-stream join) inherits it
    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)
      .withWatermark("ts", "1 hour")
    val runner = new graft.streaming.StreamingEtl(spark, sql,
      sources = Map("events_stream" -> stream), sinkDir = sinkDir)
    val queries = runner.run()
    assert(queries.length == 2) // purchases + conversions statement set
    queries.foreach { q => q.processAllAvailable(); q.stop() }

    val written = spark.read.parquet(s"$sinkDir/sink__purchases")
    val expected = batch.filter(col("value") > 10.0 &&
      col("event_type") === "purchase")
    assert(written.count() == expected.count() && written.count() > 0)

    // stream-stream join sink matches the equivalent batch interval join
    val conv = spark.read.parquet(s"$sinkDir/sink__conversions")
    val a = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val b = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val expJoin = a.join(b, col("user_id") === col("p_user") &&
      col("p_ts") >= col("click_ts") &&
      col("p_ts") <= col("click_ts") + expr("INTERVAL 6 HOURS"))
    assert(conv.count() == expJoin.count() && conv.count() > 0)
  }
}

/** The examples/incremental_merge.sql pipeline: MERGE INTO semantics in
  * the step language — golden expectations on a crafted dim + batch. */
class IncrementalMergeExampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("golden case: update beats stored row, insert lands, others pass") {
    import spark.implicits._
    Seq(
      (1L, 10L, 100.0, 0L), // will be updated by the batch
      (2L, 20L, 200.0, 0L), // untouched
      (3L, 30L, 300.0, 0L)  // untouched
    ).toDF("c_custkey", "c_nationkey", "c_acctbal", "version")
      .createOrReplaceTempView("dim_current")
    Seq(
      (1L, 10L, 150.0, 1L), // update
      (9L, 90L, 999.0, 1L)  // insert
    ).toDF("c_custkey", "c_nationkey", "c_acctbal", "version")
      .createOrReplaceTempView("changes")

    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/incremental_merge.sql")), "UTF-8")
    val backend = new SparkBackend(spark)
    new SqlProcessor(backend, sql).run(dryRun = true)

    val outView = backend.tempTables()
      .find(_.matches("customer_merged_[0-9a-f]+_output"))
    assert(outView.isDefined,
      s"no merged output view in ${backend.tempTables()}")
    val got = spark.table(outView.get)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 10L, 150.0, 1L),
      (2L, 20L, 200.0, 0L),
      (3L, 30L, 300.0, 0L),
      (9L, 90L, 999.0, 1L)))
  }
}
