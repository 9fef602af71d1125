package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the multi-sink statement set the gate oracle can't
  * state: ≥2 stateless inserts over one source run as ONE query with
  * ONE checkpoint; a checkpoint-recovery restart with no new data
  * leaves BOTH sinks byte-stable; and a full replay (checkpoint wiped)
  * rebuilds BOTH sinks to identical content — the b<batchId>-overwrite
  * discipline that turns foreachBatch's at-least-once into
  * exactly-once per sink, keeping the two sinks mutually consistent. */
class StatementSetSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark

  private def listFiles(p: Path): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(p)) Map.empty
    else Files.walk(p).iterator.asScala
      .filter(f => f.toString.endsWith(".parquet"))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
  }

  private val etl = """-- backend: spark
-- target=variables
select 25 as cutoff
-- target=temp.scored
select id, v from src_stream
-- target=output.sink.high
select id, v from scored where v >= ${cutoff}
-- target=output.sink.low
select id, v from scored where v < ${cutoff}
-- target=func.execute_streaming_inserts()
"""

  test("two stateless sinks over one source commit as one statement-set " +
      "query; restart and replay keep both sinks consistent") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_stmtset")
    val srcDir = root.resolve("src")
    // two arrival files → two micro-batches (maxFilesPerTrigger=1)
    (1 to 20).map(i => (i.toLong, i * 3L)).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir.resolve("b0").toString)
    (21 to 40).map(i => (i.toLong, i * 3L)).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir.resolve("b1").toString)
    val sinkDir = root.resolve("sink").toString

    def source = spark.readStream
      .schema(spark.read.option("recursiveFileLookup", "true")
        .parquet(srcDir.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)

    def drain(): Unit = {
      val qs = new StreamingEtl(spark, etl,
        sources = Map("src_stream" -> source), sinkDir = sinkDir).run()
      assert(qs.length === 1,
        "two stateless inserts over one source must run as ONE query")
      qs.foreach { q =>
        try { if (!q.awaitTermination(120000)) q.processAllAvailable() }
        finally q.stop()
      }
    }
    drain()

    def sinkRows(name: String): Set[(Long, Long)] =
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$sinkDir/sink__$name")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedHigh = (9 to 40).map(i => (i.toLong, i * 3L)).toSet
    val expectedLow = (1 to 8).map(i => (i.toLong, i * 3L)).toSet
    assert(sinkRows("high") === expectedHigh)
    assert(sinkRows("low") === expectedLow)

    // one checkpoint for the whole set, not one per sink
    val ckpts = root.resolve("sink/_checkpoints").toFile.list().toSeq
    assert(ckpts === Seq("__statement_set"), ckpts.toString)

    // restart from the durable checkpoint, no new data: byte-stable
    val before = (listFiles(root.resolve("sink/sink__high")),
      listFiles(root.resolve("sink/sink__low")))
    drain()
    assert((listFiles(root.resolve("sink/sink__high")),
      listFiles(root.resolve("sink/sink__low"))) === before,
      "no-new-data restart rewrote a sink")

    // full replay (checkpoint wiped): every batch reprocesses, the
    // b<id> overwrite discipline rebuilds identical content in BOTH
    // sinks — no duplicates, no loss
    graft.operators.WriteOps.SnapshotTable.deleteTree(
      root.resolve("sink/_checkpoints").toString)
    drain()
    assert(sinkRows("high") === expectedHigh, "replay diverged: high")
    assert(sinkRows("low") === expectedLow, "replay diverged: low")
  }

  test("a single queued insert keeps the per-insert query path") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_stmtset_single")
    val srcDir = root.resolve("src")
    (1 to 10).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir.toString)
    val single = """-- target=output.sink.only
select id, v from src_stream
-- target=func.execute_streaming_inserts()
"""
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir.toString).schema)
      .parquet(srcDir.toString)
    val qs = new StreamingEtl(spark, single,
      sources = Map("src_stream" -> src),
      sinkDir = root.resolve("sink").toString).run()
    qs.foreach { q =>
      try { if (!q.awaitTermination(120000)) q.processAllAvailable() }
      finally q.stop()
    }
    // per-insert path: flat append layout under the target dir
    val got = spark.read.parquet(root.resolve("sink/sink__only").toString)
    assert(got.count() === 10)
  }
}
