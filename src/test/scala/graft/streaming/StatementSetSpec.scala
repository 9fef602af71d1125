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

  test("two STATEFUL-derived sinks fan out from one aggregated " +
      "intermediate as ONE query; restart and replay keep both " +
      "consistent") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_sset_stateful")
    val srcDir = root.resolve("src")
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 $h%02d:$m%02d:00")
    // 20 events across hours 0 and 1 in two arrival files, then a
    // far-future punctuation row that pushes the watermark past both
    // real windows (its own window never finalizes)
    (1 to 10).map(i =>
        (i.toLong, if (i <= 6) "a" else "b", i * 1.0, ts(0, i)))
      .toDF("id", "etype", "v", "ts")
      .coalesce(1).write.parquet(srcDir.resolve("b0").toString)
    (11 to 20).map(i =>
        (i.toLong, if (i <= 16) "a" else "b", i * 1.0, ts(1, i)))
      .toDF("id", "etype", "v", "ts")
      .coalesce(1).write.parquet(srcDir.resolve("b1").toString)
    Seq((999L, "__sent__", 0.0,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      .toDF("id", "etype", "v", "ts")
      .coalesce(1).write.parquet(srcDir.resolve("b2").toString)
    val sinkDir = root.resolve("sink").toString
    val etl = """-- target=temp.agg
select cast(window.start as long) as bucket_start, etype,
       count(1) as cnt, cast(sum(v) as double) as sum_v
from src_stream group by window(ts, '1 hour'), etype
-- target=output.sink.counts
select bucket_start, etype, cnt from agg
-- target=output.sink.sums
select bucket_start, etype, sum_v from agg
-- target=func.execute_streaming_inserts()
"""
    def source = spark.readStream
      .schema(spark.read.option("recursiveFileLookup", "true")
        .parquet(srcDir.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
      .withWatermark("ts", "10 minutes")
    def drain(): Unit = {
      val qs = new StreamingEtl(spark, etl,
        sources = Map("src_stream" -> source), sinkDir = sinkDir).run()
      assert(qs.length === 1,
        "stateful fan-out over one aggregation must run as ONE query")
      qs.foreach { q =>
        try { if (!q.awaitTermination(120000)) q.processAllAvailable() }
        finally q.stop()
      }
    }
    drain()

    val bound = java.sql.Timestamp.valueOf("2029-01-01 00:00:00")
      .getTime / 1000
    def counts: Set[(Long, String, Long)] =
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$sinkDir/sink__counts")
        .filter(col("bucket_start") < bound)
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def sums: Set[(Long, String, Double)] =
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$sinkDir/sink__sums")
        .filter(col("bucket_start") < bound)
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    val h0 = ts(0, 0).getTime / 1000
    val h1 = ts(1, 0).getTime / 1000
    val expCounts = Set((h0, "a", 6L), (h0, "b", 4L),
      (h1, "a", 6L), (h1, "b", 4L))
    val expSums = Set((h0, "a", 21.0), (h0, "b", 34.0),
      (h1, "a", 81.0), (h1, "b", 74.0))
    assert(counts === expCounts)
    assert(sums === expSums)
    // both sinks agree on WHICH windows finalized — mutual consistency
    assert(counts.map(c => (c._1, c._2)) === sums.map(s => (s._1, s._2)))

    // ONE checkpoint for the whole stateful set
    val ckpts = root.resolve("sink/_checkpoints").toFile.list().toSeq
    assert(ckpts === Seq("__stateful_set"), ckpts.toString)

    // restart from the durable checkpoint with no new data: byte-stable
    val before = (listFiles(root.resolve("sink/sink__counts")),
      listFiles(root.resolve("sink/sink__sums")))
    drain()
    assert((listFiles(root.resolve("sink/sink__counts")),
      listFiles(root.resolve("sink/sink__sums"))) === before,
      "no-new-data restart rewrote a stateful sink")

    // full replay (checkpoint wiped): the aggregation state rebuilds
    // and the b<id> overwrite discipline converges BOTH sinks
    graft.operators.WriteOps.SnapshotTable.deleteTree(
      root.resolve("sink/_checkpoints").toString)
    drain()
    assert(counts === expCounts, "replay diverged: counts")
    assert(sums === expSums, "replay diverged: sums")
  }

  test("two stateful recorded views feeding the sinks is refused " +
      "loudly — never a silent per-insert split of the statement set") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_sset_twostate")
    val srcDir = root.resolve("src")
    Seq((1L, "a", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")))
      .toDF("id", "etype", "v", "ts")
      .coalesce(1).write.parquet(srcDir.resolve("b0").toString)
    val etl = """-- target=temp.agg_a
select cast(window.start as long) as bucket_start, etype,
       count(1) as cnt
from src_stream group by window(ts, '1 hour'), etype
-- target=temp.agg_b
select cast(window.start as long) as bucket_start,
       cast(sum(v) as double) as sum_v
from src_stream group by window(ts, '30 minutes')
-- target=output.sink.a
select bucket_start, etype, cnt from agg_a
-- target=output.sink.b
select bucket_start, sum_v from agg_b
-- target=func.execute_streaming_inserts()
"""
    val source = spark.readStream
      .schema(spark.read.option("recursiveFileLookup", "true")
        .parquet(srcDir.toString).schema)
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
      .withWatermark("ts", "10 minutes")
    val ex = intercept[graft.core.SqlProcessorException] {
      new StreamingEtl(spark, etl,
        sources = Map("src_stream" -> source),
        sinkDir = root.resolve("sink").toString).run()
    }
    assert(ex.getMessage.contains("state must live exactly once"),
      ex.getMessage)
    assert(ex.getMessage.contains("agg_a") &&
      ex.getMessage.contains("agg_b"), ex.getMessage)
    // and nothing was silently started
    assert(spark.streams.active.isEmpty,
      "a refused statement set left streaming queries running")
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
