package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Stage the sf0.001 events table as a parquet dir usable as a file
    * stream source (ts converted from ns to a proper timestamp). */
  private lazy val (srcDir, batchEvents) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
      .toString
    val ev = graft.operators.Tables.events(spark, "/root/testdata/sf0.001")
    ev.write.mode("overwrite").parquet(dir)
    (dir, spark.read.parquet(dir))
  }

  test("watermarked tumbling window agg matches batch replay") {
    val stream = spark.readStream.schema(batchEvents.schema).parquet(srcDir)
    val agg = StreamingOps.tumblingCounts(stream, "ts", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_tumbling").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("stream_tumbling").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = StreamingOps.tumblingCounts(
        batchEvents, "ts", "1 hour", "10 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("session windows produce per-user sessions") {
    val stream = spark.readStream.schema(batchEvents.schema).parquet(srcDir)
    val agg = StreamingOps.sessionCounts(stream, "ts", "1 hour", "30 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_sessions").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_sessions")
    assert(got.count() > 0)
    // every event is in exactly one session
    assert(got.agg(sum("cnt")).collect()(0).getLong(0) == batchEvents.count())
  }

  test("stateful sessionization matches batch gap logic after flush") {
    // stage to a private dir so we can append a watermark-pushing
    // sentinel batch without touching the shared source
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_src")
      .toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val sessions = StreamingOps.statefulSessions(
      stream, "ts", "user_id", watermark = "10 minutes", gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_stateful_sess").start()
    try {
      q.processAllAvailable()
      // push the watermark far past every open session's gap horizon
      // (sentinel user -1 stays open and is never emitted)
      import spark.implicits._
      val far = batchEvents.select(max("ts")).collect()(0)
        .getTimestamp(0).getTime + 7L * 24 * 3600 * 1000
      Seq((Long.MaxValue, -1L, "sentinel", 0.0,
           new java.sql.Timestamp(far)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_stateful_sess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // batch truth: same 30-minute gap rule via window functions
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("user_id").orderBy(col("us").asc)
    val expected = batchEvents
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
             col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sess_idx", sum("new_sess").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy("user_id", "sess_idx")
      .agg(min("us").as("s"), max("us").as("e"), count(lit(1)).as("cnt"))
      .select("user_id", "s", "e", "cnt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("streaming dedup drops injected duplicates within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_src")
      .toString
    batchEvents.write.mode("overwrite").parquet(dir)
    // inject exact duplicates of 50 events
    batchEvents.limit(50).write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val deduped = StreamingOps.dedupStream(stream, "ts", "1 hour",
      Seq("event_id"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("stream_dedup")
    assert(got.count() == batchEvents.count())
    assert(got.select("event_id").distinct().count() == batchEvents.count())
  }

  test("streaming ETL: statement-set deferral and explicit commit " +
      "(reference flink.py:88-131 semantics)") {
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_stream_sink")
      .toString
    val stream = spark.readStream.schema(batchEvents.schema).parquet(srcDir)
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- target=variables
select 10.0 as min_value
-- target=temp.big_events
select event_id, user_id, event_type, value from events_stream
where value > ${min_value}
-- target=output.sink.big_events
select * from big_events
-- target=func.execute_streaming_inserts()
"""
    val runner = new StreamingEtl(spark, etl,
      sources = Map("events_stream" -> stream), sinkDir = sinkDir)
    val queries = runner.run()
    assert(queries.length == 1)
    queries.foreach { q => q.processAllAvailable(); q.stop() }

    val written = spark.read.parquet(s"$sinkDir/sink__big_events")
    val expected = batchEvents.filter(col("value") > 10.0)
    assert(written.count() == expected.count())
    assert(written.select("event_id").collect().map(_.getLong(0)).toSet ==
      expected.select("event_id").collect().map(_.getLong(0)).toSet)
  }

  test("streaming aggregation without a watermark fails fast at commit") {
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_agg_sink")
      .toString
    val stream = spark.readStream.schema(batchEvents.schema).parquet(srcDir)
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- target=temp.by_type
select event_type, count(*) as cnt from events_stream group by event_type
-- target=output.sink.by_type
select * from by_type
-- target=func.execute_streaming_inserts()
"""
    val runner = new StreamingEtl(spark, etl,
      sources = Map("events_stream" -> stream), sinkDir = sinkDir)
    val e = intercept[graft.core.SqlProcessorException](runner.run())
    assert(e.getMessage.contains("watermark"))
  }

  test("watermarked aggregation commits in append mode") {
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_wm_sink")
      .toString
    val stream = spark.readStream.schema(batchEvents.schema).parquet(srcDir)
      .withWatermark("ts", "1 hour")
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- target=temp.by_window
select window(ts, '10 minutes').start as w_start, count(*) as cnt
from events_stream group by window(ts, '10 minutes')
-- target=output.sink.by_window
select * from by_window
-- target=func.execute_streaming_inserts()
"""
    val runner = new StreamingEtl(spark, etl,
      sources = Map("events_stream" -> stream), sinkDir = sinkDir)
    val queries = runner.run()
    assert(queries.length == 1)
    queries.foreach { q => q.processAllAvailable(); q.stop() }
    // append mode emits only watermark-finalized windows: a subset of the
    // batch windows, never rows outside them
    val gotDir = new java.io.File(s"$sinkDir/sink__by_window")
    if (gotDir.exists()) {
      val got = spark.read.parquet(gotDir.toString)
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      val batch = batchEvents
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w_start"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(got.subsetOf(batch))
    }
  }

  test("streaming ETL over a non-file source (rate)") {
    // the reference exercises non-file streaming sources via its CDC
    // sample (test/sample_etl.flink.postgres-cdc.sql); the Spark-native
    // seam is the same: any readStream DataFrame plugs into the sources
    // map. rate is the in-box generator source.
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_rate_sink")
      .toString
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").option("numPartitions", "1").load()
    val etl = """-- backend: spark
-- config: easy_sql.etl_type=streaming
-- target=temp.ticks
select value as tick, timestamp as ts from rate_stream where value % 2 = 0
-- target=output.sink.ticks
select * from ticks
-- target=func.execute_streaming_inserts()
"""
    val runner = new StreamingEtl(spark, etl,
      sources = Map("rate_stream" -> rate), sinkDir = sinkDir,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
    val queries = runner.run()
    assert(queries.length == 1)
    val q = queries.head
    try {
      // wait until at least one non-empty micro-batch is committed
      val deadline = System.currentTimeMillis() + 30000
      var rows = 0L
      while (rows == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        val dir = new java.io.File(s"$sinkDir/sink__ticks")
        if (dir.exists())
          rows = try spark.read.parquet(dir.toString).count()
                 catch { case _: Exception => 0L }
      }
      assert(rows > 0, "rate-source pipeline produced no rows within 30s")
      val got = spark.read.parquet(s"$sinkDir/sink__ticks")
      assert(got.columns.toSeq == Seq("tick", "ts"))
      assert(got.filter(col("tick") % 2 =!= 0).count() == 0)
    } finally q.stop()
  }
}
