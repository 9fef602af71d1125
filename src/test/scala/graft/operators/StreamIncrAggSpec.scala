package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** streaming_ingest_agg: the stream-maintained materialized aggregate
  * must equal the single-batch merge (monoid invariance across the
  * batch split) and survive the restart path (re-invocation drains
  * nothing and returns the same table). */
class StreamIncrAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream-merged aggregate equals the one-shot batch merge") {
    val streamed = WriteOps.streamingIncrAgg(spark, sf)
      .orderBy("o_custkey").collect()

    val base = java.nio.file.Files
      .createTempDirectory("g_sia_batch_tbl").toString
    val stage = java.nio.file.Files
      .createTempDirectory("g_sia_batch_stage").toString
    WriteOps.incrAggLoad(spark, sf, base)
    WriteOps.incrAggMerge(spark, base, stage,
      Tables.orders(spark, sf)
        .filter(year(col("o_orderdate")) === 1997))
    val batch = spark.read.parquet(base)
      .select(col("o_custkey"), col("n_orders"),
        col("total_dec").cast("double").as("total"))
      .orderBy("o_custkey").collect()

    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (st, b) =>
      assert(st.getLong(0) === b.getLong(0))
      assert(st.getLong(1) === b.getLong(1))
      assert(st.getDouble(2) === b.getDouble(2))
    }
  }

  test("re-invocation takes the restart path and returns the same table") {
    val again = WriteOps.streamingIncrAgg(spark, sf)
      .orderBy("o_custkey").collect().toSeq
    val expectedRows = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) <= 1997)
      .select("o_custkey").distinct().count()
    assert(again.length.toLong === expectedRows)
    // the merge must not have double-applied any arrival batch
    val once = WriteOps.streamingIncrAgg(spark, sf)
      .orderBy("o_custkey").collect().toSeq
    assert(again === once)
  }
}
