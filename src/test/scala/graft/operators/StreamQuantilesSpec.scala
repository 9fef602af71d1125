package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** streaming_ingest_quantiles: the stream-maintained frozen-grid
  * histogram must yield the same quantiles as the one-shot fixed-grid
  * computation over the full table (histogram counts are a commutative
  * monoid, so the arrival split cannot matter), survive the restart
  * path (re-invocation drains nothing and reads the same table), and
  * saturate out-of-grid arrivals into the edge bins. */
class StreamQuantilesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val bins = AdvancedOps.PCTL_SKETCH_BINS

  test("stream-merged histogram equals the one-shot fixed-grid result") {
    val streamed = AdvancedOps.streamingQuantiles(spark, sf)
      .orderBy("l_returnflag").collect()

    val cut = lit("1997-01-01").cast("timestamp")
    val all = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_shipdate"))
    val mm = all.filter(col("l_shipdate") < cut)
      .agg(min("l_quantity"), max("l_quantity")).head
    val oneShot = AdvancedOps.histQuantiles(
        AdvancedOps.histogramOf(all, "l_returnflag", "l_quantity",
          mm.getDouble(0), mm.getDouble(1), bins, clamp = true),
        "l_returnflag", mm.getDouble(0), mm.getDouble(1), bins)
      .orderBy("l_returnflag").collect()

    assert(streamed.length === oneShot.length)
    streamed.zip(oneShot).foreach { case (st, b) =>
      assert(st.getString(0) === b.getString(0))
      assert(st.getDouble(1) === b.getDouble(1))
      assert(st.getDouble(2) === b.getDouble(2))
      assert(st.getLong(3) === b.getLong(3))
    }
  }

  test("re-invocation takes the restart path and returns the same table") {
    val again = AdvancedOps.streamingQuantiles(spark, sf)
      .orderBy("l_returnflag").collect().toSeq
    val once = AdvancedOps.streamingQuantiles(spark, sf)
      .orderBy("l_returnflag").collect().toSeq
    assert(again === once)
    // n_rows must cover the WHOLE table exactly once — a double-applied
    // arrival batch would overcount
    val total = again.map(_.getLong(3)).sum
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("at-least-once replay of a batchId never double-counts, and a " +
      "torn state write is repaired by the replay") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("g_quant_replay").toString
    def hist(vs: Seq[Double]) = AdvancedOps.histogramOf(
      vs.map(("a", _)).toDF("g", "v"), "g", "v", 0.0, 63.0, bins,
      clamp = true)
    hist(Seq(1.0, 2.0)).write.parquet(s"$base/init")
    def state() = AdvancedOps.quantStateRead(spark, base)
      .orderBy("bin").collect().map(r => r.getLong(1) -> r.getLong(2))
      .toSeq
    def apply(id: Long, vs: Seq[Double]): Unit =
      AdvancedOps.applyQuantBatch(base,
        vs.map(("a", _)).toDF("g", "v"), id, "g", "v", 0.0, 63.0, bins)

    apply(0, Seq(3.0))
    apply(1, Seq(4.0, 4.0))
    val after1 = state()
    assert(after1.toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))

    // crash-between-sink-and-offset-commit: batch 1 is REDELIVERED —
    // the merge must re-anchor on batch 0's state, not add again
    apply(1, Seq(4.0, 4.0))
    assert(state() === after1, "replayed batch was double-applied")

    // torn write: s2 is left half-written (simulated by a garbage dir);
    // the replay of batch 2 overwrites and repairs it
    val s2 = new java.io.File(s"$base/s2"); s2.mkdirs()
    java.nio.file.Files.write(s2.toPath.resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    apply(2, Seq(5.0))
    assert(state().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))

    // retention: states strictly older than the predecessor are gone
    assert(!new java.io.File(s"$base/s0").exists(),
      "obsolete state dir was not reclaimed")
    assert(new java.io.File(s"$base/s1").exists(),
      "the replay-anchor predecessor must survive")
  }

  test("out-of-grid values saturate into the edge bins") {
    import spark.implicits._
    val df = Seq(("a", -100.0), ("a", 5.0), ("a", 900.0))
      .toDF("g", "v")
    // grid frozen at [0, 63]: span 64, one value per bin
    val h = AdvancedOps.histogramOf(df, "g", "v", 0.0, 63.0, bins,
        clamp = true)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(h === Map(0L -> 1L, 5L -> 1L, 63L -> 1L))
  }
}
