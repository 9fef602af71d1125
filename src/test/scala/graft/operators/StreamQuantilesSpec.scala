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
