package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Value-level assertions for the three gates the driver can only
  * rows-check (no DuckDB oracle by design): the sketch estimate, the
  * partitioning contract, and the cache lifecycle. */
class NoOracleGatesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within 10% of exact per group") {
    val rows = graft.SparkEntry.queries("approx_distinct_sketch")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(exact > 0)
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"approx $approx vs exact $exact drifts > 10%")
    }
  }

  test("repartition_coalesce reports the contracted partition count") {
    val r = graft.SparkEntry.queries("repartition_coalesce")(spark, sf)
      .collect().head
    // repartition(8).coalesce(4) => 4 planned partitions, all rows kept
    assert(r.getAs[Int]("n_partitions") == 4)
    assert(r.getAs[Long]("n_parts_used") <= 4)
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(r.getAs[Long]("total_rows") == total)
  }

  test("cache_unpersist counts match and leave no cached table behind") {
    val r = graft.SparkEntry.queries("cache_unpersist")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("cnt") == r.getAs[Long]("cached_count"))
    assert(!spark.catalog.isCached("g_cache_t"))
  }

  test("replay gate re-invocation (checkpoint recovery) is idempotent") {
    // First invocation = full replay; second = a fresh StreamingQuery
    // over the same durable checkpoint (the production restart path).
    // Both must surface the exact same sink contents — a recovery that
    // re-emitted or dropped windows would diverge here.
    def run() = graft.SparkEntry.queries("streaming_replay_tumbling")(
      spark, sf).collect().map(_.toString).sorted.toSeq
    val first = run()
    val second = run()
    assert(first.nonEmpty)
    assert(first == second, "checkpoint-recovery rerun diverged from replay")
  }
}

/** Distributional properties of the temperature mixture the row-level
  * oracle doesn't state: α = 0.5 flattens the mixture (rare domains up,
  * dominant domains down) and the sampled shares still sum to 1. */
class TemperatureMixSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sampled shares form a flatter distribution summing to 1") {
    val rows = graft.SparkEntry.queries("sample_temperature_mix")(
      spark, sf).collect()
    val share = rows.map(_.getDouble(2))
    val sampled = rows.map(_.getDouble(4))
    assert(math.abs(sampled.sum - 1.0) < 1e-9)
    assert(math.abs(share.sum - 1.0) < 1e-9)
    // flattening: the sampled ratio between most- and least-likely
    // domain is the sqrt of the raw ratio
    val rawRatio = share.max / share.min
    val sampledRatio = sampled.max / sampled.min
    assert(math.abs(sampledRatio - math.sqrt(rawRatio)) < 1e-9,
      s"expected sqrt($rawRatio), got $sampledRatio")
    // every below-average domain is upweighted, above-average damped
    rows.foreach { r =>
      val (s0, s1) = (r.getDouble(2), r.getDouble(4))
      if (s0 < 1.0 / rows.length) assert(s1 > s0)
      if (s0 > 1.0 / rows.length) assert(s1 < s0)
    }
  }
}
