package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Plan-shape evidence for the bucketed co-located join: with both
  * sides bucketed+sorted on the join key, the SortMergeJoin must read
  * bucket files directly — the ONLY exchange in the whole query is the
  * final group-by. This is the assertion wall-clock can't make at
  * sf0.001; the plan is the 100 TB cost model.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bucketed join plans with zero exchanges below the join") {
    val conf = spark.conf
    val savedAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // force the sort-merge path (no broadcast) and a static plan we can
    // inspect deterministically
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = WriteOps.queries("bucketed_join_colocated")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan)
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 1,
        s"expected the group-by exchange only, got $exchanges:\n$plan")
      // both scans report their bucket layout
      assert(plan.contains("SelectedBucketsCount"), plan)

      // and the result is right (same agg as the oracle)
      val rows = df.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getLong(1)).sum ==
        Tables.orders(spark, "/root/testdata/sf0.001")
          .join(Tables.customer(spark, "/root/testdata/sf0.001"),
            org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
          .count())
    } finally {
      conf.set("spark.sql.adaptive.enabled", savedAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }
}
