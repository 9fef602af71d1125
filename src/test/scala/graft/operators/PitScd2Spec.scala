package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The join_pit_scd2 gate's correctness core: each key's SCD2 intervals
  * tile [0, 9999), so every fact matches EXACTLY one dimension version —
  * a dropped (gap) or doubled (overlap) fact is the bug the
  * point-in-time join exists to prevent. Also locks the plan: the dim
  * broadcasts, so facts never shuffle for the join. */
class PitScd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def builtDim(): org.apache.spark.sql.DataFrame = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_pit_spec").toString
    val stage = java.nio.file.Files
      .createTempDirectory("graft_pit_stage").toString
    WriteOps.scd2Load(spark, sf, base)
    WriteOps.scd2Merge(spark, sf, base, stage, v = 1)
    WriteOps.scd2Merge(spark, sf, base, stage, v = 2)
    spark.read.parquet(base)
      .select(col("c_custkey"), col("c_acctbal"),
        col("valid_from"), col("valid_to"))
  }

  test("every fact matches exactly one dimension version") {
    val dim = builtDim()
    val facts = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 3).cast("int").as("event_v"))
    val matches = facts.join(dim,
        facts("o_custkey") === dim("c_custkey") &&
        col("event_v") >= col("valid_from") &&
        col("event_v") < col("valid_to"), "left")
      .groupBy("o_orderkey").count()
    val histogram = matches.groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFacts = facts.count()
    assert(histogram === Map(1L -> nFacts),
      s"match-count histogram must be {1 -> $nFacts}, got $histogram")
  }

  test("interval tiling: per key, versions cover [0,9999) without overlap") {
    val dim = builtDim()
    // keys born in batch 1 (the +1000000 inserts) legitimately start at
    // valid_from=1 and are unreachable from facts; tiling from 0 is the
    // contract only for keys that existed at load
    val bad = dim.filter(col("c_custkey") < 1000000L)
      .groupBy("c_custkey")
      .agg(min("valid_from").as("lo"), max("valid_to").as("hi"),
        sum(col("valid_to") - col("valid_from")).as("covered"))
      .filter(col("lo") =!= 0 || col("hi") =!= 9999 ||
        col("covered") =!= 9999)
    assert(bad.count() === 0)
  }

  test("the dim side broadcasts: no exchange on the fact side") {
    val dim = builtDim()
    val facts = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 3).cast("int").as("event_v"))
    val joined = facts.join(broadcast(dim),
      facts("o_custkey") === dim("c_custkey") &&
      col("event_v") >= col("valid_from") &&
      col("event_v") < col("valid_to"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    val beforeJoin = plan.substring(plan.indexOf("BroadcastHashJoin"))
    // the probe (fact) side below the join must not exchange
    assert(!beforeJoin.split("BroadcastExchange")(0)
      .contains("Exchange hashpartitioning"))
  }
}
