package graft.backend

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

class SparkOptimizerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("getSpark applies the reference's standing tuning") {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      val s = SparkOptimizer.getSpark() // getOrCreate -> same session
      assert(s eq spark)
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .replace("b", "") == "134217728")
      assert(s.conf.get("hive.exec.dynamic.partition.mode") == "nonstrict")
      assert(s.conf.get("spark.sql.statistics.fallBackToHdfs") == "true")
    } finally saved.foreach { case (k, v) =>
      v.foreach(spark.conf.set(k, _)) }
  }

  test("dynamic config pins partitions and disables AQE; adaptive restores") {
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val dc = new SparkDynamicConfig(
        maxShufflePartitions = Some(64), minShufflePartitions = Some(2))
      dc.useMinShufflePartitions(spark)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "2")
      dc.useMaxShufflePartitions(spark)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "64")
      dc.useAdaptiveShufflePartitions(spark)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      intercept[IllegalArgumentException] {
        new SparkDynamicConfig().useMinShufflePartitions(spark)
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    }
  }

  test("clearTempViews drops every temporary view") {
    spark.range(1).createOrReplaceTempView("opt_spec_v1")
    spark.range(2).createOrReplaceTempView("opt_spec_v2")
    SparkOptimizer.clearTempViews(spark)
    assert(!spark.catalog.tableExists("opt_spec_v1"))
    assert(!spark.catalog.tableExists("opt_spec_v2"))
  }
}
