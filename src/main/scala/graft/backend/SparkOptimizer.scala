package graft.backend

import org.apache.spark.sql.SparkSession

/** Session tuning — the Scala twin of the reference's
  * easy_sql/spark_optimizer.py (get_spark :30-58, SparkDynamicConfig
  * :6-27) and local_spark.py.
  *
  * Conf mapping notes:
  *  - `spark.sql.adaptive.shuffle.targetPostShuffleInputSize` (128 MB,
  *    spark_optimizer.py:43) is the Spark 2 name; its Spark 3+/4
  *    successor is `spark.sql.adaptive.advisoryPartitionSizeInBytes`,
  *    set here to the same 134217728.
  *  - the Spark-2-only dynamic-allocation branch (:47-51) has no
  *    Spark 4 counterpart and is dropped.
  */
object SparkOptimizer {

  /** get_spark: apply caller conf, then the engine's standing tuning:
    * AQE on, 128 MB post-shuffle target, hdfs-stats fallback, nonstrict
    * dynamic partitions. */
  def getSpark(appName: Option[String] = None,
      conf: Map[String, String] = Map.empty,
      enableHive: Boolean = false): SparkSession = {
    var builder = SparkSession.builder()
    if (enableHive) builder = builder.enableHiveSupport()
    appName.foreach(n => builder = builder.config("spark.app.name", n))
    conf.foreach { case (k, v) => builder = builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.conf.set("spark.sql.statistics.fallBackToHdfs", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "134217728")
    spark.conf.set("hive.exec.dynamic.partition.mode", "nonstrict")
    spark
  }

  /** clear_temp_views (spark_optimizer.py:62-66). */
  def clearTempViews(spark: SparkSession): Unit =
    spark.catalog.listTables("default").collect()
      .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
}

/** Manual shuffle sizing that trades AQE away for a pinned partition
  * count (SparkDynamicConfig, spark_optimizer.py:6-27) — exposed to
  * ETLs via the `set_shuffle_partitions` func; use the min/max pair
  * when a pipeline alternates small dimension builds with wide fact
  * shuffles. */
final class SparkDynamicConfig(
    maxShufflePartitions: Option[Int] = None,
    minShufflePartitions: Option[Int] = None) {

  private def pin(spark: SparkSession, n: Int): SparkDynamicConfig = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    spark.conf.set("spark.default.parallelism", n.toString)
    this
  }

  def useMinShufflePartitions(spark: SparkSession): SparkDynamicConfig =
    pin(spark, minShufflePartitions.getOrElse(throw new IllegalArgumentException(
      "must provide min_shuffle_partitions to use the conf")))

  def useMaxShufflePartitions(spark: SparkSession): SparkDynamicConfig =
    pin(spark, maxShufflePartitions.getOrElse(throw new IllegalArgumentException(
      "must provide max_shuffle_partitions to use the conf")))

  def useAdaptiveShufflePartitions(spark: SparkSession): SparkDynamicConfig = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    this
  }
}
