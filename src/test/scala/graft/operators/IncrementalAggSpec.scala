package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The write_incremental_agg gate's scale claims: the merge combines
  * partials exactly (equal to recomputing from scratch) and rewrites
  * ONLY the buckets the batch touches — proven on file mtimes. */
class IncrementalAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def bucketFiles(base: String, b: Int): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(base, s"bucket=$b")
    if (!java.nio.file.Files.exists(dir)) return Map.empty
    val stream = java.nio.file.Files.list(dir)
    try stream.toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    finally stream.close()
  }

  test("incremental merge equals a from-scratch aggregation") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_incragg_spec").toString
    val stage = java.nio.file.Files
      .createTempDirectory("graft_incragg_stage").toString
    WriteOps.incrAggLoad(spark, sf, base)
    WriteOps.incrAggMerge(spark, base, stage,
      Tables.orders(spark, sf)
        .filter(year(col("o_orderdate")) === 1997))

    val merged = spark.read.parquet(base)
      .select("o_custkey", "n_orders", "total_dec")
      .orderBy("o_custkey").collect()
    val scratch = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) <= 1997)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(Tables.dec)).as("total_dec"))
      .orderBy("o_custkey").collect()
    assert(merged.length === scratch.length)
    merged.zip(scratch).foreach { case (m, e) =>
      assert(m.getLong(0) === e.getLong(0))
      assert(m.getLong(1) === e.getLong(1))
      assert(m.getDecimal(2).compareTo(e.getDecimal(2)) === 0) // exact
    }
  }

  test("a narrow batch rewrites only its bucket; others keep mtimes") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_incragg_mtime").toString
    val stage = java.nio.file.Files
      .createTempDirectory("graft_incragg_mtime_stage").toString
    WriteOps.incrAggLoad(spark, sf, base)
    val before = (0 until 16).map(b => b -> bucketFiles(base, b)).toMap
    Thread.sleep(1100) // mtime granularity guard

    // one customer's 1997 orders → exactly one touched bucket
    val oneKey = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1997)
      .select("o_custkey").limit(1).collect()(0).getLong(0)
    WriteOps.incrAggMerge(spark, base, stage,
      Tables.orders(spark, sf)
        .filter(year(col("o_orderdate")) === 1997)
        .filter(col("o_custkey") === oneKey))

    val touched = (oneKey % 16).toInt
    (0 until 16).filter(_ != touched).foreach { b =>
      assert(bucketFiles(base, b) === before(b),
        s"bucket $b was rewritten by a batch that never touched it")
    }
    assert(bucketFiles(base, touched) !== before(touched))

    // and the touched bucket's merge is exact for that key
    val row = spark.read.parquet(base)
      .filter(col("o_custkey") === oneKey)
      .select("n_orders").collect()(0).getLong(0)
    val expected = Tables.orders(spark, sf)
      .filter(col("o_custkey") === oneKey)
      .filter(year(col("o_orderdate")) < 1997).count() +
      Tables.orders(spark, sf)
        .filter(col("o_custkey") === oneKey)
        .filter(year(col("o_orderdate")) === 1997).count()
    assert(row === expected)
  }
}
