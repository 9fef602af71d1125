package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The z-order layout's reason to exist is FILE SKIPPING: after
  * range-partitioning on the Morton value, each file's min/max range on
  * BOTH interleaved columns contracts, so a filter on either column
  * prunes files. This spec measures that contraction against a
  * round-robin layout of the same data — the curve math itself is
  * oracle-verified by the `write_zordered` gate.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  /** mean over files of (per-file max-min) / (global max-min), for a
    * column — 1.0 means every file spans the whole domain (no skipping
    * possible), small means tight files (good pruning). */
  private def meanSpread(dir: String, column: String): Double = {
    val df = spark.read.parquet(dir)
      .select(col(column), input_file_name().as("f"))
    val g = df.agg(max(column).cast("double") - min(column).cast("double"))
      .collect()(0).getDouble(0)
    val rows = df.groupBy("f")
      .agg((max(column).cast("double") - min(column).cast("double"))
        .as("spread"))
      .agg(avg("spread")).collect()
    rows(0).getDouble(0) / g
  }

  test("z-order layout contracts per-file ranges on both key columns") {
    val zDir = java.nio.file.Files
      .createTempDirectory("g_zorder").toString
    val rrDir = java.nio.file.Files
      .createTempDirectory("g_zorder_rr").toString
    try {
      WriteOps.zorderWrite(spark, sf, zDir)
      // round-robin baseline: same rows, same file count, no clustering
      spark.read.parquet(zDir).repartition(8)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(rrDir)

      val zScore = meanSpread(zDir, "l_partkey") +
        meanSpread(zDir, "l_suppkey")
      val rrScore = meanSpread(rrDir, "l_partkey") +
        meanSpread(rrDir, "l_suppkey")
      // round-robin files each span ~the full domain (score ≈ 2.0); the
      // z-order layout must contract materially on the two columns
      // combined
      assert(zScore < 0.75 * rrScore,
        s"z-order spread $zScore not materially below round-robin $rrScore")
    } finally {
      Seq(zDir, rrDir).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }
  }

  test("range-sorted layout yields disjoint per-file key ranges") {
    // run the gate (writes to its scratch dir and returns the readback)
    WriteOps.queries("write_range_sorted")(spark, sf).count()
    val dir = WriteOps.scratch("rangesort_out")
    // probe epoch longs, not Date/Timestamp objects: the fixture column
    // is TIMESTAMP_NTZ, so Row.getDate/getTimestamp would mis-cast
    val files = spark.read.parquet(dir)
      .select(col("l_shipdate").cast("timestamp").cast("long").as("k"),
        input_file_name().as("f"))
      .groupBy("f")
      .agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("lo")
      .collect()
    assert(files.length > 1, "expected a multi-file layout")
    // consecutive files may only touch at a boundary value (equal keys
    // can straddle a range split), never properly overlap
    files.sliding(2).foreach { w =>
      assert(w(0).getLong(2) <= w(1).getLong(1),
        s"file ranges overlap: ${w(0)} vs ${w(1)}")
    }
  }

  test("morton interleave is monotone in each dimension at fixed other") {
    // zval(a, b) with b fixed must be increasing in a (and vice versa):
    // the defining property that makes range partitioning on zval
    // constrain both dimensions
    val df = spark.range(0, 64).toDF("a")
      .withColumn("b", lit(5L))
      .withColumn("z", expr(WriteOps.zvalExpr("a", "b")))
      .orderBy("a")
    val zs = df.select("z").collect().map(_.getLong(0))
    assert(zs.sliding(2).forall(p => p(0) < p(1)))
  }
}
