package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Data-skipping edge cases the r12 advisor flagged: float boundary
  * values (stats must record the float's EXACT double, or `f >= 3.4f`
  * prunes the file holding 3.4f) and NaN predicate bounds (which must
  * never prune — Spark orders NaN greatest, IEEE comparisons order it
  * nowhere). */
class SkippingEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = WriteOps.SnapshotTable

  test("float boundary predicates keep the file holding the boundary") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_skip_float").toString
    // 3.4f's exact double is 3.400000095...: a max recorded via
    // Float.toString ("3.4" -> 3.4d) would understate it and prune
    val df = Seq((1L, 2024, 3.4f), (2L, 2024, 1.0f))
      .toDF("k", "pt_year", "f").coalesce(1)
    T.commit(spark, root, 0, df, Seq(2024))
    assert(T.files(root, 0).size === 1)
    // equality at the boundary: the file must survive pruning
    assert(T.filesInRange(root, 0, "f", 3.4f, 3.4f).size === 1,
      "float boundary value pruned its own file")
    val got = T.readRange(spark, root, 0, "f", 3.4f, null).collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))
    // and a genuinely-disjoint range still prunes (exactness, not
    // blanket widening)
    assert(T.filesInRange(root, 0, "f", 3.5f, null).isEmpty)
  }

  test("NaN bounds never prune; residuals apply Spark's NaN ordering") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_skip_nan").toString
    val df = Seq((1L, 2024, 1.0), (2L, 2024, 2.0))
      .toDF("k", "pt_year", "d").coalesce(1)
    T.commit(spark, root, 0, df, Seq(2024))
    // `d <= NaN` matches EVERY row (Spark orders NaN greatest); an
    // IEEE stats comparison would read `NaN >= min` as false and
    // wrongly prune the only file down to zero rows
    assert(T.filesWhere(root, 0,
      Seq(("d", null, Double.NaN))).size === 1)
    assert(T.readWhere(spark, root, 0,
      Seq(("d", null, Double.NaN))).count() === 2)
    // `d >= NaN` matches nothing here — via the RESIDUAL, not pruning
    assert(T.filesWhere(root, 0,
      Seq(("d", Double.NaN, null))).size === 1)
    assert(T.readWhere(spark, root, 0,
      Seq(("d", Double.NaN, null))).count() === 0)
  }

  test("the DSv2 connector refuses NaN as a pruning bound") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_skip_nan_dsv2").toString
    val df = Seq((1L, 2024, 1.0), (2L, 2024, 2.0))
      .toDF("k", "pt_year", "d").coalesce(1)
    T.commit(spark, root, 0, df, Seq(2024))
    val t = spark.read.format("graft-snapshot").option("root", root).load()
    // before the guard, EqualTo/LessThanOrEqual(d, NaN) became a
    // [NaN, NaN]/(-inf, NaN] bound that pruned ALL files — rows the
    // residual filter can never recover
    assert(t.filter(col("d") <= lit(Double.NaN)).count() === 2)
    assert(t.filter(col("d") === lit(Double.NaN)).count() === 0)
    // finite bounds still prune through the connector unchanged
    assert(t.filter(col("d") >= 1.5).count() === 1)
  }
}
