package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.{SnapshotTable => T}

/** Join-driven runtime partition pruning (DPP) on the ORDINARY batch
  * connector scan — the star-schema shape a 100 TB lakehouse runs
  * most: `fact ⋈ dim ON pt_year WHERE dim.<selective>` must plan only
  * the partitions whose keys survive the dim predicate, arriving at
  * the scan as a runtime `pt_year IN (...)` filter through
  * SupportsRuntimeV2Filtering. Pins: (1) the runtime filter is IN the
  * executed plan, (2) planInputPartitions after runtime filtering
  * planned EXACTLY the matching partitions, (3) results are identical
  * with DPP disabled (pruning is an optimization, never semantics),
  * (4) runtime keys intersect — never replace — statically consumed
  * pt_year conjuncts, (5) unparseable runtime predicates narrow
  * nothing. */
class DppSnapshotSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "pt_year", "v")
  }

  /** A 4-partition fact (1995..1998) and a dim whose selective tag
    * keeps 1996+1997 only. */
  private def fixture(): (String, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val root = Files.createTempDirectory("g_dpp").toString
    T.commit(spark, root, 0, frame(
      (1L, 1995, 1.0), (2L, 1995, 2.0),
      (3L, 1996, 3.0), (4L, 1996, 4.0),
      (5L, 1997, 5.0), (6L, 1997, 6.0),
      (7L, 1998, 7.0), (8L, 1998, 8.0)), Seq(1995, 1996, 1997, 1998))
    val fact = spark.read.format("graft-snapshot")
      .option("root", root).load()
    import spark.implicits._
    // the dim must be a real SCAN: a local relation would constant-
    // fold its filter away and the pruning rule would see no
    // selective predicate (exactly what a warehouse dim table is not)
    val dimPath = Files.createTempDirectory("g_dpp_dim").toString
    Seq((1995, "old"), (1996, "new"), (1997, "new"), (1998, "old"))
      .toDF("pt_year", "tag").write.mode("overwrite").parquet(dimPath)
    (root, fact, spark.read.parquet(dimPath))
  }

  test("a selective dim predicate reaches the batch scan as a runtime " +
      "pt_year filter: only matching partitions plan; results match " +
      "the DPP-off twin exactly") {
    val (root, fact, dim) = fixture()
    def run() = fact.join(dim.filter(col("tag") === "new"), "pt_year")
      .groupBy("pt_year")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
    val q = run()
    val got = q.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got === Seq((1996, 2L, 7.0), (1997, 2L, 11.0)))
    // the runtime filter is in the executed plan...
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no runtime filter reached the scan:\n$p")
    // ...and it actually narrowed planning to the matching partitions
    assert(SnapshotScan.lastPlannedYears.get(root) ===
      Some(Some(Seq(1996, 1997))),
      "the scan planned more than the dim-surviving partitions")
    // pruning is an optimization only: DPP off, identical results
    val k = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val off = run().collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(off === got)
      assert(SnapshotScan.lastPlannedYears.get(root) === Some(None),
        "with DPP off the scan must plan unscoped")
    } finally spark.conf.set(k, saved)
  }

  test("runtime keys INTERSECT statically consumed pt_year conjuncts") {
    val (root, fact, dim) = fixture()
    // static: {1996, 1998}; runtime from the dim: {1996, 1997} → 1996
    val q = fact.filter(col("pt_year").isin(1996, 1998))
      .join(dim.filter(col("tag") === "new"), "pt_year")
      .select(col("k"), col("v"))
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((3L, 3.0), (4L, 4.0)))
    val planned = SnapshotScan.lastPlannedYears.get(root)
    assert(planned === Some(Some(Seq(1996))),
      s"static ∩ runtime must plan exactly 1996, planned $planned")
  }

  test("unparseable runtime predicates narrow nothing (sound default)") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val y = Expressions.column("pt_year")
    val i7 = Expressions.literal(7)
    assert(SnapshotRuntime.years(
      new Predicate("=", Array(y, i7))) === Some(Set(7)))
    assert(SnapshotRuntime.years(
      new Predicate("IN", Array(y, i7,
        Expressions.literal(9)))) === Some(Set(7, 9)))
    // wrong column, wrong operator, non-numeric literal: all None
    assert(SnapshotRuntime.years(new Predicate("=",
      Array(Expressions.column("k"), i7))).isEmpty)
    assert(SnapshotRuntime.years(
      new Predicate(">=", Array(y, i7))).isEmpty)
    assert(SnapshotRuntime.years(new Predicate("IN", Array(y,
      Expressions.literal(org.apache.spark.unsafe.types.UTF8String
        .fromString("x"))))).isEmpty)
  }
}
