package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WriteOps.SnapshotTable

/** r17 optimization spec: commits DISTRIBUTE by the partition column
  * by default (the Iceberg write.distribution-mode=hash shape via an
  * AQE rebalance), so the staged write's file count follows the DATA,
  * not the slice's upstream task count — a 32-task slice of a small
  * table no longer lands 32 near-empty files per partition that every
  * later read, stats pass and rename loop pays for. `distribute =
  * false` preserves the caller's layout verbatim (what the optimize /
  * skipping fixtures pin). Reads plan from the manifest-backed
  * FileIndex — (path, bytes) from the manifest, zero listing jobs —
  * and must return identical rows either way. */
class CommitDistributionSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("commit-distribution-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // the exact file counts below ride on AQE's rebalance coalescing —
    // pin the configs the assertion depends on rather than inheriting
    // defaults that could drift across Spark versions
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "134217728")
    .getOrCreate()

  test("default commit coalesces a many-task slice to data-sized " +
      "files per partition; distribute=false keeps the task layout") {
    import spark.implicits._
    val rows = (0L until 2000L).map(k => (k, 1 + (k % 2).toInt, k * 1.5))

    val rootD = Files.createTempDirectory("g_dist_on").toString
    SnapshotTable.commit(spark, rootD, 0,
      rows.toDF("k", "pt_year", "v").repartition(8), Seq(1, 2))
    // tiny data, AQE rebalance → one file per touched partition
    assert(SnapshotTable.files(rootD, 0).size === 2,
      "rebalanced commit should write one data-sized file per partition")

    val rootF = Files.createTempDirectory("g_dist_off").toString
    SnapshotTable.commit(spark, rootF, 0,
      rows.toDF("k", "pt_year", "v").repartition(8), Seq(1, 2),
      distribute = false)
    assert(SnapshotTable.files(rootF, 0).size === 16,
      "distribute=false must preserve the 8-task × 2-partition layout")

    // identical content through both layouts (manifest-backed scan)
    val a = SnapshotTable.read(spark, rootD, 0)
      .orderBy("k").collect().toSeq
    val b = SnapshotTable.read(spark, rootF, 0)
      .orderBy("k").collect().toSeq
    assert(a === b)

    // stats blobs recorded on the rebalanced files too — skipping
    // still prunes (1 of 2 files can hold k in [0, 10] ∩ pt_year=1)
    assert(SnapshotTable.statEntries(rootD, 0).forall(_.stats.nonEmpty))
    val pruned = SnapshotTable.filesInRange(rootD, 0, "pt_year", 1, 1)
    assert(pruned.size === 1)
    assert(SnapshotTable.readRange(spark, rootD, 0, "pt_year", 1, 1)
      .count() === 1000L)
  }

  test("manifest-backed read resolves recorded sizes: split counts " +
      "and row totals match a listed read") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_dist_sizes").toString
    SnapshotTable.commit(spark, root, 0,
      (0L until 5000L).map(k => (k, 1, s"v$k")).toDF("k", "pt_year", "s"),
      Seq(1))
    val df = SnapshotTable.read(spark, root, 0)
    val direct = spark.read.parquet(SnapshotTable.files(root, 0): _*)
    assert(df.count() === direct.count())
    assert(df.agg(sum("k")).head.getLong(0) ===
      direct.agg(sum("k")).head.getLong(0))
  }
}
