package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.{SnapshotTable => T}

/** LIMIT / TopN pushdown on the connector
  * (SupportsPushDownLimit/TopN): an unfiltered `LIMIT n` plans only a
  * file PREFIX whose manifest row counts reach n (a 100k-file table
  * serves LIMIT 20 from one file); `ORDER BY pt_year [DESC] LIMIT n`
  * takes whole partitions in key order first. Always partial — Spark
  * keeps its own Limit/sort — so every refusal (residual filters,
  * pending tombstones, unknown-row entries) just plans the full set
  * and stays correct. */
class LimitPushSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 3 years × 4 files × 8 rows = 96 rows in 12 files. */
  private def fixture(): (String, Int) = {
    val root = Files.createTempDirectory("g_limit").toString
    import spark.implicits._
    val df = (0L until 96L).map { i =>
      (i, 2001 + (i % 3).toInt, i * 1.5)
    }.toDF("k", "pt_year", "v").repartition(4)
    T.commit(spark, root, 0, df, Seq(2001, 2002, 2003),
      distribute = false)
    val files = T.files(root, 0).size
    (root, files)
  }

  private def load(root: String) =
    spark.read.format("graft-snapshot").option("root", root).load()

  test("unfiltered LIMIT n plans a row-count-bounded file prefix") {
    val (root, total) = fixture()
    assert(total >= 12, s"fixture wanted >=12 files, got $total")
    val q = load(root).limit(5)
    val got = q.collect()
    assert(got.length === 5)
    // the bound reached the scan and planning
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("limit=5"), s"limit hint missing from scan:\n$p")
    val planned = SnapshotScan.lastPlannedFiles.get(root)
    assert(planned.exists(_ <= 2),
      s"LIMIT 5 planned $planned of $total files")
    // every served row is a real table row
    val all = load(root).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got.map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2))).forall(all.contains))
  }

  test("ORDER BY pt_year DESC LIMIT n takes whole partitions from the " +
      "top key down; the served keys match the unbounded twin") {
    val (root, total) = fixture()
    val q = load(root).orderBy(col("pt_year").desc).limit(40)
    val got = q.collect().map(_.getInt(1)).toSeq
    // 2003 holds 32 rows, so the top-40 is all of 2003 + 8 of 2002
    assert(got.count(_ == 2003) === 32 && got.count(_ == 2002) === 8)
    val planned = SnapshotScan.lastPlannedFiles.get(root)
    assert(planned.exists(_ < total),
      s"TopN planned $planned of $total files — no bound applied")
    // ascending twin
    val qa = load(root).orderBy(col("pt_year")).limit(40)
    val gotA = qa.collect().map(_.getInt(1)).toSeq
    assert(gotA.count(_ == 2001) === 32 && gotA.count(_ == 2002) === 8)
  }

  test("a residual filter refuses the bound (a raw-row prefix cannot " +
      "bound filtered rows); results stay exact") {
    val (root, total) = fixture()
    val q = load(root).filter(col("v") > 100.0).limit(5)
    val got = q.collect()
    assert(got.length === 5)
    assert(got.forall(_.getDouble(2) > 100.0))
    assert(SnapshotScan.lastPlannedFiles.get(root) === Some(total),
      "a filtered LIMIT must plan the full file set")
  }

  test("pending deletion vectors refuse the bound: recorded row counts " +
      "over-count tombstoned rows") {
    val (root, total) = fixture()
    // tombstone most of the table, leaving 6 live rows — a row-count
    // prefix for LIMIT 5 would cover >=5 raw rows but <5 live ones
    import spark.implicits._
    T.commitDelete(spark, root, 1, "k",
      (0L until 90L).map(k => (k, 2001 + (k % 3).toInt))
        .toDF("k", "pt_year"))
    val q = load(root).limit(5)
    val got = q.collect()
    assert(got.length === 5)
    assert(got.forall(_.getLong(0) >= 90L))
    assert(SnapshotScan.lastPlannedFiles.get(root) === Some(total),
      "a tombstoned version must refuse the LIMIT bound")
  }

  test("non-pt_year orderings refuse TopN; the full set plans") {
    val (root, total) = fixture()
    val q = load(root).orderBy(col("k").desc).limit(3)
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got === Seq(95L, 94L, 93L))
    assert(SnapshotScan.lastPlannedFiles.get(root) === Some(total))
  }
}
