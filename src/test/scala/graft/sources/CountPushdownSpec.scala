package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.{SnapshotTable => T}

/** Metadata-only COUNT(*) (SupportsPushDownAggregates): an unfiltered
  * ungrouped count answers from the manifest's recorded per-file row
  * counts — zero data files open — and REFUSES (falling back to a
  * correct full scan) under deletion vectors, filters, or legacy
  * entries without recorded counts. */
class CountPushdownSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "pt_year", "v")
  }

  private def df(root: String) =
    spark.read.format("graft-snapshot").option("root", root).load()

  private def countPlan(d: org.apache.spark.sql.DataFrame) =
    d.groupBy().agg(count(lit(1)).as("cnt"))

  private def planString(d: org.apache.spark.sql.DataFrame): String =
    d.queryExecution.executedPlan.toString

  test("unfiltered count(*) answers from manifest row counts") {
    val root = Files.createTempDirectory("g_cnt_push").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.0), (2L, 1, 2.0), (3L, 2, 3.0)), Seq(1, 2))
    T.commitAppend(spark, root, 1, frame((4L, 2, 4.0)))
    val q = countPlan(df(root))
    assert(planString(q).contains("COUNT(*)=4 from manifest"),
      s"count was not pushed:\n${planString(q)}")
    assert(q.collect().head.getLong(0) === 4L)
    // SQL count(*) pushes identically
    df(root).createOrReplaceTempView("cnt_push_t")
    val sqlQ = spark.sql(
      "SELECT cast(count(*) AS bigint) AS cnt FROM cnt_push_t")
    assert(planString(sqlQ).contains("from manifest"))
    assert(sqlQ.collect().head.getLong(0) === 4L)
  }

  test("GROUP BY pt_year count(*) pushes as per-partition manifest sums") {
    val root = Files.createTempDirectory("g_cnt_grp").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.0), (2L, 1, 2.0), (3L, 2, 3.0)), Seq(1, 2))
    T.commitAppend(spark, root, 1, frame((4L, 2, 4.0), (5L, 3, 5.0)))
    val q = df(root).groupBy("pt_year").agg(count(lit(1)).as("cnt"))
    assert(planString(q).contains("GROUP BY pt_year from manifest"),
      s"grouped count was not pushed:\n${planString(q)}")
    assert(q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
    // grouping by a NON-partition column scans normally
    val q2 = df(root).groupBy("k").agg(count(lit(1)).as("c"))
    assert(!planString(q2).contains("from manifest"))
    assert(q2.count() === 5)
  }

  test("a version-pinned count pushes against THAT manifest") {
    val root = Files.createTempDirectory("g_cnt_pin").toString
    T.commit(spark, root, 0, frame((1L, 1, 1.0), (2L, 1, 2.0)), Seq(1))
    T.commitAppend(spark, root, 1, frame((3L, 2, 3.0)))
    val pinned = spark.read.format("graft-snapshot")
      .option("root", root).option("versionAsOf", "0").load()
    val q = countPlan(pinned)
    assert(planString(q).contains("COUNT(*)=2 from manifest"))
    assert(q.collect().head.getLong(0) === 2L)
  }

  test("deletion vectors refuse the pushdown; the scan count is DV-exact") {
    val root = Files.createTempDirectory("g_cnt_dv").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.0), (2L, 1, 2.0), (3L, 1, 3.0)), Seq(1))
    T.commitDelete(spark, root, 1, "k", frame((2L, 1, 2.0)))
    val q = countPlan(df(root))
    assert(!planString(q).contains("from manifest"),
      "count pushed through pending tombstones — would overcount")
    assert(q.collect().head.getLong(0) === 2L)
  }

  test("a filtered count scans (stats prune files, rows re-filter)") {
    val root = Files.createTempDirectory("g_cnt_filter").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.0), (2L, 1, 2.0), (3L, 2, 3.0)), Seq(1, 2))
    val q = countPlan(df(root).filter(col("k") >= 2L))
    assert(!planString(q).contains("from manifest"))
    assert(q.collect().head.getLong(0) === 2L)
  }

  test("legacy manifest entries without row counts refuse the pushdown") {
    val root = Files.createTempDirectory("g_cnt_legacy").toString
    T.commit(spark, root, 0, frame((1L, 1, 1.0), (2L, 1, 2.0)), Seq(1))
    // strip the rows field from every entry line of the partition
    // m-file — the pre-r15 on-disk shape
    T.pointers(root, 0).values.foreach { m =>
      val p = java.nio.file.Paths.get(m)
      val stripped = java.nio.file.Files.readAllLines(p)
        .toArray.map(_.toString).map { l =>
          val t = l.split('\t'); t.take(3).mkString("\t")
        }.mkString("\n")
      java.nio.file.Files.writeString(p, stripped)
      // drop the local-FS checksum sidecar the out-of-band rewrite
      // invalidated
      java.nio.file.Files.deleteIfExists(
        p.getParent.resolve(s".${p.getFileName}.crc"))
    }
    val q = countPlan(df(root))
    assert(!planString(q).contains("from manifest"),
      "count pushed over entries with unknown row counts")
    assert(q.collect().head.getLong(0) === 2L)
  }
}
