package graft.sources

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.SnapshotTable

/** Optimistic concurrency on the SQL write path + the orphan vacuum:
  * two racing INSERTs both land (the loser rebases and retries), no
  * rows are lost or doubled, and vacuumOrphans reclaims exactly the
  * never-referenced leftovers — age-gated so in-flight staging always
  * survives, branch staging always survives. */
class ConcurrentInsertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = SnapshotTable

  private def frame(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("o_orderkey", "pt_year", "o_totalprice")
  }

  private def freshCatalog(): (String, String) = {
    val base = Files.createTempDirectory("g_conc_cat").toString
    val name = "gconc_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  test("two racing INSERTs both land; the loser rebases and retries") {
    val (cat, base) = freshCatalog()
    val root = s"$base/t1"
    T.commit(spark, root, 0, frame((1L, 1, 10.0)), Seq(1))
    frame((2L, 1, 20.0)).createOrReplaceTempView("conc_a")
    frame((3L, 2, 30.0)).createOrReplaceTempView("conc_b")
    val fa = Future(spark.sql(s"INSERT INTO $cat.t1 SELECT * FROM conc_a"))
    val fb = Future(spark.sql(s"INSERT INTO $cat.t1 SELECT * FROM conc_b"))
    Await.result(fa, 5.minutes); Await.result(fb, 5.minutes)
    // both committed: linear history grew by exactly two versions and
    // the head holds the union — nothing lost, nothing doubled
    assert(T.versions(root) === Seq(0, 1, 2))
    assert(spark.sql(s"SELECT o_orderkey FROM $cat.t1").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("vacuumOrphans reclaims race leftovers, never live or young files") {
    val root = Files.createTempDirectory("g_orphans").toString
    T.commit(spark, root, 0, frame((1L, 1, 10.0)), Seq(1))
    T.commitAppend(spark, root, 1, frame((2L, 1, 20.0)))
    // plant a loser's leftovers: an unreferenced data file + m-file
    val orphanData = java.nio.file.Paths.get(root, "data",
      "v1_y1_a00000_loser000.parquet")
    Files.write(orphanData, Array[Byte](1, 2, 3))
    val orphanM = java.nio.file.Paths.get(root, "_manifests",
      "m_v1_y1_loser000.txt")
    Files.writeString(orphanM, "junk\t3")
    // young orphans survive the default horizon (in-flight protection)
    assert(T.vacuumOrphans(root) === Seq.empty)
    assert(Files.exists(orphanData) && Files.exists(orphanM))
    // aged out: exactly the orphans go; every referenced file stays
    val reclaimed = T.vacuumOrphans(root, horizonMs = -1L)
    assert(reclaimed.toSet ===
      Set(orphanData.toString, orphanM.toString).map(p =>
        new org.apache.hadoop.fs.Path(p).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .makeQualified(new org.apache.hadoop.fs.Path(p)).toString))
    assert(!Files.exists(orphanData) && !Files.exists(orphanM))
    assert(T.read(spark, root, 1).count() === 2)
    assert(T.read(spark, root, 0).count() === 1, "history broken")
  }

  test("branch-staged files are reachable roots, never orphans") {
    val root = Files.createTempDirectory("g_orphans_br").toString
    T.commit(spark, root, 0, frame((1L, 1, 10.0)), Seq(1))
    T.stageCommit(spark, root, "audit1", frame((9L, 1, 90.0)), Seq(1))
    assert(T.vacuumOrphans(root, horizonMs = -1L) === Seq.empty,
      "vacuumOrphans reclaimed a staged branch's files")
    assert(T.readBranch(spark, root, "audit1").count() === 1)
    // publish still works after the sweep
    assert(T.publishBranch(root, "audit1") === 1)
    assert(T.read(spark, root, 1).count() === 1)
  }
}
