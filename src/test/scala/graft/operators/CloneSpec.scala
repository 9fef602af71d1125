package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Shallow clone + the OPTIMIZE tombstone-purge trigger — contracts the
  * write_shallow_clone hash oracle can't state: the clone copies zero
  * data (no data dir, source mtimes pinned across the clone's merge),
  * pending deletion vectors ride the clone, non-empty targets are
  * refused, and OPTIMIZE picks up tombstoned partitions even when they
  * are not fragmented (the nightly purge), leaving the change feed
  * empty across the purge commit. */
class CloneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = WriteOps.SnapshotTable

  private def frame(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("o_orderkey", "pt_year", "o_totalprice")
  }

  private def mtimes(fs: Seq[String]): Map[String, Long] =
    fs.map(f => f -> Files.getLastModifiedTime(Paths.get(f)).toMillis)
      .toMap

  test("a shallow clone copies zero data and evolves independently") {
    val src = Files.createTempDirectory("g_clone_src").toString
    val dst = Files.createTempDirectory("g_clone_dst").toString + "/t"
    T.commit(spark, src, 0, frame(
      (1L, 1, 10.0), (2L, 1, 20.0), (3L, 2, 30.0)), Seq(1, 2))
    val srcFiles = T.files(src, 0)
    val srcTimes = mtimes(srcFiles)

    T.shallowClone(src, dst)
    // zero data copied: the clone has no data dir, reads resolve the
    // source's files in place
    assert(!Files.exists(Paths.get(dst, "data")))
    assert(T.files(dst, 0) === srcFiles)
    assert(T.read(spark, dst, 0).collect().toSet ===
      T.read(spark, src, 0).collect().toSet)

    // the clone's rewrite of partition 1 leaves the source untouched
    T.commit(spark, dst, 1, frame((1L, 1, 11.0), (9L, 1, 90.0)), Seq(1))
    assert(mtimes(srcFiles) === srcTimes, "the clone moved source bytes")
    assert(T.versions(src) === Seq(0))
    assert(T.read(spark, src, 0).count() === 3)
    assert(T.read(spark, dst, 1).collect().map(_.getLong(0)).toSet ===
      Set(1L, 9L, 3L))
    // the clone's fresh files live under ITS root
    val fresh = T.files(dst, 1).filterNot(srcFiles.contains)
    assert(fresh.nonEmpty && fresh.forall(_.contains("/t/")))
  }

  test("pending deletion vectors ride the clone; txn lines do not") {
    val src = Files.createTempDirectory("g_clone_dv").toString
    val dst = Files.createTempDirectory("g_clone_dv_dst").toString + "/t"
    T.commit(spark, src, 0, frame((1L, 1, 10.0), (2L, 1, 20.0)), Seq(1))
    T.commitIfNew(spark, src, "app", 7L, frame((3L, 1, 30.0),
      (1L, 1, 10.0), (2L, 1, 20.0)), Seq(1))
    T.commitDelete(spark, src, 2, "o_orderkey",
      frame((2L, 1, 0.0)).select("o_orderkey", "pt_year"))
    T.shallowClone(src, dst)
    assert(T.read(spark, dst, 0).collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
    assert(T.dvOf(dst, 0).nonEmpty)
    assert(T.txnOf(dst, 0).isEmpty, "txn history leaked into the clone")
    // refuse clobbering an existing table
    intercept[IllegalArgumentException] { T.shallowClone(src, dst) }
  }

  test("OPTIMIZE purges tombstoned partitions even when not fragmented") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_opt_purge").toString
    // tableChanges' CDC shape needs (o_orderkey, o_custkey, o_totalprice)
    T.commit(spark, root, 0,
      Seq((1L, 100L, 1, 10.0), (2L, 200L, 1, 20.0), (3L, 300L, 2, 30.0))
        .toDF("o_orderkey", "o_custkey", "pt_year", "o_totalprice")
        .coalesce(1), Seq(1, 2))
    // every partition is a single file — nothing is fragmented
    assert(T.pointers(root, 0).keySet === Set(1, 2))
    T.commitDelete(spark, root, 1, "o_orderkey",
      frame((2L, 1, 0.0)).select("o_orderkey", "pt_year"))
    // the purge trigger: partition 1 rewrites because it is tombstoned
    assert(T.optimize(spark, root, 2) === Seq(1))
    assert(T.dvOf(root, 2).isEmpty, "optimize left the tombstone pending")
    val raw = spark.read.parquet(
      T.partitionEntries(root, 2, Seq(1)).map(_._1): _*)
    assert(raw.collect().map(_.getLong(0)).toSet === Set(1L))
    // visible rows unchanged across the purge — the feed is empty
    assert(WriteOps.tableChanges(spark, root, 1, 2).count() === 0)
    // and with the trigger off, nothing rewrites
    val root2 = Files.createTempDirectory("g_opt_nopurge").toString
    T.commit(spark, root2, 0, frame((1L, 1, 10.0)).coalesce(1), Seq(1))
    T.commitDelete(spark, root2, 1, "o_orderkey",
      frame((1L, 1, 0.0)).select("o_orderkey", "pt_year"))
    assert(T.optimize(spark, root2, 2, purgeTombstoned = false).isEmpty)
  }
}
