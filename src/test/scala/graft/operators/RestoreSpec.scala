package graft.operators

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** RESTORE contracts the write_restore hash oracle can't state: the
  * restore commit moves ZERO data (file list identical to the restored
  * version, mtimes pinned), history is preserved (the bad version
  * stays readable; the change feed across the restore names exactly
  * the partitions that moved back), pending deletion vectors restore
  * with their version, and restoring past retention fails loudly. */
class RestoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = WriteOps.SnapshotTable

  private def frame(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("o_orderkey", "pt_year", "o_totalprice")
  }

  test("restore is metadata-only, history-preserving, CDF-exact") {
    val root = Files.createTempDirectory("g_restore").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 10.0), (2L, 1, 20.0), (3L, 2, 30.0)), Seq(1, 2))
    val v0Files = T.files(root, 0)
    val v0Times = v0Files.map(f =>
      f -> Files.getLastModifiedTime(Paths.get(f)).toMillis).toMap
    // the bad load rewrites partition 1
    T.commit(spark, root, 1, frame((1L, 1, 999.0)), Seq(1))
    T.restore(root, 2, 0)
    // zero data movement: the restored head references v0's files
    // verbatim, untouched on disk
    assert(T.files(root, 2) === v0Files)
    assert(v0Files.map(f =>
      f -> Files.getLastModifiedTime(Paths.get(f)).toMillis).toMap ===
      v0Times, "restore moved data bytes")
    assert(T.read(spark, root, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toSet ===
      Set(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // history preserved: the bad version stays readable
    assert(T.read(spark, root, 1).filter("pt_year = 1").collect()
      .map(_.getDouble(2)).toSet === Set(999.0))
    // the change feed across the restore is exactly the moved-back
    // partition — carry-over pointer sharing keeps partition 2 silent
    assert(T.changedYears(root, 1, 2) === Seq(1))
    assert(T.changedYears(root, 0, 2) === Seq.empty)
    // stamps stay monotonic through the restore
    assert(T.commitTs(root, 2).get > T.commitTs(root, 1).get)
  }

  test("pending deletion vectors restore with their version") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_restore_dv").toString
    T.commit(spark, root, 0, frame((1L, 1, 10.0), (2L, 1, 20.0)), Seq(1))
    T.commitDelete(spark, root, 1, "o_orderkey",
      Seq((1L, 1)).toDF("o_orderkey", "pt_year"))
    // restore to v0: the delete is undone — the row resurrects
    T.restore(root, 2, 0)
    assert(T.dvOf(root, 2).isEmpty)
    assert(T.read(spark, root, 2).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    // restore to v1: the pending tombstone rides along
    T.restore(root, 3, 1)
    assert(T.dvOf(root, 3) === T.dvOf(root, 1))
    assert(T.read(spark, root, 3).collect().map(_.getLong(0)).toSet ===
      Set(2L))
  }

  test("restoring a vacuumed version fails loudly; conflicts refuse") {
    val root = Files.createTempDirectory("g_restore_vac").toString
    T.commit(spark, root, 0, frame((1L, 1, 10.0)), Seq(1))
    T.commit(spark, root, 1, frame((1L, 1, 11.0)), Seq(1))
    T.commit(spark, root, 2, frame((1L, 1, 12.0)), Seq(1))
    T.vacuum(root, retain = 2) // v0 expires
    val e = intercept[IllegalArgumentException](T.restore(root, 3, 0))
    assert(e.getMessage.contains("unavailable"))
    intercept[IllegalArgumentException](T.restore(root, 3, 3))
    T.restore(root, 3, 1)
    assert(T.read(spark, root, 3).collect().head.getDouble(2) === 11.0)
  }
}
