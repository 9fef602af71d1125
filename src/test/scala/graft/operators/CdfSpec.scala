package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the snapshot change feed the read_table_changes hash
  * oracle can't state: the touched-partition set comes from manifest
  * metadata alone, unchanged rows in rewritten partitions are NOT
  * emitted, and the feed reconciles with the version row-count delta. */
class CdfSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark

  private def frame(rows: (Long, Long, Double, Int)*) = {
    import spark.implicits._
    rows.toSeq.toDF("o_orderkey", "o_custkey", "o_totalprice", "pt_year")
  }

  test("change feed prunes via manifest diff and emits only real changes") {
    val root = Files.createTempDirectory("g_cdf_spec").toString
    val T = WriteOps.SnapshotTable

    // v0: two partitions
    T.commit(spark, root, 0, frame(
      (1L, 10L, 10.0, 1), (2L, 10L, 20.0, 1),
      (3L, 20L, 30.0, 2), (4L, 20L, 40.0, 2)), Seq(1, 2))
    // v1 rewrites partition 1 only: key 1 updated, key 2 carried
    // verbatim (an unchanged row inside a rewritten partition),
    // key 5 inserted
    T.commit(spark, root, 1, frame(
      (1L, 10L, 11.0, 1), (2L, 10L, 20.0, 1), (5L, 30L, 50.0, 1)), Seq(1))
    // v2 rewrites partition 2 only: key 3 deleted
    T.commit(spark, root, 2, frame((4L, 20L, 40.0, 2)), Seq(2))

    // touched partitions recovered from manifest metadata alone
    assert(T.changedYears(root, 0, 1) === Seq(1))
    assert(T.changedYears(root, 1, 2) === Seq(2))

    val c01 = WriteOps.tableChanges(spark, root, 0, 1)
      .collect().map(r => (r.getAs[String]("change_type"),
        r.getAs[Long]("o_orderkey"), r.getAs[Double]("price"))).toSet
    assert(c01 === Set(
      ("insert", 5L, 50.0),
      ("update_preimage", 1L, 10.0),
      ("update_postimage", 1L, 11.0)))
    // key 2 sat in the rewritten partition with identical content —
    // the changes-only contract says it emits nothing (asserted by the
    // exact-set equality above), and key 3/4's partition was untouched.

    val c12 = WriteOps.tableChanges(spark, root, 1, 2)
      .collect().map(r => (r.getAs[String]("change_type"),
        r.getAs[Long]("o_orderkey"))).toSet
    assert(c12 === Set(("delete", 3L)))

    // reconciliation: rowcount(vTo) - rowcount(vFrom) = inserts - deletes
    def counts(vF: Int, vT: Int): Long = {
      val by = WriteOps.tableChanges(spark, root, vF, vT)
        .groupBy("change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      by.getOrElse("insert", 0L) - by.getOrElse("delete", 0L)
    }
    assert(T.read(spark, root, 1).count() - T.read(spark, root, 0).count()
      === counts(0, 1))
    assert(T.read(spark, root, 2).count() - T.read(spark, root, 1).count()
      === counts(1, 2))

    T.deleteTree(root)
  }

  test("a custkey-only change still surfaces as an update pair") {
    val root = Files.createTempDirectory("g_cdf_spec2").toString
    val T = WriteOps.SnapshotTable
    T.commit(spark, root, 0, frame((1L, 10L, 10.0, 1)), Seq(1))
    T.commit(spark, root, 1, frame((1L, 99L, 10.0, 1)), Seq(1))
    val types = WriteOps.tableChanges(spark, root, 0, 1)
      .select("change_type").collect().map(_.getString(0)).sorted
    assert(types === Array("update_postimage", "update_preimage"))
    T.deleteTree(root)
  }
}
