package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the CDC apply the write_apply_changes hash oracle can't
  * state: untouched partitions are physically untouched, a delete-only
  * partition is still merged, and at-least-once delivery is safe
  * (applying the same feed twice changes nothing). */
class ApplyChangesSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark

  private def frame(rows: (Long, Long, Double, Int)*) = {
    import spark.implicits._
    rows.toSeq.toDF("o_orderkey", "o_custkey", "o_totalprice", "pt_year")
  }

  private def feed(rows: (Long, Long, Double, Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("o_orderkey", "o_custkey", "o_totalprice", "pt_year", "op")
  }

  private def state(base: String): Set[(Long, Double, Int)] =
    spark.read.parquet(base)
      .select("o_orderkey", "o_totalprice", "pt_year").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet

  test("I/U/D apply with partition-scoped rewrite and idempotence") {
    val root = Files.createTempDirectory("g_apply_spec").toString
    val base = s"$root/tbl"
    val stage = s"$root/stage"
    frame(
      (1L, 10L, 10.0, 1), (2L, 10L, 20.0, 1),
      (3L, 20L, 30.0, 2), (4L, 20L, 40.0, 2),
      (5L, 30L, 50.0, 3))
      .write.mode(SaveMode.Overwrite).partitionBy("pt_year").parquet(base)

    def partFiles(year: Int): Map[String, Long] = {
      val dir = Paths.get(base, s"pt_year=$year")
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          Files.getLastModifiedTime(p).toMillis).toMap
    }
    val y3Before = partFiles(3)

    // update key 1, insert key 6 (partition 1), delete key 3
    // (partition 2 — delete-only, must still be rewritten)
    val f = feed(
      (1L, 10L, 11.0, 1, "U"), (6L, 40L, 60.0, 1, "I"),
      (3L, 20L, 30.0, 2, "D"))
    WriteOps.applyChanges(spark, base, stage, f)

    val expected = Set(
      (1L, 11.0, 1), (2L, 20.0, 1), (6L, 60.0, 1),
      (4L, 40.0, 2), (5L, 50.0, 3))
    assert(state(base) === expected)
    // untouched partition 3's files are byte-level untouched
    assert(partFiles(3) === y3Before,
      "apply rewrote a partition the feed never touched")

    // at-least-once safety: the same feed again is a no-op
    WriteOps.applyChanges(spark, base, stage, f)
    assert(state(base) === expected, "re-applying the feed changed state")
  }

  test("a feed that tombstones EVERY row of a partition empties it") {
    val root = Files.createTempDirectory("g_apply_empty").toString
    val base = s"$root/tbl"
    val stage = s"$root/stage"
    frame(
      (1L, 10L, 10.0, 1), (2L, 10L, 20.0, 1),
      (3L, 20L, 30.0, 2))
      .write.mode(SaveMode.Overwrite).partitionBy("pt_year").parquet(base)

    // partition 1 becomes delete-only AND fully emptied — dynamic
    // partition overwrite alone would leave its stale files in place
    // (no rows of pt_year=1 survive into the written data)
    val f = feed(
      (1L, 10L, 10.0, 1, "D"), (2L, 10L, 20.0, 1, "D"),
      (4L, 20L, 40.0, 2, "I"))
    WriteOps.applyChanges(spark, base, stage, f)

    assert(state(base) === Set((3L, 30.0, 2), (4L, 40.0, 2)),
      "emptied partition's rows survived the apply")
    assert(!Files.exists(Paths.get(base, "pt_year=1")),
      "emptied partition directory was not removed")

    // idempotence holds through the empty-partition path too
    WriteOps.applyChanges(spark, base, stage, f)
    assert(state(base) === Set((3L, 30.0, 2), (4L, 40.0, 2)))
  }
}
