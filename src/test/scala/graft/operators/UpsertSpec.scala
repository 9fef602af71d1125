package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The write_upsert gate's scale claim: the merge rewrites ONLY the
  * partitions the change batch touches — proven on file mtimes, not
  * just row values.
  */
class UpsertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def partFiles(base: String, pt: Int): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(base, s"pt_year=$pt")
    val stream = java.nio.file.Files.list(dir)
    try stream.toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    finally stream.close()
  }

  test("merge rewrites only the touched partition; values are merged") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec").toString
    val stage = base + "_stage"
    WriteOps.upsertLoad(spark, sf, base)
    val before1996 = partFiles(base, 1996)
    val before1997 = partFiles(base, 1997)
    Thread.sleep(1100) // mtime granularity guard
    WriteOps.upsertMerge(spark, sf, base, stage)
    // untouched partition: identical files, byte-for-byte same mtimes
    assert(partFiles(base, 1996) == before1996,
      "1996 partition was rewritten by a 1997-only batch")
    // touched partition: actually rewritten
    assert(partFiles(base, 1997) != before1997,
      "1997 partition was not rewritten")
    // merged values: every 1997 key bumped, inserts present, others not
    val t = spark.read.parquet(base)
    val orig = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("pt_year"))
    val o97 = orig.filter(col("pt_year") === 1997)
    val n97 = o97.count()
    assert(t.filter(col("pt_year") === 1997).count() == 2 * n97)
    // updated rows carry the +100 price
    val bumped = t.filter(col("pt_year") === 1997 &&
        col("o_orderkey") < 100000000L)
      .join(o97.select(col("o_orderkey"),
        col("o_totalprice").as("old_price")), Seq("o_orderkey"))
      .filter(col("o_totalprice") =!= col("old_price") + 100.0)
      .count()
    assert(bumped == 0, s"$bumped rows missing the price bump")
    // non-1997 rows identical to the original load
    val others = t.filter(col("pt_year") =!= 1997)
    val origOthers = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("pt_year"))
      .filter(col("pt_year") =!= 1997)
    assert(others.except(origOthers).isEmpty &&
      origOthers.except(others).isEmpty)
  }
  test("schema evolution: batch adds a column; stay rows null-fill; " +
      "untouched partition files stay byte-identical") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_upsert_evo").toString
    val stage = base + "_stage"
    WriteOps.upsertLoad(spark, sf, base)
    val before1996 = partFiles(base, 1996)
    Thread.sleep(1100) // mtime granularity guard
    WriteOps.upsertMerge(spark, sf, base, stage, evolve = true)
    // evolution is free for files the merge doesn't rewrite
    assert(partFiles(base, 1996) == before1996,
      "1996 partition was rewritten by an evolving 1997-only batch")
    val t = spark.read.option("mergeSchema", "true").parquet(base)
    assert(t.columns.contains("o_channel"),
      "mergeSchema read must surface the evolved column")
    // stay rows (untouched partitions AND the table generally, pre-
    // merge) read back NULL for the new column
    assert(t.filter(col("pt_year") =!= 1997 &&
      col("o_channel").isNotNull).count() == 0)
    // updated rows carry 'web', inserted rows 'bulk' — nothing else
    val y97 = t.filter(col("pt_year") === 1997)
    assert(y97.filter(col("o_channel").isNull).count() == 0,
      "every 1997 row was in the batch and must carry the column")
    assert(y97.filter(col("o_orderkey") < 100000000L &&
      col("o_channel") =!= "web").count() == 0)
    assert(y97.filter(col("o_orderkey") >= 100000000L &&
      col("o_channel") =!= "bulk").count() == 0)
    // a plain (no-mergeSchema) read of an untouched partition still
    // works — old readers are unaffected by the evolution
    val old = spark.read.parquet(base + "/pt_year=1996")
    assert(!old.columns.contains("o_channel"))
    assert(old.count() > 0)
  }
}

/** Plan lock for the pruning claim: the batch's partition predicate
  * propagates through the semi-join into a STATIC PartitionFilter on
  * the base-table scan — untouched partitions are never opened. */
class UpsertPruningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merge read-back scans only the touched partition") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_upsert_prune").toString
    WriteOps.upsertLoad(spark, sf, base)
    val batch = WriteOps.upsertBatch(spark, sf)
    val cur = spark.read.parquet(base)
      .join(broadcast(batch.select("pt_year").distinct()),
        Seq("pt_year"), "left_semi")
    cur.collect()
    val plan = cur.queryExecution.executedPlan.toString
    val baseScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains(base))
    assert(baseScan.nonEmpty, plan)
    baseScan.foreach { l =>
      assert(l.contains("PartitionFilters: [(pt_year#") &&
        l.contains("= 1997)"), s"no static partition filter:\n$l")
    }
  }
}
