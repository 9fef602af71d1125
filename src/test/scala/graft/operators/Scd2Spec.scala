package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The write_scd2 gate's storage claims: history files are append-only
  * (merge #2 leaves merge #1's files byte-identical), and every changed
  * key carries its complete validity chain.
  */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def files(dir: String): Map[String, Long] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val stream = java.nio.file.Files.list(p)
      try stream.toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(q => q.toString ->
          java.nio.file.Files.getLastModifiedTime(q).toMillis).toMap
      finally stream.close()
    }
  }

  test("history is append-only; validity chains are complete") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_scd2_spec").toString
    val stage = base + "_stage"
    val hist = base + "/is_current=false"
    WriteOps.scd2Load(spark, sf, base)
    WriteOps.scd2Merge(spark, sf, base, stage, v = 1)
    val afterM1 = files(hist)
    assert(afterM1.nonEmpty, "merge 1 wrote no history")
    Thread.sleep(1100)
    WriteOps.scd2Merge(spark, sf, base, stage, v = 2)
    val afterM2 = files(hist)
    // every merge-1 history file survives merge 2 untouched
    afterM1.foreach { case (f, mtime) =>
      assert(afterM2.get(f).contains(mtime), s"history file rewritten: $f")
    }
    assert(afterM2.size > afterM1.size, "merge 2 appended nothing")

    val t = spark.read.parquet(base)
      .withColumn("is_current", col("is_current").cast("boolean"))
    // changed keys: exactly versions (0,1), (1,2) closed and (2,9999) open
    val chain = t.filter(col("c_custkey") % 7 === 0 &&
        col("c_custkey") < 1000000L)
      .groupBy("c_custkey")
      .agg(sort_array(collect_list(struct(
        col("valid_from"), col("valid_to")))).as("versions"))
      .select(col("versions").cast("string").as("v")).distinct().collect()
    assert(chain.length == 1, chain.mkString("; "))
    assert(chain(0).getString(0) == "[{0, 1}, {1, 2}, {2, 9999}]",
      chain(0).getString(0))
    // intervals tile: each key's current valid_from == last closed valid_to
    val broken = t.filter(col("is_current")).as("c")
      .join(t.filter(!col("is_current"))
        .groupBy("c_custkey").agg(max("valid_to").as("last_close")),
        Seq("c_custkey"))
      .filter(col("valid_from") =!= col("last_close")).count()
    assert(broken == 0, s"$broken keys have gapped validity chains")
  }
}
