package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** File-count contract of the compaction operator — the value-level
  * round trip is oracle-checked by the `write_compacted` gate. */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compaction hits the byte-targeted file count and keeps rows") {
    val base = java.nio.file.Files.createTempDirectory("g_compact")
    val frag = base.resolve("frag").toString
    val out = base.resolve("out").toString
    val df = spark.range(200000).selectExpr("id", "id * 2 as v",
      "uuid() as pad") // pad defeats trivial compression
    df.repartition(50).write.mode("overwrite").parquet(frag)
    val nFrag = parquetFiles(frag).length
    assert(nFrag == 50)

    val totalBytes = parquetFiles(frag).map(_.length).sum
    val target = 1L * 1024 * 1024
    val expected = math.max(1, math.ceil(totalBytes.toDouble / target).toInt)
    val planned = WriteOps.compact(spark, frag, out, target)
    assert(planned == expected)

    val nOut = parquetFiles(out).length
    assert(nOut == planned, s"planned $planned files, wrote $nOut")
    assert(nOut < nFrag, "compaction must reduce the file count")
    // right-sized: every output file lands within 2x of the target
    // (parquet encoding changes sizes; the contract is the ballpark)
    parquetFiles(out).foreach(f =>
      assert(f.length < 2 * target, s"${f.getName} is ${f.length} B"))
    // no rows lost or duplicated
    assert(spark.read.parquet(out).count() == 200000)
  }

  test("degenerate inputs: one tiny file, zero-byte guard") {
    val base = java.nio.file.Files.createTempDirectory("g_compact2")
    val frag = base.resolve("one").toString
    val out = base.resolve("one_out").toString
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(frag)
    assert(WriteOps.compact(spark, frag, out, 128L * 1024 * 1024) == 1)
    assert(spark.read.parquet(out).count() == 10)
    intercept[IllegalArgumentException] {
      WriteOps.compact(spark, frag, out, 0L)
    }
  }
}
