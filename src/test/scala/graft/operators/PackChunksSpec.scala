package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Properties of the concat-and-chunk context packing the oracle can't
  * state: the two-stage distributed prefix sum equals the one-window
  * definition, and every chunk except the last packs exactly `chunk`
  * tokens.
  */
class PackChunksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("two-stage prefix sum equals the single global window") {
    // the naive definition: one global cumulative sum over doc order
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("cnt"))
      .withColumn("off", coalesce(
        sum("cnt").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "off")
    val staged = TextOps.packChunks(spark, sf)
      .select("doc_id", "off").distinct()
    assert(staged.join(naive, Seq("doc_id", "off")).count() ==
      naive.count(), "staged offsets diverge from the global window")
  }

  test("every chunk except the last carries exactly 256 tokens") {
    val perChunk = TextOps.packChunks(spark, sf)
      .groupBy("chunk_id").agg(sum("tok_in_chunk").as("toks"))
      .collect().sortBy(_.getLong(0))
    val last = perChunk.map(_.getLong(0)).max
    perChunk.foreach { r =>
      if (r.getLong(0) != last)
        assert(r.getLong(1) == 256L,
          s"chunk ${r.getLong(0)} has ${r.getLong(1)} tokens")
      else assert(r.getLong(1) >= 1 && r.getLong(1) <= 256)
    }
    // chunk ids are dense from 0
    assert(perChunk.map(_.getLong(0)).toSeq == (0L to last))
  }

  test("block size does not change the packing") {
    val a = TextOps.packChunks(spark, sf, block = 64L)
    val b = TextOps.packChunks(spark, sf, block = 7L)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "packing depends on the prefix-sum block size")
  }
}
