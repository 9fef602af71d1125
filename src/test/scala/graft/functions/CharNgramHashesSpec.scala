package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CharNgramHashes must agree with the composed built-ins it replaces:
  * one hash per DISTINCT n-char window, same degenerate cases as
  * CharNgrams, and hash-injective on real window sets (no collisions
  * on the fixture vocabulary). */
class CharNgramHashesSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark

  private def distinctCount(s: String, n: Int): (Int, Int) = {
    import spark.implicits._
    val df = Seq(s).toDF("t")
    val viaStrings = df.select(size(array_distinct(
      CharNgrams.char_ngrams(col("t"), n))).as("c")).head().getInt(0)
    val viaHashes = df.select(size(
      CharNgramHashes.char_ngram_hashes(col("t"), n)).as("c"))
      .head().getInt(0)
    (viaStrings, viaHashes)
  }

  test("distinct-window counts match the composed built-ins") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",            // heavy within-doc duplication
      "abcabcabcabcabcabc",              // periodic
      "ü€𝄞 mixed — multi-byte ü€𝄞 text", // non-ASCII offsets
      "short",                           // shorter than the window
      "")                                // empty
    for (s <- samples; n <- Seq(1, 3, 5, 30)) {
      val (viaStrings, viaHashes) = distinctCount(s, n)
      assert(viaStrings === viaHashes,
        s"mismatch for s=$s n=$n")
    }
  }

  test("fixture corpus: per-doc distinct counts identical at w=30") {
    val docs = graft.operators.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      size(array_distinct(CharNgrams.char_ngrams(
        lower(trim(col("text"))), 30))).as("a"),
      size(CharNgramHashes.char_ngram_hashes(
        lower(trim(col("text"))), 30)).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() === 0L)
  }

  test("cross-doc keying: df counts from hashes equal df from strings") {
    import spark.implicits._
    val df = Seq("shared window text here ok", "shared window text here no",
      "completely different content").toDF("t")
    val byString = df
      .select(explode(array_distinct(
        CharNgrams.char_ngrams(col("t"), 10))).as("w"))
      .groupBy("w").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byHash = df
      .select(explode(
        CharNgramHashes.char_ngram_hashes(col("t"), 10)).as("w"))
      .groupBy("w").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byString === byHash)
  }
}
