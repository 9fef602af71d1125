package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.functions.NgramShingles.ngram_shingles

class NgramShinglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sqlForm(gram: Int) = expr(
    s"transform(sequence(1, greatest(size(toks) - ${gram - 1}, 1)), " +
    s"i -> concat_ws(' ', slice(toks, i, $gram)))")

  test("elementwise-identical to the transform/slice/concat_ws form " +
      "on real documents (grams 2 and 5)") {
    val toks = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("toks", split(lower(trim(col("text"))), " "))
    for (gram <- Seq(2, 5)) {
      val mismatches = toks
        .withColumn("a", ngram_shingles(col("toks"), gram))
        .withColumn("b", sqlForm(gram))
        .filter(col("a") =!= col("b"))
        .count()
      assert(mismatches == 0, s"gram=$gram diverges from the SQL form")
    }
  }

  test("degenerate inputs match the SQL form") {
    val df = spark.sql(
      """select toks from values
           (array('only')),
           (array('two', 'toks')),
           (cast(array() as array<string>)),
           (array('a', cast(null as string), 'b'))
         as t(toks)""")
    val rows = df
      .withColumn("a", ngram_shingles(col("toks"), 3))
      .withColumn("b", sqlForm(3))
      .select("a", "b").collect()
    rows.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    // spot-check the documented edges
    assert(rows(0).getSeq[String](0) == Seq("only"))
    assert(rows(2).getSeq[String](0) == Seq(""))
    assert(rows(3).getSeq[String](0) == Seq("a b"))
  }

  test("SQL registration") {
    NgramShingles.register(spark)
    val r = spark.sql(
      "select ngram_shingles(array('x', 'y', 'z'), 2) as s").collect().head
    assert(r.getSeq[String](0) == Seq("x y", "y z"))
  }
}
