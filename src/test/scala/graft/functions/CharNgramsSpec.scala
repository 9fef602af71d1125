package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.functions.CharNgrams.char_ngrams

class CharNgramsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sqlForm(n: Int) = expr(
    s"transform(sequence(1, greatest(length(s) - ${n - 1}, 1)), " +
    s"i -> substring(s, i, $n))")

  test("elementwise-identical to the transform/sequence/substring form " +
      "on real documents (n = 3 and 5)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text").as("s"))
    for (n <- Seq(3, 5)) {
      val mismatches = docs
        .withColumn("a", char_ngrams(col("s"), n))
        .withColumn("b", sqlForm(n))
        .filter(col("a") =!= col("b"))
        .count()
      assert(mismatches == 0, s"n=$n diverges from the SQL form")
    }
  }

  test("degenerate and multi-byte inputs match the SQL form") {
    val df = spark.sql(
      """select s from values
           (''), ('a'), ('ab'), ('abc'), ('abcd'),
           ('日本語のテキスト'), ('mixé ascii 和 cjk')
         as t(s)""")
    val rows = df
      .withColumn("a", char_ngrams(col("s"), 3))
      .withColumn("b", sqlForm(3))
      .select("a", "b").collect()
    rows.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    // documented edges: short input → one gram of whatever is there
    assert(rows(0).getSeq[String](0) == Seq(""))
    assert(rows(1).getSeq[String](0) == Seq("a"))
    assert(rows(3).getSeq[String](0) == Seq("abc"))
    assert(rows(4).getSeq[String](0) == Seq("abc", "bcd"))
    // code-point slicing, not byte slicing
    assert(rows(5).getSeq[String](0).head == "日本語")
  }

  test("SQL registration") {
    CharNgrams.register(spark)
    val r = spark.sql(
      "select char_ngrams('abcd', 2) as g").collect().head
    assert(r.getSeq[String](0) == Seq("ab", "bc", "cd"))
  }
}
