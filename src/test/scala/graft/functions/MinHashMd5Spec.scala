package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

class MinHashMd5Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("native expression equals composed built-ins") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",
      "single",
      "x y z x y z x y z"
    ).toDF("text").withColumn("sh", split(col("text"), " "))

    val k = 8
    val native = df.withColumn("mh", MinHashMd5.minhash_md5(col("sh"), k))
    val composed = (0 until k).foldLeft(df) { (acc, j) =>
      acc.withColumn(s"c_$j",
        expr(s"array_min(transform(sh, x -> md5(concat('$j|', x))))"))
    }
    val n = native.select(col("text") +: (0 until k).map(j =>
      col("mh").getItem(j).as(s"s_$j")): _*).collect()
    val c = composed.select(col("text") +: (0 until k).map(j =>
      col(s"c_$j")): _*).collect()
    assert(n.map(_.toSeq).toSeq == c.map(_.toSeq).toSeq)
  }

  test("null and empty inputs") {
    import spark.implicits._
    val df = Seq(Option(Seq.empty[String]), None)
      .toDF("sh")
      .withColumn("mh", MinHashMd5.minhash_md5(col("sh"), 4))
    val rows = df.collect()
    assert(rows(0).getSeq[String](1) == Seq(null, null, null, null))
    assert(rows(1).isNullAt(1))
  }

  test("sql registration") {
    MinHashMd5.register(spark)
    val r = spark.sql(
      "select minhash_md5(array('a','b'), 2) as mh").collect()(0)
      .getSeq[String](0)
    assert(r.length == 2 && r.forall(_.matches("[0-9a-f]{32}")))
  }
}
