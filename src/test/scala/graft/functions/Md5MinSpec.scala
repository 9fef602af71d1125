package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

class Md5MinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("native expression equals composed built-ins") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",
      "single",
      "x y z x y z x y z",
      ""
    ).toDF("text").withColumn("sh", split(col("text"), " "))

    val got = df
      .withColumn("native", Md5Min.md5_min(col("sh")))
      .withColumn("composed", expr("array_min(transform(sh, x -> md5(x)))"))
      .collect()
    got.foreach(r => assert(r.getString(2) == r.getString(3), r))
  }

  test("null array, empty array, null elements") {
    import spark.implicits._
    val df = Seq(
      (1, Option(Seq[String]("b", "a"))),
      (2, Option(Seq.empty[String])),
      (3, None)
    ).toDF("id", "sh")
      .withColumn("m", Md5Min.md5_min(col("sh")))
      .orderBy("id").collect()
    assert(df(0).getString(2).matches("[0-9a-f]{32}"))
    assert(df(1).isNullAt(2)) // no non-null element -> null, like array_min
    assert(df(2).isNullAt(2))
  }

  test("sql registration") {
    Md5Min.register(spark)
    val r = spark
      .sql("select md5_min(array('b', 'a')) as m, md5('a') as ma")
      .collect()(0)
    assert(r.getString(0) == r.getString(1)) // md5('a') < md5('b')
  }
}
