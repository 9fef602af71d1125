package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

class MinHashBandsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("native band hashes equal the composed minhash+md5(concat)") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",
      "single",
      "x y z x y z x y z"
    ).toDF("text").withColumn("sh", split(col("text"), " "))

    val (k, bands) = (8, 4)
    val rows = k / bands
    val native = df.select(col("text"),
        explode(MinHashBands.minhash_bands(col("sh"), k, bands))
          .as("band"))
      .select(col("text"), col("band.band_id"), col("band.band_hash"))
      .collect().map(_.toSeq).toSeq

    val sigs = (0 until k).foldLeft(df) { (acc, j) =>
      acc.withColumn(s"sig_$j",
        expr(s"array_min(transform(sh, x -> md5(concat('$j|', x))))"))
    }
    val composed = sigs.select(col("text"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band_id"),
            md5(concat((0 until rows).map(r =>
              col(s"sig_${rows * b + r}")): _*)).as("band_hash"))): _*))
          .as("band"))
      .select(col("text"), col("band.band_id"), col("band.band_hash"))
      .collect().map(_.toSeq).toSeq

    assert(native == composed)
  }

  test("null input → null; empty shingles → null band hashes") {
    import spark.implicits._
    val df = Seq(Option(Seq.empty[String]), None).toDF("sh")
      .withColumn("b", MinHashBands.minhash_bands(col("sh"), 4, 2))
    val rows = df.collect()
    val empties = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(empties.map(r => (r.getInt(0), r.isNullAt(1))) ==
      Seq((0, true), (1, true)))
    assert(rows(1).isNullAt(1))
  }

  test("sql registration") {
    MinHashBands.register(spark)
    val r = spark.sql(
      "select explode(minhash_bands(array('a','b'), 4, 2)) as b")
      .select("b.band_id", "b.band_hash").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(r.forall(_.getString(1).matches("[0-9a-f]{32}")))
  }
}
