package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.functions.QuantizeLong.quantize_long

class QuantizeLongSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("elementwise-identical to the SQL round form on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val mismatches = e
      .withColumn("sqlq",
        expr("transform(embedding, x -> " +
             "cast(round(cast(x as double) * 1000) as bigint))"))
      .withColumn("natq", quantize_long(col("embedding"), 1000L))
      .filter(col("sqlq") =!= col("natq"))
      .count()
    assert(mismatches == 0)
  }

  test("rounding edges: halves away from zero, negatives, nulls") {
    import spark.implicits._
    val df = Seq(Seq(0.0005f, -0.0005f, 0.00049999f, -1.5004f))
      .toDF("embedding")
      .select(quantize_long(col("embedding"), 1000L).as("q"),
        expr("transform(embedding, x -> " +
             "cast(round(cast(x as double) * 1000) as bigint))").as("sq"))
    val r = df.collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    // null element passes through
    val withNull = spark.sql(
      "select array(cast(1.2345 as float), cast(null as float)) as embedding")
      .select(quantize_long(col("embedding"), 1000L).as("q"))
      .collect().head.getSeq[Any](0)
    assert(withNull(0) == 1234L || withNull(0) == 1235L)
    assert(withNull(1) == null)
  }

  test("±Inf/NaN/overflow match the non-ANSI SQL cast form") {
    import spark.implicits._
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = Seq(Seq(Float.PositiveInfinity, Float.NegativeInfinity,
          Float.NaN, 1e30f, -1e30f))
        .toDF("embedding")
        .select(quantize_long(col("embedding"), 1000L).as("q"),
          expr("transform(embedding, x -> " +
               "cast(round(cast(x as double) * 1000) as bigint))").as("sq"))
      val r = df.collect().head
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      // cast semantics: NaN -> 0, ±Inf and out-of-range clamp to Long edge
      assert(r.getSeq[Long](0) == Seq(Long.MaxValue, Long.MinValue, 0L,
        Long.MaxValue, Long.MinValue))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }
}
