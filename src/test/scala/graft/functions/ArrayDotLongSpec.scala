package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.functions.ArrayDotLong.array_dot_long

class ArrayDotLongSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def one(sql: String): Any =
    spark.sql(s"select $sql as v").collect().head.get(0)

  test("matches the composed zip_with+aggregate built-ins") {
    ArrayDotLong.register(spark)
    val cases = Seq(
      "array(1L, 2L, 3L), array(4L, 5L, 6L)",
      "array(-2L, 7L), array(3L, -1L)",
      "cast(array() as array<bigint>), cast(array() as array<bigint>)",
      "cast(null as array<bigint>), array(1L)", // null input
      "array(1L, null), array(1L, 2L)",         // null element
      "array(1L, 2L), array(1L)")               // length mismatch
    cases.foreach { args =>
      val native = one(s"array_dot_long($args)")
      val composed = one(
        s"aggregate(zip_with($args, (x, y) -> x * y), " +
        "cast(0 as bigint), (a, x) -> a + x)")
      assert(native == composed, s"for ($args): $native != $composed")
    }
  }

  test("column API computes dot and norm in whole-stage codegen") {
    // non-literal input so constant folding can't erase the projection
    val df = spark.range(1, 4)
      .select(array(col("id"), col("id") * 2).as("a"),
              array(col("id") + 1, lit(3L)).as("b"))
      .select(col("a"), col("b"),
              array_dot_long(col("a"), col("b")).as("dot"),
              array_dot_long(col("a"), col("a")).as("nrm"))
    val rows = df.collect().map(r => (r.getLong(2), r.getLong(3)))
    // id=1: a=[1,2], b=[2,3] -> dot=8, nrm=5
    assert(rows.head == (8L, 5L))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project") && l.contains("array_dot_long")), plan)
  }
}
