package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.functions.PqCodes.{pq_adc_table, pq_encode}

/** The native PQ kernels must agree elementwise with the composed
  * built-in formulation they replace (per-subspace argmin over
  * inlined centroid distances), including null semantics. */
class PqCodesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val m = 2
  // kpq = 3 centroids over dim 4 (subDim 2)
  private val cb = Seq(
    Seq(0L, 0L, 0L, 0L),
    Seq(10L, 10L, 10L, 10L),
    Seq(3L, -4L, 5L, -6L))
  private def cbLit = typedLit(cb)

  test("pq_encode matches a hand-computed per-subspace argmin with " +
      "ties to the lower code") {
    import spark.implicits._
    val rows = Seq(
      Seq(1L, 1L, 9L, 9L),    // sub0 → c0 (2 vs 162 vs 29); sub1 → c1
      Seq(3L, -4L, 5L, -6L),  // exact c2 in both subspaces
      Seq(5L, 5L, 5L, 5L),    // sub0: c0=50 c1=50 c2=85 → tie → c0
      Seq.empty[Long])        // dim 0 → null
    val out = rows.toDF("qv")
      .select(pq_encode(col("qv"), cbLit, m).as("codes"))
      .collect().map(r => Option(r.getSeq[Int](0)).map(_.toList))
    assert(out(0).contains(List(0, 1)))
    assert(out(1).contains(List(2, 2)))
    assert(out(2).get.head == 0) // tie broken to the lower code
    assert(out(3).isEmpty)
  }

  test("pq_adc_table is the flat m×kpq table of exact squared L2 " +
      "distances, consistent with pq_encode's argmin") {
    import spark.implicits._
    val v = Seq(1L, 1L, 9L, 9L)
    val out = Seq(v).toDF("qv")
      .select(pq_adc_table(col("qv"), cbLit, m).as("t"),
              pq_encode(col("qv"), cbLit, m).as("codes"))
      .collect().head
    val t = out.getSeq[Long](0)
    val codes = out.getSeq[Int](1)
    val kpq = cb.size
    assert(t.size == m * kpq)
    // brute-force expected distances
    val exp = for (j <- 0 until m; c <- 0 until kpq) yield
      (0 until 2).map { i =>
        val d = v(j * 2 + i) - cb(c)(j * 2 + i); d * d
      }.sum
    assert(t == exp)
    // the encode codes are exactly the argmin rows of the table
    (0 until m).foreach { j =>
      val row = t.slice(j * kpq, (j + 1) * kpq)
      assert(row(codes(j)) == row.min)
      assert(row.indexOf(row.min) == codes(j)) // lower-code tie order
    }
  }

  test("null inputs, null elements, and shape mismatches yield null") {
    val cases = Seq(
      s"cast(null as array<bigint>), ${sql(cb)}",
      s"array(1L, null, 3L, 4L), ${sql(cb)}",
      s"array(1L, 2L, 3L), ${sql(cb)}",     // dim 3 not divisible by m=2
      s"array(1L, 2L, 3L, 4L), array(array(1L, 2L))", // cb row dim != 4
      // EMPTY codebook → null, not silent all-zero codes (which would be
      // out-of-range table subscripts downstream)
      "array(1L, 2L, 3L, 4L), cast(array() as array<array<bigint>>)")
    PqCodes.register(spark)
    cases.foreach { args =>
      assert(spark.sql(s"select pq_encode($args, $m) as v")
        .collect().head.isNullAt(0), s"encode($args)")
      assert(spark.sql(s"select pq_adc_table($args, $m) as v")
        .collect().head.isNullAt(0), s"adc($args)")
    }
  }

  test("kernels run inside whole-stage codegen (non-literal input)") {
    val df = spark.range(0, 8)
      .select(array(col("id"), col("id") + 1, col("id") * 2, lit(4L))
        .as("qv"))
      .select(pq_encode(col("qv"), cbLit, m).as("codes"),
              pq_adc_table(col("qv"), cbLit, m).as("t"))
    // the `*(n)` prefix is WholeStageCodegenExec's plan-string marker
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      df.queryExecution.executedPlan.toString)
    // interpreted eval path must agree with the codegen'd one
    val viaCodegen = df.collect().map(_.getSeq[Int](0).toList).toList
    val viaEval = (0L until 8L).map { id =>
      val v = Array(id, id + 1, id * 2, 4L)
      (0 until m).map { j =>
        cb.indices.minBy(c => (0 until 2).map { i =>
          val d = v(j * 2 + i) - cb(c)(j * 2 + i); d * d
        }.sum)
      }.toList
    }.toList
    assert(viaCodegen == viaEval)
  }

  private def sql(cb: Seq[Seq[Long]]): String =
    cb.map(row => s"array(${row.map(_ + "L").mkString(",")})")
      .mkString("array(", ",", ")")
}
