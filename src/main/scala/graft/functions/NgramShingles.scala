package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingler: token array → array of space-joined n-grams
  * in one pass. Semantically identical to the composed built-ins
  * `transform(sequence(1, greatest(size(toks) - n + 1, 1)),
  *            i -> concat_ws(' ', slice(toks, i, n)))`
  * — including the degenerate cases (fewer than n tokens → ONE shingle
  * joining whatever is there; empty input → [""]; null elements are
  * skipped by the join, as concat_ws does) — which is what the DuckDB
  * oracle computes, so swapping this in changes no gate values.
  *
  * The point is the hot path: Spark's higher-order functions
  * (transform/slice/concat_ws-over-slice) are interpreted
  * lambda-per-element evaluation with an intermediate array per
  * shingle. This is the first narrow pass of every MinHash/Jaccard
  * dedup over the corpus, so it runs once per document at 100 TB.
  * `doGenCode` routes through a codegen reference object, keeping the
  * surrounding tokenize → shingle → minhash stage inside one
  * WholeStageCodegen span.
  */
case class NgramShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    NgramShingles.shingle(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = NgramShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.shingle($c, $n);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NgramShingles = copy(child = newChild)
}

object NgramShingles {

  private val space = UTF8String.fromString(" ")
  private val empty = UTF8String.fromString("")

  /** One n-gram: tokens [from, from+n) joined by ' ', nulls skipped. */
  private def join(arr: ArrayData, from: Int, n: Int,
      total: Int): UTF8String = {
    val hi = math.min(from + n, total)
    var count = 0
    var i = from
    while (i < hi) {
      if (!arr.isNullAt(i)) count += 1
      i += 1
    }
    if (count == 0) return empty
    val parts = new Array[UTF8String](count * 2 - 1)
    var p = 0
    i = from
    while (i < hi) {
      if (!arr.isNullAt(i)) {
        if (p > 0) { parts(p) = space; p += 1 }
        parts(p) = arr.getUTF8String(i)
        p += 1
      }
      i += 1
    }
    UTF8String.concat(parts: _*)
  }

  def shingle(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    val count = math.max(total - n + 1, 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = join(arr, i, n, total)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def ngram_shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NgramShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), n))

  /** SQL registration: ngram_shingles(arr, n). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_shingles",
      exprs => NgramShingles(exprs.head,
        exprs(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .asInstanceOf[Number].intValue()),
      "scala_udf")
}
