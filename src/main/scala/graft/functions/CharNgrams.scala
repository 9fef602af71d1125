package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram extractor: string → array of all n-char
  * substrings in one pass. Semantically identical to the composed
  * built-ins
  * `transform(sequence(1, greatest(length(s) - n + 1, 1)),
  *            i -> substring(s, i, n))`
  * — including the degenerate cases (fewer than n chars → ONE gram with
  * whatever is there; empty input → [""]) — which is what the DuckDB
  * oracle computes, so swapping this in changes no gate values.
  *
  * The point is the hot path of `text_char_lm_score`: the built-in
  * composition is interpreted lambda-per-gram evaluation where EVERY
  * `substring(s, i, n)` call re-walks the string from byte 0 to find
  * the code-point offset — O(len²) per document. This computes the
  * code-point byte-offset table once and slices byte ranges, O(len),
  * and `doGenCode` keeps the scan → gram → explode stage inside one
  * WholeStageCodegen span.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = CharNgrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.grams($c, $n);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharNgrams = copy(child = newChild)
}

object CharNgrams {

  def grams(str: UTF8String, n: Int): ArrayData = {
    val bytes = str.getBytes
    val total = str.numChars()
    // offs(i) = byte offset where code point i starts; offs(total) = end
    val offs = new Array[Int](total + 1)
    var i = 0
    var b = 0
    while (i < total) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(total) = bytes.length
    val count = math.max(total - n + 1, 1)
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      val end = math.min(i + n, total)
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(end) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def char_ngrams(s: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharNgrams(
        org.apache.spark.sql.GraftColumnBridge.expression(s), n))

  /** SQL registration: char_ngrams(str, n). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      exprs => CharNgrams(exprs.head,
        exprs(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .asInstanceOf[Number].intValue()),
      "scala_udf")
}
