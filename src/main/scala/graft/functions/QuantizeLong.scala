package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native quantizer for embedding columns: float array → int64 array
  * via `round(x * scale)` — the narrow pass in front of every
  * similarity operator. Replaces the interpreted
  * `transform(embedding, x -> cast(round(cast(x as double) * S) as
  * bigint))` lambda with one codegen-resident call.
  *
  * Rounding matches Spark's `Round` for doubles exactly
  * (BigDecimal.valueOf(d).setScale(0, HALF_UP)) so results stay
  * bit-identical to the SQL form and the DuckDB oracle —
  * QuantizeLongSpec asserts elementwise equality on the real
  * embeddings table. Null input → null; null element → null element.
  */
case class QuantizeLong(child: Expression, scale: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "quantize_long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<float|double>, got ${other.sql}")
    }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    QuantizeLong.quantize(arr, scale, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = QuantizeLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.quantize($c, ${scale}L, $isFloat);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : QuantizeLong = copy(child = newChild)
}

object QuantizeLong {

  /** Spark Round-for-double semantics at scale 0, then the (non-ANSI)
    * double→long cast: Round passes NaN/±Inf through unchanged and the
    * cast is a JVM long conversion — NaN → 0, ±Inf and out-of-range
    * values clamp to Long.MaxValue/MinValue. Bit-identical to
    * `cast(round(x*scale) as bigint)` over the FULL double range, not
    * just finite inputs (QuantizeLongSpec covers ±Inf/NaN/overflow). */
  def quantize(arr: ArrayData, scale: Long, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = (if (isFloat) arr.getFloat(i).toDouble
                 else arr.getDouble(i)) * scale
        out(i) =
          if (d.isNaN || d.isInfinite) d.toLong
          else java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .doubleValue().toLong
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API. */
  def quantize_long(v: Column, scale: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      QuantizeLong(
        org.apache.spark.sql.GraftColumnBridge.expression(v), scale))

  /** SQL registration: quantize_long(arr, scale). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_long",
      exprs => QuantizeLong(exprs.head,
        exprs(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .asInstanceOf[Number].longValue()),
      "scala_udf")
}
