package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 1-permutation MinHash: the minimum (lowercase-hex) md5 digest
  * over a string array, in one pass.
  *
  * Semantically identical to the composed built-ins
  * `array_min(transform(arr, x -> md5(x)))` — null elements are skipped,
  * an array with no non-null element yields null — which is what the
  * DuckDB oracle computes, so swapping this in changes no gate values.
  *
  * Same rationale as [[MinHashMd5]] (the k-salt variant): `transform` is
  * an always-interpreted higher-order function that materializes the full
  * hash array per row just to take its min; this keeps the document-
  * fingerprint pass (one shingle-hash min per document over the whole
  * corpus) inside whole-stage codegen, comparing raw 16-byte digests with
  * no per-element string allocation — only the single winner is
  * hex-encoded.
  */
case class Md5Min(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "md5_min"

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

  override def nullSafeEval(input: Any): Any =
    Md5Min.minHex(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = Md5Min.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
         |  $cls.minHex($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Min = copy(child = newChild)
}

object Md5Min {

  /** Min md5 over non-null elements as lowercase hex; null if none.
    * Digests compare as raw bytes (unsigned lexicographic == hex-string
    * order), so the n-element loop allocates no hex strings. */
  def minHex(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val md = MinHashMd5.mdLocal.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val digest = md.digest()
        if (min == null || lessThan(digest, min)) min = digest
      }
      i += 1
    }
    if (min == null) null
    else UTF8String.fromBytes(MinHashMd5.toHexBytes(min))
  }

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Column API. */
  def md5_min(arr: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5Min(org.apache.spark.sql.GraftColumnBridge.expression(arr)))

  /** SQL registration: md5_min(arr). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_min", exprs => Md5Min(exprs.head), "scala_udf")
}
