package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: LSH band hashes of a shingle array in ONE
  * pass — shingles → k salted-md5 minhash signatures → `bands` band
  * digests — emitted directly as `array<struct<band_id int, band_hash
  * string>>` ready to `explode` into the bucket join.
  *
  * Semantically identical to the composition it replaces
  * (`mh = minhash_md5(shingles, k)` then per band
  * `md5(concat(mh[rows*b], …, mh[rows*b + rows-1]))` — band_hash is the
  * md5 of the CONCATENATED LOWERCASE-HEX signatures, which is what the
  * DuckDB oracle computes), but the k `getItem` projections and the
  * per-band `md5(concat(...))` expression trees disappear: the minimum
  * digests never materialize as a column, the hex encoding happens once
  * into a reused buffer, and the whole band path is a single call inside
  * the surrounding WholeStageCodegen span.
  *
  * Null semantics match the built-in composition: null input → null;
  * empty shingle array → every signature null → `concat` null →
  * `band_hash` null (struct present, hash null — dropped by the
  * equi-join exactly as before).
  */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  require(k % bands == 0, s"k=$k must be a multiple of bands=$bands")
  private val rows = k / bands

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band_id", IntegerType, nullable = false),
    StructField("band_hash", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "minhash_bands"

  @transient private lazy val salts: Array[Array[Byte]] =
    (0 until k).map(j => s"$j|".getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = MinHashMd5.minDigests(arr, k, salts)
    val md = MinHashMd5.mdLocal.get()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var anyNull = false
      var r = 0
      while (r < rows) { if (mins(rows * b + r) == null) anyNull = true; r += 1 }
      val hash =
        if (anyNull) null
        else {
          md.reset()
          r = 0
          while (r < rows) {
            // md5 of the concatenated lowercase-hex signature strings
            // (hex is ASCII, so hex-bytes == UTF-8 bytes of the concat)
            md.update(MinHashMd5.toHexBytes(mins(rows * b + r)))
            r += 1
          }
          UTF8String.fromString(MinHashMd5.toHex(md.digest()))
        }
      out(b) = InternalRow(b, hash)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashBandsExpr", this,
      classOf[MinHashBands].getName)
    nullSafeCodeGen(ctx, ev, child => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.nullSafeEval($child);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashBands = copy(child = newChild)
}

object MinHashBands {
  /** Column API. */
  def minhash_bands(shingles: Column, k: Int, bands: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashBands(
        org.apache.spark.sql.GraftColumnBridge.expression(shingles),
        k, bands))

  /** SQL registration: minhash_bands(arr, k, bands). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands",
      exprs => MinHashBands(exprs.head,
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int],
        exprs(2).eval(InternalRow.empty).asInstanceOf[Int]),
      "scala_udf")
}
