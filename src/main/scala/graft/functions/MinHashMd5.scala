package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k salted-md5 MinHash signatures of a
  * string array in ONE pass.
  *
  * Semantically identical to the composed built-ins
  * `array_min(transform(shingles, x -> md5(concat('<j>|', x))))` for
  * j in 0 until k — but evaluates every salt in a single traversal
  * without materializing k intermediate hash arrays, which is the hot
  * loop of MinHash-LSH dedup over billions of documents. Returns
  * array<string> of k lowercase hex digests (null input → null; empty
  * array → array of nulls).
  *
  * Two scale-minded choices:
  *   - candidates are compared as raw 16-byte digests (unsigned
  *     lexicographic == hex lexicographic order), so the n*k inner
  *     loop allocates no hex strings — only the k winners are
  *     hex-encoded at the end;
  *   - `doGenCode` emits a call through a codegen reference object
  *     instead of extending CodegenFallback, so the surrounding stage
  *     (tokenize/explode before, LSH band aggregation after) stays
  *     inside ONE WholeStageCodegen span rather than being split by an
  *     interpreted projection.
  */
case class MinHashMd5(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  @transient private lazy val salts: Array[Array[Byte]] =
    (0 until k).map(j => s"$j|".getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val mins = MinHashMd5.minDigests(
      input.asInstanceOf[ArrayData], k, salts)
    new GenericArrayData(mins.map(m =>
      if (m == null) null
      else UTF8String.fromString(MinHashMd5.toHex(m))))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashMd5].getName)
    nullSafeCodeGen(ctx, ev, child => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.nullSafeEval($child);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashMd5 = copy(child = newChild)
}

object MinHashMd5 {
  private val hexChars = "0123456789abcdef".toCharArray

  private[functions] val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private[functions] def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** Lowercase-hex as ASCII bytes (== UTF-8 bytes of [[toHex]]). */
  private[functions] def toHexBytes(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >>> 4).toByte
      out(i * 2 + 1) = hexChars(b & 0x0f).toByte
      i += 1
    }
    out
  }

  /** Unsigned lexicographic compare of equal-length digests; matches
    * String ordering of their lowercase-hex encodings. */
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

  /** The shared MinHash hot loop: per salt j, the minimum md5 digest of
    * `<j>|<element>` over the array (null elements skipped; null slot if
    * the array is empty). Raw 16-byte digests — unsigned lexicographic
    * order == hex-string order, so no hex allocation in the n×k loop. */
  private[functions] def minDigests(arr: ArrayData, k: Int,
      salts: Array[Array[Byte]]): Array[Array[Byte]] = {
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](k)
    // one digest instance per executor thread, not per row — getInstance
    // does a provider lookup that would otherwise run n_rows times
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val sBytes = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(salts(j))
          md.update(sBytes)
          val digest = md.digest()
          if (mins(j) == null || lessThan(digest, mins(j))) mins(j) = digest
          j += 1
        }
      }
      i += 1
    }
    mins
  }

  /** Column API. */
  def minhash_md5(shingles: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashMd5(
        org.apache.spark.sql.GraftColumnBridge.expression(shingles), k))

  /** SQL registration: minhash_md5(arr, k). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_md5",
      exprs => MinHashMd5(exprs.head,
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int]),
      "scala_udf")
}
