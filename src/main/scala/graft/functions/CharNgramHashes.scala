package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native DISTINCT character-n-gram hasher: string → array<long> of the
  * distinct 64-bit window hashes, computed in one pass over the UTF-8
  * bytes with NO window string ever materialized.
  *
  * Semantically it is `array_distinct(transform(char_ngrams(s, n),
  * g -> xxhash64(g)))` up to the (already-accepted, ~2⁻⁶⁴-per-pair)
  * hash-collision tolerance of keying windows by a 64-bit hash — the
  * window keys are INTERNAL to dedup_substring (the DuckDB oracle keys
  * on window text equality its own way), so the hash family need not
  * match Spark's xxhash64 literal output, only its collision behavior.
  * Degenerate cases mirror [[CharNgrams]]: fewer than n chars → the
  * whole string as one window; empty input → one hash of "".
  *
  * Why it exists (the sf1 audit): dedup_substring's window stream is
  * ~L hashes per L-char document. Materializing each window as a
  * 30-char UTF8String (explode → xxhash64) allocates ~30× the bytes of
  * the text itself before hashing throws them away — at sf1 that
  * allocation wall was the whole cost. Hashing byte RANGES in place
  * (XXH64 over [offs(i), offs(i+n))) allocates one long[] per doc;
  * per-doc distinctness folds into the same pass via an open-addressing
  * long set. */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

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
    CharNgramHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = CharNgramHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.hashes($c, $n);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharNgramHashes = copy(child = newChild)
}

object CharNgramHashes {

  private final val SEED = 42L // Spark's hash seed convention

  def hashes(str: UTF8String, n: Int): ArrayData = {
    val bytes = str.getBytes
    val total = str.numChars()
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

    // open-addressing set over the window hashes; 0 marks an empty slot
    // (a genuine 0 hash is remapped — bias is irrelevant for keying)
    // capacity math in Long: count*2-1 overflows Int at >=2^30 chars,
    // which would under-size the table and spin the insert loop forever
    var cap = Integer.highestOneBit(
      math.min(Int.MaxValue / 2L, math.max(count.toLong * 2 - 1, 4L)).toInt) << 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    val out = new Array[Long](count)
    var nOut = 0
    i = 0
    while (i < count) {
      val end = math.min(i + n, total)
      var h = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + offs(i), offs(end) - offs(i), SEED)
      if (h == 0L) h = 1L
      var slot = (h & mask).toInt
      var seen = false
      while (!seen && table(slot) != 0L) {
        if (table(slot) == h) seen = true
        else slot = (slot + 1) & mask
      }
      if (!seen) {
        table(slot) = h
        out(nOut) = h
        nOut += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Column API. */
  def char_ngram_hashes(s: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharNgramHashes(
        org.apache.spark.sql.GraftColumnBridge.expression(s), n))
}
