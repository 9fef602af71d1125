package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels.
  *
  * A PQ index (the compression half of IVF-PQ — the layout
  * billion-vector indexes store their corpus in) needs two per-row
  * kernels over quantized `array<bigint>` embeddings:
  *
  *  - ENCODE: for each of `m` subspaces, the argmin-distance² code
  *    against a `kpq`-entry codebook (ties to the lower code);
  *  - ADC table: the full m×kpq table of squared L2 distances, used
  *    per QUERY to turn the corpus scan into m table lookups per row.
  *
  * Composing these from built-ins needs m×kpq inlined centroid
  * literals and ~3 dot products per (j, c) cell — a several-hundred-
  * node expression tree whose analysis/codegen time dominates the
  * whole job and which exceeds whole-stage-codegen method limits.
  * These expressions collapse each kernel to ONE tree node with a
  * tight generated loop; the codebook rides along as a single
  * `array<array<bigint>>` literal (kpq×dim ints — driver-held index
  * metadata, exactly what FAISS ships to every search node).
  *
  * Distances are exact int64 squared L2 on the quantized grid, so
  * downstream results stay bit-identical to a SQL oracle.
  * Null semantics: null input, null element, `dim % m != 0`, an EMPTY
  * codebook, or a codebook row of the wrong length → null (the composed
  * built-in form yields null in the same cases; an empty codebook
  * previously produced silent all-zero codes — out-of-range by
  * definition — instead of null).
  */
abstract class PqKernel extends BinaryExpression {
  /** Corpus/query vector: array<bigint> of dim elements. */
  def vec: Expression
  /** Codebook: array<array<bigint>>, kpq rows of dim elements. */
  def codebook: Expression
  /** Number of subspaces; dim must divide evenly. */
  def m: Int

  override def left: Expression = vec
  override def right: Expression = codebook
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (vec.dataType, codebook.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        m > 0
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>) and m > 0, " +
      s"got ${vec.dataType.sql}, ${codebook.dataType.sql}, m=$m")
  }
}

/** `pq_encode(vec, codebook, m)` → array<int> of m codes. */
case class PqEncode(vec: Expression, codebook: Expression, m: Int)
    extends PqKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, codebook = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    val kpq = cb.numElements()
    if (n == 0 || n % m != 0 || kpq == 0) return null
    val subDim = n / m
    val bestD = Array.fill(m)(Long.MaxValue)
    val bestC = new Array[Int](m)
    var c = 0
    while (c < kpq) {
      if (cb.isNullAt(c)) return null
      val cv = cb.getArray(c)
      if (cv.numElements() != n) return null
      var j = 0
      while (j < m) {
        var d = 0L
        var i = j * subDim
        val end = i + subDim
        while (i < end) {
          if (v.isNullAt(i) || cv.isNullAt(i)) return null
          val t = v.getLong(i) - cv.getLong(i)
          d += t * t
          i += 1
        }
        if (d < bestD(j)) { bestD(j) = d; bestC(j) = c }
        j += 1
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val subDim = ctx.freshName("subDim")
      val kpq = ctx.freshName("kpq"); val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC"); val cv = ctx.freshName("cv")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val end = ctx.freshName("end")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val ok = ctx.freshName("ok")
      s"""
        final int $n = $a.numElements();
        final int $kpq = $b.numElements();
        boolean $ok = $n > 0 && $n % $m == 0 && $kpq > 0;
        if ($ok) {
          final int $subDim = $n / $m;
          final long[] $bestD = new long[$m];
          final int[] $bestC = new int[$m];
          java.util.Arrays.fill($bestD, Long.MAX_VALUE);
          for (int $c = 0; $ok && $c < $kpq; $c++) {
            if ($b.isNullAt($c)) { $ok = false; break; }
            final org.apache.spark.sql.catalyst.util.ArrayData $cv =
              $b.getArray($c);
            if ($cv.numElements() != $n) { $ok = false; break; }
            for (int $j = 0; $ok && $j < $m; $j++) {
              long $d = 0L;
              int $i = $j * $subDim;
              final int $end = $i + $subDim;
              for (; $i < $end; $i++) {
                if ($a.isNullAt($i) || $cv.isNullAt($i)) { $ok = false; break; }
                final long $t = $a.getLong($i) - $cv.getLong($i);
                $d += $t * $t;
              }
              if ($ok && $d < $bestD[$j]) { $bestD[$j] = $d; $bestC[$j] = $c; }
            }
          }
          if ($ok) {
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
          }
        }
        ${ev.isNull} = !$ok;
      """
    })
  }
}

/** `pq_adc_table(vec, codebook, m)` → array<bigint> of m×kpq squared
  * distances, row-major: element `j * kpq + c` is dist²(subvec_j,
  * codebook[c] subspace j). Flat (not nested) so the downstream
  * lookup is a single 0-based subscript `t[j * kpq + code_j]`. */
case class PqAdcTable(vec: Expression, codebook: Expression, m: Int)
    extends PqKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcTable =
    copy(vec = newLeft, codebook = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    val kpq = cb.numElements()
    if (n == 0 || n % m != 0 || kpq == 0) return null
    val subDim = n / m
    val out = new Array[Long](m * kpq)
    var c = 0
    while (c < kpq) {
      if (cb.isNullAt(c)) return null
      val cv = cb.getArray(c)
      if (cv.numElements() != n) return null
      var j = 0
      while (j < m) {
        var d = 0L
        var i = j * subDim
        val end = i + subDim
        while (i < end) {
          if (v.isNullAt(i) || cv.isNullAt(i)) return null
          val t = v.getLong(i) - cv.getLong(i)
          d += t * t
          i += 1
        }
        out(j * kpq + c) = d
        j += 1
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val subDim = ctx.freshName("subDim")
      val kpq = ctx.freshName("kpq"); val out = ctx.freshName("out")
      val cv = ctx.freshName("cv")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val end = ctx.freshName("end")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val ok = ctx.freshName("ok")
      s"""
        final int $n = $a.numElements();
        final int $kpq = $b.numElements();
        boolean $ok = $n > 0 && $n % $m == 0 && $kpq > 0;
        if ($ok) {
          final int $subDim = $n / $m;
          final long[] $out = new long[$m * $kpq];
          for (int $c = 0; $ok && $c < $kpq; $c++) {
            if ($b.isNullAt($c)) { $ok = false; break; }
            final org.apache.spark.sql.catalyst.util.ArrayData $cv =
              $b.getArray($c);
            if ($cv.numElements() != $n) { $ok = false; break; }
            for (int $j = 0; $ok && $j < $m; $j++) {
              long $d = 0L;
              int $i = $j * $subDim;
              final int $end = $i + $subDim;
              for (; $i < $end; $i++) {
                if ($a.isNullAt($i) || $cv.isNullAt($i)) { $ok = false; break; }
                final long $t = $a.getLong($i) - $cv.getLong($i);
                $d += $t * $t;
              }
              if ($ok) { $out[$j * $kpq + $c] = $d; }
            }
          }
          if ($ok) {
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }
        ${ev.isNull} = !$ok;
      """
    })
  }
}

object PqCodes {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column helpers mirroring the other native-expression factories. */
  def pq_encode(vec: Column, codebook: Column, m: Int): Column =
    column(PqEncode(expression(vec), expression(codebook), m))
  def pq_adc_table(vec: Column, codebook: Column, m: Int): Column =
    column(PqAdcTable(expression(vec), expression(codebook), m))

  /** SQL registration: pq_encode(vec, cb, m) / pq_adc_table(vec, cb, m). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode",
      exprs => PqEncode(exprs(0), exprs(1), PqKernel.litInt(exprs(2))),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_table",
      exprs => PqAdcTable(exprs(0), exprs(1), PqKernel.litInt(exprs(2))),
      "scala_udf")
  }
}

object PqKernel {
  private[graft] def litInt(e: Expression): Int =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Number].intValue()
}
