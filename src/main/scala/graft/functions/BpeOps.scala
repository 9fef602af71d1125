package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the iterative-BPE gate (`text_bpe_tokens`): one
  * JVM pass per document instead of interpreted per-element lambda
  * evaluation (the higher-order-function composition measured ~30 s at
  * sf0.1; these bring the gate back to sub-second).
  *
  * Semantics are EXACTLY the order-free formulation the DuckDB oracle
  * computes (TextOps.bpeOracleSql) and the HOF reference
  * (TextOps.bpeTokensHof): tokens start as code points; each round's
  * merge batch is conflict-free (no two pairs share a boundary token,
  * no self-pairs), so batch occurrences are DISJOINT and the greedy
  * left-to-right scan here coincides with the oracle's simultaneous
  * hit-mask application — BpeIterativeSpec proves the equivalence
  * corpus-wide. Callers must only pass batches produced by that
  * acceptance rule; a chaining batch would break the equivalence.
  */
object BpeOps {

  /** Pair-key separator (U+0001) between the two tokens of a merge —
    * must match TextOps.BPE_SEP / the oracle's chr(1). */
  val SEP = '\u0001'

  def bpe_pairs(c: Column, merges: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpePairs(org.apache.spark.sql.GraftColumnBridge.expression(c),
        merges))

  def bpe_round_counts(c: Column, merges: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeRoundCounts(org.apache.spark.sql.GraftColumnBridge.expression(c),
        merges))

  private[functions] def toSets(merges: Seq[Seq[String]])
      : Array[java.util.HashSet[String]] =
    merges.map { batch =>
      val s = new java.util.HashSet[String](math.max(batch.size * 2, 4))
      batch.foreach(s.add)
      s
    }.toArray

  /** Split into code-point tokens (Spark substring / DuckDB substr
    * both count code points, so parity requires code points, not
    * UTF-16 units). */
  private def initTokens(s: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + n)
      i += n
    }
    out
  }

  /** One merge round: greedy left-to-right over the token list. With a
    * conflict-free batch, occurrences are disjoint, so this equals the
    * oracle's simultaneous application. */
  private def applyRound(toks: ArrayBuffer[String],
      batch: java.util.HashSet[String]): ArrayBuffer[String] = {
    if (toks.length < 2 || batch.isEmpty) return toks
    val out = new ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 &&
          batch.contains(toks(i) + SEP + toks(i + 1))) {
        out += toks(i) + toks(i + 1)
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    out
  }

  private def nonSpaceCount(toks: ArrayBuffer[String]): Int = {
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i) != " ") n += 1
      i += 1
    }
    n
  }

  /** Adjacent pair keys of the segmentation AFTER applying `sets`
    * (empty array when fewer than 2 tokens — mirrors the oracle's
    * `len(toks) < 2` case). */
  def pairs(norm: UTF8String,
      sets: Array[java.util.HashSet[String]]): ArrayData = {
    var toks = initTokens(norm.toString)
    var r = 0
    while (r < sets.length) { toks = applyRound(toks, sets(r)); r += 1 }
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + SEP + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Non-space token counts after round 0..R (length R+1): the whole
    * train-trajectory of a doc in one pass. */
  def roundCounts(norm: UTF8String,
      sets: Array[java.util.HashSet[String]]): ArrayData = {
    var toks = initTokens(norm.toString)
    val out = new Array[Int](sets.length + 1)
    out(0) = nonSpaceCount(toks)
    var r = 0
    while (r < sets.length) {
      toks = applyRound(toks, sets(r))
      out(r + 1) = nonSpaceCount(toks)
      r += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] trait BpeExpr extends UnaryExpression {
  def merges: Seq[Seq[String]]

  @transient protected lazy val sets: Array[java.util.HashSet[String]] =
    BpeOps.toSets(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }

  protected def genCall(ctx: CodegenContext, ev: ExprCode,
      method: String): ExprCode = {
    val cls = BpeOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val setsRef = ctx.addReferenceObj("bpeSets", sets,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.$method($c, $setsRef);""".stripMargin
    })
  }
}

case class BpePairs(child: Expression, merges: Seq[Seq[String]])
    extends BpeExpr {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pairs"
  override def nullSafeEval(input: Any): Any =
    BpeOps.pairs(input.asInstanceOf[UTF8String], sets)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genCall(ctx, ev, "pairs")
  override protected def withNewChildInternal(newChild: Expression)
      : BpePairs = copy(child = newChild)
}

case class BpeRoundCounts(child: Expression, merges: Seq[Seq[String]])
    extends BpeExpr {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_round_counts"
  override def nullSafeEval(input: Any): Any =
    BpeOps.roundCounts(input.asInstanceOf[UTF8String], sets)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genCall(ctx, ev, "roundCounts")
  override protected def withNewChildInternal(newChild: Expression)
      : BpeRoundCounts = copy(child = newChild)
}
