package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE training round's rewrite: greedy left-to-right
  * non-overlapping merge of the adjacent token pair (left, right) into
  * the single token `left + "+" + right`, applied to every document's
  * token array (Sennrich et al. 2016, word-level variant).
  *
  * The scan is the textbook one: at position i, if t(i)==left and
  * t(i+1)==right emit the merged token and skip two, else emit t(i)
  * and advance one — so `x x x` under pair (x,x) merges positions
  * (0,1) and leaves the trailing x, exactly like the reference
  * algorithm and like DuckDB's `list_reduce` replay in the oracle.
  *
  * Why a native expression: the same fold as a SQL `aggregate` HOF
  * needs a growing string accumulator probed with `regexp_extract`
  * per element — O(len²) per document per round, measured at ~470 s
  * for 6 rounds at sf0.1. This kernel is one O(len) pass per document
  * inside whole-stage codegen; the merged token is a per-round
  * constant built once at expression construction. The pair operands
  * are Scala constructor params (not child expressions) because a
  * round's pair is a 1-row argmax the driver already holds — the
  * bounded-collect contract shared with the PQ codebook kernels.
  */
case class BpeMergeStep(child: Expression, leftTok: String, rightTok: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_step"

  @transient private lazy val leftU = UTF8String.fromString(leftTok)
  @transient private lazy val rightU = UTF8String.fromString(rightTok)
  @transient private lazy val mergedU =
    UTF8String.fromString(leftTok + "+" + rightTok)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          leftU.equals(arr.getUTF8String(i)) &&
          rightU.equals(arr.getUTF8String(i + 1))) {
        out(k) = mergedU
        i += 2
      } else {
        out(k) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        i += 1
      }
      k += 1
    }
    new GenericArrayData(
      if (k == n) out else java.util.Arrays.copyOfRange(out.asInstanceOf[Array[AnyRef]], 0, k))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergeStep", this, classOf[BpeMergeStep].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
