package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator (the UDTF extension point, SURVEY §2.10): emit the
  * DISTINCT n-token shingles of a token array as rows.
  *
  * The built-in formulation —
  * `explode(array_distinct(transform(sequence(...), i =>
  * array_join(slice(toks, i+1, n), " "))))` — walks four interpreted
  * higher-order expressions per row and materializes the full shingle
  * array before exploding. This generator does one pass in Scala:
  * build each shingle, dedupe with a per-row hash set, emit. Same
  * output, a fraction of the expression-evaluation overhead on the
  * near-dup hot path.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, "shingle length must be >= 1")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)
  override def collectionType: org.apache.spark.sql.types.DataType =
    ArrayType(elementSchema, containsNull = false)
  override def position: Boolean = false
  override def inline: Boolean = false
  override def prettyName: String = "shingle_explode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_explode needs array<string>, got ${other.simpleString(40)}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val len = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (len < n) {
      // short-document fallback: one whole-document shingle
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        if (i > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i).toString)
        i += 1
      }
      out.add(UTF8String.fromString(sb.toString))
    } else {
      var i = 0
      while (i <= len - n) {
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val it = out.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow = InternalRow(it.next())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGeneratorApi {
  /** Column form for `select(..., shingle_explode(tokens, n))`. */
  def shingle_explode(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleGenerator(ColumnBridge.expression(tokens), n))
}
