package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter build + probe for join pruning.
  *
  * The 100 TB shape: build a Bloom filter over the SMALL side's join
  * keys (one partially-aggregated pass, merge = bitwise OR, a few MB
  * of bits), broadcast the single-row result, and drop big-side rows
  * that cannot match BEFORE they reach the shuffle. False positives
  * only cost work, never correctness — the exact join downstream
  * keeps semantics — so this turns a full-corpus shuffle into a
  * shuffle of roughly the matching rows (Spark's own runtime row-group
  * filtering applies the same idea below the scan).
  *
  * Hashing: double hashing bit_i = (h1 + i*h2) mod bits with
  * xxhash64(v, seed 0x9747b28c) / xxhash64(v, seed 0x243f6a88) — the
  * build aggregate and the probe expression share [[BloomKernels]], so
  * interpreted and codegen paths are bit-identical. Keys may be LONG
  * or STRING.
  */
object BloomKernels {
  final val Seed1 = 0x9747b28cL
  final val Seed2 = 0x243f6a88L

  def hashLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)
  def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  def set(buf: Array[Byte], h1: Long, h2: Long, k: Int): Unit = {
    val numBits = buf.length.toLong << 3
    var i = 0
    while (i < k) {
      var bit = (h1 + i * h2) % numBits
      if (bit < 0) bit += numBits
      val idx = (bit >>> 3).toInt
      buf(idx) = (buf(idx) | (1 << (bit & 7).toInt)).toByte
      i += 1
    }
  }

  def mightContain(buf: Array[Byte], h1: Long, h2: Long, k: Int): Boolean = {
    val numBits = buf.length.toLong << 3
    var i = 0
    while (i < k) {
      var bit = (h1 + i * h2) % numBits
      if (bit < 0) bit += numBits
      if ((buf((bit >>> 3).toInt) & (1 << (bit & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  def mightContainLong(buf: Array[Byte], v: Long, k: Int): Boolean =
    mightContain(buf, hashLong(v, Seed1), hashLong(v, Seed2), k)
  def mightContainString(buf: Array[Byte], s: UTF8String, k: Int): Boolean =
    mightContain(buf, hashString(s, Seed1), hashString(s, Seed2), k)
}

/** Build aggregate: buffer IS the bit array (bytes), merge is bitwise
  * OR, so partial aggregation combines map-side and the shuffle
  * carries one `numBytes` blob per partition.
  */
case class BloomAgg(child: Expression, numBytes: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg supports LONG or STRING keys, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBytes)

  // lazy: the child is unresolved at construction time
  private lazy val isLong = child.dataType == LongType

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) =
        if (isLong) {
          val l = v.asInstanceOf[Long]
          (BloomKernels.hashLong(l, BloomKernels.Seed1),
            BloomKernels.hashLong(l, BloomKernels.Seed2))
        } else {
          val s = v.asInstanceOf[UTF8String]
          (BloomKernels.hashString(s, BloomKernels.Seed1),
            BloomKernels.hashString(s, BloomKernels.Seed2))
        }
      BloomKernels.set(buf, h1, h2, numHashes)
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Probe: stays inside whole-stage codegen (a static kernel call), so
  * the big-side filter costs two multiplies and k bit reads per row.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (BINARY, LONG|STRING), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(bloom: Any, v: Any): Any = {
    val buf = bloom.asInstanceOf[Array[Byte]]
    right.dataType match {
      case LongType => BloomKernels.mightContainLong(buf, v.asInstanceOf[Long], numHashes)
      case _ => BloomKernels.mightContainString(buf, v.asInstanceOf[UTF8String], numHashes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Call the STATIC FORWARDERS on the plain class (scalac emits them
    // for object methods): `BloomKernels.MODULE$` does not compile
    // under Janino — MODULE$ lives on the `BloomKernels$` class, so
    // that form threw CompileException and silently dropped the whole
    // stage back to interpreted execution.
    val kernels = BloomKernels.getClass.getName.stripSuffix("$")
    val call = right.dataType match {
      case LongType => "mightContainLong"
      case _ => "mightContainString"
    }
    nullSafeCodeGen(ctx, ev, (bloom, v) =>
      s"${ev.value} = $kernels.$call($bloom, $v, $numHashes);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** A materialized Bloom blob as a leaf expression: evaluates to the
  * bytes (a codegen reference object, zero per-row cost) but prints
  * compactly — a raw 1 MB BinaryType Literal would render as 2 MB of
  * hex in every plan string, UI event, and explain output.
  */
case class BloomBlob(bytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = false // keep it out of constant folding
  override def eval(input: InternalRow): Any = bytes
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBlob", bytes, "byte[]")
    ExprCode(code"", FalseLiteral, JavaCode.global(ref, BinaryType))
  }
  override def toString: String = s"bloom_blob(${bytes.length} bytes)"
}

object BloomApi {
  /** Aggregate a LONG or STRING key column into a Bloom filter blob. */
  def bloom_agg(key: Column, numBytes: Int = 1 << 20, numHashes: Int = 5): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(key), numBytes, numHashes).toAggregateExpression())

  /** True if `key` MAY be in `bloom`; false means definitely absent. */
  def bloom_might_contain(bloom: Column, key: Column, numHashes: Int = 5): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(key), numHashes))

  /** Probe against an already-materialized blob (runtime-filter shape). */
  def bloom_might_contain(bloom: Array[Byte], key: Column, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      BloomBlob(bloom), ColumnBridge.expression(key), numHashes))
}
