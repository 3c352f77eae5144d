package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash-signature aggregate (the §2.10 UDAF extension point):
  * one TypedImperativeAggregate whose buffer is the numPerm-long
  * signature, updated in place per shingle with numPerm seeded
  * xxhash64 evaluations.
  *
  * Versus the "explode -> numPerm min() columns" formulation this
  * halves the shuffle payload (one array column, not numPerm scalar
  * columns with per-column agg bookkeeping) and skips the wide
  * projection; partial aggregation (merge = element-wise min) still
  * combines map-side, so the shuffle carries one signature per
  * (partition, key).
  */
case class MinHashAgg(child: Expression, numPerm: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  // Same permutation family as graft.operators.Dedup: ONE xxhash64 of
  // the value string, then per member a seeded xxhash64 of that base
  // long — replicating the expression xxhash64(lit(p), h), which folds
  // hash(p, Int, 42) into the seed for hash(h, Long, _).
  private lazy val permSeeds: Array[Long] = Array.tabulate(numPerm)(p =>
    XxHash64Function.hash(p, org.apache.spark.sql.types.IntegerType, 42L))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XxHash64Function.hash(v, StringType, 42L)
      var p = 0
      while (p < numPerm) {
        val h = XxHash64Function.hash(base, LongType, permSeeds(p))
        if (h < buf(p)) buf(p) = h
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) {
      if (b(p) < a(p)) a(p) = b(p)
      p += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAggApi {
  /** Aggregate a (string) shingle column into a numPerm-long MinHash
    * signature.
    */
  def minhash_agg(shingle: Column, numPerm: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(shingle), numPerm).toAggregateExpression())
}
