package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native
  * TypedImperativeAggregate: one pass, at most `k` counters, mergeable
  * (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantee: every value with true frequency > N/(k+1) is present in
  * the final candidate set, where N is the total number of non-null
  * inputs — merging only ADDS error bounded by the counts it subtracts,
  * so the union bound holds across partitions. The candidates are a
  * SUPERSET of the true heavy hitters; callers that need exact top-k
  * (see `heavy_hitters_topk`) re-count ONLY the candidates with an
  * exact aggregate restricted by a broadcast semi-join. That second
  * pass touches every row but shuffles at most k keys — the point at
  * 100 TB, where an unrestricted groupBy over all distinct tokens
  * shuffles the full vocabulary.
  *
  * The buffer is a HashMap of at most k entries; the classic
  * decrement-all step is amortized O(1) per input because every pass
  * consumes `size` units of previously added count and at most N units
  * are ever added.
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "misra_gries k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.getOrElse(key, 0L)
      if (cur > 0L || buf.size < k) buf.update(key, cur + 1L)
      else {
        // full and unseen: decrement every counter by 1, drop zeros
        // (the arriving item is consumed by the same decrement)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (t, c) => if (c <= 0L) dead += t }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // keep the k largest; subtract the (k+1)-th largest count from
      // the survivors (the mergeable-summaries rule that preserves the
      // N/(k+1) guarantee under merging)
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.update(new String(arr, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object FreqSketchApi {
  /** Aggregate a string column into the Misra-Gries candidate set
    * (sorted array of at most k values): a superset of every value
    * with frequency > N/(k+1).
    */
  def misra_gries(value: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(value), k).toAggregateExpression())
}
