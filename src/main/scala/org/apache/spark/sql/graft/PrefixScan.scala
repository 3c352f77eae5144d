package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, BoundReference, Expression, JoinedRow, Literal, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Distributed exclusive prefix scan as a native physical operator
  * (SURVEY §2 ladder step (c)): appends `sum(weight) OVER (ROWS
  * UNBOUNDED PRECEDING AND 1 PRECEDING)` in the child's CURRENT
  * partition-and-row order, entirely at the `InternalRow`/Tungsten
  * level — no `Row.fromSeq` boxing, no `createDataFrame` analyzer
  * boundary, partitioning and ordering forwarded so AQE and
  * EnsureRequirements see through it.
  *
  * The caller is responsible for the total order (range-partition +
  * sort within partitions, i.e. `repartitionByRange.sortWithinPartitions`
  * — the parallel machinery `orderBy` itself uses); this node only does
  * the classic two-pass scan on top: one lightweight job collecting
  * per-partition weight totals (#partitions longs to the driver, never
  * data), then a map pass seeded with the scanLeft of those totals.
  *
  * Determinism requirement: both passes run over the SAME RDD, so
  * Spark reuses the range shuffle's map outputs between them. If those
  * shuffle files are lost (executor decommission) AND the upstream
  * frame is nondeterministic (e.g. a fresh `rand()` per recompute),
  * the recomputed data pass can disagree with the collected totals.
  * Callers with nondeterministic upstreams must persist the sorted
  * frame first — the same contract `rdd.zipWithIndex` ships with.
  */
case class PrefixScan(weight: Expression, outAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  // every child column passes through — block ColumnPruning from
  // inserting a Project between us and the sorted child
  override def references: AttributeSet = AttributeSet(child.output)
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): PrefixScan =
    copy(child = newChild)
}

object PrefixScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PrefixScan(weight, outAttr, child) =>
      PrefixScanExec(weight, outAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class PrefixScanExec(weight: Expression, outAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  // a 1:1 map in place: the child's range partitioning and sort order
  // survive, so downstream ops (and AQE) keep planning against them
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val bound = BindReferences.bindReference(weight, childOutput)
    val rdd = child.execute()
    // pass 1: per-partition totals — #partitions rows to the driver.
    // A null weight contributes 0 (documented in GlobalRank.withPrefixSum,
    // which also coalesces at the column level for the oracle's benefit).
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { r =>
        val v = bound.eval(r)
        if (v != null) s += v.asInstanceOf[Long]
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    // pass 2: emit child row + exclusive running sum as one UnsafeRow
    val projExprs: Seq[Expression] = childOutput.zipWithIndex.map {
      case (a, i) => BoundReference(i, a.dataType, a.nullable)
    } :+ BoundReference(childOutput.size, LongType, nullable = false)
    rdd.mapPartitionsWithIndex { (i, it) =>
      val proj = UnsafeProjection.create(projExprs)
      val joined = new JoinedRow
      val sumRow = new SpecificInternalRow(Seq(LongType))
      var running = offsets(i)
      it.map { r =>
        sumRow.setLong(0, running)
        val v = bound.eval(r)
        if (v != null) running += v.asInstanceOf[Long]
        proj(joined(r, sumRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PrefixScanExec =
    copy(child = newChild)
}

object PrefixScanApi {

  /** Append `outName` = exclusive running sum of `weightCol` (a LongType
    * column of `df`; None = constant 1, i.e. a global 0-based row index)
    * over `df`'s CURRENT partition/row order. The caller must already
    * have established the total order — see [[PrefixScan]]'s scaladoc.
    */
  def scan(df: DataFrame, weightCol: Option[String], outName: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(PrefixScanStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PrefixScanStrategy
    val analyzed = castToImpl(df).queryExecution.analyzed
    val weightExpr: Expression = weightCol match {
      case Some(n) => analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"weight column '$n' not in ${analyzed.output.map(_.name).mkString(", ")}"))
      case None => Literal(1L)
    }
    val outAttr = AttributeReference(outName, LongType, nullable = false)()
    ClassicDataset.ofRows(castToImpl(spark),
      PrefixScan(weightExpr, outAttr, analyzed))
  }
}
