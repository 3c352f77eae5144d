package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PrefixScanApi
import org.apache.spark.sql.types.LongType

/** Distributed global ranking. A bare `Window.orderBy(...)` (no
  * partition keys) moves EVERY row to a single partition — the
  * "WindowExec: No Partition Defined" plan that cannot survive scale.
  * These helpers compute the same global ordinals with a
  * range-partitioned sort (parallel, same machinery as orderBy) plus
  * the [[org.apache.spark.sql.graft.PrefixScan]] native exec — a
  * two-pass scan at the InternalRow level, so no task ever holds more
  * than its slice and no row leaves the Tungsten format.
  *
  * Determinism: the scan's offsets are collected in a separate job
  * that reuses the range shuffle's map outputs. If the upstream frame
  * is NONDETERMINISTIC (fresh `rand()` per recompute) and shuffle
  * files are lost, a recomputed sort can disagree with the collected
  * offsets — persist the input first in that case (the same contract
  * `rdd.zipWithIndex` ships with).
  */
object GlobalRank {

  /** Append a global 0-based row index by `order` without a
    * single-partition window: range-partition + sort within partitions
    * (a distributed total order), then an exclusive count scan.
    * Costs one extra lightweight job (partition counts) — versus a
    * WindowExec that serializes the whole dataset through one task.
    * Ties in `order` get an arbitrary but stable index; pass a unique
    * tie-break column for determinism.
    */
  def withGlobalIndex(df: DataFrame, order: Seq[Column],
      idxName: String = "__gidx"): DataFrame = {
    require(!df.columns.contains(idxName),
      s"index column '$idxName' already exists; pass a fresh name")
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    PrefixScanApi.scan(sorted, None, idxName)
  }

  /** Append an EXCLUSIVE global running sum of `weight` by `order` —
    * `sum(w) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)` — without the single-partition WindowExec that a
    * partition-less running sum compiles to. Two-pass prefix sum, the
    * classic distributed scan, run by the native
    * [[org.apache.spark.sql.graft.PrefixScanExec]]: range-partition +
    * sort (a parallel total order), one lightweight job for
    * per-partition weight totals (#partitions rows to the driver,
    * never data), then a map pass that seeds each partition with the
    * scanLeft of those totals. Both jobs share the one shuffle.
    *
    * The weight is evaluated BEFORE the sort so expression weights
    * (e.g. `size(tokens(text))`) are computed once; a NULL weight
    * counts as 0 (coalesced — a null-weight row keeps the running sum
    * unchanged rather than poisoning every later prefix). Ties in
    * `order` get an arbitrary but stable position; pass a unique
    * tie-break column for determinism. See the object scaladoc for
    * the nondeterministic-upstream caveat.
    */
  def withPrefixSum(df: DataFrame, order: Seq[Column], weight: Column,
      name: String = "__psum"): DataFrame = {
    require(!df.columns.contains(name),
      s"prefix-sum column '$name' already exists; pass a fresh name")
    val weighted = df.select(df.columns.map(col) :+
      coalesce(weight.cast(LongType), lit(0L)).as(name): _*)
    val sorted = weighted.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    PrefixScanApi.scan(sorted, Some(name), "__pscan")
      .select(df.columns.map(col) :+ col("__pscan").as(name): _*)
  }

  /** Greedy sequential shard assignment by cumulative weight: doc d
    * goes to shard exclusive-prefix-sum(d) div targetWeight, so
    * shards are contiguous runs of the global order and every shard
    * except the last holds >= targetWeight - (heaviest row - 1) and
    * < targetWeight + (heaviest row - 1) weight. This is the balanced
    * training-shard writer's layout (curriculum order preserved,
    * loader-even token budgets) — computed with [[withPrefixSum]], so
    * no single-task window anywhere. Long `div`, not floor(/): the
    * double division would lose integer precision once cumulative
    * weight passes 2^53 — well inside 100 TB-corpus territory.
    */
  def shardAssign(df: DataFrame, order: Seq[Column], weight: Column,
      targetWeight: Long, name: String = "shard_id"): DataFrame = {
    require(targetWeight > 0, s"target weight must be positive, got $targetWeight")
    withPrefixSum(df, order, weight, "__excl")
      .withColumn(name, expr(s"__excl div $targetWeight"))
      .drop("__excl")
  }

  /** Exact NTILE(buckets) over a global ordering, distributed: bucket
    * boundaries follow the SQL-standard allocation (the first n %
    * buckets buckets get one extra row), computed from the global index.
    */
  def ntile(df: DataFrame, buckets: Int, order: Seq[Column],
      name: String = "bucket"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val n = df.count()
    val base = n / buckets
    val rem = n % buckets
    val cut = rem * (base + 1)
    // base == 0 (fewer rows than buckets): every index < cut = n, so the
    // small-bucket branch never evaluates; guard its divisor anyway.
    val safeBase = math.max(base, 1L)
    withGlobalIndex(df, order, "__gidx")
      .withColumn(name,
        when(col("__gidx") < cut, expr(s"__gidx div ${base + 1}") + 1L)
          .otherwise(lit(rem) + expr(s"(__gidx - $cut) div $safeBase") + 1L))
      .drop("__gidx")
  }
}
