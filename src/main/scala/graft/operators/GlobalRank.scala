package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking. A bare `Window.orderBy(...)` (no
  * partition keys) moves EVERY row to a single partition — the
  * "WindowExec: No Partition Defined" plan that cannot survive scale.
  * These helpers compute the same global ordinals with a
  * range-partitioned sort (parallel, same machinery as orderBy) plus
  * per-partition offsets, so no task ever holds more than its slice.
  */
object GlobalRank {

  /** Append a global 0-based row index by `order` without a
    * single-partition window: range-partition + sort within partitions
    * (a distributed total order), then zipWithIndex's per-partition
    * offset pass. Costs one extra lightweight job (partition counts) —
    * versus a WindowExec that serializes the whole dataset through one
    * task. Ties in `order` get an arbitrary but stable index; pass a
    * unique tie-break column for determinism.
    */
  def withGlobalIndex(df: DataFrame, order: Seq[Column],
      idxName: String = "__gidx"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idxName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Append an EXCLUSIVE global running sum of `weight` by `order` —
    * `sum(w) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)` — without the single-partition WindowExec that a
    * partition-less running sum compiles to. Two-pass prefix sum, the
    * classic distributed scan: range-partition + sort (a parallel
    * total order), one lightweight job for per-partition weight totals
    * (#partitions rows to the driver, never data), then a map pass
    * that seeds each partition with the scanLeft of those totals. Both
    * jobs share the one shuffle (stage reuse), exactly the
    * zipWithIndex shape [[withGlobalIndex]] already relies on.
    *
    * The weight is evaluated BEFORE the sort so expression weights
    * (e.g. `size(tokens(text))`) are computed once. Ties in `order`
    * get an arbitrary but stable position; pass a unique tie-break
    * column for determinism.
    */
  def withPrefixSum(df: DataFrame, order: Seq[Column], weight: Column,
      name: String = "__psum"): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains(name),
      s"prefix-sum column '$name' already exists; pass a fresh name")
    val weighted = df.select(df.columns.map(col) :+ weight.cast(LongType).as(name): _*)
    val sorted = weighted.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val wIdx = sorted.schema.fieldIndex(name)
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(wIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var running = offsets(i)
      it.map { r =>
        val excl = running
        running += r.getLong(wIdx)
        Row.fromSeq(r.toSeq.updated(wIdx, excl))
      }
    }
    spark.createDataFrame(rdd, sorted.schema)
  }

  /** Greedy sequential shard assignment by cumulative weight: doc d
    * goes to shard floor(exclusive-prefix-sum(d) / targetWeight), so
    * shards are contiguous runs of the global order and every shard
    * except the last holds >= targetWeight - (heaviest row - 1) and
    * < targetWeight + (heaviest row - 1) weight. This is the balanced
    * training-shard writer's layout (curriculum order preserved,
    * loader-even token budgets) — computed with [[withPrefixSum]], so
    * no single-task window anywhere.
    */
  def shardAssign(df: DataFrame, order: Seq[Column], weight: Column,
      targetWeight: Long, name: String = "shard_id"): DataFrame = {
    require(targetWeight > 0, s"target weight must be positive, got $targetWeight")
    withPrefixSum(df, order, weight, "__excl")
      .withColumn(name, floor(col("__excl") / targetWeight))
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
