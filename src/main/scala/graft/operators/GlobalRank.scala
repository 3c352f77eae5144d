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
