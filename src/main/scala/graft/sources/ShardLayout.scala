package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** Balanced training-shard WRITER: the sink half of
  * [[graft.operators.GlobalRank.shardAssign]]. The layout operator is
  * only useful if the write path preserves it, so this writes the
  * assigned frame as `shard_id=K/` parquet directories WITHOUT
  * disturbing the distribution the prefix scan produced:
  *
  *   - `shardAssign` leaves the frame RANGE-partitioned by the global
  *     order with `shard_id` monotone nondecreasing across and within
  *     partitions (shards are contiguous runs of the order).
  *   - `partitionBy("shard_id")` is a pure sink transform — the file
  *     committer opens one writer per distinct partition value per
  *     task. No exchange is added: each task holds a contiguous run of
  *     the order covering (task rows / shard weight) consecutive
  *     shards, so a shard's directory receives files from at most the
  *     two tasks whose range boundary it straddles (plus one per extra
  *     task the shard spans when shards are larger than partitions).
  *     SinksAndSqlSpec pins both properties: zero exchanges after the
  *     prefix scan, and files-per-shard bounded by run adjacency — a
  *     shuffle-scrambled layout would smear every shard over every
  *     task.
  *   - Within a file, rows stay in curriculum (global) order — the
  *     committer's partition-column sort is task-local and `shard_id`
  *     is already monotone there, so it never reorders rows inside a
  *     shard. Cross-file order within one shard follows the lexical
  *     file-name order (`part-<taskId>-…`), the standard loader
  *     convention.
  *
  * At 100 TB the shard count is corpus tokens / `targetWeight` —
  * directories scale linearly and each holds ~`targetWeight` tokens of
  * parquet, the loader-even unit the training job consumes; read one
  * shard directory per loader and the curriculum order is the
  * directory order. `maxRecordsPerFile`/committer knobs compose
  * normally since this is a plain DataFrame write.
  */
object ShardLayout {

  /** Assign shards by exclusive prefix sum of `weight` over `order`
    * and write `df` under `path` as one `shard_id=K` directory per
    * shard. Returns the assigned frame (lazily re-computable; the
    * write itself has consumed one pass).
    */
  def write(df: DataFrame, order: Seq[Column], weight: Column,
      targetWeight: Long, path: String): DataFrame = {
    val assigned = GlobalRank.shardAssign(df, order, weight, targetWeight)
    // A zero-row partitionBy write emits no files at all, leaving a
    // directory [[read]] cannot infer a schema from; write the empty
    // frame flat instead (schema-bearing parquet, no partition dirs).
    // The emptiness probe is one take(1) job — trivial next to the
    // full write that follows either way.
    if (assigned.take(1).isEmpty)
      assigned.write.mode("overwrite").parquet(path)
    else
      assigned.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    assigned
  }

  /** Read a shard layout back. `shard_id` returns as a partition
    * column; filters on it prune to shard directories (the loader's
    * "give me shard K" path reads exactly one directory). Its type
    * follows parquet partition inference (int until shard ids exceed
    * int range, then long); an empty layout reads back with the
    * written long column.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
