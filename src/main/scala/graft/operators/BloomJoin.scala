package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomApi

/** Bloom-filter join pruning (SURVEY.md §7.4 scale lever).
  *
  * When the small side of a join is too big to broadcast as a hash
  * table but its KEY SET still fits a few MB of bits, build a Bloom
  * filter over the keys, broadcast THAT, and drop non-matching
  * big-side rows before the shuffle. The trailing exact join keeps
  * results exact (false positives just ride along to be dropped by
  * the join itself), so this is a pure plan optimization: shuffle
  * volume scales with matches + epsilon instead of the full corpus.
  */
object BloomJoin {

  /** `big` minus the rows whose `bigKey` is definitely not in
    * `small`'s `smallKey` set. numBytes=1MB / numHashes=5 holds ~1M
    * keys at <1% false-positive rate; size up for bigger key sets.
    *
    * The bloom is materialized EAGERLY (one aggregate job producing a
    * single blob — a dimension-scale scalar, the one collect() this
    * operator is allowed) and embedded as a literal, so the probe is a
    * plain whole-stage-codegen'd Filter directly over the scan rather
    * than a join condition — the same runtime-filter shape Spark's own
    * injected bloom filters use.
    */
  def pruned(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      numBytes: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloomBytes = small.agg(
        BloomApi.bloom_agg(col(smallKey), numBytes, numHashes).as("__bloom"))
      .collect()(0).getAs[Array[Byte]](0)
    big.filter(BloomApi.bloom_might_contain(bloomBytes, col(bigKey), numHashes))
  }

  /** Exact inner join with the Bloom pre-filter on the big side. */
  def join(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      numBytes: Int = 1 << 20, numHashes: Int = 5): DataFrame =
    pruned(big, small, bigKey, smallKey, numBytes, numHashes)
      .join(small, col(bigKey) === col(smallKey))
}
