package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for compute-heavy narrow stages.
  *
  * The driver corpus ships each table as ONE single-row-group parquet
  * file, so a scan yields one partition no matter how many cores the
  * session has (parquet only splits at row-group boundaries —
  * `spark.sql.files.*` cannot help), and every map-heavy kernel chained
  * on the scan (shingling, minhash, vector prep, interval explode)
  * runs on 1 of N cores until the first exchange. Measured round 19:
  * q17_range_join spent 4.4 of 5.0 s in a single task on a 32-core
  * box; semdedup's all-pairs stage 2.5 s in one task (StageProbe,
  * BASELINE.md r19).
  *
  * [[spread]] round-robin repartitions to the session's default
  * parallelism ONLY when the input's physical partitioning is below
  * half of it. At production scale a corpus scan has thousands of
  * splits, the condition is false, and no exchange is added — this is
  * the guide's "make partitioning scale-adaptive rather than a
  * constant" rule (§2), applied to scan parallelism the same way AQE
  * applies it to shuffle parallelism. The exchanged rows are the
  * operator's raw input, paid once, BEFORE the expensive per-row
  * kernel; round-robin keeps sort-before-repartition determinism
  * (SPARK-23207), so retried tasks reproduce the same placement.
  *
  * NOT a result cache, NOT a local[32] constant: the target derives
  * from `sparkContext.defaultParallelism` (cores in local mode,
  * cluster cores on a real master) and the trigger from the input's
  * own partition count.
  */
object Par {

  /** Attribution kill-switch: SPARK_GRAFT_SPREAD=off makes [[spread]]
    * the identity, so an entry can be A/B-ed spread-on vs spread-off
    * across alternating JVMs without a rebuild.
    */
  private val enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_SPREAD", "on") != "off"

  /** Repartition `df` to the session default parallelism when its
    * current partitioning would leave most of the machine idle for a
    * downstream compute-heavy stage; identity otherwise (and always at
    * multi-split scale). The partition-count probe costs one plan
    * compile of `df`'s lineage, no job.
    */
  def spread(df: DataFrame): DataFrame =
    spreadTo(df, df.sparkSession.sparkContext.defaultParallelism)

  /** [[spread]] with an explicit, session-independent target — for the
    * one consumer class where the REPARTITION COUNT must not vary with
    * the core count: floating-point partial aggregates over the spread
    * frame (k-means component means). Round-robin placement and the
    * partial-sum groupings are a function of the partition COUNT, so a
    * target tied to `defaultParallelism` makes non-associative double
    * sums differ between an 8- and a 32-core session — a ULP shift
    * that can flip a near-tie nearest-centroid assignment downstream
    * (r19 ADVICE, medium). A pinned target keeps the same partials on
    * every box; the trigger condition is unchanged, so any multi-split
    * production scan still bypasses the exchange entirely.
    */
  def spreadTo(df: DataFrame, target: Int): DataFrame = {
    if (!enabled || target <= 1) df
    else if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }
}
