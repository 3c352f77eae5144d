package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling patterns (SURVEY.md "Partitioning & shuffle").
  *
  * AQE's skew-join splitting handles most cases at runtime; these are
  * the explicit shapes for when the skew is known ahead of time (a
  * hot patient id, a viral document) or when AQE can't help (skewed
  * aggregation keys, which AQE does not split).
  *
  * WHICH TOOL WHEN (SkewSpec proves both sides on the same hot-key
  * corpus; PLANS.md "skew: AQE vs manual salting" shows the plans):
  *
  *  - Skewed equi-JOIN, skew unknown until runtime: prefer PLAIN join
  *    + AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default).
  *    OptimizeSkewedJoin splits the oversized partition into
  *    advisory-sized slices and replicates the matching other side —
  *    same effect as [[saltedJoin]] with a data-driven salt count, no
  *    code change, and it composes with broadcast/CBO decisions.
  *    SkewSpec pins that the split actually engages (`skew=true` on
  *    the join node) and returns [[saltedJoin]]'s rows exactly.
  *  - Skewed JOIN where AQE can't see or can't act: [[saltedJoin]].
  *    That means broadcast-ineligible shapes AQE leaves alone (e.g.
  *    the join must stay shuffle-free upstream of a reused exchange —
  *    OptimizeSkewedJoin skips joins whose output partitioning other
  *    operators depend on), or engines/pipelines with AQE disabled.
  *  - Skewed AGGREGATION: always [[saltedSum]] (or the two-stage
  *    pattern generally). AQE never splits a groupBy key — a 50%-hot
  *    key serializes on one reducer regardless of adaptive settings;
  *    the salt is the only way to spread it.
  */
object Skew {

  /** Two-stage salted aggregation: spread each hot key over `salts`
    * partial groups, aggregate, then combine. Exact for decomposable
    * aggregates (sum/count/min/max). At 100 TB this turns one reducer
    * receiving a hot key's entire volume into `salts` reducers each
    * taking 1/salts of it.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      keyName: String = "key", sumName: String = "sum"): DataFrame =
    df.select(key.as(keyName), value.as("__v"),
        (monotonically_increasing_id() % salts).as("__salt"))
      .groupBy(col(keyName), col("__salt"))
      .agg(sum(col("__v")).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(keyName))
      .agg(sum(col("__partial")).as(sumName), sum(col("__n")).as(s"${sumName}_count"))

  /** Salted broadcast-side replication for a skewed join: explode the
    * small side over the salt domain so the big side can salt its key
    * and still hash-join. Exact join semantics for equi-joins.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (monotonically_increasing_id() % salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
      saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
