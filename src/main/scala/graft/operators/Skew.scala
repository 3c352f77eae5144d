package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling patterns (SURVEY.md "Partitioning & shuffle").
  *
  * AQE's skew-join splitting handles most cases at runtime; these are
  * the explicit shapes for when the skew is known ahead of time (a
  * hot patient id, a viral document) or when AQE can't help (skewed
  * aggregation keys, which AQE does not split).
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
