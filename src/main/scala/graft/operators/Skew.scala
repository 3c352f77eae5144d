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
    *
    * SCALE CAVEAT: this replicates the ENTIRE small side `salts`×. At
    * 100 TB a 15M-row dimension becomes salts×15M shuffle rows — the
    * measured sf10 offender (22× wall, SMJ spill). Unless the whole
    * dimension really is hot, use [[hotKeySaltedJoin]], which
    * replicates only |hot keys| rows.
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

  /** Misra-Gries heavy-key candidates of `big(bigKey)`: every key with
    * frequency > N/(maxHot+1) is guaranteed present (superset — a few
    * non-hot stragglers may ride along, which only costs their rows a
    * harmless salt). One scan, map-side-combining, at most `maxHot`
    * strings returned to the driver — bounded regardless of data size.
    */
  def hotKeys(big: DataFrame, bigKey: String, maxHot: Int): Seq[String] = {
    import org.apache.spark.sql.graft.FreqSketchApi
    big.select(FreqSketchApi.misra_gries(col(bigKey).cast("string"), maxHot)
        .as("__hot"))
      .head().getSeq[String](0)
  }

  /** Hot-key-only salted join: salt ONLY the keys a one-pass
    * Misra-Gries sketch flags as heavy; everything else takes the
    * plain equi-join (where AQE remains free to act). Exact inner
    * equi-join semantics — the hot/cold split partitions the big
    * side's key space, each branch joins exactly its keys, and the
    * union is the full match set (null big keys fall to the cold
    * branch and match nothing, as in the plain join).
    *
    * Versus [[saltedJoin]]: small-side replication drops from
    * |small|×salts to |small rows on hot keys|×salts ≤ maxHot×salts
    * per distinct key — at sf10 that is ~512 rows instead of 120M.
    * The price is re-scanning the big side per branch (a pruned
    * parquet scan, cheap next to the avoided replicated shuffle);
    * callers holding `big` in memory can persist it first.
    */
  def hotKeySaltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int, maxHot: Int = 64): DataFrame = {
    // The hot/cold partition is computed on STRING renderings of the
    // keys while the joins compare native values. Those two notions of
    // equality only coincide when the key types are identical (long 7
    // vs double 7.0 render "7" vs "7.0" but join-match after implicit
    // cast — the string filter would silently drop those pairs). Fail
    // fast rather than be approximately exact.
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    require(bigType == smallType,
      s"hotKeySaltedJoin requires identical key types for exactness: " +
        s"$bigKey is $bigType but $smallKey is $smallType — cast one side " +
        "to the other's type before calling")
    val hot = hotKeys(big, bigKey, maxHot)
    if (hot.isEmpty) {
      big.join(small, big(bigKey) === small(smallKey))
    } else {
      val isHotBig = col(bigKey).cast("string").isin(hot: _*)
      val isHotSmall = col(smallKey).cast("string").isin(hot: _*)
      val hotSide = saltedJoin(big.filter(isHotBig), small.filter(isHotSmall),
        bigKey, smallKey, salts)
      val bigCold = big.filter(!coalesce(isHotBig, lit(false)))
      val coldSide = bigCold.join(small, bigCold(bigKey) === small(smallKey))
      coldSide.unionByName(hotSide)
    }
  }
}
