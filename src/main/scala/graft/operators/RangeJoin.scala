package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed interval (range) join: match points to the intervals
  * containing them WITHOUT the broadcast-nested-loop plan Spark picks
  * for a bare non-equi `t >= start AND t < end` condition.
  *
  * Shape: intervals explode to the fixed-width bins they cover, points
  * map to their single bin, the join becomes an EQUI join on the bin
  * plus a residual containment filter. A point lands in exactly one
  * bin, so no dedup is needed. Cost scales with
  * |points| + |intervals| * avg_bins_per_interval — at 100 TB this is
  * a hash join on a well-distributed key instead of an O(n*m) loop.
  * Choose binWidth on the order of the typical interval length.
  *
  * Skew defense: a single pathological interval spanning the whole
  * domain would explode to EVERY bin — one task generating (and then
  * shuffling) domain/binWidth rows, the straggler that dominates
  * wall-time at scale. When any interval covers more than
  * `maxBinsPerInterval` fine bins, the join switches to a TWO-LEVEL
  * decomposition: each interval registers the coarse bins (width
  * binWidth * maxBinsPerInterval) it covers COMPLETELY plus the <=
  * 2*maxBinsPerInterval fine bins at its edges, and each point probes
  * both its fine and its coarse bin. The three per-interval regions
  * are disjoint and cover the interval exactly, so every (point,
  * interval) match surfaces exactly once — same results, and the
  * residual containment filter still gates every pair. Per-interval
  * fan-out drops from span/binWidth to <= 2*maxBinsPerInterval +
  * span/(binWidth*maxBinsPerInterval): a 10M-bin interval at the
  * default cap emits ~11k rows instead of 10M. The level choice is
  * decided by ONE metadata-sized aggregate over the interval side
  * (max span in bins — a partial-agg scan of the dimension table, not
  * the fact side), so the common all-narrow corpus keeps the exact
  * historical single-level plan with no extra point-side work.
  */
object RangeJoin {

  /** Fine-bin fan-out ceiling before the two-level decomposition
    * engages; also the coarse-bin width multiplier once it does.
    */
  val DefaultMaxBinsPerInterval: Int = 4096

  /** SQL fragment: floor division of `x` (a column expression string)
    * by literal `b` > 0 in exact Long arithmetic. `div` truncates
    * toward zero, which disagrees with floor for negative positions;
    * subtracting pmod first makes the dividend an exact multiple, so
    * the quotient is floor(x/b) at any magnitude (no double
    * round-trip, exact past 2^53).
    */
  private def fd(x: String, b: Long): String =
    s"((($x) - pmod(($x), ${b}L)) div ${b}L)"

  /** SQL fragment: `sequence(lo, hi)` when lo <= hi, else empty —
    * Spark's sequence(s, s-1) is a DESCENDING [s, s-1], never what a
    * bin range means.
    */
  private def seqIf(lo: String, hi: String): String =
    s"(case when ($lo) <= ($hi) then sequence($lo, $hi) " +
      s"else cast(array() as array<bigint>) end)"

  /** The (lvl, bin) registration entries for an interval with bounds
    * in columns `__s`/`__e` (half-open): lvl 1 = coarse bins covered
    * completely, lvl 0 = the remaining fine bins at the edges.
    * Package-visible so the skew spec can pin the fan-out bound
    * directly.
    */
  private[graft] def intervalEntries(w: Long, c: Int): Column = {
    val wC = w * c
    val fineLo = fd("__s", w)
    val fineHi = fd("__e - 1", w)
    val cLo = fd(s"__s + ${wC - 1}L", wC) // ceilDiv(start, wC) under floor-div
    val cHi = s"(${fd("__e", wC)} - 1)"
    def fine(lo: String, hi: String) =
      s"transform(${seqIf(lo, hi)}, b -> named_struct('lvl', 0, 'bin', b))"
    expr(
      s"""case when ($cLo) <= ($cHi) then
            concat(
              ${fine(fineLo, s"least($fineHi, ($cLo) * ${c}L - 1)")},
              ${fine(s"greatest($fineLo, (($cHi) + 1) * ${c}L)", fineHi)},
              transform(sequence($cLo, $cHi),
                cc -> named_struct('lvl', 1, 'bin', cc)))
          else ${fine(fineLo, fineHi)} end""")
  }

  /** Widest interval measured in fine bins — the one metadata-sized
    * eager aggregate that picks the plan shape (dimension-side scan
    * only; the fact/point side is never touched).
    */
  private def maxSpanBins(intervals: DataFrame, startCol: String,
      endCol: String, w: Long): Long = {
    val r = intervals.select(col(startCol).as("__s"), col(endCol).as("__e"))
      .selectExpr(s"max(${fd("__e - 1", w)} - ${fd("__s", w)} + 1) as m")
      .head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  private def unpack(df: DataFrame): DataFrame = df
    .withColumn("__lvl", col("__ent.lvl"))
    .withColumn("__bin", col("__ent.bin"))
    .drop("__ent")

  /** @param points    (any columns) with `pointCol`: LONG position
    * @param intervals (any columns) with `startCol`/`endCol`: LONG,
    *                  half-open [start, end)
    * @param binWidth  bin size in the same units
    * @param maxBinsPerInterval fine-bin fan-out cap (see class doc)
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long,
      maxBinsPerInterval: Int = DefaultMaxBinsPerInterval): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerInterval >= 2,
      s"maxBinsPerInterval must be >= 2, got $maxBinsPerInterval")
    if (maxSpanBins(intervals, startCol, endCol, binWidth) <= maxBinsPerInterval) {
      // all-narrow corpus: the exact historical single-level plan.
      // The point side feeds the pair-expansion join + partial
      // aggregate — the entry's dominant stage — so it must enter the
      // join at machine parallelism (Par.spread is a no-op on any
      // multi-split scan; r19 StageProbe: 4.4 of 5.0 s in ONE task).
      val p = Par.spread(points).withColumn("__bin", expr(s"$pointCol div $binWidth"))
      val iv = intervals.withColumn("__bin",
        explode(sequence(expr(s"$startCol div $binWidth"),
          expr(s"($endCol - 1) div $binWidth"))))
      p.join(iv, Seq("__bin"))
        .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
        .drop("__bin")
    } else {
      val c = maxBinsPerInterval
      val wC = binWidth * c
      val p = Par.spread(points)
        .withColumn("__ent", explode(array(
          struct(lit(0).as("lvl"),
            expr(fd(pointCol, binWidth)).as("bin")),
          struct(lit(1).as("lvl"),
            expr(fd(pointCol, wC)).as("bin")))))
      val iv = intervals
        .withColumn("__s", col(startCol)).withColumn("__e", col(endCol))
        .withColumn("__ent", explode(intervalEntries(binWidth, c)))
        .drop("__s", "__e")
      unpack(p).join(unpack(iv), Seq("__lvl", "__bin"))
        .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
        .drop("__lvl", "__bin")
    }
  }

  /** Aggregate pushdown through a BIN-ALIGNED interval join: when
    * every interval's start and end are exact multiples of binWidth,
    * containment depends only on the point's bin — so the points
    * collapse to one (bin, __cnt, __sum) partial per bin BEFORE the
    * join, and the join plus everything downstream scales with the
    * number of covered bins, not with |points| x |intervals| matched
    * pairs. For q17's shape this turns a ~20M-pair consumption into a
    * |days|-row join. The caller aggregates the returned partials per
    * interval (sum(__cnt) = matched points, sum(__sum) = their value
    * sum). Alignment is the caller's contract; misaligned bounds need
    * [[pointInInterval]].
    *
    * Same wide-interval defense as [[pointInInterval]]: above the cap,
    * fine partials roll up into coarse partials (floor-div nesting
    * makes fine bin -> coarse bin exact for any sign) and intervals
    * register full coarse bins plus edge fine bins — disjoint exact
    * cover under the alignment contract, so the summed partials are
    * unchanged.
    */
  def pointPartialsPerInterval(points: DataFrame, pointCol: String,
      valueCol: String, intervals: DataFrame, startCol: String,
      endCol: String, binWidth: Long,
      maxBinsPerInterval: Int = DefaultMaxBinsPerInterval): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerInterval >= 2,
      s"maxBinsPerInterval must be >= 2, got $maxBinsPerInterval")
    val partials = points
      .groupBy(expr(s"$pointCol div $binWidth").as("__bin"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    // Empty intervals (end == start) must match nothing, but Spark's
    // sequence(s, s-1) is a DESCENDING [s, s-1] — without this guard
    // an empty interval would wrongly pick up two bins of partials.
    // (pointInInterval is immune: its residual containment filter
    // rejects every point for an empty interval.)
    val nonEmpty = intervals.filter(col(endCol) > col(startCol))
    if (maxSpanBins(nonEmpty, startCol, endCol, binWidth) <= maxBinsPerInterval) {
      nonEmpty.withColumn("__bin",
          explode(sequence(expr(s"$startCol div $binWidth"),
            expr(s"($endCol - 1) div $binWidth"))))
        .join(partials, Seq("__bin"))
        .drop("__bin")
    } else {
      val c = maxBinsPerInterval
      // alignment contract => non-negative multiples share floor/trunc
      // semantics, and floor-div nests: floor(floor(x/w)/c) = floor(x/(w*c))
      val coarse = partials
        .groupBy(expr(fd("__bin", c.toLong)).as("__bin"))
        .agg(sum(col("__cnt")).as("__cnt"), sum(col("__sum")).as("__sum"))
      val lvld = partials.withColumn("__lvl", lit(0))
        .unionByName(coarse.withColumn("__lvl", lit(1)))
      val iv = nonEmpty
        .withColumn("__s", col(startCol)).withColumn("__e", col(endCol))
        .withColumn("__ent", explode(intervalEntries(binWidth, c)))
        .drop("__s", "__e")
      unpack(iv).join(lvld, Seq("__lvl", "__bin"))
        .drop("__lvl", "__bin")
    }
  }
}
