package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object RangeJoin {

  /** @param points    (any columns) with `pointCol`: LONG position
    * @param intervals (any columns) with `startCol`/`endCol`: LONG,
    *                  half-open [start, end)
    * @param binWidth  bin size in the same units
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin", expr(s"$pointCol div $binWidth"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binWidth"),
        expr(s"($endCol - 1) div $binWidth"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
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
    */
  def pointPartialsPerInterval(points: DataFrame, pointCol: String,
      valueCol: String, intervals: DataFrame, startCol: String,
      endCol: String, binWidth: Long): DataFrame = {
    val partials = points
      .groupBy(expr(s"$pointCol div $binWidth").as("__bin"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    // Empty intervals (end == start) must match nothing, but Spark's
    // sequence(s, s-1) is a DESCENDING [s, s-1] — without this guard
    // an empty interval would wrongly pick up two bins of partials.
    // (pointInInterval is immune: its residual containment filter
    // rejects every point for an empty interval.)
    intervals.filter(col(endCol) > col(startCol)).withColumn("__bin",
        explode(sequence(expr(s"$startCol div $binWidth"),
          expr(s"($endCol - 1) div $binWidth"))))
      .join(partials, Seq("__bin"))
      .drop("__bin")
  }
}
