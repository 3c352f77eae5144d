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
}
