package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right
  * row with rightTime <= leftTime on the same key. The reference has
  * no such operator; it's a §7.4 addition every feature/training
  * pipeline needs ("attach the most recent profile snapshot to each
  * event").
  *
  * Implementation is the union-window shape rather than a custom
  * SparkPlan: tag both sides, union, one window sorted by (key, time)
  * with last(ignoreNulls) carrying the right side forward, then keep
  * left rows. Cost = ONE shuffle on the key (the same shuffle a
  * shuffle-join would pay) and no range explosion — at 100 TB this
  * beats the naive rightTime <= leftTime non-equi join (which Spark
  * plans as a broadcast nested loop) by orders of magnitude.
  */
object AsOfJoin {

  /** @param left      rows to enrich; all kept (left-outer as-of)
    * @param right     lookup side
    * @param keyCol    equi-key present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right column -> output alias; attached as the
    *                  values of the single latest right row (carried
    *                  as one struct, so columns never mix rows)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String,
      payload: Map[String, String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rowStruct = struct(leftCols.map(col): _*)
    val pStruct = struct(payload.toSeq.map { case (src, a) => col(src).as(a) }: _*)
    val rowType = left.select(rowStruct.as("s")).schema("s").dataType
    val pType = right.select(pStruct.as("s")).schema("s").dataType

    val l = left.select(col(keyCol).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__isLeft"), rowStruct.as("__row"),
      lit(null).cast(pType).as("__p"))
    val r = right.select(col(keyCol).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__isLeft"), lit(null).cast(rowType).as("__row"),
      pStruct.as("__p"))

    // Right rows sort BEFORE left rows at equal timestamps (__isLeft
    // ascending), so a right row at exactly t is visible to a left row
    // at t — the inclusive as-of convention (matches DuckDB ASOF JOIN).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) ++
        payload.values.toSeq.map(a => col(s"__c.$a").as(a)): _*)
  }
}
