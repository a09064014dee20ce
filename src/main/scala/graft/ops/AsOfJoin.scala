package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: for every left row, attach the right
  * row with the greatest timestamp <= the left timestamp within the same
  * key — the time-series operator Spark famously lacks as a primitive.
  *
  * Implemented by composition (SURVEY preference (a)) rather than a
  * custom SparkPlan: tag and union both sides, then one window pass per
  * key ordered by (ts, side) carries the right side's latest values
  * forward with `last_value(ignoreNulls)`. Cost is exactly one shuffle
  * on the key and one sort — identical to what a bespoke physical
  * operator would pay — and the window is codegen'd.
  *
  * Equal timestamps match (`<=`, DuckDB/kdb ASOF semantics): the right
  * side sorts before the left at a tie via the side tag.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side (its `valueCols` are attached)
    * @param keyCols   equality keys present on both sides
    * @param leftTs    event-time column on the left
    * @param rightTs   event-time column on the right
    * @param valueCols right-side columns to carry (attached with their
    *                  own names; NULL when no prior right row exists)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right (sorts first at timestamp ties → <= semantics)
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        valueCols.map(c => col(c).as(s"_v_$c")): _*)
    val taggedLeft = left.select(
      (leftCols.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")): _*)
    // unionByName with allowMissingColumns fills the left-only columns
    // on the right side with NULLs.
    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"_asof_$c", last(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_asof_$c").as(c)): _*)
  }
}
