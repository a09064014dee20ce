package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (most-recent-prior) join: for every left row, attach the right
  * row with the greatest timestamp <= the left timestamp within the same
  * key — the time-series operator Spark famously lacks as a primitive.
  *
  * Implemented by composition (SURVEY preference (a)) rather than a
  * custom SparkPlan: tag and union both sides, then one window pass per
  * key ordered by (ts, side, tiebreak) carries the right side's latest
  * row forward. Cost is exactly one shuffle on the key and one sort —
  * identical to what a bespoke physical operator would pay — and the
  * window is codegen'd.
  *
  * All `valueCols` are carried as ONE struct per right row, so they are
  * always stitched from the SAME matched row, and a genuine NULL inside
  * that row survives (the struct itself is never NULL for a right row,
  * so `last(ignoreNulls)` skips left rows but not NULL fields). The
  * earlier per-column `last(ignoreNulls)` formulation got both of those
  * wrong.
  *
  * Equal timestamps match (`<=`, DuckDB/kdb ASOF semantics): the right
  * side sorts before the left at a tie via the side tag. Among right
  * rows sharing (key, ts), the one with the GREATEST `tiebreakCols`
  * (ascending window order → last wins) is matched, making the result
  * deterministic; with no tiebreak the choice is arbitrary, as in
  * DuckDB's native ASOF.
  */
object AsOfJoin {

  /** @param left         probe side (keeps all rows)
    * @param right        reference side (its `valueCols` are attached)
    * @param keyCols      equality keys present on both sides
    * @param leftTs       event-time column on the left
    * @param rightTs      event-time column on the right
    * @param valueCols    right-side columns to carry (attached with their
    *                     own names; NULL when no prior right row exists)
    * @param tiebreakCols right-side columns breaking equal-`rightTs` ties
    *                     deterministically (greatest wins); empty = arbitrary
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tiebreakCols: Seq[String] = Nil): DataFrame = {
    // Caller-supplied names go through col() backtick-quoted: bare
    // col("a.b") parses as a nested-field PATH and would resolve
    // wrongly (or fail) for a column whose name contains a dot.
    def q(c: String) = col(s"`${c.replace("`", "``")}`")
    val leftCols = left.columns.toSeq
    val internal = Set("_ts", "_side", "_row", "_asof") ++ tiebreakCols.map(c => s"_tb_$c")
    val clash = leftCols.filter(internal) ++ valueCols.filter(leftCols.contains)
    require(clash.isEmpty,
      s"asOf: left columns collide with internal/value names: ${clash.mkString(", ")} — " +
        "rename them before joining (internal names: _ts/_side/_row/_asof/_tb_*)")
    val payloadType = StructType(valueCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val tbCols = tiebreakCols.map(c => s"_tb_$c")
    // side 0 = right (sorts first at timestamp ties → <= semantics).
    // NULL-ts right rows are dropped: ASC sorts NULLS FIRST, so an
    // unfiltered NULL-timestamp row would sort before every left row
    // and become a phantom "prior" match — SQL ASOF semantics never
    // match a NULL timestamp.
    val taggedRight = right
      .filter(q(rightTs).isNotNull)
      .select(
      keyCols.map(q) ++
        Seq(q(rightTs).as("_ts"), lit(0).as("_side"),
          struct(valueCols.map(c => q(c).as(c)): _*).as("_row")) ++
        tiebreakCols.map(c => q(c).as(s"_tb_$c")): _*)
    val taggedLeft = left.select(
      leftCols.map(q) ++
        Seq(q(leftTs).as("_ts"), lit(1).as("_side"),
          lit(null).cast(payloadType).as("_row")): _*)
    // unionByName with allowMissingColumns fills the side-only columns
    // (left payload cols, right tiebreak cols) with NULLs.
    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(q): _*)
      // q(), not bare col(): a tiebreak column with a dot makes the
      // internal "_tb_a.b" name itself a path without quoting
      .orderBy(Seq(col("_ts").asc, col("_side").asc) ++ tbCols.map(q(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_row"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(q) ++
        // getField, not col("_asof.c"): the string form parses c as a
        // nested-field PATH, so a value column named "a.b" (or with a
        // backtick) would resolve wrongly or fail analysis
        valueCols.map(c => col("_asof").getField(c).as(c)): _*)
  }
}
