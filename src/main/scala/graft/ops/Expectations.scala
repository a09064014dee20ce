package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Great-Expectations /
  * dbt-test idea as an engine operator): a checklist of column and
  * relationship contracts evaluated into ONE violations report — the
  * gate a pipeline runs before publishing a partition, and the other
  * half of profiling ([[Stats.columnProfile]] describes what IS;
  * expectations assert what MUST BE).
  *
  * Scale shape: every row-local check (`NotNull`, `InRange`,
  * `Accepted`, `Matches`) compiles to ONE shared aggregation pass over
  * the table — one conditional-sum column per check, map-side
  * combined, so ten checks cost one scan, not ten. `Unique` adds one
  * hash aggregation on its key; `ForeignKey` one left-anti join
  * against the (distinct) reference keys. Nothing collects; the
  * report is checks-scale.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** ≤ `maxNullFrac` of rows may be NULL (0.0 = strictly required).
    * The tolerance is part of the check's NAME when non-zero, so the
    * same column can carry checks at several thresholds without the
    * report rows colliding.
    */
  case class NotNull(col: String, maxNullFrac: Double = 0.0) extends Check {
    val name =
      if (maxNullFrac > 0) s"not_null($col, $maxNullFrac)"
      else s"not_null($col)"
  }

  /** Non-null values must lie in [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($col, $lo, $hi)"
  }

  /** Non-null values must be one of the accepted literals. */
  case class Accepted(col: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, "Accepted: empty value list")
    val name = s"accepted($col)"
  }

  /** Non-null values must fully match the (Java/RE2-compatible)
    * regex.
    */
  case class Matches(col: String, pattern: String) extends Check {
    val name = s"matches($col)"
  }

  /** The column tuple must be unique across rows. */
  case class Unique(cols: Seq[String]) extends Check {
    require(cols.nonEmpty, "Unique: empty column list")
    val name = s"unique(${cols.mkString(", ")})"
  }

  /** Every non-null key tuple must exist in `ref` (referential
    * integrity; `ref` is typically a dimension — the anti-join
    * broadcasts when it is small).
    */
  case class ForeignKey(cols: Seq[String], ref: DataFrame,
      refCols: Seq[String], refName: String) extends Check {
    require(cols.nonEmpty && cols.length == refCols.length,
      "ForeignKey: key/ref column lists must be non-empty and same-length")
    val name = s"foreign_key(${cols.mkString(", ")} -> $refName)"
  }

  /** Evaluate all checks: one row per check —
    * `check, n_rows, n_violations, pass`. Row-local checks share one
    * aggregation pass; violations count ROWS that break the contract
    * (for `Unique`, rows beyond the first of each duplicated key).
    */
  /** The one-pass shared aggregation for every row-local check:
    * `(total rows, (check name, violation count)*)`. Violation counts
    * are ADDITIVE across row disjoint slices — the property the
    * streaming monitor ([[graft.streaming.ExpectationsStream]]) leans
    * on: per-micro-batch counts re-sum to the batch pass's exactly.
    */
  private def rowLocalCounts(
      df: DataFrame, checks: Seq[Check]): (Long, Seq[(String, Long)]) = {
    val rowLocal = checks.collect {
      case c: NotNull => c.name ->
        sum(col(c.col).isNull.cast("long")).as(c.name)
      case c: InRange => c.name ->
        sum((col(c.col).isNotNull &&
          !col(c.col).cast("double").between(c.lo, c.hi)).cast("long"))
          .as(c.name)
      case c: Accepted => c.name ->
        sum((col(c.col).isNotNull &&
          !col(c.col).cast("string").isin(c.values: _*)).cast("long"))
          .as(c.name)
      case c: Matches => c.name ->
        sum((col(c.col).isNotNull &&
          !col(c.col).cast("string").rlike("^(?:" + c.pattern + ")$"))
          .cast("long")).as(c.name)
    }
    val aggCols = count(lit(1)).as("_ex_n") +: rowLocal.map(_._2)
    val one = df.agg(aggCols.head, aggCols.tail: _*).head()
    // an EMPTY slice leaves conditional sums NULL — they must read as
    // 0 so appended micro-batch rows stay summable
    (one.getAs[Long]("_ex_n"),
      rowLocal.map { case (nm, _) =>
        nm -> (if (one.isNullAt(one.fieldIndex(nm))) 0L
               else one.getAs[Long](nm))
      })
  }

  def isRowLocal(c: Check): Boolean = c match {
    case _: Unique | _: ForeignKey => false
    case _ => true
  }

  /** Row-local checks as the tidy ADDITIVE relation
    * `(check, n_rows, n_violations)` — the per-micro-batch unit of the
    * streaming monitor. `Unique`/`ForeignKey` are refused: they are
    * global contracts (a duplicate can pair ACROSS micro-batches, a
    * key missing now may arrive later) and stay batch-only by design.
    */
  def rowLocalReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "rowLocalReport: empty checklist")
    // same guard as validate(): two same-named checks would append two
    // rows per micro-batch under one name and readReport's re-sum
    // would silently double that check's totals
    require(checks.map(_.name).distinct.length == checks.length,
      s"rowLocalReport: duplicate check names — ${checks.map(_.name).diff(checks.map(_.name).distinct).distinct.mkString(", ")}")
    val global = checks.filterNot(isRowLocal)
    require(global.isEmpty,
      s"rowLocalReport: global checks are batch-only — ${global.map(_.name).mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val (nRows, local) = rowLocalCounts(df, checks)
    val byName = local.toMap
    checks.map(c => (c.name, nRows, byName(c.name)))
      .toDF("check", "n_rows", "n_violations")
  }

  /** Re-sum an appended [[rowLocalReport]] dir (the streaming monitor's
    * sink) into the [[validate]]-shaped report: totals per check, pass
    * judged against the checklist's thresholds over the TOTALS — so
    * stream-built ≡ batch-built row for row (counts are additive;
    * ExpectationsSpec pins it). Checklist order preserved.
    */
  def readReport(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      checks: Seq[Check]): DataFrame = {
    import spark.implicits._
    val totals = spark.read.parquet(path)
      .groupBy("check")
      .agg(sum("n_rows").as("n_rows"), sum("n_violations").as("n_violations"))
    val meta = checks.zipWithIndex.map { c =>
      (c._1.name, c._2,
        c._1 match { case n: NotNull => n.maxNullFrac; case _ => 0.0 })
    }.toDF("check", "_ex_ord", "_ex_frac")
    // LEFT from the checklist: a check no appended batch has covered
    // yet (e.g. the list was extended after the monitor started) must
    // surface as an explicit zero-observation row, not silently vanish
    // — n_rows = 0 is the "never observed" signal (vacuously passing)
    meta.join(totals, Seq("check"), "left")
      .select(col("check"), col("_ex_ord"), col("_ex_frac"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
      .withColumn("pass",
        col("n_violations").cast("double") <= col("_ex_frac") * col("n_rows"))
      .orderBy("_ex_ord")
      .select("check", "n_rows", "n_violations", "pass")
  }

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate: empty checklist")
    require(checks.map(_.name).distinct.length == checks.length,
      s"validate: duplicate check names — ${checks.map(_.name).diff(checks.map(_.name).distinct).distinct.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val (nRows, local) = rowLocalCounts(df, checks)
    val heavy = checks.collect {
      case c: Unique =>
        val dups = df.groupBy(c.cols.map(col): _*)
          .agg(count(lit(1)).as("_ex_c"))
          .agg(coalesce(sum(col("_ex_c") - 1), lit(0L)))
          .head().getLong(0)
        c.name -> dups
      case c: ForeignKey =>
        val keys = df.select(c.cols.map(col): _*)
          .na.drop("any", c.cols)
        val ref = c.ref.selectExpr(
          c.refCols.zip(c.cols).map { case (r, k) => s"$r AS $k" }: _*)
          .distinct()
        c.name -> keys.join(ref, c.cols, "left_anti").count()
    }
    // preserve the checklist's order in the report
    val byName = (local ++ heavy).toMap
    val thresholds = checks.collect {
      case c: NotNull => c.name -> (c.maxNullFrac * nRows)
    }.toMap
    checks.map { c =>
      val v = byName(c.name)
      val limit = thresholds.getOrElse(c.name, 0.0)
      (c.name, nRows, v, v <= limit)
    }.toDF("check", "n_rows", "n_violations", "pass")
  }
}
