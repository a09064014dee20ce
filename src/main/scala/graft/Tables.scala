package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalog over the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's Athena-external-table pattern
  * (ipynb:732–750): a fixed set of named tables over partition-discovered
  * columnar files, registered for SQL access. Here the "catalog" is a
  * directory of parquet files; `registerViews` is the analog of the
  * `CREATE EXTERNAL TABLE` DDL.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table. Scans stay columnar + vectorized; Catalyst pushes
    * filters/projections into the parquet reader.
    *
    * The events table's `ts` physical encoding has varied across data
    * generations: parquet TIMESTAMP(NANOS) (read as an epoch-nanos long
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, see [[Sessions]])
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ). [[normalizeTs]] maps every encoding to one engine
    * contract — `TimestampType` carrying the same UTC wall-clock the
    * oracle sees — so no consumer ever branches on the source encoding.
    */
  /** Normalize any `ts` encoding to TimestampType, shared with every
    * other reader of the raw events encoding (e.g. the streaming stage
    * in StreamingQueries) so the encoding contract lives in ONE place.
    *   - epoch-nanos long (legacy TIMESTAMP(NANOS) data): integral div
    *     to micros (ns magnitudes overflow double precision, so `div`,
    *     never `/`), then `timestamp_micros`.
    *   - TIMESTAMP_NTZ (TIMESTAMP(MICROS, isAdjustedToUTC=false) data):
    *     cast to TimestampType; the session timezone is pinned UTC, so
    *     the wall clock is preserved — exactly DuckDB's reading of the
    *     same naive column.
    *   - TimestampType (our own staged rewrites): pass through.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Register every table as a temp view so `spark.sql` surfaces work
    * unmodified (SURVEY.md §7.4 item 7 — keep SQL general).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
