package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

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
    * The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects; sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]), and
    * the loader converts the resulting epoch-nanos long back to a proper
    * TimestampType with integral division (ns magnitudes overflow double
    * precision, so `div`, never `/`).
    */
  /** The TIMESTAMP(NANOS)→TimestampType conversion, shared with every
    * other reader of the raw events encoding (e.g. the streaming file
    * source in StreamingQueries) so the nanos contract lives in ONE
    * place.
    */
  def nanosToTimestamp(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      nanosToTimestamp(df)
    else df
  }

  /** Register every table as a temp view so `spark.sql` surfaces work
    * unmodified (SURVEY.md §7.4 item 7 — keep SQL general).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
