package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming vs batch equivalence on sf0.001: the streaming operators
  * must compute exactly what their batch window-function formulations
  * compute (the DuckDB oracle checks the batch side at sf0.01; this
  * suite closes the streaming≡batch loop in-engine).
  */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming sessionization (flatMapGroupsWithState) ≡ batch lag/cumsum sessionization") {
    val streamed = graft.analytics.StreamingQueries.all
      .find(_.name == "q33_sessionization").get
      .build(spark, TestSpark.Sf001)
      .collect().map(_.toSeq).toSet

    val batch = graft.analytics.StreamingQueries
      .batchSessionize(Tables.load(spark, TestSpark.Sf001, "events"))
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
  }

  test("streaming hourly rollup ≡ batch date_trunc group-by") {
    val streamed = graft.analytics.StreamingQueries.all
      .find(_.name == "q32_stream_hourly").get
      .build(spark, TestSpark.Sf001)
      .collect().map(_.toSeq).toSet
    val batch = Tables.load(spark, TestSpark.Sf001, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }
}
