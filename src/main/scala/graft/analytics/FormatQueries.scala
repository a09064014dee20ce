package graft.analytics

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: JSON and CSV round-trips
  * (write → schema'd read → aggregate), oracle-checked against the
  * original table — i.e. the gate proves the round-trip is lossless for
  * the projected columns. Map-typed JSON parsing covers the semi-
  * structured column surface (the reference's `props`-style payloads).
  */
object FormatQueries {

  val all: Seq[NamedQuery] = Seq(

    // JSON sink + schema'd JSON source (the raw-zone format, exercised
    // here outside the Telegram pipeline): project → write JSON → read
    // with explicit schema → aggregate. Timestamps ride as epoch micros
    // (JSON has no timestamp type — make the contract explicit).
    NamedQuery(
      "q53_json_roundtrip",
      Some("""SELECT event_type, count(*) AS n,
             |       ROUND(SUM(value), 2) AS sum_value
             |FROM events WHERE user_id < 20
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        // Deterministic staging path + overwrite mode: repeated runs
        // replace instead of leaking a new copy into /tmp each time.
        val out = s"${sys.props("java.io.tmpdir")}/graft_stage/json_rt_${Integer.toHexString(dir.hashCode)}"
        Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("event_type"), col("value"))
          .write.mode("overwrite").json(out)
        val schema = StructType(Seq(
          StructField("event_type", StringType), StructField("value", DoubleType)))
        s.read.schema(schema).json(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .orderBy("event_type")
      }),

    // CSV sink + source with header and explicit schema.
    NamedQuery(
      "q54_csv_roundtrip",
      Some("""SELECT l_returnflag, count(*) AS n,
             |       ROUND(SUM(l_quantity), 2) AS total_qty
             |FROM lineitem WHERE l_suppkey < 20
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) => {
        val out = s"${sys.props("java.io.tmpdir")}/graft_stage/csv_rt_${Integer.toHexString(dir.hashCode)}"
        Tables.load(s, dir, "lineitem")
          .filter(col("l_suppkey") < 20)
          .select(col("l_returnflag"), col("l_quantity"))
          .write.mode("overwrite").option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("l_returnflag", StringType), StructField("l_quantity", DoubleType)))
        s.read.schema(schema).option("header", "true").csv(out)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("total_qty"))
          .orderBy("l_returnflag")
      }),

    // ORC sink + source (columnar alternative to parquet — Spark ships a
    // native vectorized ORC reader). Same lossless-round-trip contract as
    // q53/q54: the oracle aggregates the ORIGINAL parquet table, so a
    // value mangled by the ORC write/read would hash-mismatch.
    NamedQuery(
      "q89_orc_roundtrip",
      Some("""SELECT lang, source, count(*) AS n,
             |       ROUND(AVG(n_chars), 4) AS avg_chars
             |FROM documents WHERE n_chars >= 100
             |GROUP BY lang, source ORDER BY lang, source""".stripMargin),
      (s, dir) => {
        val out = s"${sys.props("java.io.tmpdir")}/graft_stage/orc_rt_${Integer.toHexString(dir.hashCode)}"
        Tables.load(s, dir, "documents")
          .filter(col("n_chars") >= 100)
          .select(col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out) // ORC embeds the schema — no explicit one needed
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n"), round(avg("n_chars"), 4).as("avg_chars"))
          .orderBy("lang", "source")
      }),

    // Semi-structured → typed map: from_json to map<string,bigint>, then
    // map functions (keys, element_at). Every event's props is {"k": n}.
    NamedQuery(
      "q55_map_funcs",
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
             |       count(*) AS n
             |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select(from_json(col("props"), MapType(StringType, LongType)).as("m"))
          .select((element_at(col("m"), "k") % 10).as("k_mod"))
          .groupBy("k_mod")
          .agg(count(lit(1)).as("n"))
          .orderBy("k_mod"))
  )
}
