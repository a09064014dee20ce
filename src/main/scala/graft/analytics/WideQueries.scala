package graft.analytics

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Salting

/** Breadth coverage: reshaping (pivot/unpivot), order statistics,
  * scalar-string surface, array aggregation, and the salted-aggregation
  * operator — whose oracle is the PLAIN group-by, making semantic
  * transparency of the skew mitigation a gate-checked property.
  */
object WideQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[NamedQuery] = Seq(

    // Window-function frame surface in one query: row_number, lead,
    // first_value, cumulative ROWS frame, bounded moving frame. Ties
    // broken by event_id everywhere; running sums of 2-decimal values
    // round safely at 2.
    {
      // one dialect-shared string = Spark query AND oracle (no drift)
      val q56 =
        """SELECT user_id, event_id,
          |  CAST(row_number() OVER w AS BIGINT) AS rn,
          |  lead(event_type) OVER w AS next_type,
          |  first_value(event_type) OVER w AS first_type,
          |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
          |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
          |FROM events WHERE user_id < 5
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |ORDER BY user_id, rn""".stripMargin
      NamedQuery(
        "q56_window_frames",
        Some(q56),
        (s, dir) => {
          Tables.registerViews(s, dir)
          s.sql(q56)
        })
    },

    // Time-based RANGE frame (q56 covers ROWS frames): per user, the
    // trailing-1-hour sum of value — the sliding-window aggregate shape
    // of rate limiting / rolling revenue. Both engines order on
    // FLOORED epoch seconds (event timestamps carry microseconds;
    // truncation is the shared grid — Spark's long cast truncates,
    // DuckDB's epoch() keeps the fraction). A RANGE frame includes all
    // peers of the current second, so within-second order is irrelevant
    // to the SUM and the result is deterministic.
    NamedQuery(
      "q73_range_window",
      Some("""SELECT user_id, event_id,
             |  ROUND(SUM(value) OVER (PARTITION BY user_id
             |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS trailing_1h
             |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").cast("long"))
          .rangeBetween(-3600, 0)
        Tables.load(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_id"),
            round(sum(col("value")).over(w), 2).as("trailing_1h"))
          .orderBy("event_id")
      }),

    // The Presto date_format dialect surface against an INDEPENDENT
    // engine's formatter: every directive both Presto and DuckDB
    // define, one formatted column, hash-compared (the remaining
    // no-pad/fractional directives %c %e %k %l %f have no DuckDB
    // equivalent and are property-tested against java.time in
    // PrestoCompatSpec instead).
    NamedQuery(
      "q71_presto_datefmt",
      Some("""SELECT event_id,
             |  strftime(ts, '%Y-%m-%d %H:%M:%S|%p|%I|%A|%a|%B|%b|%j|%y|%H:%M:%S|x%%') AS fmt
             |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(col("event_id") < 2000)
          .select(col("event_id"),
            graft.pipeline.PrestoCompat.prestoDateFormat(col("ts"),
              "%Y-%m-%d %H:%i:%s|%p|%I|%W|%a|%M|%b|%j|%y|%T|x%%").as("fmt"))
          .orderBy("event_id")),

    // As-of join: every purchase matched to the user's most recent prior
    // (<=) click — Spark-side by window composition (ops.AsOfJoin),
    // oracle-side by DuckDB's native ASOF JOIN. Epoch-second casts keep
    // the comparison on the engines' shared grid.
    NamedQuery(
      "q58_asof_join",
      // Arg-max oracle, not DuckDB's native ASOF: at equal click
      // timestamps ASOF's pick is arbitrary on BOTH engines, so the
      // gate pins the tie explicitly — latest ts, then highest
      // event_id — and the Spark side passes the same tiebreak.
      Some("""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT * FROM events WHERE event_type = 'click'),
             |j AS (SELECT p.event_id pid, c.ts cts, c.value cv,
             |        row_number() OVER (PARTITION BY p.event_id
             |          ORDER BY c.ts DESC, c.event_id DESC) rn
             |      FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
             |SELECT p.event_id, p.user_id,
             |  CAST(epoch_us(p.ts) // 1000000 AS BIGINT) AS purchase_sec,
             |  CAST(epoch_us(j.cts) // 1000000 AS BIGINT) AS click_sec,
             |  ROUND(j.cv, 2) AS click_value
             |FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON p.event_id = j.pid
             |ORDER BY p.event_id""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_eid"),
            col("ts").cast("long").as("click_sec"), col("value").as("click_value"))
        graft.ops.AsOfJoin.asOf(purchases, clicks,
            keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("click_sec", "click_value"),
            tiebreakCols = Seq("click_eid"))
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("purchase_sec"),
            col("click_sec"), round(col("click_value"), 2).as("click_value"))
          .orderBy("event_id")
      }),

    // Bucketed range join: per purchase, the same user's clicks within
    // ±4 h — written as the |Δts| <= tol predicate the oracle states
    // directly, executed as ops.RangeJoin's binned equi-join (3× left
    // replication to adjacent tolerance-wide bins + exact filter) so
    // the plan is a shuffled hash/merge join, never a nested loop.
    NamedQuery(
      "q130_range_join",
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |        epoch_us(ts) // 1000000 AS sec FROM events)
             |SELECT p.event_id, count(*) AS n_clicks,
             |  CAST(min(c.sec - p.sec) AS BIGINT) AS closest_lead
             |FROM e p JOIN e c ON p.user_id = c.user_id
             |  AND p.event_type = 'purchase' AND c.event_type = 'click'
             |  AND abs(p.sec - c.sec) <= 14400
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("sec", col("ts").cast("long"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "sec")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("sec").as("c_sec"))
        graft.ops.RangeJoin.byBucket(purchases, clicks,
            keyCols = Seq("user_id"), leftTs = "sec", rightTs = "c_sec",
            tolerance = 14400L)
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_clicks"),
            min(col("c_sec") - col("sec")).as("closest_lead"))
          .orderBy("event_id")
      }),

    // NULL-handling scalar surface: coalesce / nullif / CASE-null
    // interplay, on synthesized nulls (the tables are null-free).
    NamedQuery(
      "q57_null_funcs",
      Some("""SELECT doc_id,
             |  COALESCE(NULLIF(lang, 'en'), 'default') AS lang_or_default,
             |  CAST(COALESCE(NULLIF(n_chars, 157), 0) AS BIGINT) AS chars_or_zero,
             |  CASE WHEN NULLIF(source, 'src0') IS NULL THEN 'primary' ELSE 'other' END AS source_class
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            coalesce(nullif(col("lang"), lit("en")), lit("default")).as("lang_or_default"),
            coalesce(nullif(col("n_chars"), lit(157)), lit(0)).cast("long").as("chars_or_zero"),
            when(nullif(col("source"), lit("src0")).isNull, "primary")
              .otherwise("other").as("source_class"))
          .orderBy("doc_id")),

    // PIVOT: long → wide crosstab. Oracle spells it as FILTERed counts
    // (portable); Spark uses the real pivot operator with pinned values
    // (never let pivot infer values from data — that's an extra job and
    // nondeterministic column order).
    NamedQuery(
      "q44_pivot",
      Some(s"""SELECT CAST(ts AS DATE) AS d,
              |  ${EventTypes.map(t =>
                 s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t")
                 .mkString(",\n  ")}
              |FROM events GROUP BY 1 ORDER BY d""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .pivot("event_type", EventTypes)
          .agg(count(lit(1)))
          .na.fill(0L, EventTypes)
          .orderBy("d")),

    // UNPIVOT: wide → long melt, then aggregate the melted metric.
    NamedQuery(
      "q45_unpivot",
      Some("""WITH u AS (
             |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
             |)
             |SELECT metric, count(*) AS n, ROUND(SUM(value), 2) AS total
             |FROM u GROUP BY metric ORDER BY metric""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .unpivot(Array(col("l_orderkey")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "value")
          .groupBy("metric")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy("metric")),

    // Exact percentiles (linear interpolation on the sorted multiset —
    // Spark `percentile` ≡ DuckDB `quantile_cont`).
    NamedQuery(
      "q46_percentile",
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
          .orderBy("l_returnflag")),

    // Scalar string surface: upper/substr/trim/concat/lpad/replace.
    NamedQuery(
      "q47_string_funcs",
      Some("""SELECT doc_id,
             |  upper(substr(text, 1, 10)) AS head_upper,
             |  CAST(length(trim(text)) AS BIGINT) AS trimmed_len,
             |  concat(lang, '_', source) AS lang_source,
             |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
             |  replace(substr(text, 1, 20), ' ', '_') AS head_snake
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            upper(substring(col("text"), 1, 10)).as("head_upper"),
            length(trim(col("text"))).cast("long").as("trimmed_len"),
            concat(col("lang"), lit("_"), col("source")).as("lang_source"),
            lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
            call_function("replace", substring(col("text"), 1, 20), lit(" "), lit("_")).as("head_snake"))
          .orderBy("doc_id")),

    // Array aggregation (sorted, stringified for a type-stable compare)
    // + conditional aggregate.
    NamedQuery(
      "q48_array_agg",
      Some("""SELECT user_id,
             |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
             |  CAST(count(*) FILTER (WHERE value > 10.0) AS BIGINT) AS n_big
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg(
            concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
            sum(when(col("value") > 10.0, 1).otherwise(0)).cast("long").as("n_big"))
          .orderBy("user_id")),

    // TPC-H Q6 shape: the pure-pushdown forecast query — every predicate
    // reaches the parquet scan, the aggregate is a single partial/final
    // pair over the surviving rows. discount×price products have 4
    // decimals → ROUND(,4) is exact-grid-safe.
    NamedQuery(
      "q51_selective_revenue",
      Some("""SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n"))),

    // Event funnel: users progressing view → click → purchase by first-
    // occurrence ordering — conditional min-timestamps per user, then
    // stage predicates. One shuffle on user_id.
    NamedQuery(
      "q52_funnel",
      Some("""WITH f AS (
             |  SELECT user_id,
             |    min(ts) FILTER (WHERE event_type = 'view') AS t_view,
             |    min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             |    min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
             |  FROM events GROUP BY user_id
             |)
             |SELECT count(*) AS n_users,
             |  CAST(count(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS viewed,
             |  CAST(count(*) FILTER (WHERE t_view < t_click) AS BIGINT) AS then_clicked,
             |  CAST(count(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase) AS BIGINT) AS then_purchased
             |FROM f""".stripMargin),
      (s, dir) => {
        val f = Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            min(when(col("event_type") === "click", col("ts"))).as("t_click"),
            min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        f.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("t_view").isNotNull, 1).otherwise(0)).cast("long").as("viewed"),
          sum(when(col("t_view") < col("t_click"), 1).otherwise(0)).cast("long").as("then_clicked"),
          sum(when(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"), 1)
            .otherwise(0)).cast("long").as("then_purchased"))
      }),

    // Salted two-phase aggregation: the oracle is the PLAIN group-by —
    // the gate proves the skew path changes performance shape, never
    // results. (Sums rounded: the salted summation tree differs.)
    NamedQuery(
      "q49_salted_agg",
      Some("""SELECT l_suppkey, count(*) AS n, ROUND(SUM(l_quantity), 2) AS total_qty,
             |       ROUND(MIN(l_extendedprice), 2) AS min_price,
             |       ROUND(MAX(l_extendedprice), 2) AS max_price
             |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      (s, dir) =>
        Salting.saltedAggregate(
            Tables.load(s, dir, "lineitem"),
            keys = Seq("l_suppkey"),
            saltBy = Seq("l_orderkey", "l_linenumber"),
            salt = 16,
            counts = Seq("n"),
            sums = Seq("total_qty" -> "l_quantity"),
            mins = Seq("min_price" -> "l_extendedprice"),
            maxs = Seq("max_price" -> "l_extendedprice"))
          .select(col("l_suppkey"), col("n"),
            round(col("total_qty"), 2).as("total_qty"),
            round(col("min_price"), 2).as("min_price"),
            round(col("max_price"), 2).as("max_price"))
          .orderBy("l_suppkey")),

    // Key-skew diagnostic — the report that decides whether a key needs
    // q49's salting / AQE skew handling: counts, heaviest-key share,
    // top-10 share, exact Gini over the key-count distribution. The
    // only corpus-scale exchange is the map-side-combined count; ranks
    // come from the two-phase contiguousIndex, never a global window.
    NamedQuery(
      "q142_key_skew_report",
      Some("""WITH c AS (SELECT user_id, count(*) cnt FROM events GROUP BY user_id),
             |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) rk FROM c),
             |a AS (SELECT CAST(sum(cnt) AS BIGINT) t, CAST(count(*) AS BIGINT) nk,
             |        CAST(max(cnt) AS BIGINT) mx, sum(cnt * rk) rw FROM r),
             |tp AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) topc FROM
             |        (SELECT cnt FROM c ORDER BY cnt DESC, user_id DESC LIMIT 10))
             |SELECT t AS n_rows, nk AS n_keys, mx AS max_count,
             |  ROUND(CAST(mx AS DOUBLE) / t, 6) AS max_share,
             |  ROUND(CAST(topc AS DOUBLE) / t, 6) AS top10_share,
             |  ROUND(2.0 * rw / CAST(nk * t AS DOUBLE)
             |    - CAST(nk + 1 AS DOUBLE) / CAST(nk AS DOUBLE), 6) AS gini
             |FROM a, tp""".stripMargin),
      (s, dir) =>
        Salting.keySkewReport(Tables.load(s, dir, "events"), "user_id",
          topK = 10))
  )
}
