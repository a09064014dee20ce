package graft.analytics

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join / analytical surface the harness tests beyond the reference
  * (SURVEY.md §2.8: the reference has no joins because it has one table,
  * but the engine must support them first-class).
  *
  * Scale notes (100 TB design):
  *   - Dimension tables (region/nation/customer/supplier/part) are tiny
  *     relative to the facts — every dim join is `broadcast()`, so the
  *     only shuffles are the aggregation exchanges on the group keys.
  *   - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; at
  *     cluster scale these would be bucketed on orderkey to make the
  *     exchange a no-op. AQE handles skew re-splitting at runtime.
  *   - Floating aggregates are ROUNDed at a digit count that clears the
  *     data's decimal grid (prices have 2 decimals, discount/tax 2, so
  *     products have ≤4) — summation-order fp noise can't flip them.
  */
object JoinQueries {

  private def t(name: String)(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[NamedQuery] = Seq(

    // TPC-H Q1-shaped pricing summary: scan-heavy partial aggregation.
    NamedQuery(
      "q10_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
             |       ROUND(SUM(l_quantity), 2) AS sum_qty,
             |       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             |       ROUND(AVG(l_quantity), 4) AS avg_qty,
             |       ROUND(AVG(l_discount), 4) AS avg_disc,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) =>
        t("lineitem")(s, dir)
          .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q5-shaped star join: fact ⋈ fact shuffle, dims broadcast.
    NamedQuery(
      "q11_revenue_by_region",
      Some("""SELECT r_name, n_name,
             |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin),
      (s, dir) => {
        val li = t("lineitem")(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        val o = t("orders")(s, dir).select("o_orderkey", "o_custkey")
        val c = t("customer")(s, dir).select("c_custkey", "c_nationkey")
        val n = t("nation")(s, dir).select("n_nationkey", "n_name", "n_regionkey")
        val r = t("region")(s, dir).select("r_regionkey", "r_name")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      }),

    // TPC-H Q10-shaped top-k by computed aggregate; the sort key is the
    // ROUNDed revenue with custkey tiebreak so the top-20 cut is stable.
    NamedQuery(
      "q12_top_customers",
      Some("""SELECT c_custkey, c_name,
             |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      (s, dir) => {
        val c = t("customer")(s, dir).select("c_custkey", "c_name")
        val o = t("orders")(s, dir).select("o_orderkey", "o_custkey")
        val li = t("lineitem")(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      }),

    // EXISTS → left_semi: no columns from the right side, no row blowup.
    NamedQuery(
      "q13_semi_join",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val c = t("customer")(s, dir)
        val big = t("orders")(s, dir).filter(col("o_totalprice") > 400000)
        c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      }),

    // NOT EXISTS → left_anti: parts with no large-quantity shipment. The
    // filter on the right side runs before the join, shrinking the build.
    NamedQuery(
      "q14_anti_join",
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_partkey = p_partkey AND l_quantity > 48)
             |ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        val p = t("part")(s, dir)
        val li = t("lineitem")(s, dir)
          .filter(col("l_quantity") > 48).select("l_partkey")
        p.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
          .select("p_partkey", "p_name")
          .orderBy("p_partkey")
      }),

    // Window top-N per group: partitioned row_number with full tiebreak
    // (totalprice values recur, orderkey is unique) — deterministic.
    NamedQuery(
      "q15_window_topn",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
             |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
             |  FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t("orders")(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      }),

    // DISTINCT aggregate: expands to a two-stage aggregation in Spark.
    NamedQuery(
      "q16_distinct_agg",
      Some("""SELECT event_type,
             |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
             |       count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) =>
        t("events")(s, dir)
          .groupBy("event_type")
          .agg(countDistinct("user_id").as("distinct_users"), count(lit(1)).as("n"))
          .orderBy("event_type")),

    // HAVING → post-aggregation filter.
    NamedQuery(
      "q17_having",
      Some("""SELECT l_suppkey, count(*) AS n, ROUND(SUM(l_quantity), 2) AS total_qty
             |FROM lineitem GROUP BY l_suppkey
             |HAVING count(*) >= 550 ORDER BY l_suppkey""".stripMargin),
      (s, dir) =>
        t("lineitem")(s, dir)
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("total_qty"))
          .filter(col("n") >= 550)
          .orderBy("l_suppkey")),

    // ROLLUP: hierarchical subtotals; NULL ordering pinned on both sides
    // (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST — spell it out).
    {
      // Through the SQL front end: DataFrame `.rollup` on post-join
      // columns trips Spark's ambiguous-self-join analyzer; the SQL
      // planner produces the identical Expand + HashAggregate plan.
      // One dialect-shared string = Spark query AND oracle (no drift).
      val q18 =
        """SELECT r_name, n_name, count(*) AS n_customers,
          |       ROUND(SUM(c_acctbal), 2) AS total_acctbal
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin
      NamedQuery(
        "q18_rollup",
        Some(q18),
        (s, dir) => {
          Tables.registerViews(s, dir)
          s.sql(q18)
        })
    }
  )
}
