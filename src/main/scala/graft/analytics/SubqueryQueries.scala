package graft.analytics

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subquery and set-operator coverage (absent from the reference —
  * SURVEY §2.8 — but part of a complete SQL surface).
  *
  * The correlated scalar subquery is the interesting one: Catalyst
  * de-correlates it into an aggregate + join (visible as an extra
  * HashAggregate/Join pair in the plan), which is exactly the rewrite
  * you'd hand-write at scale — no RBO/driver-side loops.
  */
object SubqueryQueries {

  private def sql(q: String)(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(q)
  }

  /** One dialect-shared SQL string serving as BOTH the Spark query and
    * the DuckDB oracle — a single source of truth, so an edit can't
    * silently reach only one side of the gate.
    */
  private def sharedSql(name: String, q: String): NamedQuery =
    NamedQuery(name, Some(q), sql(q))

  val all: Seq[NamedQuery] = Seq(

    // TPC-H Q17 shape: per-part average quantity as a correlated scalar
    // subquery. Quantities are integer-valued doubles, so AVG is an
    // exact-sum division — the 0.5*avg threshold compares identically
    // across engines.
    sharedSql(
      "q19_scalar_subquery",
      """SELECT p_brand, count(*) AS n_small,
        |       ROUND(SUM(l_extendedprice), 2) AS small_qty_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = l_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // IN-subquery (Catalyst plans a left-semi join after de-correlation).
    sharedSql(
      "q34_in_subquery",
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    NamedQuery(
      "q35_intersect",
      Some("""SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'click'
             |INTERSECT
             |SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'
             |ORDER BY user_id, d""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
        e.filter(col("event_type") === "click").select("user_id", "d")
          .intersect(e.filter(col("event_type") === "purchase").select("user_id", "d"))
          .orderBy("user_id", "d")
      }),

    NamedQuery(
      "q36_except",
      Some("""SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'view'
             |EXCEPT
             |SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'error'
             |ORDER BY user_id, d""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
        e.filter(col("event_type") === "view").select("user_id", "d")
          .except(e.filter(col("event_type") === "error").select("user_id", "d"))
          .orderBy("user_id", "d")
      }),

    // CUBE: all grouping-set combinations; NULL ordering pinned both sides.
    sharedSql(
      "q37_cube",
      """SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
        |       ROUND(SUM(value), 2) AS sum_value
        |FROM events
        |WHERE user_id < 10
        |GROUP BY CUBE(event_type, d)
        |ORDER BY event_type ASC NULLS FIRST, d ASC NULLS FIRST""".stripMargin),

    // Approximate distinct (HLL++): the raw estimates are
    // sketch-dependent and can never hash-match across engines, so the
    // gate relation is an ERROR-BAND oracle instead: each engine
    // computes exact distinct + its OWN approx estimate and emits
    // whether the estimate lands within 10 % of exact (Spark's rsd is
    // pinned at 0.02, 5σ of headroom). Both sides agree on (group,
    // exact, true) iff both sketches are sane — a real cross-engine
    // correctness check, not a rows-only count.
    NamedQuery(
      "q38_approx_distinct",
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS exact_users,
             |  (abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
             |       - count(DISTINCT user_id))
             |     <= 0.10 * count(DISTINCT user_id)) AS users_ok,
             |  count(DISTINCT props) AS exact_props,
             |  (abs(CAST(approx_count_distinct(props) AS DOUBLE)
             |       - count(DISTINCT props))
             |     <= 0.10 * count(DISTINCT props)) AS props_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).as("exact_users"),
            approx_count_distinct("user_id", 0.02).as("_au"),
            countDistinct(col("props")).as("exact_props"),
            approx_count_distinct("props", 0.02).as("_ap"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("_au").cast("double") - col("exact_users")) <=
              lit(0.10) * col("exact_users")).as("users_ok"),
            col("exact_props"),
            (abs(col("_ap").cast("double") - col("exact_props")) <=
              lit(0.10) * col("exact_props")).as("props_ok"))
          .orderBy("event_type"))
  )
}
