package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** General analytics over the TPC-H-style testdata tables — the engine is
  * an analytics engine, not only a text engine: multi-way broadcast +
  * shuffle joins, windowed ranking, semi-joins and skewed-key aggregation,
  * each with a DuckDB oracle.
  *
  * Money sums are accumulated as exact BIGINT cents (per-row rounding) so
  * the result is independent of float summation order — a distributed sum
  * of raw doubles diverges from any sequential oracle at ~1e-9 relative,
  * which a round(..., 4) cannot absorb at 1e8 magnitudes.
  */
private[graft] object SparkEntryTpch {

  // shared per-session view/table registry (see SparkEntry.registerView)
  private def views(spark: SparkSession, dir: String, names: String*): Unit =
    SparkEntry.views(spark, dir, names: _*)

  /** Dialect-shared SQL (identical text runs on Spark and DuckDB). */
  private val PricingSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100
           AS sum_disc
       FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  private val RegionRevenueSql =
    """SELECT r_name, c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, c_mktsegment
       ORDER BY r_name, c_mktsegment"""

  private val TopCustomersSql =
    """WITH spend AS (
         SELECT c_custkey, n_name,
                sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY c_custkey, n_name),
       ranked AS (
         SELECT n_name, c_custkey, cents,
                row_number() OVER (PARTITION BY n_name
                                   ORDER BY cents DESC, c_custkey) AS rk
         FROM spend)
       SELECT n_name, rk, c_custkey, CAST(cents AS DOUBLE) / 100 AS spend
       FROM ranked WHERE rk <= 3
       ORDER BY n_name, rk"""

  private val OrderPrioritySql =
    """SELECT o_orderpriority, count(*) AS n
       FROM orders
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  private val tables = Seq("lineitem", "orders", "customer", "nation", "region")

  def tpchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_pricing" -> ((s: SparkSession, dir: String) => {
      views(s, dir, tables: _*); s.sql(PricingSql)
    }),
    "q_tpch_region_revenue" -> ((s: SparkSession, dir: String) => {
      views(s, dir, tables: _*); s.sql(RegionRevenueSql)
    }),
    "q_tpch_top_customers" -> ((s: SparkSession, dir: String) => {
      views(s, dir, tables: _*); s.sql(TopCustomersSql)
    }),
    "q_tpch_order_priority" -> ((s: SparkSession, dir: String) => {
      views(s, dir, tables: _*); s.sql(OrderPrioritySql)
    }))

  def tpchOracles: Map[String, String] = Map(
    "q_tpch_pricing" -> PricingSql,
    "q_tpch_region_revenue" -> RegionRevenueSql,
    "q_tpch_top_customers" -> TopCustomersSql,
    "q_tpch_order_priority" -> OrderPrioritySql)
}
