package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi/anti-join and set-operation members of the relational inventory —
  * the "which rows have (no) counterpart" family every curation pipeline
  * leans on (decontamination is exactly an anti join at heart).
  *
  * Scale shape: both ops plan as hash-partitioned LeftAnti joins on the
  * key — the probe side streams, only keys shuffle, and no payload ever
  * crosses the exchange for non-matches. Nothing here collects, products,
  * or broadcasts the fact side.
  */
object SetOps {

  /** Customers with no order above `minTotal` — LEFT ANTI join, the
    * relational NOT EXISTS. The price filter pushes into the orders scan
    * BEFORE the exchange, and Catalyst prunes the orders side to its join
    * key — only qualifying keys ever shuffle. (`minTotal = 0` degenerates
    * to "customers with no orders at all".)
    */
  def customersWithoutBigOrders(
      customer: DataFrame,
      orders: DataFrame,
      minTotal: Double = 300000.0): DataFrame =
    customer
      .join(orders.where(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Customers with at least one order at `priority` — LEFT SEMI join,
    * the relational EXISTS and [[customersWithoutBigOrders]]'s mirror.
    * Semi joins are the shape to reach for over `IN (subquery)` at scale:
    * the build side reduces to distinct keys before the exchange, the
    * probe side emits each customer AT MOST once (no fan-out however many
    * orders match), and no orders payload survives past the join.
    */
  def customersWithUrgentOrders(
      customer: DataFrame,
      orders: DataFrame,
      priority: String = "1-URGENT"): DataFrame =
    customer
      .join(orders.where(col("o_orderpriority") === priority),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Users with a high-value click but no high-value purchase — EXCEPT
    * (set-distinct semantics), the audience-carving staple. Plans as
    * aggregate + anti join; both sides reduce to distinct keys map-side
    * first.
    */
  def clickersNotBuyers(
      events: DataFrame, minValue: Double = 95.0): DataFrame =
    events.where(col("event_type") === "click" && col("value") > minValue)
      .select(col("user_id"))
      .except(
        events.where(col("event_type") === "purchase" &&
            col("value") > minValue)
          .select(col("user_id")))

  /** Users with BOTH a high-value click and a high-value purchase —
    * INTERSECT (set-distinct semantics), [[clickersNotBuyers]]'s
    * complement and the last set-op member of the inventory. Plans as
    * aggregate + LEFT SEMI join: both sides reduce to distinct keys
    * map-side before the exchange, and only keys ever shuffle.
    */
  def clickersAlsoBuyers(
      events: DataFrame, minValue: Double = 95.0): DataFrame =
    events.where(col("event_type") === "click" && col("value") > minValue)
      .select(col("user_id"))
      .intersect(
        events.where(col("event_type") === "purchase" &&
            col("value") > minValue)
          .select(col("user_id")))

  /** Per (user, day): click count vs purchase count, FULL OUTER joined —
    * the reconciliation shape (neither side may drop rows the other
    * lacks: a click day with no purchases and a purchase day with no
    * clicks both appear, zero-filled). Both sides aggregate FIRST (map-
    * side combinable, (user, day)-sized), so the full-outer join runs
    * over two pre-shrunk frames on the same key — never fact-to-fact.
    */
  def dailyClickPurchaseMatrix(events: DataFrame): DataFrame = {
    def side(eventType: String, alias: String): DataFrame =
      events.where(col("event_type") === eventType && col("ts").isNotNull)
        .groupBy(col("user_id"), to_date(col("ts")).alias("day"))
        .agg(count(lit(1)).alias(alias))
    side("click", "n_clicks")
      .join(side("purchase", "n_purchases"), Seq("user_id", "day"), "full_outer")
      .select(col("user_id"), col("day").cast("string").alias("day"),
        coalesce(col("n_clicks"), lit(0L)).alias("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).alias("n_purchases"))
  }
}
