package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational spine over the TPC-H-ish testdata — the general
  * analytic shapes (wide aggregate, dimension joins, fact-fact join)
  * that sit beside the TSDB surface.
  *
  * Scale notes baked into each shape:
  *  - q1: single scan, map-side partial aggregation, grouping keys
  *    with tiny cardinality — the shuffle carries a handful of rows.
  *  - broadcast join: dimensions (region/nation/customer) are orders
  *    of magnitude smaller than the fact side — broadcast() keeps the
  *    fact table unshuffled end-to-end.
  *  - shuffle join: orders⋈lineitem are both fact-sized; AQE handles
  *    skew/coalescing, the filter on lineitem is pushed to the scan
  *    before the exchange.
  */
object Relational {

  /** TPC-H Q1 shape: pricing summary by returnflag/linestatus. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        // integer-exact means (SURVEY §6): quantities are integers and
        // discounts 2-decimal, so these are exact at any group size
        expr("CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) * 10000 DIV count(1)")
          .as("avg_qty_e4"),
        expr("CAST(floor(sum(l_discount) * 100 + 0.5) AS BIGINT) * 100 DIV count(1)")
          .as("avg_disc_e4"),
        count(lit(1)).as("count_order"))

  /** Revenue by region: fact orders joined through broadcast dims. */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("revenue"))

  /** TPC-H Q3 shape: top-10 highest-revenue undelivered orders for a
    * market segment — broadcast dimension gate (customer), fact-fact
    * shuffle join (orders⋈lineitem, both date-filtered AT THE SCAN),
    * then TakeOrdered for the top-k (no global sort materializes).
    * Revenue ranks on the integer-exact 1e-4 sum (price×(1−disc) is
    * a 4-decimal product, so the floor-scaled sum is exact and the
    * ordering engine-stable; o_orderkey breaks ties). */
  def q3Shipping(spark: SparkSession, dir: String, segment: String = "BUILDING",
                 cutoff: String = "1998-06-01", k: Int = 10): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(broadcast(Tables.customer(spark, dir)
          .filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") > lit(cutoff).cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(expr(
        "CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)")
        .as("revenue_e4"))
      .select(col("o_orderkey"),
        expr("CAST(o_orderdate AS DATE)").cast("string").as("o_orderdate"),
        col("o_orderpriority"), col("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey").asc)
      .limit(k)

  /** Fact-fact shuffle join: returned-item share per order priority. */
  def returnedByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
           count(lit(1)).as("n_lineitems"),
           round(sum(col("l_extendedprice")), 2).as("returned_value"))

  /** The same fact-fact join with NO runtime join shuffle: both sides
    * written bucketed (and sorted) on the join key, so the sort-merge
    * join reads co-located buckets directly. This is the 100 TB
    * pattern for repeated fact-fact joins — pay the layout once at
    * write time, and every subsequent join on the bucket key skips
    * both exchanges (the join keys' hashpartitioning never appears in
    * the plan; PlanSpec asserts it). The merge hint keeps the planner
    * on SMJ so the bucket layout, not a broadcast, is what's
    * exercised; nBuckets scales to cluster width in deployment.
    * Results are identical to [[returnedByPriority]] — same oracle. */
  def returnedByPriorityBucketed(spark: SparkSession, dir: String,
                                 warehouseDir: String, nBuckets: Int = 8): DataFrame = {
    // table identity covers BOTH inputs (sf dir) and layout home
    // (warehouse dir), so two call sites never alias each other's data
    val suffix = new java.io.File(dir).getName.replace(".", "_") +
      "_" + (warehouseDir.hashCode & 0x7fffffff).toString
    val tOrders = s"orders_bkt_$suffix"
    val tLine = s"lineitem_bkt_$suffix"
    // pay-once layout: rewrite only when this session hasn't built
    // the bucketed tables yet (the pattern's whole point — every
    // subsequent join reuses the co-located files)
    if (!spark.catalog.tableExists(tOrders) || !spark.catalog.tableExists(tLine)) {
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderpriority").write
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouseDir/$tOrders")
        .mode("overwrite").format("parquet").saveAsTable(tOrders)
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_returnflag", "l_extendedprice").write
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouseDir/$tLine")
        .mode("overwrite").format("parquet").saveAsTable(tLine)
    }
    spark.table(tOrders).hint("merge")
      .join(spark.table(tLine).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
           count(lit(1)).as("n_lineitems"),
           round(sum(col("l_extendedprice")), 2).as("returned_value"))
  }
}
