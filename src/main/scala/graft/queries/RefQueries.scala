package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch-form gate queries for the reference's join/agg surface.
  *
  * Each entry mirrors one permutation from the reference's test suite
  * (/root/reference/tests/JoinTest*.py, AggsTest*.py) re-based onto the
  * driver's TPC-H-ish tables: customer↔customers, orders↔transactions,
  * lineitem↔orders, part↔products (SURVEY.md §4). Every computed
  * column is rounded and aliased identically to its DuckDB oracle so
  * the driver's hash compare is byte-stable.
  *
  * Scale notes: dimension sides (customer, part, supplier, nation) are
  * broadcast-able at any SF where dims ≪ facts; we leave the choice to
  * Catalyst/AQE rather than forcing hints, except where a dim is known
  * tiny (nation, region) — those we hint explicitly.
  */
object RefQueries {

  private def r2(c: Column): Column = round(c, 2)

  // --- aggregations (AggsTest*.py analogs) -------------------------------

  /** TPC-H Q1-style pricing summary — AggsTestGroupBy.py analog. */
  def aggSumGroupBy(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r2(sum("l_quantity")).as("sum_qty"),
        r2(sum("l_extendedprice")).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Multi-aggregate over one group — sum/avg/count (AggsTestGroupBy variants). */
  def aggMulti(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        r2(sum("o_totalprice")).as("sum_price"),
        r2(avg("o_totalprice")).as("avg_price"),
        count(lit(1)).as("cnt"))

  /** min/max aggregates (AggsTestRightGroupByInnerGroupByMax analog). */
  def aggMinMax(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        min("l_shipdate").as("min_ship"),
        max("l_shipdate").as("max_ship"),
        r2(min("l_extendedprice")).as("min_price"),
        r2(max("l_extendedprice")).as("max_price"))

  /** Custom merge arithmetic — the reference's `.reduce(avg = total/count)`
    * (AggsTestInnerGroupByLeftLeftGroupBy.py:11) expressed as its batch
    * fixpoint: avg derived from re-aggregable sum+count. */
  def aggCustomAvg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        r2(sum("c_acctbal")).as("total_bal"),
        count(lit(1)).as("cnt"),
        r2(sum("c_acctbal") / count(lit(1))).as("avg_bal"))

  /** join → groupBy → join → groupBy chain
    * (AggsTestInnerGroupByLeftLeftGroupBy.py analog). */
  def aggJoinAggChain(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_custkey")
      .agg(sum("o_totalprice").as("total_amount"), count(lit(1)).as("cnt"))
    // fresh scan of orders for the second stage — the reference
    // re-reads each staged table too (aggs.py:112-136)
    val o2 = Tables.orders(s, d)
    perCust
      .join(o2, perCust("c_custkey") === o2("o_custkey"), "left")
      .join(l, o2("o_orderkey") === l("l_orderkey"), "left")
      .groupBy(l("l_orderkey"))
      .agg(r2(sum("total_amount")).as("total_amount_per_order"))
      .select(col("l_orderkey"), col("total_amount_per_order"))
  }

  // --- 2-way joins (JoinTestInner/Left/Right.py analogs) -----------------

  def joinInner(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "o_totalprice", "c_name", "c_acctbal", "c_mktsegment")
  }

  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .select("o_orderkey", "o_totalprice", "c_custkey", "c_name")
  }

  def joinRight(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
  }

  // --- chained joins (3+ way permutations) -------------------------------

  def joinInnerLeft(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d); val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"), "left")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderdate", "c_name")
  }

  def joinLeftRight(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d); val p = Tables.part(s, d); val sup = Tables.supplier(s, d)
    l.join(p, l("l_partkey") === p("p_partkey"), "left")
      .join(sup, l("l_suppkey") === sup("s_suppkey"), "right")
      .select("s_suppkey", "s_name", "l_orderkey", "l_linenumber", "p_name")
  }

  def joinRightRightLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d); val p = Tables.part(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "right")
      .join(l, o("o_orderkey") === l("l_orderkey"), "right")
      .join(p, l("l_partkey") === p("p_partkey"), "left")
      .select("l_orderkey", "l_linenumber", "c_name", "o_orderdate", "p_name")
  }

  def joinInnerInnerInner(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    val c = Tables.customer(s, d); val n = Tables.nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select("l_orderkey", "l_linenumber", "o_orderdate", "c_name", "n_name")
  }

  /** Arbitrary `.on(expr)` condition with a literal filter — mirrors
    * JoinTestComplex1.py:12 `(p.product_name == o.item_name) &
    * (p.product_name == lit('Small Towels'))`. */
  def joinOnExpr(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d); val p = Tables.part(s, d)
    l.join(p, l("l_partkey") === p("p_partkey") && p("p_brand") === lit("Brand#13"), "left")
      .select("l_orderkey", "l_linenumber", "p_name", "p_brand")
  }

  /** select/drop projection incl. a transformed column (Selector.select). */
  def joinSelectDrop(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), upper(col("c_name")).as("name_upper"),
        col("o_orderstatus"))
  }

  /** Partition-pruned join — mirrors partitionBy(prune('date')) on a
    * year×month derived column (JoinTestComplex1.py:8). */
  def joinPartitioned(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).withColumn("o_yearmonth",
      year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .where(col("o_yearmonth") === lit(199506))
      .select("o_orderkey", "o_yearmonth", "c_name")
  }

  /** `.to(df => transform)` on a source before joining (streams.py:235). */
  def joinTransformSource(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumnRenamed("o_totalprice", "price")
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "o_year", "price", "c_name")
  }

  /** Stream union (joins.py:861-865) in batch form. */
  def unionAll(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("kind"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("kind"))
    c.unionByName(sup)
  }

  // --- TPC-H-style headline analytics ------------------------------------

  /** Q3-like: segment revenue per order with date predicates — filters
    * must push to the scans, dims broadcast. */
  def tpchQ3Like(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).where(col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
    val l = Tables.lineitem(s, d).where(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      // decimal arithmetic: float sums can land exactly on a .xx5
      // rounding boundary and disagree with the oracle in the last
      // cent; decimal is exact in both engines
      .agg(r2(sum(col("l_extendedprice").cast("decimal(18,6)") * (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))).cast("double").as("revenue"))
      .select("o_orderkey", "o_orderdate", "revenue")
  }

  /** Q5-like: per-nation revenue inside one region — a 5-way join whose
    * three dimension sides should all broadcast. */
  def tpchQ5Like(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).where(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    broadcast(r).join(n, r("r_regionkey") === n("n_regionkey"))
      .join(c, n("n_nationkey") === c("c_nationkey"))
      .join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(r2(sum(col("l_extendedprice").cast("decimal(18,6)") * (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))).cast("double").as("revenue"))
  }

  /** Q7-like: bilateral shipping volume between two nations by year —
    * a 6-way join where both nation sides must broadcast and the
    * name-pair filter prunes before the aggregate. */
  def tpchQ7Like(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(r2(sum(col("l_extendedprice").cast("decimal(18,6)") *
          (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))))
        .cast("double").as("volume"))
  }

  /** Q9-like: per-nation profit by year over a part-name predicate (no
    * partsupp table in the testdata, so cost = 80% of retail). */
  def tpchQ9Like(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).where(col("p_name").contains("red"))
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(r2(sum(
          col("l_extendedprice").cast("decimal(18,6)") *
            (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")) -
          col("l_quantity").cast("decimal(18,6)") *
            col("p_retailprice").cast("decimal(18,6)") * lit(0.8).cast("decimal(18,6)")))
        .cast("double").as("profit"))
  }

  /** Q4-like: priority counts of 1995-Q1/Q2 orders having ≥1 returned
    * lineitem — LEFT SEMI join (no fan-out, dedup-free EXISTS). */
  def tpchQ4Like(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-07-01")
    val ret = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** LEFT ANTI complement: orders with NO lineitems at all, by status
    * (the data-quality "orphan rows" probe). */
  def ordersWithoutLineitems(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))

  /** Ranked-window analytics: top-3 orders per customer by price
    * (deterministic tie-break on orderkey). One shuffle on the
    * partition key; the rank prunes before any downstream join. */
  def windowTopOrders(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
  }

  /** ROLLUP aggregate: order counts and revenue by (status, year) with
    * subtotal and grand-total rows — one shuffle, partial aggregation
    * map-side for every grouping set. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(count(lit(1)).as("cnt"),
        r2(sum(col("o_totalprice").cast("decimal(18,6)")))
          .cast("double").as("revenue"))

  /** Q18-like: large-volume orders — HAVING over a fact aggregate, then
    * the qualifying (small) key set joins BACK against orders+customer.
    * The agg side reduces before any join, so the join input is the
    * handful of qualifying orders, not the fact table. */
  def tpchQ18Like(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(r2(sum(col("l_quantity").cast("decimal(18,6)")))
        .cast("double").as("sum_qty"))
      .where(col("sum_qty") > 300)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
  }

  /** Q14-like: promo revenue share — conditional aggregation to ONE
    * scalar row (the case-when folds into the same partial agg pass;
    * no second scan, no join fan-out). */
  def tpchQ14Like(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-07-01").cast("timestamp_ntz"))
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    // the exact decimal sums cast to double BEFORE the ratio: decimal
    // division precision rules differ across engines, double division
    // of identical operands doesn't
    l.join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(r2(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,6)")))
            .cast("double") * 100 / sum(rev).cast("double")).as("promo_pct"),
        r2(sum(rev)).cast("double").as("total_rev"))
  }

  /** Q10-like: revenue lost to returns per customer, top 20 — join +
    * agg + deterministic top-k (rank prunes before the final output). */
  def tpchQ10Like(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(r2(sum(rev)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Q19-like: disjunctive brand/size/quantity predicates — one scalar
    * revenue over an OR-of-ANDs that references BOTH join sides; the
    * join-key conjunct still pushes, the disjunction evaluates once
    * post-join inside the same codegen stage. */
  def tpchQ19Like(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1.0).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 40) &&
        col("l_quantity").between(20, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(cond)
      .agg(r2(sum(rev)).cast("double").as("revenue"),
        count(lit(1)).as("line_cnt"))
  }

  // --- registration ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q19_like"          -> (tpchQ19Like _),
    "tpch_q18_like"          -> (tpchQ18Like _),
    "tpch_q14_like"          -> (tpchQ14Like _),
    "tpch_q10_like"          -> (tpchQ10Like _),
    "tpch_q3_like"           -> (tpchQ3Like _),
    "tpch_q5_like"           -> (tpchQ5Like _),
    "tpch_q7_like"           -> (tpchQ7Like _),
    "tpch_q9_like"           -> (tpchQ9Like _),
    "window_top_orders"      -> (windowTopOrders _),
    "agg_rollup"             -> (aggRollup _),
    "tpch_q4_like"           -> (tpchQ4Like _),
    "join_anti_orphans"      -> (ordersWithoutLineitems _),
    "agg_sum_groupby"        -> (aggSumGroupBy _),
    "agg_multi"              -> (aggMulti _),
    "agg_min_max"            -> (aggMinMax _),
    "agg_custom_avg"         -> (aggCustomAvg _),
    "agg_join_agg_chain"     -> (aggJoinAggChain _),
    "join_inner"             -> (joinInner _),
    "join_left"              -> (joinLeft _),
    "join_right"             -> (joinRight _),
    "join_inner_left"        -> (joinInnerLeft _),
    "join_left_right"        -> (joinLeftRight _),
    "join_right_right_left"  -> (joinRightRightLeft _),
    "join_inner_inner_inner" -> (joinInnerInnerInner _),
    "join_on_expr"           -> (joinOnExpr _),
    "join_select_drop"       -> (joinSelectDrop _),
    "join_partitioned"       -> (joinPartitioned _),
    "join_transform_source"  -> (joinTransformSource _),
    "union_all"              -> (unionAll _))

  val oracleSql: Map[String, String] = Map(
    "tpch_q19_like" ->
      """SELECT
           round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS revenue,
           count(*) AS line_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 30)""",
    "tpch_q18_like" ->
      """WITH big AS (
           SELECT l_orderkey,
             round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2)::DOUBLE AS sum_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2)::DOUBLE > 300)
         SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
         FROM orders JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey""",
    "tpch_q14_like" ->
      """SELECT
           round(CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) * 100 /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS promo_pct,
           round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS total_rev
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1995-07-01'""",
    "tpch_q10_like" ->
      """SELECT c_custkey, c_name, n_name,
           round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q3_like" ->
      """SELECT o_orderkey, o_orderdate,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1996-01-01'
           AND l_shipdate > TIMESTAMP '1996-01-01'
         GROUP BY o_orderkey, o_orderdate""",
    "tpch_q5_like" ->
      """SELECT n_name,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS revenue
         FROM region
         JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    "tpch_q7_like" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(date_part('year', l_shipdate) AS INT) AS l_year,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS volume
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
         GROUP BY 1, 2, 3""",
    "tpch_q9_like" ->
      """SELECT n_name AS nation,
         CAST(date_part('year', o_orderdate) AS INT) AS o_year,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1.0 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                 - CAST(l_quantity AS DECIMAL(18,6)) * CAST(p_retailprice AS DECIMAL(18,6)) * CAST(0.8 AS DECIMAL(18,6))), 2)::DOUBLE AS profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2""",
    "tpch_q4_like" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY 1""",
    "join_anti_orphans" ->
      """SELECT o_orderstatus, count(*) AS cnt
         FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         GROUP BY 1""",
    "window_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, rk FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) WHERE rk <= 3""",
    "agg_rollup" ->
      """SELECT o_orderstatus,
           CAST(date_part('year', o_orderdate) AS INT) AS o_year,
           count(*) AS cnt,
           round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
         FROM orders
         GROUP BY ROLLUP (o_orderstatus, o_year)""",
    "agg_sum_groupby" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "agg_multi" ->
      """SELECT o_orderstatus,
         round(sum(o_totalprice), 2) AS sum_price,
         round(avg(o_totalprice), 2) AS avg_price,
         count(*) AS cnt
         FROM orders GROUP BY o_orderstatus""",
    "agg_min_max" ->
      """SELECT l_returnflag,
         min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
         round(min(l_extendedprice), 2) AS min_price,
         round(max(l_extendedprice), 2) AS max_price
         FROM lineitem GROUP BY l_returnflag""",
    "agg_custom_avg" ->
      """SELECT c_mktsegment,
         round(sum(c_acctbal), 2) AS total_bal,
         count(*) AS cnt,
         round(sum(c_acctbal) / count(*), 2) AS avg_bal
         FROM customer GROUP BY c_mktsegment""",
    "agg_join_agg_chain" ->
      """WITH per_cust AS (
           SELECT c_custkey, sum(o_totalprice) AS total_amount, count(*) AS cnt
           FROM customer JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         SELECT l_orderkey, round(sum(total_amount), 2) AS total_amount_per_order
         FROM per_cust
         LEFT JOIN orders ON per_cust.c_custkey = o_custkey
         LEFT JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY l_orderkey""",
    "join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_acctbal, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "join_left" ->
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    "join_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey""",
    "join_inner_left" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderdate, c_name
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         LEFT JOIN customer ON o_custkey = c_custkey""",
    "join_left_right" ->
      """SELECT s_suppkey, s_name, l_orderkey, l_linenumber, p_name
         FROM lineitem
         LEFT JOIN part ON l_partkey = p_partkey
         RIGHT JOIN supplier ON l_suppkey = s_suppkey""",
    "join_right_right_left" ->
      """SELECT l_orderkey, l_linenumber, c_name, o_orderdate, p_name
         FROM customer
         RIGHT JOIN orders ON c_custkey = o_custkey
         RIGHT JOIN lineitem ON o_orderkey = l_orderkey
         LEFT JOIN part ON l_partkey = p_partkey""",
    "join_inner_inner_inner" ->
      """SELECT l_orderkey, l_linenumber, o_orderdate, c_name, n_name
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey""",
    "join_on_expr" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand
         FROM lineitem
         LEFT JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'""",
    "join_select_drop" ->
      """SELECT o_orderkey, upper(c_name) AS name_upper, o_orderstatus
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "join_partitioned" ->
      """SELECT o_orderkey,
         CAST(date_part('year', o_orderdate) * 100 + date_part('month', o_orderdate) AS INT) AS o_yearmonth,
         c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE date_part('year', o_orderdate) * 100 + date_part('month', o_orderdate) = 199506""",
    "join_transform_source" ->
      """SELECT o_orderkey,
         CAST(date_part('year', o_orderdate) AS INT) AS o_year,
         o_totalprice AS price, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "union_all" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
         UNION ALL
         SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier""")
}
