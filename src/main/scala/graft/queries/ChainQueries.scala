package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exhaustive join-chain permutations mirroring the reference's test
  * matrix (tests/JoinTest{Inner,Left,Right}*.py — every 2- and 3-stage
  * combination of inner/left/right) on the fixed chain
  * lineitem → orders → customer → part, plus the agg-chain permutations
  * from tests/AggsTest*.py. Queries and oracles are generated from the
  * same spec so they cannot drift.
  */
object ChainQueries {

  private val types = Seq("inner", "left", "right")

  /** lineitem ⋈t1 orders ⋈t2 customer [⋈t3 part]. */
  private def chainQuery(ts: Seq[String])(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val base = l.join(o, l("l_orderkey") === o("o_orderkey"), ts(0))
      .join(c, o("o_custkey") === c("c_custkey"), ts(1))
    val full =
      if (ts.size == 2) base
      else base.join(Tables.part(s, d), l("l_partkey") === col("p_partkey"), ts(2))
    val cols = Seq("l_orderkey", "l_linenumber", "o_orderdate", "c_name") ++
      (if (ts.size == 3) Seq("p_name") else Nil)
    full.select(cols.map(col): _*)
  }

  private def chainSql(ts: Seq[String]): String = {
    def kw(t: String) = t match {
      case "inner" => "JOIN"
      case "left"  => "LEFT JOIN"
      case "right" => "RIGHT JOIN"
    }
    val third =
      if (ts.size == 3) s"\n ${kw(ts(2))} part ON l_partkey = p_partkey" else ""
    val pcol = if (ts.size == 3) ", p_name" else ""
    s"""SELECT l_orderkey, l_linenumber, o_orderdate, c_name$pcol
        FROM lineitem
        ${kw(ts(0))} orders ON l_orderkey = o_orderkey
        ${kw(ts(1))} customer ON o_custkey = c_custkey$third"""
  }

  // all 9 two-stage chains; three-stage chains cover the reference's
  // specific test files not already expressible as a 2-chain
  private val twoChains: Seq[Seq[String]] =
    for (a <- types; b <- types) yield Seq(a, b)
  private val threeChains: Seq[Seq[String]] = Seq(
    Seq("inner", "inner", "left"),  // JoinTestInnerInnerLeft
    Seq("left", "inner", "right"),  // JoinTestLeftInnerRight
    Seq("left", "right", "inner"),  // JoinTestLeftRightInner
    Seq("left", "right", "left"))   // JoinTestLeftRightLeft

  private def name(ts: Seq[String]) = s"join_chain_${ts.mkString("_")}"

  // --- agg-chain permutations (AggsTest*.py) -----------------------------

  /** RightGroupBy: right join then groupBy-sum (AggsTestRightGroupBy). */
  private def aggRightGroupBy(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "right")
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("total_amount"),
        count(lit(1)).as("cnt"))
  }

  /** InnerGroupByLeft: join → groupBy → left join back
    * (AggsTestInnerGroupByLeft). */
  private def aggInnerGroupByLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    val g = c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_custkey")
      .agg(sum("o_totalprice").as("total_amount"))
    val o2 = Tables.orders(s, d)
    g.join(o2, g("c_custkey") === o2("o_custkey"), "left")
      .select(col("c_custkey"), round(col("total_amount"), 2).as("total_amount"),
        col("o_orderkey"), col("o_orderstatus"))
  }

  /** RightGroupByInnerGroupBy: right join → groupBy → inner join →
    * groupBy (AggsTestRightGroupByInnerGroupBy). */
  private def aggRightGroupByInnerGroupBy(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    val g = c.join(o, c("c_custkey") === o("o_custkey"), "right")
      .groupBy("o_custkey")
      .agg(sum("o_totalprice").as("total_amount"))
    val o2 = Tables.orders(s, d)
    g.join(o2, g("o_custkey") === o2("o_custkey"))
      .groupBy("o_orderstatus")
      .agg(round(sum("total_amount"), 2).as("status_total"))
  }

  /** ...Max variant: terminal max aggregate, the reference's
    * `.reduce(update=greatest(...), delta_update=greatest(...))`
    * fixpoint (AggsTestRightGroupByInnerGroupByMax). */
  private def aggRightGroupByInnerGroupByMax(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    val g = c.join(o, c("c_custkey") === o("o_custkey"), "right")
      .groupBy("o_custkey")
      .agg(sum("o_totalprice").as("total_amount"))
    val o2 = Tables.orders(s, d)
    g.join(o2, g("o_custkey") === o2("o_custkey"))
      .groupBy("o_orderstatus")
      .agg(round(max("total_amount"), 2).as("max_amount"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    (twoChains ++ threeChains).map(ts => name(ts) ->
      ((s: SparkSession, d: String) => chainQuery(ts)(s, d))).toMap ++ Map(
      "agg_right_groupby" -> (aggRightGroupBy _),
      "agg_inner_groupby_left" -> (aggInnerGroupByLeft _),
      "agg_right_groupby_inner_groupby" -> (aggRightGroupByInnerGroupBy _),
      "agg_right_groupby_inner_groupby_max" -> (aggRightGroupByInnerGroupByMax _))

  val oracleSql: Map[String, String] =
    (twoChains ++ threeChains).map(ts => name(ts) -> chainSql(ts)).toMap ++ Map(
      "agg_right_groupby" ->
        """SELECT o_custkey, round(sum(o_totalprice), 2) AS total_amount,
           count(*) AS cnt
           FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
           GROUP BY o_custkey""",
      "agg_inner_groupby_left" ->
        """WITH g AS (
             SELECT c_custkey, sum(o_totalprice) AS total_amount
             FROM customer JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey)
           SELECT c_custkey, round(total_amount, 2) AS total_amount,
             o_orderkey, o_orderstatus
           FROM g LEFT JOIN orders ON g.c_custkey = o_custkey""",
      "agg_right_groupby_inner_groupby" ->
        """WITH g AS (
             SELECT o_custkey, sum(o_totalprice) AS total_amount
             FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
             GROUP BY o_custkey)
           SELECT o_orderstatus, round(sum(total_amount), 2) AS status_total
           FROM g JOIN orders o2 ON g.o_custkey = o2.o_custkey
           GROUP BY o_orderstatus""",
      "agg_right_groupby_inner_groupby_max" ->
        """WITH g AS (
             SELECT o_custkey, sum(o_totalprice) AS total_amount
             FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
             GROUP BY o_custkey)
           SELECT o_orderstatus, round(max(total_amount), 2) AS max_amount
           FROM g JOIN orders o2 ON g.o_custkey = o2.o_custkey
           GROUP BY o_orderstatus""")
}
