package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class AsOfRankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join matches a brute-force latest-prior computation") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 11:00:00"), 2.0),
      (3L, 10L, ts("2024-01-01 09:00:00"), 3.0), // before any right row
      (4L, 20L, ts("2024-01-01 12:00:00"), 4.0),
      (5L, 30L, ts("2024-01-01 12:00:00"), 5.0)  // user with no right rows
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 09:30:00"), 10.0),
      (102L, 10L, ts("2024-01-01 10:30:00"), 20.0),
      (103L, 20L, ts("2024-01-01 12:00:00"), 30.0), // equal ts: inclusive
      (104L, 20L, ts("2024-01-01 12:00:00"), 40.0)  // tie: higher id wins
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.asof(left, right, on = Seq("user_id"),
      leftTs = "ts", rightTs = "ts",
      payload = Map("value" -> "pv"), tieBreak = "event_id")
      .select("event_id", "pv").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> Some(10.0), // 09:30 row is latest ≤ 10:00
      2L -> Some(20.0),
      3L -> None,       // nothing at or before 09:00
      4L -> Some(40.0), // equal-ts inclusive, event_id 104 beats 103
      5L -> None))
  }

  test("strict asof excludes equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((101L, 10L, ts("2024-01-01 12:00:00"), 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    val incl = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts",
      Map("value" -> "pv"), "event_id")
    val strict = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts",
      Map("value" -> "pv"), "event_id", strict = true)
    assert(incl.select("pv").head.getDouble(0) == 10.0)
    assert(strict.select("pv").head.isNullAt(0))
  }

  test("asof on the events table agrees with a per-row subquery") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ts", "ts",
      Map("value" -> "purchase_value"), "event_id")
    // brute force: join all pairs, keep max-(ts, event_id) right per left
    val p = purchases.select(col("user_id").alias("p_uid"),
      col("ts").alias("p_ts"), col("event_id").alias("p_id"),
      col("value").alias("p_value"))
    val brute = clicks.join(p,
        col("user_id") === col("p_uid") && col("p_ts") <= col("ts"), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_id")
          .orderBy(col("p_ts").desc_nulls_last, col("p_id").desc_nulls_last)))
      .where(col("__rn") === 1)
      .select(col("event_id"), col("p_value"))
    val a = out.select("event_id", "purchase_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val b = brute.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(a.nonEmpty && a == b)
  }

  test("bm25 ranks the term-dense short doc above a term-sparse long doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark filter"),              // dense, short
      (2L, "spark " + Seq.fill(100)("pad").mkString(" ")), // sparse, long
      (3L, "pad pad pad")                           // no query terms
    ).toDF("doc_id", "text")
    val scores = Ranking.bm25(docs, Seq("spark", "join", "filter"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.contains(1L) && scores.contains(2L))
    assert(!scores.contains(3L), "doc without query terms must be absent")
    assert(scores(1L) > scores(2L))
    val top1 = Ranking.bm25TopK(docs, Seq("spark", "join", "filter"), 1)
      .head.getLong(0)
    assert(top1 == 1L)
  }
}
