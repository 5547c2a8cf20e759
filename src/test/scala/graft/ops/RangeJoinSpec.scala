package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed range join equals the naive range join exactly") {
    val points = (1L to 2000L).map(i => (i, i % 7, i * 13 % 10000))
      .toDF("pid", "k", "p")
    val intervals = (1L to 300L).map(i => (i, i % 7, i * 31 % 9000, i * 31 % 9000 + i % 400))
      .toDF("iid", "k", "s", "e")
    val bucketed = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "p", "s", "e", width = 500)
    val naive = points.join(intervals, Seq("k"))
      .where(col("p").between(col("s"), col("e")))
    assert(bucketed.count() == naive.count() && naive.count() > 0)
    assert(bucketed.select("pid", "iid").exceptAll(naive.select("pid", "iid")).count() == 0)
    assert(naive.select("pid", "iid").exceptAll(bucketed.select("pid", "iid")).count() == 0)
  }

  test("the plan is an equi-join: no nested-loop, no cartesian") {
    val points = (1L to 100L).map(i => (i, i * 13 % 1000)).toDF("pid", "p")
    val intervals = (1L to 10L).map(i => (i, i * 31 % 900, i * 31 % 900 + 50))
      .toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, Nil,
      "p", "s", "e", width = 100).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned as a product:\n$plan")
    // the naive predicate, for contrast, IS a nested loop
    val naivePlan = points.crossJoin(intervals)
      .where(col("p").between(col("s"), col("e")))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }
}
