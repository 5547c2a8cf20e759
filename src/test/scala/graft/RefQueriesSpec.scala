package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RefQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows at sf0.001") {
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empty = results.filter(_._2 == 0L).keys.toSeq
    // join_partitioned filters to one year-month; tiny SF may legitimately
    // yield few rows but must not be empty at sf0.001 either
    assert(empty.isEmpty, s"empty results: ${empty.mkString(", ")}")
  }

  test("every query key has matching oracle or is declared rows-only") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: ${missing.mkString(", ")}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("agg_sum_groupby values match a hand-computed group") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val expect = li.where(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .agg(round(sum("l_quantity"), 2)).head.getDouble(0)
    val got = SparkEntry.queries("agg_sum_groupby")(spark, sf)
      .where(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select("sum_qty").head.getDouble(0)
    assert(got == expect)
  }
}
