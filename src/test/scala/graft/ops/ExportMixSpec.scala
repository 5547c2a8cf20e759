package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class ExportMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("alpha=1 preserves natural proportions; alpha=0 equalizes") {
    // skewed corpus: 1000 rows of src A, 100 of B, 10 of C
    val df = ((1 to 1000).map(i => (i.toLong, "A")) ++
      (1001 to 1100).map(i => (i.toLong, "B")) ++
      (1101 to 1110).map(i => (i.toLong, "C"))).toDF("id", "src")
    def mix(alpha: Double) = Export.temperatureMix(df, "src", "id",
      alpha, targetRows = 200L, seed = 3L)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nat = mix(1.0)
    // natural: A gets ~10x B's share
    assert(nat("A") > 5 * nat.getOrElse("B", 1L), s"natural mix skew lost: $nat")
    val eq = mix(0.0)
    // equalized: every source capped by rate 1 on the tail, A ~ target/3
    assert(eq("C") == 10, s"alpha=0 must keep ALL of the tiny source: $eq")
    assert(math.abs(eq("A") - 200.0 / 3) < 25, s"alpha=0 head share off: $eq")
  }

  test("deterministic across runs and engine-reproducible rate rounding") {
    val docs = Tables.documents(spark, sf)
    val a = Export.temperatureMix(docs, "source", "doc_id", 0.5, 300L, 7L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Export.temperatureMix(docs, "source", "doc_id", 0.5, 300L, 7L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
    // keep_rate is always a clean multiple of 1e-6 (floor(x*1e6+0.5)/1e6)
    val rates = Export.temperatureMix(docs, "source", "doc_id", 0.5, 300L, 7L)
      .select("keep_rate").distinct().collect().map(_.getDouble(0))
    rates.foreach(r => assert(math.abs(r * 1e6 - math.rint(r * 1e6)) < 1e-6, s"rate $r"))
  }
}
