package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rule order is fixed and every rule can fire") {
    import spark.implicits._
    val good = "the fast data " + (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                  // keeps
      (2L, "the and of"),                          // too_short
      (3L, "the " + Seq.fill(2500)("x").mkString(" ")), // too_long wins over low_quality
      // repeated word → distinct_ratio ~0, short words → no length
      // bonus → quality ~0.07, but "the" pins lang=en: quality fires
      (4L, "the " + Seq.fill(40)("zz").mkString(" ")),
      (5L, good)                                   // duplicate of 1 (higher id loses)
    ).toDF("doc_id", "text")
    val out = Curation.curate(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) == (true, null))
    assert(out(2L) == (false, "too_short"))
    assert(out(3L) == (false, "too_long"))
    assert(out(4L) == (false, "low_quality"))
    assert(out(5L) == (false, "duplicate"))
  }
}
