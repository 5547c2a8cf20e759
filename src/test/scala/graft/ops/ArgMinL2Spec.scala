package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** r16 pin: the native ArgMinL2 assignment must be BIT-EQUAL to the
  * composed form it replaced (k inlined aggregate(zip_with) distance
  * trees + array_min over (dist, id) structs) — same element order,
  * float→double cast, left-fold sum, and lowest-index tie-break — on
  * float and double vectors, including exact ties. */
class ArgMinL2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The pre-r16 composed reference, verbatim. */
  private def composedArgMin(sub: Column, cents: Seq[Seq[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(
          zip_with(sub, typedLit(c), (a, b) => {
            val d = a.cast("double") - b; d * d
          }),
          lit(0.0d), (acc, x) => acc + x).alias("d"),
        lit(i).alias("i"))
    }: _*)).getField("i")

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("native == composed on random double vectors (incl. duplicates)") {
    val r = rng(7)
    val cents = Seq.fill(16)(Seq.fill(8)(r.nextDouble() * 10 - 5))
    // duplicate centroid 3 at index 12 → exact tie must pick index 3
    val tied = cents.updated(12, cents(3))
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)(r.nextDouble() * 10 - 5))) ++
      // vectors exactly ON centroids → distance 0 at two indices
      Seq((200L, tied(3)), (201L, tied(12)))
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
      graft.functions.VectorExpressions.argMinL2(col("v"), typedLit(tied)),
      composedArgMin(col("v"), tied)).collect()
    got.foreach(row => assert(row.getInt(1) == row.getInt(2),
      s"mismatch at id=${row.getLong(0)}: native=${row.getInt(1)} composed=${row.getInt(2)}"))
    // the planted ties resolve to the LOWEST index
    assert(got.filter(_.getLong(0) >= 200L).forall(_.getInt(1) == 3))
  }

  test("native == composed on null elements, length mismatch, empty centroids") {
    val cents = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    // a null element → null distance for EVERY centroid → composed
    // array_min returns the lowest index (nulls-first struct ordering)
    val withNull = Seq(1L, 2L).toDF("id").withColumn("v",
      when(col("id") === 1L, array(lit(1.0), lit(null).cast("double")))
        .otherwise(array(lit(5.0), lit(5.0))))
    val g1 = withNull.select(col("id"),
      graft.functions.VectorExpressions.argMinL2(col("v"), typedLit(cents)),
      composedArgMin(col("v"), cents)).collect()
    g1.foreach(r => assert(r.isNullAt(1) == r.isNullAt(2) &&
      (r.isNullAt(1) || r.getInt(1) == r.getInt(2)),
      s"null-element mismatch at id=${r.getLong(0)}: $r"))
    // length mismatch: zip_with pads with null → same nulls-first pick
    val shortVec = Seq((1L, Seq(1.0))).toDF("id", "v")
    val g2 = shortVec.select(
      graft.functions.VectorExpressions.argMinL2(col("v"), typedLit(cents)),
      composedArgMin(col("v"), cents)).head
    assert(g2.getInt(0) == g2.getInt(1))
    // empty centroid matrix → null (the composed array() of zero structs
    // does not even analyze, so only the native side is asserted)
    val g3 = Seq((1L, Seq(1.0))).toDF("id", "v").select(
      graft.functions.VectorExpressions.argMinL2(col("v"),
        typedLit(Seq.empty[Seq[Double]]))).head
    assert(g3.isNullAt(0))
  }

  test("native == composed on float vectors (cast path)") {
    val r = rng(13)
    val cents = Seq.fill(5)(Seq.fill(6)(r.nextDouble()))
    val df = (0 until 100).map(i =>
      (i.toLong, Seq.fill(6)(r.nextFloat()))).toDF("id", "v")
    val got = df.select(
      graft.functions.VectorExpressions.argMinL2(col("v"), typedLit(cents)),
      composedArgMin(col("v"), cents)).collect()
    got.foreach(row => assert(row.getInt(0) == row.getInt(1)))
  }
}
