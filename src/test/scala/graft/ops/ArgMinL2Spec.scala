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
