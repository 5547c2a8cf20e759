package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join (SURVEY.md §2 B32): join points to intervals
  * (`point ∈ [start, end]`) as an EQUI-join on coarse buckets plus an
  * exact residual filter — Spark's own planner can only express a
  * point-in-interval join as BroadcastNestedLoopJoin (or a cartesian),
  * which is quadratic the moment the interval side outgrows broadcast.
  *
  * Shape: points compute ONE bucket (`floor(p / width)`); intervals
  * explode to every bucket they overlap (`floor(start/w) ..
  * floor(end/w)` — with `width` chosen ≥ the typical interval length
  * the fan-out is ~2×, the standard trade). One shuffle on the bucket
  * (+ any extra equi-keys), then the exact `between` filter drops
  * same-bucket non-overlaps. Result EXACTLY equals the naive range
  * join (spec asserts equality AND that the plan contains no
  * BroadcastNestedLoopJoin/CartesianProduct).
  */
object RangeJoin {

  /** @param on        extra equi-join keys (e.g. user_id), may be empty
    * @param width     bucket width in the point/start/end unit; size it
    *                  ≥ the typical interval length (fan-out is
    *                  `len/width + 1` buckets per interval)
    * @param pointCol  numeric (or epoch) column on `points`
    * @param startCol/endCol  inclusive interval bounds on `intervals` */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      on: Seq[String], pointCol: String, startCol: String, endCol: String,
      width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val p = points.withColumn("__b", floor(col(pointCol) / width))
    val i = intervals.withColumn("__b",
      explode(sequence(floor(col(startCol) / width), floor(col(endCol) / width))))
    val keys = on :+ "__b"
    p.join(i, keys, "inner")
      .where(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }
}
