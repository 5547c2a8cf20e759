package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the single right
  * row with the greatest `rightTs <= leftTs` within the same equality
  * keys — the "latest quote at trade time" / "feature state at event
  * time" operator every event pipeline needs and vanilla Spark lacks.
  *
  * Implementation is the scale-correct union form, NOT a range join:
  * tag both sides, union them, and run ONE window per key ordered by
  * `(ts, side)` that carries the last non-null right payload forward
  * (`last(_, ignoreNulls)` over rows unbounded-preceding..current).
  * Cost is a single hash shuffle on the key columns plus a per-key
  * sort — no ts-range cross product, no broadcast of either side, and
  * AQE handles key skew like any other shuffle. A Catalyst range join
  * of the same query would plan as SortMergeJoin on keys with the ts
  * predicate as a post-filter over ALL (left × right-per-key) pairs —
  * quadratic in per-key row count; the union form is linear.
  *
  * Right rows at identical `(keys, ts)` resolve deterministically to
  * the greatest `tieBreak`: they sort before the left row ordered by
  * `(ts, side, tieBreak)`, so the carry-forward `last()` lands on the
  * max-tieBreak payload — no separate dedup window, no second
  * exchange of the right side.
  */
object AsOfJoin {

  /** @param on          equality key columns (present on both sides)
    * @param leftTs      left event-time column
    * @param rightTs     right event-time column
    * @param payload     right columns to attach (renamed as given)
    * @param tieBreak    right column ordering ties at equal (keys, ts)
    * @param strict      true → match `rightTs < leftTs` instead of `<=`
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Map[String, String],
      tieBreak: String,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val tbType = right.schema(tieBreak).dataType
    val rProj = right.select((on.map(col) :+ col(rightTs).alias("__ts") :+
      col(tieBreak).cast(tbType).alias("__tb") :+
      struct(payload.map { case (c, a) => col(c).alias(a) }.toSeq: _*)
        .alias("__payload")): _*)

    // side ordering at equal ts decides inclusivity: rights first (0)
    // for `<=`, rights last (2) for strict `<`
    val rSide = if (strict) 2 else 0
    val lPacked = left.select(
      (on.map(col) :+ col(leftTs).alias("__ts") :+ lit(1).alias("__side") :+
        lit(null).cast(tbType).alias("__tb") :+
        lit(null).cast(rProj.schema("__payload").dataType).alias("__payload") :+
        struct(leftCols.map(col): _*).alias("__l")): _*)
    val rPacked = rProj.select(
      (on.map(col) :+ col("__ts") :+ lit(rSide).alias("__side") :+
        col("__tb") :+ col("__payload") :+
        lit(null).cast(lPacked.schema("__l").dataType).alias("__l")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val payloadCols = payload.values.toSeq
    lPacked.unionByName(rPacked)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        payloadCols.map(a => col(s"__match.$a").alias(a)): _*)
  }
}
