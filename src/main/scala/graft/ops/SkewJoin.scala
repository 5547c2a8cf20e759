package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions (SURVEY §6c-6).
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer; at
  * 100 TB a single key holding 5% of a fact table stalls the stage.
  * Salting splits each large-side key into `salts` sub-keys with a
  * deterministic per-row salt, replicates the small side once per salt
  * value, and joins on (key, salt) — the hot key's rows now spread
  * across `salts` reducers. Results are identical to the unsalted join
  * (the salt is a partitioning artifact, dropped on output), which is
  * exactly what the gate oracle checks.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * explicit salting remains the portable answer when the skew is known
  * ahead of time (e.g. the null/default key of a foreign-key column) or
  * when the join must be pre-partitioned for a downstream stage.
  */
object SkewJoin {

  /** Inner/left equi-join of `large` (skewed) with `small` on `keys`,
    * salted `salts` ways. The salt is `xxhash64(whole row) % salts` —
    * deterministic, no rand(), stable under retries (a speculative
    * re-execution of a task must salt identically or rows duplicate). */
  def salted(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = pmod(xxhash64(large.columns.map(col): _*), lit(salts)).cast("int")
    val l = large.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
