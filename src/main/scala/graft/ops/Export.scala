package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export sharding: the deterministic "epoch shuffle" a
  * trainer consumes — every row gets a stable (shard, pos) so N data
  * loaders can each read one shard in a reproducible pseudo-random
  * order, for any engine that computes the same md5.
  *
  * Scale shape: shard assignment is a pure projection (md5 of id+seed,
  * first 4 hex chars → 65536 bins folded modulo numShards) and the
  * within-shard position is ONE row_number window partitioned by
  * shard — parallel across shards, no global sort, no driver state.
  * Re-seeding re-shuffles; same seed reproduces byte-identically.
  */
object Export {

  /** B31: deterministic EXACT-k-per-group downsampling — cap every
    * stratum (language, source, domain) at `k` rows, chosen by a seeded
    * md5 order so the "random" subset is engine-reproducible (the
    * balanced-corpus cap before training: rate-based sampling — B20 —
    * can't bound a dominant stratum's absolute size; this does).
    * ONE window shuffle partitioned by the stratum; no global sort.
    * Ties cannot happen (md5 collisions aside, `id` breaks them). */
  def sampleKPerGroup(df: DataFrame, group: String, id: String, k: Int,
      seed: Long): DataFrame = {
    val h = md5(concat_ws("|", col(id).cast("string"), lit(seed.toString)))
    val w = Window.partitionBy(col(group)).orderBy(col("__h"), col(id))
    df.withColumn("__h", h)
      .withColumn("smp_rank", row_number().over(w).cast("long"))
      .where(col("smp_rank") <= k)
      .drop("__h")
  }

  /** B38: temperature-weighted source mixing — the standard recipe for
    * balancing a multi-source/multilingual corpus: source `s` with
    * `n_s` rows is sampled toward `target · n_s^α / Σ n^α` rows
    * (α = 1 preserves natural proportions, α = 0 equalizes sources,
    * 0 < α < 1 up-samples the tail — the "sampling temperature").
    * Row selection is a seeded md5 threshold, so the mix is
    * engine-reproducible (same trick as [[shardForTraining]]); keep
    * rates round via the engine-neutral floor(x·10⁶+½)/10⁶ so a `pow`
    * ulp difference can never flip a row across the threshold.
    *
    * Scale shape: per-source counts are one map-side-combinable
    * shuffle to a |sources|-row frame, rates broadcast back, and the
    * keep decision is a pure projection over the corpus scan — no
    * second shuffle, no driver state beyond the tiny rate table. */
  def temperatureMix(df: DataFrame, source: String, id: String, alpha: Double,
      targetRows: Long, seed: Long): DataFrame = {
    require(alpha >= 0, "alpha must be >= 0")
    val counts = df.groupBy(col(source)).agg(count(lit(1)).alias("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), lit(alpha)))
    val tot = counts.agg(sum("__w").alias("__tw"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("keep_rate", least(lit(1.0),
        floor(lit(targetRows.toDouble) * col("__w") / col("__tw") / col("__n")
          * 1e6 + 0.5) / 1e6))
      .select(col(source), col("keep_rate"))
    val keyed = df.withColumn("__h",
      md5(concat_ws("|", col(id).cast("string"), lit(seed.toString))))
    def nib(i: Int): Column =
      expr(s"locate(substr(__h, $i, 1), '0123456789abcdef') - 1")
    val frac = (1 to 6).map(nib).reduce(_ * 16 + _).cast("double") / (1 << 24)
    keyed.join(broadcast(rates), source)
      .where(frac < col("keep_rate"))
      .drop("__h")
  }

  /** @param numShards ≤ 65536 (bins = first 4 md5 hex chars) */
  def shardForTraining(df: DataFrame, id: String, numShards: Int,
      seed: Long): DataFrame = {
    require(numShards > 0 && numShards <= 65536, "numShards in [1, 65536]")
    val h = md5(concat_ws("|", col(id).cast("string"), lit(seed.toString)))
    def nib(i: Int): Column =
      expr(s"locate(substr(__h, $i, 1), '0123456789abcdef') - 1")
    val shard = pmod(
      ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4),
      lit(numShards)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(id))
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }
}
