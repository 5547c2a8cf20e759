package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (SURVEY.md §2 B29): pre-filter a huge fact
  * side against a compact bit-set of the dimension side's join keys
  * BEFORE the join's shuffle, so fact rows that cannot match never ship.
  *
  * This is the classic runtime-filter pattern (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies it automatically to
  * shuffle joins under size thresholds; here it is a first-class,
  * deterministic operator usable on any join the optimizer won't cover —
  * e.g. fact-side pruning before a shuffle join whose dim side exceeds
  * the broadcast threshold but whose KEY SET still fits in a few MB of
  * bits).
  *
  * Scale shape:
  *   - BUILD: one explode(k)+groupBy shuffle over the (small) dim side —
  *     `k * |dim|` rows — then `mBits/64` longs collected to the driver.
  *     At 10M dim keys and 16 bits/key the filter is 20 MB: broadcast as
  *     a literal, never a shuffle.
  *   - PROBE: a pure projection over the fact scan (xxhash64 + bit
  *     tests, all codegen'd — no UDF), evaluated BEFORE the join
  *     exchange, so ~`1 - fpp` of non-matching fact rows never enter the
  *     shuffle. The subsequent real join removes false positives, so the
  *     result is EXACTLY the plain join (full DuckDB oracle).
  */
object BloomJoin {

  /** A built key filter: `mBits` bit positions packed into longs, probed
    * with `k` seeded hashes per key. */
  final case class KeyFilter(bits: Array[Long], mBits: Int, k: Int)

  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(mBits.toLong)))

  /** Builds the bit-set from the dim side's `key` column. `bitsPerKey`
    * sizes the filter from an exact dim count (one small action);
    * ~16 bits/key with k=7 gives fpp ≈ 1%. */
  def build(dim: DataFrame, key: String, bitsPerKey: Int = 16, k: Int = 7): KeyFilter = {
    val n = math.max(1L, dim.select(key).distinct().count())
    // power-of-two sizing keeps pmod cheap and the array bounded
    val mBits = math.max(1024, java.lang.Long.highestOneBit(n * bitsPerKey * 2 - 1) << 1)
      .min(1L << 30).toInt
    val posCol = explode(array(positions(col(key), mBits, k): _*)).alias("__pos")
    val words = dim.select(posCol)
      .groupBy((col("__pos") / 64).cast("int").alias("__w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("__pos"), lit(64L)).cast("int"))).alias("__bits"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    KeyFilter(bits, mBits, k)
  }

  /** The membership test as a codegen'd Column — no UDF, no shuffle. */
  def mightContain(key: Column, f: KeyFilter): Column = {
    val bitsLit = typedLit(f.bits.toSeq)
    positions(key, f.mBits, f.k).map { pos =>
      call_function("shiftright", element_at(bitsLit, (pos / 64).cast("int") + 1),
        pmod(pos, lit(64L)).cast("int")).bitwiseAND(1L) === 1L
    }.reduce(_ && _)
  }

  /** Fact rows that may have a dim match (plus fpp false positives). */
  def prefilter(fact: DataFrame, factKey: String, f: KeyFilter): DataFrame =
    fact.where(mightContain(col(factKey), f))

  /** The full pruned join: build on dim, prefilter fact, then the real
    * inner join (which removes false positives — result is EXACTLY
    * `fact ⋈ dim`). */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      bitsPerKey: Int = 16, k: Int = 7): DataFrame = {
    val f = build(dim, dimKey, bitsPerKey, k)
    prefilter(fact, factKey, f).join(dim, col(factKey) === col(dimKey))
  }
}
