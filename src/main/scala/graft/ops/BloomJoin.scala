package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Key handling: both sides are PREHASHED to one 64-bit value with
  * integral types normalized to long first, so an `int` fact key probes
  * the same bit positions an equal `bigint` dim key set (xxhash64 is
  * type-sensitive — without normalization every probe would miss and the
  * prefilter would silently drop all matches). The normalized type is
  * recorded in the filter and re-checked at probe time.
  *
  * Scale shape:
  *   - BUILD: one explode(k)+groupBy shuffle over the (small) dim side —
  *     `k * |dim|` rows — then the non-zero words of an `mBits/64`-long
  *     array collected to the driver. `mBits` is capped at 2^28 (32 MB of
  *     longs) — past the cap fpp degrades (less pruning) but correctness
  *     never does, because the real join removes false positives.
  *   - PROBE: small filters (≤ `LiteralBitsMax` bits) embed the words as
  *     a plan literal — fully codegen'd, zero extra distribution cost.
  *     Larger filters are shipped ONCE PER EXECUTOR as a real Spark
  *     broadcast variable (a plan literal is serialized with every task)
  *     and probed by a long→boolean function over the codegen-computed
  *     prehash column — the string/decimal hashing stays in codegen; only
  *     the final k bit tests run in the lambda.
  *   - The subsequent real join removes false positives, so the result
  *     is EXACTLY the plain join (full DuckDB oracle).
  */
object BloomJoin {

  /** Bits a filter may embed as a plan literal before switching to a
    * broadcast variable: 2^23 bits = 1 MB of longs. */
  val LiteralBitsMax: Int = 1 << 23

  /** Hard cap on filter size: 2^28 bits = 32 MB of longs (≈16M keys at
    * 16 bits/key). Beyond it fpp rises but results stay exact. */
  val BitsCap: Int = 1 << 28

  /** A built key filter: `mBits` bit positions packed into longs, probed
    * with `k` seeded hashes per key; `keyType` is the normalized type the
    * prehash was computed over (probe side must normalize to the same). */
  final case class KeyFilter(bits: Array[Long], mBits: Int, k: Int, keyType: DataType) {
    // one torrent broadcast per filter, created on first large-probe use
    // and reused by every later prefilter of the same filter — a fresh
    // broadcast per call would pin up to 32 MB per join in a long-lived
    // session with nothing ever releasing it
    @transient private[ops] var bcVar: org.apache.spark.broadcast.Broadcast[Array[Long]] = _

    private[ops] def broadcastBits(sc: org.apache.spark.SparkContext)
        : org.apache.spark.broadcast.Broadcast[Array[Long]] = synchronized {
      if (bcVar == null) bcVar = sc.broadcast(bits)
      bcVar
    }

    /** Releases the executor-side copies of a large filter's bits. Call
      * once every join built from this filter has MATERIALIZED (the probe
      * is lazy — destroying earlier fails those jobs). */
    def destroy(): Unit = synchronized {
      if (bcVar != null) { bcVar.destroy(); bcVar = null }
    }
  }

  /** Integral types all hash as long so int/bigint key pairs agree;
    * float narrows to double for the same reason. */
  private def normalizedType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType                        => DoubleType
    case other                                         => other
  }

  /** The 64-bit prehash both sides derive bit positions from. */
  private def prehash(df: DataFrame, key: String): Column = {
    val dt = df.schema(key).dataType
    xxhash64(col(key).cast(normalizedType(dt)))
  }

  private def positions(h0: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(h0, lit(i)), lit(mBits.toLong)))

  /** Builds the bit-set from the dim side's `key` column. `bitsPerKey`
    * sizes the filter from an exact dim count (one small action);
    * ~16 bits/key with k=7 gives fpp ≈ 1%. */
  def build(dim: DataFrame, key: String, bitsPerKey: Int = 16, k: Int = 7): KeyFilter = {
    val n = math.max(1L, dim.select(key).distinct().count())
    // power-of-two sizing keeps pmod cheap and the array bounded
    val mBits = math.max(1024, java.lang.Long.highestOneBit(n * bitsPerKey * 2 - 1) << 1)
      .min(BitsCap.toLong).toInt
    val posCol = explode(array(positions(prehash(dim, key), mBits, k): _*)).alias("__pos")
    val words = dim.select(posCol)
      .groupBy((col("__pos") / 64).cast("int").alias("__w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("__pos"), lit(64L)).cast("int"))).alias("__bits"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    KeyFilter(bits, mBits, k, normalizedType(dim.schema(key).dataType))
  }

  /** The membership test over the PREHASH column, as a codegen'd plan
    * literal — right for filters up to ~1 MB. */
  private def mightContainLiteral(h0: Column, f: KeyFilter): Column = {
    val bitsLit = typedLit(f.bits.toSeq)
    positions(h0, f.mBits, f.k).map { pos =>
      call_function("shiftright", element_at(bitsLit, (pos / 64).cast("int") + 1),
        pmod(pos, lit(64L)).cast("int")).bitwiseAND(1L) === 1L
    }.reduce(_ && _)
  }

  /** Replicates `pmod(xxhash64(h0, lit(i)), m)` on the JVM so the
    * broadcast probe tests exactly the bits [[build]] set. Spark's
    * XxHash64 folds children left-to-right with the running hash as
    * seed: long child → hashLong, int literal → hashInt. */
  private def jvmPosition(h0: Long, i: Int, mBits: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h = XXH64.hashInt(i, XXH64.hashLong(h0, 42L))
    java.lang.Math.floorMod(h, mBits.toLong).toInt
  }

  /** Fact rows that may have a dim match (plus fpp false positives).
    * Rejects a probe column whose normalized type differs from the
    * build side's — a silent all-miss prefilter otherwise. */
  def prefilter(fact: DataFrame, factKey: String, f: KeyFilter,
      literalBitsMax: Int = LiteralBitsMax): DataFrame = {
    val factType = normalizedType(fact.schema(factKey).dataType)
    require(factType == f.keyType,
      s"bloom probe key type $factType does not match build key type ${f.keyType}; " +
        "cast one side so both normalize to the same type")
    val h0 = prehash(fact, factKey)
    if (f.mBits <= literalBitsMax) fact.where(h0.isNotNull && mightContainLiteral(h0, f))
    else {
      // one copy per executor via torrent broadcast, not one per task —
      // and ONE broadcast per filter across repeated probes (f.destroy()
      // releases it once the joins have materialized)
      val bc = f.broadcastBits(fact.sparkSession.sparkContext)
      val (m, k) = (f.mBits, f.k)
      val test = udf { h: java.lang.Long =>
        h != null && {
          val bits = bc.value
          var i = 0
          var ok = true
          while (ok && i < k) {
            val p = jvmPosition(h, i, m)
            ok = (bits(p >>> 6) >>> (p & 63) & 1L) == 1L
            i += 1
          }
          ok
        }
      }
      fact.where(test(h0))
    }
  }

  /** The full pruned join: build on dim, prefilter fact, then the real
    * inner join (which removes false positives — result is EXACTLY
    * `fact ⋈ dim`). */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      bitsPerKey: Int = 16, k: Int = 7): DataFrame = {
    val f = build(dim, dimKey, bitsPerKey, k)
    prefilter(fact, factKey, f).join(dim, col(factKey) === col(dimKey))
  }
}
