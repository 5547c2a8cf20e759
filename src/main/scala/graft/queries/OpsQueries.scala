package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{AsOfJoin, Dedup, Multimodal, Ranking, Similarity, SkewJoin, TextAnalysis}
import graft.streaming.EventOps

/** Gate queries for the training-data pipeline ops (§2B) and streaming
  * analytics (§2C). Column types are cast to match DuckDB's output
  * types (len/count → BIGINT etc.) because the driver hash-compares
  * schemas too.
  */
object OpsQueries {

  // --- §2B text analysis --------------------------------------------------

  def textTokens(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, d))
      .select(col("doc_id"),
        col("ws_tokens").cast("long").alias("ws_tokens"),
        col("word_tokens").cast("long").alias("word_tokens"),
        col("byte_len").cast("long").alias("byte_len"))

  def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScore(Tables.documents(s, d))
      .select(col("doc_id"), col("n_words").cast("long").alias("n_words"),
        col("stop_ratio"), col("distinct_ratio"), col("mean_word_len"),
        col("quality_score"))

  def textLangid(s: SparkSession, d: String): DataFrame =
    TextAnalysis.languageId(Tables.documents(s, d))
      .select("doc_id", "lang", "lang_pred")

  def textFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, d))
      .select("doc_id", "fp_md5")

  // --- §2B dedup ----------------------------------------------------------

  /** Documents plus planted exact duplicates (the corpus itself has
    * near-dups but no byte-identical ones). */
  private def docsWithExactDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(docs.where(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(docsWithExactDups(s, d))
      .select(col("doc_id"), col("canonical_id"),
        col("group_size").cast("long").alias("group_size"), col("is_canonical"))

  def dedupJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.allPairsJaccard(Tables.documents(s, d), threshold = 0.5)

  /** bands=32 (r=2): at J=0.5 a true pair misses all 32 bands with
    * probability (1-0.5²)³² ≈ 1e-4, so the LSH output deterministically
    * equals the all-pairs jaccard result on this corpus — which is
    * exactly what the oracle asserts (same SQL as `dedup_jaccard`). The
    * estimate pre-filter keeps the extra band collisions of r=2 cheap. */
  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(s, d), bands = 32, threshold = 0.5)

  /** Exercises the chunk-BUCKETED candidate path plus the exact-jaccard
    * verify. 8-bit chunks guarantee recall for hamming ≤ 7 (pigeonhole)
    * and every J ≥ 0.5 pair on this corpus sits within 5 simhash bits,
    * so the verified output DETERMINISTICALLY equals the all-pairs
    * jaccard result (same full oracle as `dedup_jaccard`/
    * `dedup_minhash`). The raw hamming-pairs path stays recall-spec'd
    * in DedupSpec. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDup(Tables.documents(s, d), maxHamming = 7, threshold = 0.5,
      chunkBits = 8)

  /** The corpus has no natural embedding near-dups (max pairwise cosine
    * ≈ 0.51), so plant slightly-perturbed copies of the first 50 vectors
    * (cosine ≈ 0.998 to their originals) and require the LSH-bucketed
    * pass to recover them. */
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val planted = e.where(col("vec_id") < 50).select(
      (col("vec_id") + 1000000L).alias("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") + pmod(xxhash64(i), lit(100)).cast("double") / 5000.0 - 0.01)
        .cast("array<float>").alias("embedding"))
    // The oracle asserts EXACTLY the 50 planted pairs come back (ids
    // only — the cosine values are spec-tested; reproducing Spark's
    // xxhash64 perturbation inside DuckDB isn't possible). Banded
    // auto-scaled signatures (planes = max(8, log2(n/32)) per band,
    // 8 bands): a planted pair (cosine ≈ 0.998, p ≈ 0.98 per plane)
    // misses a band at ~1-0.98^planes and ALL 8 bands at ~1e-6 — while
    // per-band bucket occupancy stays flat as the corpus grows, so the
    // candidate volume scales linearly (the fixed-planes version
    // measured QUADRATIC at the sf1 sweep).
    Dedup.embeddingNearDup(e.unionByName(planted), threshold = 0.99,
        planes = -1, bands = 8)
      .select("id_a", "id_b")
  }

  /** B39: cross-corpus dedup — "new" = docs ≥ 400 plus verbatim copies
    * of docs 0-49 (re-ingestion simulation); "existing" = docs < 400.
    * bands=32 makes candidate recall total on this corpus, so the gate
    * carries the full cross-set all-pairs jaccard oracle. */
  def dedupCross(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val existing = docs.where(col("doc_id") < 400)
    val newDocs = docs.where(col("doc_id") >= 400)
      .unionByName(docs.where(col("doc_id") < 50)
        .select((col("doc_id") + lit(1000000L)).alias("doc_id"), col("text")))
    Dedup.crossDedup(newDocs, existing)
  }

  /** B39 persisted form: the signature store seeded with docs < 300,
    * grown to < 400 through the incremental admit path, then probed by
    * the same batch as `dedup_cross` — identical expected pairs, so
    * the SAME oracle checks the persisted store end-to-end. */
  def dedupIngest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val store = graft.ops.SignatureStore.create(s,
      java.nio.file.Files.createTempDirectory("graft_sigstore").toString + "/st",
      docs.where(col("doc_id") < 300))
    graft.ops.SignatureStore.admit(store,
      docs.where(col("doc_id") >= 300 && col("doc_id") < 400), batchId = 1L)
    val batch = docs.where(col("doc_id") >= 400)
      .unionByName(docs.where(col("doc_id") < 50)
        .select((col("doc_id") + lit(1000000L)).alias("doc_id"), col("text")))
    graft.ops.SignatureStore.check(store, batch)
  }

  // --- §2B similarity search ---------------------------------------------

  def annBruteforce(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Gate probes ALL buckets (multiProbe = planes): the full LSH
    * machinery — bucketing, mask expansion, bucket join, ranking —
    * executes, and the result provably equals brute-force top-k, so
    * the gate carries the FULL oracle (same SQL as `ann_bruteforce`).
    * The deployment path (multiProbe ≪ planes) is recall-spec'd. */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.lshTopK(e, e.where(col("vec_id") < 10), k = 5, planes = 4,
        multiProbe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Gate runs nprobe = nlist (exhaustive probing): every stage of the
    * IVF machinery — Lloyd iterations, shuffle-free ArgMaxCosine
    * assignment, probe ranking, candidate join — executes, and the
    * result provably equals brute-force top-k, so the gate carries the
    * FULL oracle. The deployment path (nprobe < nlist) is recall-spec'd
    * in OpsSpec. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.ivfTopK(e, e.where(col("vec_id") < 10), k = 5,
        nlist = 8, nprobe = 8)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** B34: incrementally-maintained IVF index — built on a third of the
    * corpus, grown to full coverage with two CDC upserts (the second
    * re-upserts overlapping ids: the update path), then queried with
    * nprobe = nlist so the result provably equals brute-force top-k
    * over the final corpus (same full oracle as `ann_bruteforce`). */
  def annIndexIncremental(s: SparkSession, d: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft_vidx").toString + "/idx"
    val e = Tables.embeddings(s, d)
    graft.ops.VectorIndex.build(s, path, e.where(col("vec_id") % 3 === 0), nlist = 8)
    graft.ops.VectorIndex.upsert(s, path, e.where(col("vec_id") % 3 === 1), batchId = 1L)
    // second wave overlaps the first (update path) and adds the rest
    graft.ops.VectorIndex.upsert(s, path, e.where(col("vec_id") % 3 >= 1), batchId = 2L)
    graft.ops.VectorIndex.query(s, path, e.where(col("vec_id") < 10), k = 5, nprobe = 8)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** §6c-6: salted join under heavy key skew — 70% of lineitem rows
    * collapse onto one hot key; the salted join must return exactly the
    * unsalted join's aggregate (the oracle computes the plain join). */
  def joinSaltedSkew(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 10 < 7, 0)
        .otherwise(pmod(col("l_orderkey"), lit(25))).cast("int").alias("skew_key"),
      col("l_quantity"), col("l_extendedprice"))
    val dim = Tables.nation(s, d).select(
      col("n_nationkey").cast("int").alias("skew_key"), col("n_name"))
    SkewJoin.salted(fact, dim, Seq("skew_key"), salts = 8)
      .groupBy("n_name")
      .agg(count(lit(1)).alias("cnt"),
        round(sum(col("l_quantity")), 2).alias("total_qty"))
  }

  /** PII scrubbing over documents with planted synthetic PII (the
    * corpus itself is clean, so every row must show redactions). */
  def textPiiScrub(s: SparkSession, d: String): DataFrame = {
    val withPii = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-123-4567 at 10.0.0."),
        col("doc_id") % 256).alias("text"))
    TextAnalysis.piiScrub(withPii).select("doc_id", "scrubbed", "pii_found")
  }

  def textVocabTopk(s: SparkSession, d: String): DataFrame =
    TextAnalysis.vocabTopK(Tables.documents(s, d), k = 100)
      .select(col("word"), col("freq"), col("rank").cast("long").alias("rank"))

  /** Deterministic stratified sampling: per-language keep-rates over a
    * stable id-derived bucket (sampleBy's rand() is not reproducible
    * across engines; pipelines that must re-materialize identical
    * samples use exactly this shape). */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("__bucket", pmod(col("doc_id"), lit(100)))
      .where(col("__bucket") <
        when(col("lang") === "en", 50)
          .when(col("lang") === "de", 30).otherwise(10))
      .select("doc_id", "lang")

  /** Sequence packing of documents into 2048-token training bins. */
  def packSequences(s: SparkSession, d: String): DataFrame =
    Dedup.packSequences(Tables.documents(s, d),
      tokens = size(split(col("text"), " ")).cast("long"), capacity = 2048)

  /** Near-dup clustering: connected components over the dup-pair edge
    * list; every doc labeled with its min reachable doc id. The edges
    * come from banded-minhash candidates (the SCALE path — bounded by
    * band collisions, never all-pairs), exact-verified to the same
    * J ≥ 0.5 contract the recursive-CTE oracle asserts: bands=32
    * (r=2) misses a true J=0.5 pair with probability (1−t²)^32 ≈ 1e-4,
    * and the `dedup_minhash` gate proves the identical pair set on
    * this corpus against the same full exact-jaccard oracle. The
    * exact all-pairs engine (`allPairsJaccard`) remains the
    * `dedup_jaccard` gate's deliberate quadratic-by-contract path. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashLsh(docs, bands = 32, threshold = 0.5)
    Dedup.nearDupClusters(docs.select("doc_id"), pairs)
  }

  /** Contamination check with a planted eval set: verbatim copies of
    * the first 10 docs (fresh ids) must each flag their source — plus
    * any true near-dups that share a 13-gram. */
  def contaminationCheck(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val eval = docs.where(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 9000000L)
    TextAnalysis.contamination(docs, eval)
      .select(col("train_id"), col("n_eval_docs"), col("n_shared_ngrams"))
  }

  /** Deterministic hash-free train/val/test split — reproducible across
    * engines and runs, the first step of every training-data pipeline. */
  def splitTrainTest(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("lang"),
      when(col("doc_id") % 100 < 80, "train")
        .when(col("doc_id") % 100 < 90, "val")
        .otherwise("test").alias("split"))

  /** Text normalization: lowercase, collapse whitespace, strip digits —
    * the canonicalization pass before dedup/fingerprinting. */
  def textNormalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(regexp_replace(lower(col("text")), "[0-9]+", ""),
        "\\s+", " ").alias("norm_text"))

  /** Sketch aggregates: HyperLogLog distinct + approximate quantiles per
    * language — the approximate-analytics path for 100 TB profiling.
    * Oracle-checked against EXACT values where the sketch is exact at
    * this cardinality (HLL counts ≤ a few hundred distinct), plus a
    * rows-only sanity on the quantiles. */
  def sketchProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).groupBy("lang")
      .agg(
        approx_count_distinct(col("source")).alias("approx_sources"),
        count(lit(1)).alias("n_docs"),
        round(element_at(percentile_approx(col("n_chars"),
          array(lit(0.5)), lit(10000)), 1).cast("double"), 2).alias("p50_chars"))

  // --- §2B multimodal -----------------------------------------------------

  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeMeta(Multimodal.withBinaryColumn(Tables.documents(s, d))).toDF()

  def multimodalFrames(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSample(
      Multimodal.decodeMeta(Multimodal.withBinaryColumn(Tables.documents(s, d))).toDF(),
      stride = 2)
      .select(col("doc_id"), col("frame_idx").cast("long").alias("frame_idx"))

  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.withBinaryColumn(Tables.documents(s, d)))
      .toDF().select(col("doc_id"), round(element_at(col("features"), 1), 4)
        .alias("f0"), size(col("features")).alias("dim"))

  // --- §2C streaming analytics over events --------------------------------

  /** Literal `offsetSecs` past the table's max ts, expressed in the raw
    * `ts` column's physical type (long nanos, NTZ, or LTZ timestamp) so
    * sentinel rows round-trip through the same parquet schema whichever
    * generation of testdata is on disk. */
  private def sentinelTsLit(raw: DataFrame, offsetSecs: Long): Column = {
    val agg = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        max(col("ts")) + lit(offsetSecs * 1000000000L)
      case _ => max(col("ts")) + expr(s"INTERVAL $offsetSecs SECOND")
    }
    lit(raw.agg(agg.alias("s")).head.get(0))
  }

  def streamWindowAgg(s: SparkSession, d: String): DataFrame =
    EventOps.runToMemory(s, s"$d/events.parquet", s"win_agg_${System.nanoTime()}")(
      EventOps.windowedAgg)

  /** C10: genuine stream-stream interval join (two watermarked file
    * streams; state bounded by the 1-hour range condition). */
  def streamIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val src = s"$d/events.parquet"
    val name = s"ivj_${System.nanoTime()}"
    val q = EventOps.intervalJoin(
        EventOps.eventStream(s, src), EventOps.eventStream(s, src))
      .writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** C10b: LEFT OUTER interval join — clicks with no purchase in their
    * window must emit with nulls, which requires genuine outer-join
    * state eviction. Sentinel click/purchase events (negative user ids,
    * 3h past max ts) advance both watermarks so every pending unmatched
    * click flushes. Sentinels need NO output filter — and must not get
    * one: a `user_id >= 0` filter would be PUSHED DOWN below the
    * watermark assigner into the parquet scan, silently re-removing the
    * sentinels before they can advance the watermark (observed: the
    * last-hour unmatched clicks never flushed). They exit naturally:
    * the sentinel click's own window never expires (nothing arrives
    * after it) so it stays in state, and an unmatched right-side row
    * never emits from a left join. */
  def streamIntervalJoinLeft(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$d/events.parquet"
    val raw = s.read.parquet(src)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivjl").toString
    val conf = s.sessionState.newHadoopConf()
    val srcP = new org.apache.hadoop.fs.Path(src)
    val fs = srcP.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, srcP, fs,
      new org.apache.hadoop.fs.Path(tmp, srcP.getName), false, conf)
    val sentinelTs = sentinelTsLit(raw, offsetSecs = 3L * 3600L) // 3h past max
    val sentinel = Seq((-1L, "click"), (-2L, "purchase")).foldLeft(
      Option.empty[DataFrame]) { case (acc, (uid, tpe)) =>
        val row = raw.limit(1).select(raw.schema.fields.toSeq.map { f =>
          f.name match {
            case "event_id"   => lit(uid).cast(f.dataType).alias("event_id")
            case "user_id"    => lit(uid).cast(f.dataType).alias("user_id")
            case "ts"         => sentinelTs.cast(f.dataType).alias("ts")
            case "event_type" => lit(tpe).alias("event_type")
            case other        => lit(null).cast(f.dataType).alias(other)
          }
        }: _*)
        Some(acc.fold(row)(_.unionByName(row)))
      }.get
    sentinel.coalesce(1).write.mode("append").parquet(tmp)
    val name = s"ivjl_${System.nanoTime()}"
    val q = EventOps.intervalJoinLeft(
        EventOps.eventStream(s, tmp), EventOps.eventStream(s, tmp))
      .writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  def streamDedup(s: SparkSession, d: String): DataFrame = {
    // feed the events twice; streaming dropDuplicates must collapse them
    val st = EventOps.eventStream(s, s"$d/events.parquet")
    val doubled = st.unionByName(st)
    val name = s"dedup_${System.nanoTime()}"
    val q = EventOps.dedup(doubled)
      .select("event_id", "event_type", "value")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** C1 (sliding variant): 2-hour windows sliding by 1 hour — every
    * event lands in two windows. */
  def streamSlidingWindow(s: SparkSession, d: String): DataFrame =
    EventOps.runToMemory(s, s"$d/events.parquet", s"slide_${System.nanoTime()}")(ev =>
      ev.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "2 hours", "1 hour").alias("w"), col("event_type"))
        .agg(count(lit(1)).alias("cnt"), round(sum("value"), 2).alias("total"))
        .select(col("w.start").cast(org.apache.spark.sql.types.TimestampNTZType)
            .alias("window_start"),
          col("event_type"), col("cnt"), col("total")))

  /** Stream-static join: the event stream enriched against a broadcast
    * dimension — the classic streaming lookup pattern. */
  def streamStaticJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Seq(
      ("click", "engagement"), ("view", "engagement"),
      ("purchase", "conversion"), ("signup", "conversion"),
      ("error", "problem")).toDF("event_type", "category")
    val name = s"ssj_${System.nanoTime()}"
    val q = EventOps.eventStream(s, s"$d/events.parquet")
      .join(broadcast(dim), "event_type")
      .select("event_id", "event_type", "category", "value")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  def streamSeriesSimilarity(s: SparkSession, d: String): DataFrame =
    EventOps.seriesSimilarity(Tables.events(s, d), targetUser = 1L, k = 10,
        minOverlap = 3)
      .select(col("user_id"), col("similarity"),
        col("overlap_hours"), col("rank").cast("long").alias("rank"))

  def streamSessionize(s: SparkSession, d: String): DataFrame =
    EventOps.sessionizeBatch(Tables.events(s, d))
      .select(col("user_id"), col("session_id"),
        col("n_events").cast("long").alias("n_events"),
        date_trunc("second", col("session_start")).alias("session_start"),
        date_trunc("second", col("session_end")).alias("session_end"))

  /** C3, streaming-NATIVE form: the real flatMapGroupsWithState session
    * operator over the event stream. A per-user sentinel event one gap
    * past the global max timestamp flushes every real session out of
    * state (sentinel sessions stay open and are never emitted), so the
    * appended output equals the batch gaps-and-islands fixpoint. */
  def streamSessionizeNative(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$d/events.parquet"
    val raw = s.read.parquet(src)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val conf = s.sessionState.newHadoopConf()
    val srcP = new org.apache.hadoop.fs.Path(src)
    val fs = srcP.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, srcP, fs,
      new org.apache.hadoop.fs.Path(tmp, srcP.getName), false, conf)
    val sentinelTs = sentinelTsLit(raw, offsetSecs = 1801L) // gap (1800s) + 1s
    val sentinel = raw.select(col("user_id")).distinct()
      .select(raw.schema.fields.toSeq.map { f =>
        f.name match {
          case "user_id" => col("user_id")
          case "ts"      => sentinelTs.cast(f.dataType).alias("ts")
          case other     => lit(null).cast(f.dataType).alias(other)
        }
      }: _*)
    sentinel.coalesce(1).write.mode("append").parquet(tmp)
    val out = EventOps.runToMemory(s, tmp, s"sessnat_${System.nanoTime()}",
      org.apache.spark.sql.streaming.OutputMode.Append())(df =>
      EventOps.sessionizeStream(s, df))
    out.select(col("user_id"),
      col("n_events").cast("long").alias("n_events"),
      date_trunc("second",
        col("session_start").cast(org.apache.spark.sql.types.TimestampNTZType))
        .alias("session_start"),
      date_trunc("second",
        col("session_end").cast(org.apache.spark.sql.types.TimestampNTZType))
        .alias("session_end"))
  }

  /** B27: end-to-end curation decision over the corpus (with planted
    * exact dups so the duplicate rule fires). */
  def curateDocs(s: SparkSession, d: String): DataFrame =
    graft.ops.Curation.curate(docsWithExactDups(s, d))

  /** B31: exact-k-per-group balanced downsample (cap each language at
    * 120 docs, seeded md5 order — engine-reproducible). */
  def samplePerGroup(s: SparkSession, d: String): DataFrame =
    graft.ops.Export.sampleKPerGroup(
      Tables.documents(s, d).select("doc_id", "lang"),
      group = "lang", id = "doc_id", k = 120, seed = 7L)

  /** B28: deterministic epoch-shuffle sharding for training export. */
  def exportShards(s: SparkSession, d: String): DataFrame =
    graft.ops.Export.shardForTraining(
      Tables.documents(s, d).select("doc_id", "n_chars"),
      id = "doc_id", numShards = 7, seed = 42L)

  /** B26: shuffle-free co-bucket join — orders and a per-order
    * lineitem rollup land in KeyedTables bucketed identically on
    * o_orderkey, then join bucket-by-bucket with zero exchange
    * (decimal sums so the stored rollup is bit-exact vs the oracle). */
  def joinCobucket(s: SparkSession, d: String): DataFrame = {
    import graft.store.KeyedTable
    val root = java.nio.file.Files.createTempDirectory("graft_cb").toString
    val oDf = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val rollup = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").alias("o_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).alias("sum_qty"),
        count(lit(1)).alias("line_cnt"))
    val oT = KeyedTable.create(s, s"$root/orders", oDf.schema,
      Seq("o_orderkey"), numBuckets = 8)
    val rT = KeyedTable.create(s, s"$root/rollup", rollup.schema,
      Seq("o_orderkey"), numBuckets = 8)
    oT.upsert(oDf, uniqueKeys = true)
    rT.upsert(rollup, uniqueKeys = true)
    graft.ops.CoBucketJoin.join(oT, rT, Seq("o_orderkey"), joinType = "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), round(col("sum_qty"), 2).cast("double").alias("sum_qty"),
        col("line_cnt"))
  }

  /** B24: as-of join — each click picks up the user's latest
    * prior-or-simultaneous purchase (value + time). DuckDB's native
    * ASOF LEFT JOIN is the oracle. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    AsOfJoin.asof(clicks, purchases, on = Seq("user_id"),
      leftTs = "ts", rightTs = "ts",
      payload = Map("value" -> "purchase_value", "ts" -> "purchase_ts"),
      tieBreak = "event_id")
  }

  /** B30: int8 embedding quantization — per-vector symmetric scale +
    * signed-byte codes, bit-reproducible across engines (explicit
    * floor(x/s + 0.5), not engine `round`). The oracle recomputes the
    * codes in DuckDB and checks scale + code-sum + code-range per
    * vector; the compressed-scoring search path is recall-spec'd. */
  def quantizeEmbeddings(s: SparkSession, d: String): DataFrame = {
    val q = graft.ops.Quantize.int8(Tables.embeddings(s, d))
    q.select(col("vec_id"),
      round(col("scale"), 6).alias("scale"),
      aggregate(col("qvec"), lit(0L), (a, x) => a + x).alias("q_sum"),
      array_min(col("qvec")).alias("q_min"),
      array_max(col("qvec")).alias("q_max"))
  }

  /** B29: Bloom-filter join pruning — lineitem pre-filtered against the
    * bit-set of a selective part subset's keys BEFORE the join shuffle.
    * The real join removes bloom false positives, so the result is
    * EXACTLY the plain join (full oracle); the pruning ratio (~99% of
    * fact rows never enter the exchange) is spec-asserted. */
  def bloomJoin(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d).select("l_partkey", "l_quantity")
    val dim = Tables.part(s, d).where(col("p_size") === 15)
      .select("p_partkey", "p_brand")
    graft.ops.BloomJoin.join(fact, dim, "l_partkey", "p_partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).alias("cnt"),
        round(sum(col("l_quantity")), 2).alias("total_qty"))
  }

  /** B32: bucketed range join — click→purchase attribution as a batch
    * point-in-interval join (click_ts ∈ [purchase_ts − 1h,
    * purchase_ts]), expressed as an equi-join on 1h buckets + exact
    * residual filter. Same result set as the streaming interval join's
    * oracle; the spec additionally asserts the plan has no
    * BroadcastNestedLoopJoin/cartesian (what Spark's planner would do
    * with a raw range predicate). */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val tsType = org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").alias("click_id"),
        col("user_id"), col("ts").alias("click_ts"))
      .withColumn("__pt", unix_micros(col("click_ts").cast(tsType)))
    val hourUs = 3600L * 1000000L
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").alias("purchase_id"),
        col("user_id"), col("ts").alias("purchase_ts"),
        col("value").alias("purchase_value"))
      .withColumn("__end", unix_micros(col("purchase_ts").cast(tsType)))
      .withColumn("__start", col("__end") - hourUs)
    graft.ops.RangeJoin.pointInInterval(clicks, purchases, Seq("user_id"),
        "__pt", "__start", "__end", width = hourUs)
      .select("click_id", "purchase_id", "user_id", "click_ts",
        "purchase_ts", "purchase_value")
  }

  /** B30 (codebook half): product-quantized embedding codes + per-row
    * reconstruction error. Codebook training is deterministic
    * (lowest-id seeds, squared-L2 ties to the lowest cid, engine-neutral
    * rounding), so the DuckDB oracle replays the full per-sub-space
    * Lloyd training as CTEs — a complete hash-checked gate; the
    * ADC-equals-reconstruction identity and dup-recovery are
    * additionally spec-asserted (ProductQuantizeSpec). */
  def quantizePq(s: SparkSession, d: String): DataFrame = {
    import graft.ops.ProductQuantize
    val corpus = Tables.embeddings(s, d)
    val book = ProductQuantize.train(corpus, m = 8, k = 16, iters = 2)
    ProductQuantize.encode(corpus, book)
      .select(col("vec_id"),
        concat_ws(",", col("codes")).alias("codes"),
        col("recon_err"))
  }

  /** B7c: IVF+PQ compressed ANN — coarse lists + residual PQ codes,
    * probed search over nprobe lists with per-list ADC tables (the
    * FAISS IVFPQ shape; at 100 TB the scan reads m bytes per vector in
    * nprobe/nlist of the corpus). Fully oracled like [[quantizePq]]:
    * the DuckDB CTE replays coarse train, residual PQ train, and the
    * probed ADC scan end to end. */
  def annIvfPq(s: SparkSession, d: String): DataFrame = {
    import graft.ops.ProductQuantize
    val corpus = Tables.embeddings(s, d)
    val idx = ProductQuantize.buildIvfPq(corpus, nlist = 16, m = 8, k = 16,
      iters = 2)
    val q = corpus.orderBy("vec_id").select("embedding").head
      .getSeq[Any](0).map(_.asInstanceOf[Float].toDouble).toSeq
    ProductQuantize.ivfPqTopK(idx, q, k = 20, nprobe = 4)
  }

  /** B34b: incrementally-maintained IVF+PQ index — codebooks train on
    * the seed HALF of the corpus, then the second half arrives as a CDC
    * upsert, a slice is RE-EMBEDDED (vectors halved — exact in both
    * float and double, so engine-neutral), and a slice is deleted; the
    * probed ADC query runs over the final index state. Oracle replays
    * build-on-seed + frozen-book encode of the final corpus. */
  def annIvfPqIndex(s: SparkSession, d: String): DataFrame = {
    import graft.ops.IvfPqIndex
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val corpus = Tables.embeddings(s, d)
    IvfPqIndex.build(s, s"$root/idx", corpus.where(col("vec_id") < 250),
      nlist = 16, m = 8, k = 16)
    IvfPqIndex.upsert(s, s"$root/idx", corpus.where(col("vec_id") >= 250))
    val re = corpus.where(col("vec_id") < 10)
      .withColumn("embedding",
        transform(col("embedding"), x => (x * lit(0.5d)).cast("float")))
    IvfPqIndex.upsert(s, s"$root/idx", re)
    IvfPqIndex.delete(s, s"$root/idx",
      corpus.where(col("vec_id").between(100, 119)).select("vec_id"))
    val q = re.orderBy("vec_id").select("embedding").head.getSeq[Any](0).map {
      case f: Float => f.toDouble
      case dd: Double => dd
      case n: Number => n.doubleValue()
    }.toSeq
    IvfPqIndex.query(s, s"$root/idx", q, k = 20, nprobe = 4)
  }

  /** B25: BM25 relevance of every document against a fixed query.
    * Scores round to 6 decimals on BOTH sides: `ln` differs by ±1 ulp
    * between Math.log and libm, so raw doubles can't hash-match. */
  def rankBm25(s: SparkSession, d: String): DataFrame =
    Ranking.bm25(Tables.documents(s, d), Seq("spark", "join", "filter"))
      .select(col("doc_id"), round(col("bm25"), 6).alias("bm25"))

  /** B35: token-window chunking (64-token windows, 8-token overlap);
    * chunk text hashed so the oracle compare stays compact. */
  def chunkDocuments(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chunk(Tables.documents(s, d), maxTokens = 64, overlap = 8)
      .select(col("doc_id"), col("chunk_id"), col("tok_start"), col("tok_end"),
        md5(col("chunk_text")).alias("chunk_md5"))

  /** B33: unigram-LM perplexity scoring (reported as avg −ln p(w)). */
  def textPerplexity(s: SparkSession, d: String): DataFrame =
    Ranking.unigramLogPpl(Tables.documents(s, d))
      .select(col("doc_id"), col("n_tokens"),
        round(col("log_ppl"), 6).alias("log_ppl"))

  /** B36: hybrid BM25 + dense retrieval fused by reciprocal rank —
    * the full-oracle composition of B25's lexical ranking and B6's
    * cosine ranking (doc identity: doc_id == vec_id). */
  def hybridRetrieval(s: SparkSession, d: String): DataFrame =
    graft.ops.Retrieval.hybridRrf(
      Tables.documents(s, d), Tables.embeddings(s, d),
      terms = Seq("spark", "join", "filter"), queryVecId = 0L,
      n = 100, k = 20)

  /** B37: deterministic spherical k-means topic assignment (lowest-id
    * seeds, 2 Lloyd iterations, engine-neutral centroid rounding) —
    * the oracle replays the identical iterations as DuckDB CTEs. */
  def clusterKmeans(s: SparkSession, d: String): DataFrame =
    graft.ops.Clustering.kmeansAssign(Tables.embeddings(s, d), k = 8, iters = 2)

  /** B38: temperature-weighted source mixing (α = 0.5 up-samples tail
    * sources) toward a 300-row mix, seeded md5 row selection. */
  def mixTemperature(s: SparkSession, d: String): DataFrame =
    graft.ops.Export.temperatureMix(Tables.documents(s, d), "source", "doc_id",
      alpha = 0.5, targetRows = 300L, seed = 7L)
      .select("doc_id", "source", "keep_rate")

  // --- registration -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens"       -> (textTokens _),
    "text_quality"      -> (textQuality _),
    "text_langid"       -> (textLangid _),
    "text_fingerprint"  -> (textFingerprint _),
    "dedup_exact"       -> (dedupExact _),
    "dedup_jaccard"     -> (dedupJaccard _),
    "dedup_minhash"     -> (dedupMinhash _),
    "dedup_simhash"     -> (dedupSimhash _),
    "dedup_embedding"   -> (dedupEmbedding _),
    "ann_bruteforce"    -> (annBruteforce _),
    "ann_lsh"           -> (annLsh _),
    "multimodal_meta"   -> (multimodalMeta _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_features" -> (multimodalFeatures _),
    "split_train_test"  -> (splitTrainTest _),
    "text_normalize"    -> (textNormalize _),
    "sketch_profile"    -> (sketchProfile _),
    "stream_window_agg"     -> (streamWindowAgg _),
    "stream_sliding_window" -> (streamSlidingWindow _),
    "stream_static_join"    -> (streamStaticJoin _),
    "stream_dedup"          -> (streamDedup _),
    "ann_ivf"           -> (annIvf _),
    "join_salted_skew"  -> (joinSaltedSkew _),
    "text_pii_scrub"    -> (textPiiScrub _),
    "text_vocab_topk"   -> (textVocabTopk _),
    "sample_stratified" -> (sampleStratified _),
    "contamination_check" -> (contaminationCheck _),
    "pack_sequences"    -> (packSequences _),
    "dedup_clusters"    -> (dedupClusters _),
    "stream_sessionize"     -> (streamSessionize _),
    "stream_series_similarity" -> (streamSeriesSimilarity _),
    "stream_sessionize_native" -> (streamSessionizeNative _),
    "asof_join"         -> (asofJoin _),
    "rank_bm25"         -> (rankBm25 _),
    "join_cobucket"     -> (joinCobucket _),
    "stream_interval_join" -> (streamIntervalJoin _),
    "curate_docs"       -> (curateDocs _),
    "export_shards"     -> (exportShards _),
    "bloom_join"        -> (bloomJoin _),
    "quantize_embeddings" -> (quantizeEmbeddings _),
    "quantize_pq"       -> (quantizePq _),
    "ann_ivfpq"         -> (annIvfPq _),
    "ann_ivfpq_index"   -> (annIvfPqIndex _),
    "sample_per_group"  -> (samplePerGroup _),
    "stream_interval_left" -> (streamIntervalJoinLeft _),
    "range_join"        -> (rangeJoin _),
    "text_perplexity"   -> (textPerplexity _),
    "ann_index_incremental" -> (annIndexIncremental _),
    "chunk_documents"   -> (chunkDocuments _),
    "hybrid_retrieval"  -> (hybridRetrieval _),
    "cluster_kmeans"    -> (clusterKmeans _),
    "mix_temperature"   -> (mixTemperature _),
    "dedup_cross"       -> (dedupCross _),
    "dedup_ingest"      -> (dedupIngest _))

  private val stop10 = "['the','a','of','and','to','in','is','on','for','with']"

  val oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
         len(string_split(text, ' ')) AS ws_tokens,
         len(regexp_extract_all(text, '[a-z]+')) AS word_tokens,
         strlen(text) AS byte_len
         FROM documents""",
    "text_quality" -> s"""
         WITH t AS (SELECT doc_id, text, string_split(text, ' ') w FROM documents),
         c AS (SELECT doc_id, len(w) AS n_words,
           CAST(len(list_filter(w, x -> list_contains($stop10, x))) AS DOUBLE) / len(w) AS sr,
           CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dr,
           CAST(strlen(text) - len(w) + 1 AS DOUBLE) / len(w) AS mwl
           FROM t)
         SELECT doc_id, n_words, round(sr, 4) AS stop_ratio,
           round(dr, 4) AS distinct_ratio, round(mwl, 4) AS mean_word_len,
           round(least(1.0, sr * 2.0 + dr * 0.5 +
             CASE WHEN mwl BETWEEN 3.0 AND 8.0 THEN 0.25 ELSE 0.0 END), 4) AS quality_score
         FROM c""",
    "text_langid" -> """
         WITH t AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
         c AS (SELECT doc_id, lang,
           len(list_filter(w, x -> list_contains(['the','and','of','is'], x))) AS c_en,
           len(list_filter(w, x -> list_contains(['der','die','und','ist'], x))) AS c_de,
           len(list_filter(w, x -> list_contains(['le','la','et','est'], x))) AS c_fr,
           len(list_filter(w, x -> list_contains(['el','los','y','es'], x))) AS c_es
           FROM t),
         g AS (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS best FROM c)
         SELECT doc_id, lang,
           CASE WHEN c_en = best AND best > 0 THEN 'en'
                WHEN c_de = best AND best > 0 THEN 'de'
                WHEN c_fr = best AND best > 0 THEN 'fr'
                WHEN c_es = best AND best > 0 THEN 'es'
                ELSE 'und' END AS lang_pred
         FROM g""",
    "text_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
    "split_train_test" -> """
         SELECT doc_id, lang,
           CASE WHEN doc_id % 100 < 80 THEN 'train'
                WHEN doc_id % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM documents""",
    "text_normalize" -> """
         SELECT doc_id,
           regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),
             '\s+', ' ', 'g') AS norm_text
         FROM documents""",
    "dedup_exact" -> """
         WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50)
         SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           count(*) OVER (PARTITION BY md5(text)) AS group_size,
           doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
         FROM all_docs""",
    "dedup_jaccard" -> """
         WITH sh AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""",
    // B39: cross-set all-pairs jaccard (quadratic oracle — sf0.01-only
    // by the standing policy, like the other jaccard oracles)
    "dedup_cross" -> """
         WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id >= 400
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50),
         old AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
         shn AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM newd)),
         sho AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM old)),
         p AS (SELECT a.doc_id AS new_id, b.doc_id AS old_id,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM shn a CROSS JOIN sho b)
         SELECT new_id, old_id, jaccard FROM p WHERE jaccard >= 0.5""",
    // B39 persisted form: the store holds docs < 400 (seed + admit),
    // probed by the same batch — the SAME cross-set expectation as
    // dedup_cross (quadratic oracle, sf0.01-only by standing policy)
    "dedup_ingest" -> """
         WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id >= 400
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50),
         old AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
         shn AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM newd)),
         sho AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM old)),
         p AS (SELECT a.doc_id AS new_id, b.doc_id AS old_id,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM shn a CROSS JOIN sho b)
         SELECT new_id, old_id, jaccard FROM p WHERE jaccard >= 0.5""",
    // the LSH pipeline at bands=32 provably recovers every J >= 0.5
    // pair on this corpus, so its verified output IS the all-pairs
    // jaccard result — the same oracle asserts full recall+precision
    "dedup_minhash" -> """
         WITH sh AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""",
    // only the 50 planted perturbed copies clear cosine >= 0.99 (the
    // corpus's max natural pairwise cosine is ~0.51); multi-probe LSH
    // must return exactly those pairs
    "dedup_embedding" -> """
         SELECT vec_id AS id_a, vec_id + 1000000 AS id_b
         FROM embeddings WHERE vec_id < 50""",
    // nprobe = nlist → IVF is exhaustive → identical to brute force
    // (same (sim desc, neighbor_id) tie-break, same round-6 sims)
    "ann_ivf" -> """
         WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         s AS (SELECT query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(qv, c.embedding::DOUBLE[]), 6) AS sim
               FROM q, embeddings c WHERE c.vec_id != query_id),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5""",
    "ann_lsh" -> """
         WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         s AS (SELECT query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(qv, c.embedding::DOUBLE[]), 6) AS sim
               FROM q, embeddings c WHERE c.vec_id != query_id),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5""",
    // incremental index at nprobe = nlist == brute force over the
    // final corpus (build ∪ upserts = the whole embeddings table)
    "ann_index_incremental" -> """
         WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         s AS (SELECT query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(qv, c.embedding::DOUBLE[]), 6) AS sim
               FROM q, embeddings c WHERE c.vec_id != query_id),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5""",
    "ann_bruteforce" -> """
         WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         s AS (SELECT query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(qv, c.embedding::DOUBLE[]), 6) AS sim
               FROM q, embeddings c WHERE c.vec_id != query_id),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5""",
    "multimodal_frames" -> """
         SELECT doc_id, unnest(range(0, strlen(text) // 1000 + 1, 2)) AS frame_idx
         FROM documents""",
    "multimodal_meta" -> """
         SELECT doc_id, CAST(strlen(text) AS INT) AS byte_len,
           CASE WHEN strlen(text) % 3 = 0 THEN 'image'
                WHEN strlen(text) % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(strlen(text) % 640 AS INT) AS width,
           CAST(strlen(text) % 480 AS INT) AS height,
           CAST(strlen(text) // 1000 + 1 AS INT) AS frames
         FROM documents""",
    "stream_window_agg" -> """
         SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS cnt, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2""",
    "stream_dedup" ->
      "SELECT event_id, event_type, value FROM events",
    "stream_sliding_window" -> """
         WITH ws AS (
           SELECT date_trunc('hour', ts) AS window_start, event_type, value FROM events
           UNION ALL
           SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events)
         SELECT window_start, event_type, count(*) AS cnt,
           round(sum(value), 2) AS total
         FROM ws GROUP BY window_start, event_type""",
    "stream_static_join" -> """
         SELECT event_id, event_type,
           CASE event_type WHEN 'click' THEN 'engagement'
                           WHEN 'view' THEN 'engagement'
                           WHEN 'purchase' THEN 'conversion'
                           WHEN 'signup' THEN 'conversion'
                           ELSE 'problem' END AS category,
           value
         FROM events""",
    "stream_series_similarity" -> """
         WITH h AS (SELECT user_id, date_trunc('hour', ts) AS h, avg(value) AS v
             FROM events GROUP BY user_id, date_trunc('hour', ts)),
         t AS (SELECT h, v AS tv FROM h WHERE user_id = 1),
         s AS (SELECT user_id, round(corr(v, tv), 4) AS similarity,
             count(*) AS overlap_hours
           FROM h JOIN t USING (h) WHERE user_id <> 1 GROUP BY user_id),
         f AS (SELECT * FROM s
           WHERE overlap_hours >= 3 AND similarity IS NOT NULL),
         r AS (SELECT user_id, similarity, overlap_hours,
             row_number() OVER (ORDER BY similarity DESC, user_id ASC) AS rank
           FROM f)
         SELECT user_id, similarity, overlap_hours, rank FROM r
         WHERE rank <= 10""",
    "stream_sessionize" -> """
         WITH l AS (SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events),
         f AS (SELECT user_id, ts,
             CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
               THEN 1 ELSE 0 END AS flag
           FROM l),
         s AS (SELECT user_id, ts,
             CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, session_id, count(*) AS n_events,
           date_trunc('second', min(ts)) AS session_start,
           date_trunc('second', max(ts)) AS session_end
         FROM s GROUP BY user_id, session_id""",
    "text_pii_scrub" -> """
         WITH t AS (SELECT doc_id,
             text || ' contact user' || doc_id ||
               '@example.com or 555-123-4567 at 10.0.0.' || (doc_id % 256)
               AS text FROM documents),
         r AS (SELECT doc_id, text,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed
           FROM t)
         SELECT doc_id, scrubbed, scrubbed <> text AS pii_found FROM r""",
    "text_vocab_topk" -> """
         WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         c AS (SELECT word, count(*) AS freq FROM w WHERE word <> '' GROUP BY word),
         r AS (SELECT word, freq,
             row_number() OVER (ORDER BY freq DESC, word ASC) AS rank FROM c)
         SELECT word, freq, rank FROM r WHERE rank <= 100""",
    "contamination_check" -> """
         WITH g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 13
               THEN list_distinct([array_to_string(w[i:i+12], ' ')
                                   for i in range(1, len(w) - 11)])
               ELSE [text] END) AS gram
           FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents)),
         e AS (SELECT doc_id + 9000000 AS eval_id, gram FROM g WHERE doc_id < 10)
         SELECT g.doc_id AS train_id,
           count(DISTINCT e.eval_id) AS n_eval_docs,
           count(*) AS n_shared_ngrams
         FROM g JOIN e ON g.gram = e.gram
         GROUP BY g.doc_id""",
    "sample_stratified" -> """
         SELECT doc_id, lang FROM documents
         WHERE doc_id % 100 < CASE lang WHEN 'en' THEN 50
           WHEN 'de' THEN 30 ELSE 10 END""",
    "pack_sequences" -> """
         WITH t AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         b AS (SELECT doc_id, lang, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
           FROM t)
         SELECT doc_id, lang, n_tokens,
           CAST(floor(before / 2048.0) AS BIGINT) AS bin_id,
           CAST(before % 2048 AS BIGINT) AS bin_offset
         FROM b""",
    "dedup_clusters" -> """
         WITH RECURSIVE
         sh AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.5),
         e AS (SELECT id_a AS a, id_b AS b FROM p
           UNION ALL SELECT id_b, id_a FROM p),
         reach(src, dst) AS (
           SELECT a, b FROM e
           UNION
           SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
         m AS (SELECT src AS doc_id, min(dst) AS min_reach
           FROM reach GROUP BY src)
         SELECT d.doc_id,
           CASE WHEN m.min_reach IS NULL OR d.doc_id < m.min_reach
             THEN d.doc_id ELSE m.min_reach END AS cluster_id
         FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id""",
    "join_salted_skew" -> """
         WITH fact AS (SELECT
             CASE WHEN l_orderkey % 10 < 7 THEN 0
               ELSE l_orderkey % 25 END AS skew_key,
             l_quantity FROM lineitem)
         SELECT n_name, count(*) AS cnt,
           round(sum(l_quantity), 2) AS total_qty
         FROM fact JOIN nation ON skew_key = n_nationkey
         GROUP BY n_name""",
    "stream_sessionize_native" -> """
         WITH l AS (SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events),
         f AS (SELECT user_id, ts,
             CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
               THEN 1 ELSE 0 END AS flag
           FROM l),
         s AS (SELECT user_id, ts,
             sum(flag) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
           FROM f),
         g AS (SELECT user_id, session_id, count(*) AS n_events,
             date_trunc('second', min(ts)) AS session_start,
             date_trunc('second', max(ts)) AS session_end
           FROM s GROUP BY user_id, session_id)
         SELECT user_id, n_events, session_start, session_end FROM g""",
    // ts is TIMESTAMP_NS in DuckDB but µs-truncated in Spark (Tables
    // .events) — CAST both sides to µs TIMESTAMP before comparing
    "asof_join" -> """
         WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
             FROM events WHERE event_type = 'click'),
         r0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id
             FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, arg_max(value, event_id) AS purchase_value
             FROM r0 GROUP BY user_id, ts)
         SELECT l.event_id, l.user_id, l.ts, l.value,
             r.purchase_value, r.ts AS purchase_ts
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    // B36: identical BM25 formula to rank_bm25 + cosine ranks, fused
    "hybrid_retrieval" -> """
         WITH tok AS (SELECT doc_id,
             unnest(string_split_regex(text, '\s+')) AS term FROM documents),
         tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
         stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
             WHERE term IN ('spark', 'join', 'filter') GROUP BY doc_id, term),
         dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         lex AS (SELECT tf.doc_id,
             round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                 tf * (1.2 + 1.0) /
                 (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
           FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           GROUP BY tf.doc_id),
         lexr AS (SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM lex),
         lexn AS (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= 100),
         q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         vec AS (SELECT e.vec_id AS doc_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
           FROM embeddings e, q WHERE e.vec_id <> 0),
         vecr AS (SELECT doc_id,
             row_number() OVER (ORDER BY sim DESC, doc_id) AS vec_rank FROM vec),
         vecn AS (SELECT doc_id, vec_rank FROM vecr WHERE vec_rank <= 100),
         f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             round(coalesce(1.0 / (60 + l.lex_rank), 0.0) +
                   coalesce(1.0 / (60 + v.vec_rank), 0.0), 6) AS rrf
           FROM lexn l FULL OUTER JOIN vecn v ON l.doc_id = v.doc_id)
         SELECT doc_id, lex_rank, vec_rank, rrf FROM f
         ORDER BY rrf DESC, doc_id LIMIT 20""",
    // B37: the same 2 Lloyd iterations graft runs, as CTEs — lowest-id
    // seeds, argmax cosine (ties -> lowest cluster), per-dim means
    // rounded by the engine-neutral floor(x*1e6+0.5)/1e6
    "cluster_kmeans" -> """
         WITH c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 8),
         a0 AS (SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                 c.cid) AS rn
           FROM embeddings e CROSS JOIN c0 c),
         s0 AS (SELECT vec_id, cid FROM a0 WHERE rn = 1),
         x0 AS (SELECT s.cid, generate_subscripts(e.embedding, 1) AS i,
             unnest(e.embedding::DOUBLE[]) AS v
           FROM embeddings e JOIN s0 s USING (vec_id)),
         m0 AS (SELECT cid, i, floor(avg(v) * 1e6 + 0.5) / 1e6 AS m
           FROM x0 GROUP BY cid, i),
         u0 AS (SELECT cid, list(m ORDER BY i) AS cv FROM m0 GROUP BY cid),
         c1 AS (SELECT c0.cid, coalesce(u0.cv, c0.cv) AS cv
           FROM c0 LEFT JOIN u0 USING (cid)),
         a1 AS (SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                 c.cid) AS rn
           FROM embeddings e CROSS JOIN c1 c),
         s1 AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
         x1 AS (SELECT s.cid, generate_subscripts(e.embedding, 1) AS i,
             unnest(e.embedding::DOUBLE[]) AS v
           FROM embeddings e JOIN s1 s USING (vec_id)),
         m1 AS (SELECT cid, i, floor(avg(v) * 1e6 + 0.5) / 1e6 AS m
           FROM x1 GROUP BY cid, i),
         u1 AS (SELECT cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY cid),
         c2 AS (SELECT c1.cid, coalesce(u1.cv, c1.cv) AS cv
           FROM c1 LEFT JOIN u1 USING (cid)),
         a2 AS (SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                 c.cid) AS rn
           FROM embeddings e CROSS JOIN c2 c)
         SELECT vec_id, cid AS cluster_id FROM a2 WHERE rn = 1""",
    // B30b: full PQ replay — per sub-space (m=8, subDim=8) the same 2
    // Lloyd iterations as cluster_kmeans (lowest-id seeds, squared-L2
    // argmin with ties -> lowest cid, floor(x*1e6+0.5)/1e6 means),
    // then codes + reconstruction error from the final codebook
    "quantize_pq" -> """
         WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         sub AS (SELECT CAST(s AS INT) AS s FROM range(8) t(s)),
         es AS (SELECT e.vec_id, sub.s, list_slice(e.v, sub.s*8+1, sub.s*8+8) AS sv
             FROM e CROSS JOIN sub),
         c0 AS (SELECT s, CAST(vec_id AS INT) AS cid, sv AS cv FROM es WHERE vec_id < 16),
         a0 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
               PARTITION BY es.vec_id, es.s
               ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
           FROM es JOIN c0 c USING (s)),
         s0 AS (SELECT vec_id, s, cid FROM a0 WHERE rn = 1),
         x0 AS (SELECT s0.s, s0.cid, generate_subscripts(es.sv, 1) AS i, unnest(es.sv) AS x
           FROM es JOIN s0 ON es.vec_id = s0.vec_id AND es.s = s0.s),
         m0 AS (SELECT s, cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM x0 GROUP BY s, cid, i),
         u0 AS (SELECT s, cid, list(m ORDER BY i) AS cv FROM m0 GROUP BY s, cid),
         c1 AS (SELECT c0.s, c0.cid, coalesce(u0.cv, c0.cv) AS cv
           FROM c0 LEFT JOIN u0 ON c0.s = u0.s AND c0.cid = u0.cid),
         a1 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
               PARTITION BY es.vec_id, es.s
               ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
           FROM es JOIN c1 c USING (s)),
         s1 AS (SELECT vec_id, s, cid FROM a1 WHERE rn = 1),
         x1 AS (SELECT s1.s, s1.cid, generate_subscripts(es.sv, 1) AS i, unnest(es.sv) AS x
           FROM es JOIN s1 ON es.vec_id = s1.vec_id AND es.s = s1.s),
         m1 AS (SELECT s, cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM x1 GROUP BY s, cid, i),
         u1 AS (SELECT s, cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY s, cid),
         c2 AS (SELECT c1.s, c1.cid, coalesce(u1.cv, c1.cv) AS cv
           FROM c1 LEFT JOIN u1 ON c1.s = u1.s AND c1.cid = u1.cid),
         a2 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
               PARTITION BY es.vec_id, es.s
               ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
           FROM es JOIN c2 c USING (s)),
         s2 AS (SELECT vec_id, s, cid FROM a2 WHERE rn = 1),
         codes AS (SELECT vec_id, string_agg(cid, ',' ORDER BY s) AS codes
           FROM s2 GROUP BY vec_id),
         r AS (SELECT s2.vec_id,
               sum(list_sum(list_transform(list_zip(c2.cv, es.sv),
                 p -> (p[1]-p[2])*(p[1]-p[2])))) AS sq
           FROM s2 JOIN c2 ON c2.s = s2.s AND c2.cid = s2.cid
             JOIN es ON es.vec_id = s2.vec_id AND es.s = s2.s
           GROUP BY s2.vec_id)
         SELECT codes.vec_id, codes.codes, round(sqrt(r.sq), 4) AS recon_err
         FROM codes JOIN r USING (vec_id)""",
    // B7c: IVF+PQ replay — coarse k-means (nlist=16, squared-L2), PQ on
    // RESIDUALS vs the final coarse centroids, then nprobe=4 probed ADC
    // with per-list residual query tables, top-20 by (round(adc,6), id)
    "ann_ivfpq" -> """
         WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         g0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 16),
         b0 AS (SELECT e.vec_id, g.cid, row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_sum(list_transform(list_zip(e.v, g.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
           FROM e CROSS JOIN g0 g),
         t0 AS (SELECT vec_id, cid FROM b0 WHERE rn = 1),
         y0 AS (SELECT t0.cid, generate_subscripts(e.v, 1) AS i, unnest(e.v) AS x
           FROM e JOIN t0 USING (vec_id)),
         n0 AS (SELECT cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM y0 GROUP BY cid, i),
         v0 AS (SELECT cid, list(m ORDER BY i) AS cv FROM n0 GROUP BY cid),
         g1 AS (SELECT g0.cid, coalesce(v0.cv, g0.cv) AS cv FROM g0 LEFT JOIN v0 USING (cid)),
         b1 AS (SELECT e.vec_id, g.cid, row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_sum(list_transform(list_zip(e.v, g.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
           FROM e CROSS JOIN g1 g),
         t1 AS (SELECT vec_id, cid FROM b1 WHERE rn = 1),
         y1 AS (SELECT t1.cid, generate_subscripts(e.v, 1) AS i, unnest(e.v) AS x
           FROM e JOIN t1 USING (vec_id)),
         n1 AS (SELECT cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM y1 GROUP BY cid, i),
         v1 AS (SELECT cid, list(m ORDER BY i) AS cv FROM n1 GROUP BY cid),
         g2 AS (SELECT g1.cid, coalesce(v1.cv, g1.cv) AS cv FROM g1 LEFT JOIN v1 USING (cid)),
         bf AS (SELECT e.vec_id, g.cid, row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_sum(list_transform(list_zip(e.v, g.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
           FROM e CROSS JOIN g2 g),
         lst AS (SELECT vec_id, cid AS lid FROM bf WHERE rn = 1),
         rs AS (SELECT e.vec_id, lst.lid,
               list_transform(list_zip(e.v, g2.cv), p -> p[1]-p[2]) AS rv
           FROM e JOIN lst USING (vec_id) JOIN g2 ON g2.cid = lst.lid),
         sub AS (SELECT CAST(s AS INT) AS s FROM range(8) t(s)),
         es AS (SELECT rs.vec_id, sub.s, list_slice(rs.rv, sub.s*8+1, sub.s*8+8) AS sv
           FROM rs CROSS JOIN sub),
         c0 AS (SELECT s, CAST(vec_id AS INT) AS cid, sv AS cv FROM es WHERE vec_id < 16),
         a0 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
               PARTITION BY es.vec_id, es.s
               ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
           FROM es JOIN c0 c USING (s)),
         s0 AS (SELECT vec_id, s, cid FROM a0 WHERE rn = 1),
         x0 AS (SELECT s0.s, s0.cid, generate_subscripts(es.sv, 1) AS i, unnest(es.sv) AS x
           FROM es JOIN s0 ON es.vec_id = s0.vec_id AND es.s = s0.s),
         m0 AS (SELECT s, cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM x0 GROUP BY s, cid, i),
         u0 AS (SELECT s, cid, list(m ORDER BY i) AS cv FROM m0 GROUP BY s, cid),
         c1 AS (SELECT c0.s, c0.cid, coalesce(u0.cv, c0.cv) AS cv
           FROM c0 LEFT JOIN u0 ON c0.s = u0.s AND c0.cid = u0.cid),
         a1 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
               PARTITION BY es.vec_id, es.s
               ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
           FROM es JOIN c1 c USING (s)),
         s1 AS (SELECT vec_id, s, cid FROM a1 WHERE rn = 1),
         x1 AS (SELECT s1.s, s1.cid, generate_subscripts(es.sv, 1) AS i, unnest(es.sv) AS x
           FROM es JOIN s1 ON es.vec_id = s1.vec_id AND es.s = s1.s),
         m1 AS (SELECT s, cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM x1 GROUP BY s, cid, i),
         u1 AS (SELECT s, cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY s, cid),
         c2 AS (SELECT c1.s, c1.cid, coalesce(u1.cv, c1.cv) AS cv
           FROM c1 LEFT JOIN u1 ON c1.s = u1.s AND c1.cid = u1.cid),
         a2 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
               PARTITION BY es.vec_id, es.s
               ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                 p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
           FROM es JOIN c2 c USING (s)),
         s2 AS (SELECT vec_id, s, cid FROM a2 WHERE rn = 1),
         q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
         pd AS (SELECT g2.cid, list_sum(list_transform(list_zip(g2.cv, q.qv),
               p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
           FROM g2 CROSS JOIN q),
         pr AS (SELECT cid FROM pd ORDER BY d, cid LIMIT 4),
         qr AS (SELECT g2.cid AS lid, sub.s,
               list_slice(list_transform(list_zip(q.qv, g2.cv), p -> p[1]-p[2]),
                 sub.s*8+1, sub.s*8+8) AS qsv
           FROM g2 CROSS JOIN q CROSS JOIN sub
           WHERE g2.cid IN (SELECT cid FROM pr)),
         adcs AS (SELECT lst.vec_id,
               sum(list_sum(list_transform(list_zip(c2.cv, qr.qsv),
                 p -> (p[1]-p[2])*(p[1]-p[2])))) AS adc
           FROM lst
           JOIN s2 ON s2.vec_id = lst.vec_id
           JOIN c2 ON c2.s = s2.s AND c2.cid = s2.cid
           JOIN qr ON qr.lid = lst.lid AND qr.s = s2.s
           WHERE lst.lid IN (SELECT cid FROM pr)
           GROUP BY lst.vec_id),
         top AS (SELECT vec_id AS neighbor_id, round(adc, 6) AS adc FROM adcs
           ORDER BY round(adc, 6), vec_id LIMIT 20)
         SELECT neighbor_id,
           CAST(row_number() OVER (ORDER BY adc, neighbor_id) AS INT) AS rank, adc
         FROM top""",
    // B34b: build-on-seed (vec_id < 250) + FROZEN-book encode of the
    // final corpus (second half upserted, ids < 10 re-embedded as exact
    // halves, ids 100-119 deleted), probed ADC over the final state
    "ann_ivfpq_index" -> """
         WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         sd AS (SELECT vec_id, v FROM e WHERE vec_id < 250),
         g0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM sd WHERE vec_id < 16),
         b0 AS (SELECT sd.vec_id, g.cid, row_number() OVER (PARTITION BY sd.vec_id
                  ORDER BY list_sum(list_transform(list_zip(sd.v, g.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
                FROM sd CROSS JOIN g0 g),
         t0 AS (SELECT vec_id, cid FROM b0 WHERE rn = 1),
         y0 AS (SELECT t0.cid, generate_subscripts(sd.v, 1) AS i, unnest(sd.v) AS x
                FROM sd JOIN t0 USING (vec_id)),
         n0 AS (SELECT cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM y0 GROUP BY cid, i),
         v0 AS (SELECT cid, list(m ORDER BY i) AS cv FROM n0 GROUP BY cid),
         g1 AS (SELECT g0.cid, coalesce(v0.cv, g0.cv) AS cv FROM g0 LEFT JOIN v0 USING (cid)),
         b1 AS (SELECT sd.vec_id, g.cid, row_number() OVER (PARTITION BY sd.vec_id
                  ORDER BY list_sum(list_transform(list_zip(sd.v, g.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
                FROM sd CROSS JOIN g1 g),
         t1 AS (SELECT vec_id, cid FROM b1 WHERE rn = 1),
         y1 AS (SELECT t1.cid, generate_subscripts(sd.v, 1) AS i, unnest(sd.v) AS x
                FROM sd JOIN t1 USING (vec_id)),
         n1 AS (SELECT cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM y1 GROUP BY cid, i),
         v1 AS (SELECT cid, list(m ORDER BY i) AS cv FROM n1 GROUP BY cid),
         g2 AS (SELECT g1.cid, coalesce(v1.cv, g1.cv) AS cv FROM g1 LEFT JOIN v1 USING (cid)),
         bf AS (SELECT sd.vec_id, g.cid, row_number() OVER (PARTITION BY sd.vec_id
                  ORDER BY list_sum(list_transform(list_zip(sd.v, g.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
                FROM sd CROSS JOIN g2 g),
         lst AS (SELECT vec_id, cid AS lid FROM bf WHERE rn = 1),
         rs AS (SELECT sd.vec_id, lst.lid,
                  list_transform(list_zip(sd.v, g2.cv), p -> p[1]-p[2]) AS rv
                FROM sd JOIN lst USING (vec_id) JOIN g2 ON g2.cid = lst.lid),
         sub AS (SELECT CAST(s AS INT) AS s FROM range(8) t(s)),
         es AS (SELECT rs.vec_id, sub.s, list_slice(rs.rv, sub.s*8+1, sub.s*8+8) AS sv
                FROM rs CROSS JOIN sub),
         c0 AS (SELECT s, CAST(vec_id AS INT) AS cid, sv AS cv FROM es WHERE vec_id < 16),
         a0 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
                  PARTITION BY es.vec_id, es.s
                  ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
                FROM es JOIN c0 c USING (s)),
         s0 AS (SELECT vec_id, s, cid FROM a0 WHERE rn = 1),
         x0 AS (SELECT s0.s, s0.cid, generate_subscripts(es.sv, 1) AS i, unnest(es.sv) AS x
                FROM es JOIN s0 ON es.vec_id = s0.vec_id AND es.s = s0.s),
         m0 AS (SELECT s, cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM x0 GROUP BY s, cid, i),
         u0 AS (SELECT s, cid, list(m ORDER BY i) AS cv FROM m0 GROUP BY s, cid),
         c1 AS (SELECT c0.s, c0.cid, coalesce(u0.cv, c0.cv) AS cv
                FROM c0 LEFT JOIN u0 ON c0.s = u0.s AND c0.cid = u0.cid),
         a1 AS (SELECT es.vec_id, es.s, c.cid, row_number() OVER (
                  PARTITION BY es.vec_id, es.s
                  ORDER BY list_sum(list_transform(list_zip(es.sv, c.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
                FROM es JOIN c1 c USING (s)),
         s1 AS (SELECT vec_id, s, cid FROM a1 WHERE rn = 1),
         x1 AS (SELECT s1.s, s1.cid, generate_subscripts(es.sv, 1) AS i, unnest(es.sv) AS x
                FROM es JOIN s1 ON es.vec_id = s1.vec_id AND es.s = s1.s),
         m1 AS (SELECT s, cid, i, floor(avg(x)*1e6+0.5)/1e6 AS m FROM x1 GROUP BY s, cid, i),
         u1 AS (SELECT s, cid, list(m ORDER BY i) AS cv FROM m1 GROUP BY s, cid),
         c2 AS (SELECT c1.s, c1.cid, coalesce(u1.cv, c1.cv) AS cv
                FROM c1 LEFT JOIN u1 ON c1.s = u1.s AND c1.cid = u1.cid),
         fin AS (SELECT vec_id,
                   CASE WHEN vec_id < 10 THEN list_transform(v, x -> x*0.5) ELSE v END AS v
                 FROM e WHERE vec_id < 100 OR vec_id > 119),
         bf2 AS (SELECT fin.vec_id, g.cid, row_number() OVER (PARTITION BY fin.vec_id
                   ORDER BY list_sum(list_transform(list_zip(fin.v, g.cv),
                     p -> (p[1]-p[2])*(p[1]-p[2]))), g.cid) AS rn
                 FROM fin CROSS JOIN g2 g),
         lst2 AS (SELECT vec_id, cid AS lid FROM bf2 WHERE rn = 1),
         rs2 AS (SELECT fin.vec_id, lst2.lid,
                   list_transform(list_zip(fin.v, g2.cv), p -> p[1]-p[2]) AS rv
                 FROM fin JOIN lst2 USING (vec_id) JOIN g2 ON g2.cid = lst2.lid),
         es2 AS (SELECT rs2.vec_id, sub.s, list_slice(rs2.rv, sub.s*8+1, sub.s*8+8) AS sv
                 FROM rs2 CROSS JOIN sub),
         a3 AS (SELECT es2.vec_id, es2.s, c.cid, row_number() OVER (
                  PARTITION BY es2.vec_id, es2.s
                  ORDER BY list_sum(list_transform(list_zip(es2.sv, c.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
                FROM es2 JOIN c2 c USING (s)),
         s3 AS (SELECT vec_id, s, cid FROM a3 WHERE rn = 1),
         q AS (SELECT v AS qv FROM fin WHERE vec_id = 0),
         pd AS (SELECT g2.cid, list_sum(list_transform(list_zip(g2.cv, q.qv),
                  p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
                FROM g2 CROSS JOIN q),
         pr AS (SELECT cid FROM pd ORDER BY d, cid LIMIT 4),
         qr AS (SELECT g2.cid AS lid, sub.s,
                  list_slice(list_transform(list_zip(q.qv, g2.cv), p -> p[1]-p[2]),
                    sub.s*8+1, sub.s*8+8) AS qsv
                FROM g2 CROSS JOIN q CROSS JOIN sub
                WHERE g2.cid IN (SELECT cid FROM pr)),
         adcs AS (SELECT lst2.vec_id,
                    sum(list_sum(list_transform(list_zip(c2.cv, qr.qsv),
                      p -> (p[1]-p[2])*(p[1]-p[2])))) AS adc
                  FROM lst2
                  JOIN s3 ON s3.vec_id = lst2.vec_id
                  JOIN c2 ON c2.s = s3.s AND c2.cid = s3.cid
                  JOIN qr ON qr.lid = lst2.lid AND qr.s = s3.s
                  WHERE lst2.lid IN (SELECT cid FROM pr)
                  GROUP BY lst2.vec_id),
         top AS (SELECT vec_id AS neighbor_id, round(adc, 6) AS adc FROM adcs
                 ORDER BY round(adc, 6), vec_id LIMIT 20)
         SELECT neighbor_id,
           CAST(row_number() OVER (ORDER BY adc, neighbor_id) AS INT) AS rank, adc
         FROM top""",
    "rank_bm25" -> """
         WITH tok AS (SELECT doc_id,
             unnest(string_split_regex(text, '\s+')) AS term FROM documents),
         tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
         stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
             WHERE term IN ('spark', 'join', 'filter') GROUP BY doc_id, term),
         dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT tf.doc_id,
             round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                 tf * (1.2 + 1.0) /
                 (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
         FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         GROUP BY tf.doc_id""",
    "join_cobucket" -> """
         WITH r AS (SELECT l_orderkey AS o_orderkey,
             round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2)::DOUBLE AS sum_qty,
             count(*) AS line_cnt
           FROM lineitem GROUP BY l_orderkey)
         SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             sum_qty, line_cnt
         FROM orders LEFT JOIN r USING (o_orderkey)""",
    "curate_docs" -> s"""
         WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
         t AS (SELECT doc_id, text, string_split(text, ' ') w FROM all_docs),
         q AS (SELECT doc_id, len(w) AS n_words,
           round(least(1.0,
             CAST(len(list_filter(w, x -> list_contains($stop10, x))) AS DOUBLE) / len(w) * 2.0
             + CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.5
             + CASE WHEN CAST(strlen(text) - len(w) + 1 AS DOUBLE) / len(w)
                 BETWEEN 3.0 AND 8.0 THEN 0.25 ELSE 0.0 END), 4) AS qs
           FROM t),
         lc AS (SELECT doc_id,
           len(list_filter(w, x -> list_contains(['the','and','of','is'], x))) AS c_en,
           len(list_filter(w, x -> list_contains(['der','die','und','ist'], x))) AS c_de,
           len(list_filter(w, x -> list_contains(['le','la','et','est'], x))) AS c_fr,
           len(list_filter(w, x -> list_contains(['el','los','y','es'], x))) AS c_es
           FROM t),
         lg AS (SELECT doc_id, greatest(c_en, c_de, c_fr, c_es) AS best, * FROM lc),
         l AS (SELECT doc_id,
           CASE WHEN c_en = best AND best > 0 THEN 'en'
                WHEN c_de = best AND best > 0 THEN 'de'
                WHEN c_fr = best AND best > 0 THEN 'fr'
                WHEN c_es = best AND best > 0 THEN 'es'
                ELSE 'und' END AS lang_pred
           FROM lg),
         cn AS (SELECT doc_id,
             doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
           FROM all_docs),
         r AS (SELECT q.doc_id,
           CASE WHEN n_words < 20 THEN 'too_short'
                WHEN n_words > 2000 THEN 'too_long'
                WHEN qs < 0.5 THEN 'low_quality'
                WHEN lang_pred = 'und' THEN 'unknown_lang'
                WHEN NOT canonical THEN 'duplicate' END AS reason
           FROM q JOIN l USING (doc_id) JOIN cn USING (doc_id))
         SELECT doc_id, reason IS NULL AS keep, reason FROM r""",
    // B38: per-source counts -> temperature weights -> engine-neutral
    // rounded keep rates -> seeded md5 row threshold
    "mix_temperature" -> """
         WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         w AS (SELECT source, n, pow(CAST(n AS DOUBLE), 0.5) AS w FROM c),
         t AS (SELECT sum(w) AS tw FROM w),
         r AS (SELECT source,
             least(1.0, floor(300.0 * w / tw / n * 1e6 + 0.5) / 1e6) AS keep_rate
           FROM w CROSS JOIN t),
         h AS (SELECT doc_id, source,
             md5(CAST(doc_id AS VARCHAR) || '|' || '7') AS hx FROM documents),
         b AS (SELECT doc_id, source,
             (((((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) * 16
               + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)) * 16
               + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) * 16
               + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1)) * 16
               + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) AS bin
           FROM h)
         SELECT doc_id, b.source, keep_rate
         FROM b JOIN r ON b.source = r.source
         WHERE CAST(bin AS DOUBLE) / 16777216 < keep_rate""",
    "export_shards" -> """
         WITH h AS (SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR) || '|' || '42') AS hx
           FROM documents),
         b AS (SELECT doc_id, n_chars, hx,
             (((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) * 16
               + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)) * 16
               + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS bin
           FROM h)
         SELECT doc_id, n_chars, CAST(bin % 7 AS INT) AS shard,
             CAST(row_number() OVER (PARTITION BY bin % 7
               ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos
         FROM b""",
    // simhash candidates (chunk-bucketed, hamming <= 12) verified by
    // exact jaccard: recall is empirically total on this corpus, so the
    // output equals the all-pairs jaccard result
    "dedup_simhash" -> """
         WITH sh AS (SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""",
    "sample_per_group" -> """
         WITH r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || '7'), doc_id)
               AS smp_rank
           FROM documents)
         SELECT doc_id, lang, CAST(smp_rank AS BIGINT) AS smp_rank
         FROM r WHERE smp_rank <= 120""",
    // codes recomputed in DuckDB with the same explicit floor(x/s+0.5)
    // formula; the UNROUNDED scale feeds the codes, rounding is
    // display-only (separate CTE so the alias can't shadow it)
    "quantize_embeddings" -> """
         WITH m AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS s
           FROM embeddings),
         q AS (SELECT vec_id, s,
             list_transform(v, x -> CASE WHEN s = 0 THEN 0
               ELSE CAST(floor(x / s + 0.5) AS INT) END) AS qv
           FROM m)
         SELECT vec_id, round(s, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max
         FROM q""",
    // bloom pre-filter + real join == plain join, exactly
    "bloom_join" -> """
         SELECT p_brand, count(*) AS cnt,
             round(sum(l_quantity), 2) AS total_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 15 GROUP BY p_brand""",
    // 64-token windows, stride 56; DuckDB list slice is 1-based
    // inclusive, Spark slice(start, length) — both clamp at the end
    "chunk_documents" -> """
         WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         n AS (SELECT doc_id, w, len(w) AS n,
             greatest(1, CAST(ceil((len(w) - 8) / 56.0) AS BIGINT)) AS nc
           FROM t),
         c AS (SELECT doc_id, w, n, unnest(range(0, nc)) AS chunk_id FROM n)
         SELECT doc_id, chunk_id, chunk_id * 56 AS tok_start,
           least(chunk_id * 56 + 64, n) AS tok_end,
           md5(array_to_string(w[chunk_id * 56 + 1 : chunk_id * 56 + 64], ' '))
             AS chunk_md5
         FROM c""",
    "text_perplexity" -> """
         WITH w AS (SELECT doc_id,
             unnest(string_split_regex(text, '\s+')) AS term FROM documents),
         w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
         c AS (SELECT term, count(*) AS cnt FROM w2 GROUP BY term),
         t AS (SELECT sum(cnt) AS total FROM c)
         SELECT doc_id, count(*) AS n_tokens,
             round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 6) AS log_ppl
         FROM w2 JOIN c USING (term) CROSS JOIN t
         GROUP BY doc_id""",
    "range_join" -> """
         WITH c AS (SELECT event_id AS click_id, user_id,
             CAST(ts AS TIMESTAMP) AS click_ts
           FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id AS p_user_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
           FROM events WHERE event_type = 'purchase')
         SELECT click_id, purchase_id, user_id, click_ts,
             purchase_ts, purchase_value
         FROM c JOIN p ON c.user_id = p.p_user_id
           AND click_ts >= purchase_ts - INTERVAL 1 HOUR
           AND click_ts <= purchase_ts""",
    "stream_interval_left" -> """
         WITH c AS (SELECT event_id AS click_id, user_id,
             CAST(ts AS TIMESTAMP) AS click_ts
           FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id AS p_user_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
           FROM events WHERE event_type = 'purchase')
         SELECT click_id, purchase_id, user_id, click_ts,
             purchase_ts, purchase_value
         FROM c LEFT JOIN p ON c.user_id = p.p_user_id
           AND purchase_ts >= click_ts
           AND purchase_ts <= click_ts + INTERVAL 1 HOUR""",
    "stream_interval_join" -> """
         WITH c AS (SELECT event_id AS click_id, user_id,
             CAST(ts AS TIMESTAMP) AS click_ts
           FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
           FROM events WHERE event_type = 'purchase')
         SELECT click_id, purchase_id, c.user_id, click_ts,
             purchase_ts, purchase_value
         FROM c JOIN p ON c.user_id = p.user_id
           AND purchase_ts >= click_ts
           AND purchase_ts <= click_ts + INTERVAL 1 HOUR""")
}
