package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the σ-scaled estimate-prefilter slack ([[Dedup.estSlack]]) at
  * the THRESHOLD BOUNDARY — the property the fixed 0.05 slack violated:
  * the 64-lane minhash agreement fraction has σ = √(J(1−J)/64) ≈ 0.0625
  * at J = 0.5, so a sub-σ slack drops a true pair at exactly J = t
  * ~19% of the time. Gate corpora never see this (their true-pair J
  * distribution sits far above the threshold), so the property must be
  * pinned with CRAFTED pairs planted exactly at the boundary.
  *
  * Construction: docs are sequences of globally-unique words, a pair
  * sharing a p-word prefix with q/r unique suffix words. Distinct word
  * trigrams give |∩| = p−2, |∪| = p−2+q+r, so J = (p−2)/(p−2+q+r)
  * EXACTLY — pairs are planted at J ∈ {t, t+0.02, t+0.05} for t = 0.5.
  */
class BoundaryRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t = 0.5
  private val seeds = 20

  /** (docA, docB) sharing a p-word prefix, q and r unique suffix words:
    * trigram Jaccard exactly (p−2)/(p−2+q+r). All words unique per
    * (seed, tag) so no cross-pair edges ever appear. */
  private def pair(seed: Int, tag: String, p: Int, q: Int, r: Int): (String, String) = {
    def w(role: String, k: Int) = s"${role}${seed}x${tag}n$k"
    val common = (0 until p).map(w("c", _))
    val a = common ++ (0 until q).map(w("a", _))
    val b = common ++ (0 until r).map(w("b", _))
    (a.mkString(" "), b.mkString(" "))
  }

  // J = 0.50: (22−2)/(20+10+10); J = 0.52: 26/50; J = 0.55: 22/40
  private val shapes = Seq(
    ("j50", 22, 10, 10, 0.50), ("j52", 28, 12, 12, 0.52), ("j55", 24, 9, 9, 0.55))

  private lazy val planted: Seq[(Long, Long, Double)] =
    for {
      s <- 0 until seeds
      ((tag, _, _, _, j), i) <- shapes.zipWithIndex
    } yield {
      val idA = (s * 10 + i * 2).toLong
      (idA, idA + 1, j)
    }

  private lazy val docs = {
    val rows = for {
      s <- 0 until seeds
      ((tag, p, q, r, _), i) <- shapes.zipWithIndex
      (da, db) = pair(s, tag, p, q, r)
      row <- Seq(((s * 10 + i * 2).toLong, da), ((s * 10 + i * 2 + 1).toLong, db))
    } yield row
    rows.toDF("doc_id", "text").cache()
  }

  test("true pairs planted AT the threshold boundary survive minhashLsh end-to-end") {
    val found = Dedup.minhashLsh(docs, bands = 32, threshold = t)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision: nothing beyond the planted pairs (all other word sets
    // are disjoint, so any extra pair would be a verify bug)
    val plantedSet = planted.map(p => (p._1, p._2)).toSet
    assert(found.keySet.subsetOf(plantedSet),
      s"false positives: ${found.keySet -- plantedSet}")
    // exact-J sanity: the verify pass reports the planted jaccard
    found.foreach { case (k, j) =>
      val exp = planted.find(p => (p._1, p._2) == k).get._3
      assert(math.abs(j - exp) < 1e-9, s"pair $k jaccard $j != planted $exp")
    }
    // recall: banding at 32 bands of r=2 misses a J=0.5 pair w.p.
    // ~1e-4 — with the σ-scaled slack, misses must be at most the
    // banding layer's. Allow 1 of 60 (deterministic contents: observed
    // 60/60); the OLD 0.05 slack loses ~19% of the J=0.50 third.
    val missed = plantedSet -- found.keySet
    assert(missed.size <= 1, s"boundary recall broken: missed $missed")
  }

  test("the fixed 0.05 slack would have dropped planted boundary pairs (regression pin)") {
    // lane-agreement estimate for every planted pair, computed exactly
    // as the prefilter does — at least one true J=0.50 pair must sit
    // below the OLD cut (est < t − 0.05) while ALL pairs sit at or
    // above the σ-scaled cut modulo the ≤1 banding miss. Reverting
    // estSlack to a fixed 0.05 makes the end-to-end test above fail.
    val numHashes = 64
    val sig = docs
      .withColumn("__sh", graft.functions.HashExpressions.wordShingles(col("text"), 3))
      .withColumn("__sig",
        graft.functions.HashExpressions.minhashShingles(col("__sh"), numHashes))
      .select(col("doc_id"), col("__sig"))
    val pairsDf = planted.map(p => (p._1, p._2)).toDF("id_a", "id_b")
    val ests = pairsDf
      .join(sig.select(col("doc_id").alias("id_a"), col("__sig").alias("__siga")), "id_a")
      .join(sig.select(col("doc_id").alias("id_b"), col("__sig").alias("__sigb")), "id_b")
      .withColumn("__est",
        size(filter(zip_with(col("__siga"), col("__sigb"),
          (x, y) => (x === y).cast("int")), v => v === 1)).cast("double") / numHashes)
      .select("id_a", "id_b", "__est").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ests.size == planted.size)
    val belowOldCut = ests.filter(_._2 < t - 0.05)
    assert(belowOldCut.nonEmpty,
      "expected ≥1 planted boundary pair below the old fixed-0.05 cut " +
        s"(min est = ${ests.values.min}) — the corpus no longer exercises the hazard")
    val newCut = t - Dedup.estSlack(t, numHashes)
    val belowNewCut = ests.filter(_._2 < newCut)
    assert(belowNewCut.isEmpty,
      s"planted true pairs below the σ-scaled cut $newCut: $belowNewCut")
  }

  // --- the other three estSlack call sites (r13 verdict #4): each adds
  // its own recall layers on top of the shared slack — the planted
  // exact-J corpus must traverse ALL of them. The ≤1-missed assertions
  // double as the revert pin: a fixed 0.05 slack drops each J=0.50
  // pair ~19% of the time (20 planted), failing every test below.

  private val plantedSet = planted.map(p => (p._1, p._2)).toSet

  test("boundary pairs survive simhashNearDup (hamming layer held open)") {
    // the hamming prefilter is a recall layer BY CONTRACT (J=0.5 pairs
    // sit near 16/64 differing simhash bits, beyond the default 12) —
    // maxHamming=32 holds it open so banding + estimate slack decide,
    // which is exactly the layer under test
    val found = Dedup.simhashNearDup(docs, maxHamming = 32, threshold = t)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(found.keySet.subsetOf(plantedSet),
      s"false positives: ${found.keySet -- plantedSet}")
    val missed = plantedSet -- found.keySet
    assert(missed.size <= 1, s"simhash boundary recall broken: missed $missed")
  }

  test("boundary pairs split ACROSS frames survive crossDedup") {
    val aSide = docs.where(col("doc_id") % 2 === 0)
    val bSide = docs.where(col("doc_id") % 2 === 1)
    val found = Dedup.crossDedup(aSide, bSide, threshold = t)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(plantedSet), s"false positives: ${found -- plantedSet}")
    val missed = plantedSet -- found
    assert(missed.size <= 1, s"cross-frame boundary recall broken: missed $missed")
  }

  test("boundary pairs against STORED signatures survive SignatureStore.check") {
    // the store path adds signature persistence: the existing side's
    // signatures come off a KeyedTable snapshot (create + a later
    // admit batch), never recomputed — a boundary pair must survive
    // the round-trip through storage as well as the slack
    val root = java.nio.file.Files.createTempDirectory("brsig").toString
    val bSide = docs.where(col("doc_id") % 2 === 1)
    val (seedB, admitB) = (bSide.where(col("doc_id") % 4 === 1),
      bSide.where(col("doc_id") % 4 === 3))
    val store = SignatureStore.create(spark, s"$root/sig", seedB)
    SignatureStore.admit(store, admitB, batchId = 1L)
    val found = SignatureStore.check(store, docs.where(col("doc_id") % 2 === 0),
        threshold = t)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(plantedSet), s"false positives: ${found -- plantedSet}")
    val missed = plantedSet -- found
    assert(missed.size <= 1, s"stored-signature boundary recall broken: missed $missed")
  }
}
