package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** r16 pin for the connected-components label propagation after the
  * monotone-sum convergence rewrite (one agg job per round instead of a
  * count + change-detection join): labels must still converge to the
  * minimum reachable doc id, including multi-round chains, and the
  * edgeless / empty cases must terminate. */
class NearDupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(ids: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val docs = ids.toDF("doc_id")
    val pairs = edges.toDF("id_a", "id_b")
    Dedup.nearDupClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain converges to the minimum reachable id (multi-round)") {
    // 1-2-3-4-5-6-7-8: min-label needs ~log2(chain) doubling rounds
    val labels = run(1L to 8L, (1L to 7L).map(i => (i, i + 1)))
    assert(labels == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("disjoint clusters keep separate representatives") {
    val labels = run(Seq(1L, 2L, 3L, 10L, 11L, 20L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("no edges: every doc is its own cluster, loop terminates early") {
    val labels = run(Seq(5L, 6L, 7L), Nil)
    assert(labels == Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }
}
