package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(n: Int = 50, k: Int = 10) =
    Retrieval.hybridRrf(Tables.documents(spark, sf), Tables.embeddings(spark, sf),
      terms = Seq("spark", "join", "filter"), queryVecId = 0L, n = n, k = k)

  test("rrf equals the hand-computed fusion of the two rank lists") {
    val out = run().collect().map(r =>
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))).toSeq
    assert(out.nonEmpty && out.size <= 10)
    out.foreach { case (_, lex, vec, rrf) =>
      val expect = lex.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vec.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6, s"rrf $rrf != $expect")
      assert(lex.nonEmpty || vec.nonEmpty, "doc in neither list surfaced")
    }
    // output is rrf-descending with id tiebreak
    val scores = out.map(o => (-o._4, o._1))
    assert(scores == scores.sorted, s"not rrf-ordered: $out")
  }

  test("top-n lists plan as distributed TakeOrdered, never a corpus-wide window") {
    // a partition-less WindowExec over the scored corpus would move
    // every row to one partition (the 100 TB scale-killer); the top-n
    // must come from TakeOrderedAndProject (per-partition partial
    // top-k), with any remaining window consuming only the n survivors
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(run().queryExecution.executedPlan)
    val takes = nodes.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takes.size >= 2,
      s"expected a TakeOrderedAndProject per rank list, got ${takes.size}")
    val corpusWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty &&
          flatten(w).collectFirst {
            case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => ()
            case _: org.apache.spark.sql.execution.GlobalLimitExec => ()
          }.isEmpty => w
    }
    assert(corpusWindows.isEmpty,
      s"partition-less window over unbounded input:\n${corpusWindows.mkString}")
  }

  test("a doc ranked #1 in BOTH lists dominates any single-list doc") {
    val out = run(n = 50, k = 50).collect()
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = out.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty) {
      // max two-list fusion beats the best possible one-list score 1/61
      val bestBoth = both.map(_.getDouble(3)).max
      assert(bestBoth > 1.0 / 61.0 - 1e-9)
    }
    // deterministic across runs
    val again = run(n = 50, k = 50).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
