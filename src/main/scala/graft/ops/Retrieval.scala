package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval (SURVEY §2 B36): fuse a BM25
  * ranking and a cosine-similarity ranking of the same corpus with
  * reciprocal-rank fusion (RRF, Cormack/Clarke/Buettcher SIGIR'09):
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d))
  *
  * — the standard way a retrieval stack combines a sparse (keyword)
  * and a dense (embedding) index without score calibration, since it
  * only consumes RANKS. Docs absent from a list contribute nothing for
  * it.
  *
  * Scale shape: each list is an independent top-`n` (the lexical side
  * is two map-side-combinable token shuffles + a rank; the vector side
  * is one broadcast-query scan + a rank — both identical to their
  * standalone operators B25/B6). The fusion itself joins two n-row
  * frames — driver-small at any corpus size; nothing corpus-sized is
  * ever shuffled beyond the two scoring passes themselves.
  */
object Retrieval {

  /** Top-`k` documents by RRF over (BM25 top-`n`, cosine top-`n`).
    *
    * @param docs       corpus with `docId` + `textCol`
    * @param embeddings corpus embeddings with `vecId` + `vecCol`; doc
    *                   identity is `docId == vecId`
    * @param terms      lexical query terms
    * @param queryVecId embedding row to use as the dense query (it is
    *                   excluded from the vector candidate list)
    * @param c          RRF smoothing constant (60 in the original paper)
    * @return (doc_id, lex_rank, vec_rank, rrf) — ranks null when the
    *         doc missed that list's top-`n`
    */
  def hybridRrf(
      docs: DataFrame,
      embeddings: DataFrame,
      terms: Seq[String],
      queryVecId: Long,
      n: Int = 100,
      k: Int = 20,
      c: Int = 60,
      docId: String = "doc_id",
      textCol: String = "text",
      vecId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // top-n of a scored list WITHOUT a corpus-wide window: a global
    // `row_number().over(Window.orderBy(...))` moves every scored row
    // to ONE partition (at 100 TB, one executor sorting the corpus).
    // `orderBy(...).limit(n)` instead plans TakeOrderedAndProject —
    // each partition keeps its local top-n, the driver merges — and the
    // rank is then assigned within the surviving n rows, a window whose
    // input is bounded by the parameter, not the corpus.
    def topRanked(scored: DataFrame, rankCol: String): DataFrame =
      scored.orderBy(col("__s").desc, col(docId).asc).limit(n)
        .withColumn(rankCol, row_number().over(
          Window.orderBy(col("__s").desc, col(docId).asc)).cast("long"))
        .select(col(docId), col(rankCol))
    // lexical list: BM25 scores rounded to 6 (ln differs by ±1 ulp
    // across engines), ranked score-desc with id tiebreak
    val lex = topRanked(Ranking.bm25(docs, terms, docId, textCol)
      .withColumn("__s", round(col("bm25"), 6)), "lex_rank")
    // vector list: cosine against the query embedding, same rounding
    val qv = broadcast(embeddings.where(col(vecId) === queryVecId)
      .select(col(vecCol).alias("__qv")))
    val vec = topRanked(embeddings.where(col(vecId) =!= queryVecId)
      .select(col(vecId).alias(docId), col(vecCol))
      .crossJoin(qv)
      .withColumn("__s", round(Similarity.cosine(col(vecCol), col("__qv")), 6)),
      "vec_rank")
    val fused = lex.join(vec, Seq(docId), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("vec_rank")), lit(0.0)), 6))
    fused.orderBy(col("rrf").desc, col(docId).asc).limit(k)
      .select(col(docId), col("lex_rank"), col("vec_rank"), col("rrf"))
  }
}
