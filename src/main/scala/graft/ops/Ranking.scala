package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical relevance scoring over a document corpus — the retrieval
  * half of a training-data curation loop (score documents against a
  * query, keep the high-signal ones).
  *
  * BM25 (Robertson/Sparck Jones, the Okapi formula) over whitespace
  * tokens. All corpus statistics are computed distributed and joined
  * back broadcast-style: per-term document frequencies and the corpus
  * aggregate (N, avgdl) are tiny relative to the corpus (|terms| and 1
  * rows), so the only full-corpus shuffles are the two `groupBy`s over
  * (doc, term) tokens — both map-side-combinable. No driver-side
  * collect anywhere; at 100 TB the token explode streams through the
  * scan and the score join stays broadcast.
  */
object Ranking {

  /** BM25 scores for every document matching ≥1 query term.
    *
    * @param docs  corpus with `docIdCol` and `textCol`
    * @param terms query terms (exact whitespace-token match)
    * @return (docIdCol, bm25) — docs with no matching term are absent
    */
  def bm25(docs: DataFrame, terms: Seq[String], docIdCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(docIdCol),
      explode(split(col(textCol), "\\s+")).alias("term"))
      .where(col("term") =!= "")
    val dl = toks.groupBy(docIdCol).agg(count(lit(1)).alias("dl"))
    // corpus aggregate: ONE row (N docs, mean doc length) — broadcast
    val stats = dl.agg(count(lit(1)).alias("n"), avg("dl").alias("avgdl"))
    val tf = toks.where(col("term").isin(terms: _*))
      .groupBy(col(docIdCol), col("term")).agg(count(lit(1)).alias("tf"))
    // per-term document frequency: ≤ |terms| rows — broadcast
    val dfq = tf.groupBy("term").agg(count(lit(1)).alias("df"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfq), "term")
      .join(dl, docIdCol)
      .crossJoin(broadcast(stats))
      .withColumn("__s", idf * norm)
      .groupBy(docIdCol).agg(sum("__s").alias("bm25"))
  }

  /** B33: unigram language-model NEGATIVE LOG-LIKELIHOOD per document —
    * the perplexity-filtering signal (CCNet-style): documents whose
    * tokens are improbable under the corpus unigram distribution score
    * high and get dropped/down-weighted. Reported as avg −ln p(w)
    * (= ln perplexity) rather than exp of it, so cross-engine float
    * drift stays at the ulp level (same trick as [[bm25]]'s round-6 ln).
    *
    * Scale shape: two map-side-combinable shuffles over the token
    * explode (per-word counts = vocab-sized; per-doc average), the
    * corpus total joined back as a broadcast 1-row frame — no collect,
    * no driver state; the same shape a 100 TB corpus pass needs. */
  def unigramLogPpl(docs: DataFrame, docIdCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(docIdCol),
      explode(split(col(textCol), "\\s+")).alias("term"))
      .where(col("term") =!= "")
    val counts = toks.groupBy("term").agg(count(lit(1)).alias("cnt"))
    val total = counts.agg(sum("cnt").alias("total"))
    toks.join(counts, "term")
      .crossJoin(broadcast(total))
      .withColumn("__nll", -log(col("cnt").cast("double") / col("total")))
      .groupBy(docIdCol)
      .agg(count(lit(1)).alias("n_tokens"), avg("__nll").alias("log_ppl"))
  }

  /** Top-k documents for the query by BM25 — rank over the scored set. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      docIdCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25(docs, terms, docIdCol, textCol)
      .orderBy(col("bm25").desc, col(docIdCol).asc).limit(k)
}
