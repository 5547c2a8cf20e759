package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the keep/drop decision a training-data
  * pipeline applies before tokenization, composed from the §2B ops —
  * length gate, quality score, language id, exact-dedup canonicalizer.
  * Each rule is a single-pass projection or one bounded shuffle; the
  * whole decision is ~3 hash joins on doc_id plus one md5 window —
  * linear at 100 TB, no driver-side state.
  *
  * The first failing rule (fixed order: too_short, too_long,
  * low_quality, unknown_lang, duplicate) becomes the drop `reason`;
  * survivors get `keep = true, reason = null`. Deterministic: every
  * rule input is itself deterministic (rounded scores, min-doc_id
  * canonical choice).
  */
object Curation {

  def curate(docs: DataFrame, minWords: Long = 20, maxWords: Long = 2000,
      minQuality: Double = 0.5): DataFrame = {
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    val l = TextAnalysis.languageId(docs).select("doc_id", "lang_pred")
    val w = Window.partitionBy(md5(col("text")))
    val canon = docs
      .withColumn("__canonical", min("doc_id").over(w) === col("doc_id"))
      .select("doc_id", "__canonical")
    val reason =
      when(col("n_words") < minWords, "too_short")
        .when(col("n_words") > maxWords, "too_long")
        .when(col("quality_score") < minQuality, "low_quality")
        .when(col("lang_pred") === "und", "unknown_lang")
        .when(!col("__canonical"), "duplicate")
    q.join(l, "doc_id").join(canon, "doc_id")
      .select(col("doc_id"), reason.isNull.alias("keep"),
        reason.alias("reason"))
  }
}
