package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual tiers exist
  * for, in ONE declarative plan: quality gate → language gate → exact-dedup
  * canonical keep. Because every stage is a Column pipeline over the same
  * scan, Catalyst fuses the three text passes' scans, prunes to the two
  * columns they read, and AQE sizes the dedup join — the whole pass is two
  * shuffles (the fingerprint groupBy and the canonical join), not a chain of
  * materialized intermediate tables like a script-per-stage pipeline.
  */
object Curation {

  /** Keep docs that (a) are their content fingerprint's canonical
    * representative (smallest id), (b) classify as `lang`, and (c) pass the
    * token-count window and minimum stopword ratio (the classic
    * gibberish/boilerplate gate). Emits (id, n_tokens) per kept doc — the
    * minimal retention manifest downstream token-budget planning needs. */
  def curate(docs: DataFrame, id: String, text: String,
             stopwords: Seq[String], profiles: Map[String, Seq[String]],
             lang: String, minTokens: Long, maxTokens: Long,
             minStopRatio: Double): DataFrame = {
    val quality = TextOps.qualityScore(docs, id, text, stopwords)
      .select(col(id), col("n_tokens"), col("stopword_ratio"))
    val language = TextOps.languageId(docs, id, text, profiles)
      .select(col(id), col("lang_pred"))
    val canonical = Dedup.exactDedup(docs, id, text)
      .select(col("canonical_id").as(id))
    canonical
      .join(quality, Seq(id))
      .join(language, Seq(id))
      .filter(col("lang_pred") === lang &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("stopword_ratio") >= minStopRatio)
      .select(col(id), col("n_tokens"))
  }
}
