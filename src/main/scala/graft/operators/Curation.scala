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

  /** Token-budget selection: keep the highest-`priority` docs whose running
    * token total stays within `budget` — "fill a 10B-token training budget
    * with the best documents" as one plan. Order is (priority DESC, id ASC),
    * made engine-exact by the caller passing an already floor-truncated
    * priority (e.g. qualityScore's stopword_ratio); the global cumulative
    * sum runs through CoreOps.orderedPrefixSum, so no single-task window
    * exists at any scale. Emits the manifest (id, n_tokens, cum_tokens). */
  def tokenBudget(scored: DataFrame, id: String, tokensCol: String,
                  priorityCol: String, budget: Long): DataFrame = {
    // DESC priority as an ASC int64 range key: negate the micro-truncated
    // score (the same 1e6 grid the quality ratios already live on)
    val ord = -floor(col(priorityCol) * 1e6).cast("long")
    CoreOps.orderedPrefixSum(scored, ord, id, tokensCol, "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col(id), col(tokensCol), col("cum_tokens"))
  }
}
