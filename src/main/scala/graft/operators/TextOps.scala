package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, built
  * entirely from codegen'd Column expressions (no UDFs) so they stay inside
  * whole-stage codegen and scale linearly with input partitions — a pure map
  * stage with zero shuffles until the caller aggregates.
  *
  * Beyond the reference surface (the reference has no text ops); designed for
  * the `documents` table (doc_id, text, lang, source, n_chars).
  */
object TextOps {

  /** Truncate to 6 decimals via floor — unlike round(), floor of an identical
    * IEEE double is identical on every engine (no HALF_UP vs HALF_EVEN skew
    * at representable boundaries), so ratio outputs hash-match the oracle. */
  private def trunc6(c: Column): Column = floor(c * 1000000d) / 1000000d

  /** Whitespace tokenizer: trims, splits on runs of whitespace, drops empty
    * tokens (so "" → [] and leading/trailing space is harmless). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** BPE-ish subword-count proxy: word pieces = runs of letters, digits, or
    * single punctuation marks — a deterministic, library-free stand-in for a
    * real BPE vocab that still tracks token-count scaling. */
  def wordPieces(text: Column): Column =
    filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => trim(t) =!= "")

  /** Per-document token statistics: token count, char count, avg token length. */
  def tokenStats(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokens(col(text))
    docs.select(
      col(id),
      size(toks).cast("long").as("n_tokens"),
      length(col(text)).cast("long").as("n_chars_measured"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("n_token_chars"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length — the standard cheap heuristics used to pre-filter web corpora.
    * All ratios are exact integer-count fractions so any engine agrees. */
  def qualityScore(docs: DataFrame, id: String, text: String,
                   stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col(text))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long")
    val nPunct = (length(col(text)) -
      length(regexp_replace(col(text), "[\\p{Punct}]", ""))).cast("long")
    docs.select(
      col(id),
      nTok.as("n_tokens"),
      nStop.as("n_stopwords"),
      nPunct.as("n_punct"),
      when(nTok > 0, trunc6(nStop.cast("double") / nTok.cast("double")))
        .otherwise(lit(0.0)).as("stopword_ratio"),
      when(length(col(text)) > 0,
        trunc6(nPunct.cast("double") / length(col(text)).cast("double")))
        .otherwise(lit(0.0)).as("punct_ratio"))
  }

  /** Language ID via stopword-hit counting: the classic cheap n-gram/function-
    * word heuristic. `profiles` maps language code → its function words; the
    * language with the most token hits wins (ties broken by language code).
    * One wide map stage + no shuffle; profiles are compiled into the plan as
    * literals (broadcast-free). */
  def languageId(docs: DataFrame, id: String, text: String,
                 profiles: Map[String, Seq[String]]): DataFrame = {
    val toks = tokens(lower(col(text)))
    val scored = profiles.toSeq.sortBy(_._1).map { case (langCode, words) =>
      struct(size(filter(toks, t => t.isin(words.map(lit): _*))).as("hits"),
        lit(langCode).as("lang"))
    }
    // array_max on (hits, lang) structs compares fields in order: most hits
    // wins, ties broken toward the lexicographically largest language code.
    val best = array_max(array(scored: _*))
    docs.select(col(id), best.getField("lang").as("lang_pred"),
      best.getField("hits").cast("long").as("lang_hits"))
  }

  /** Corpus n-gram vocabulary: the `topN` most frequent word n-grams of the
    * normalized text across all documents, with deterministic (count desc,
    * gram asc) ordering — the vocabulary-building step of a training
    * pipeline. Explode is map-side; the count is a partial-aggregated single
    * shuffle on the gram; top-N compiles to TakeOrderedAndProject (each
    * partition keeps only its local top N). Documents shorter than n words
    * contribute nothing (a vocab wants real n-grams, not padded stubs). */
  def ngramVocab(docs: DataFrame, text: String, n: Int, topN: Int): DataFrame =
    docs.select(explode(graft.expressions.HashKernelExpressions
        .shingleStrings(normalized(col(text)), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(topN)

  /** Interpreted Column form of the gram extraction — HashKernelSpec's
    * parity oracle for ShingleStrings (it mirrors the DuckDB oracle SQL). */
  private[graft] def ngramsColumnForm(text: Column, n: Int): Column = {
    val toks = tokens(normalized(text))
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Document fingerprint: md5 of the normalized text (lowercased, whitespace
    * collapsed, punctuation stripped) — the exact-dedup key used by
    * Dedup.exactDedup. md5 is bit-identical across engines. */
  def fingerprint(text: Column): Column =
    md5(normalized(text))

  /** Normalization used for near/exact dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[\\p{Punct}]", " "), "\\s+", " "))
}
