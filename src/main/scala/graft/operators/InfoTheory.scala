package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Information-theoretic corpus diagnostics — entropy, KL drift, mutual
  * information, PMI collocations, Zipf slope — the distribution-shape
  * gauges a training-data pipeline reads before mixing or re-weighting
  * corpora (is this source diverse or templated? did the token
  * distribution drift between crawls? which token pairs are collocations
  * rather than coincidences?).
  *
  * Extension tier beyond the reference surface (the reference —
  * chapter2/BasicStreamingOperations.java:56-115 — is a linear stream
  * pipeline with no distribution analytics).
  *
  * Determinism contract (the exactCorr argument extended to logarithms):
  * logarithms are transcendental, so a sum of double `ln` terms is
  * order-dependent and engine-dependent. Instead every `ln` here is
  * QUANTIZED AT THE TERM — `qlog(x) = floor(ln(x)·10⁶)` as BIGINT on an
  * integer argument — and all summation happens on exact integers
  * (order-independent under any partitioning), with one final double
  * division per output row. The emitted numbers are therefore
  * *defined* as the quantized-log statistic: bit-identical across
  * engines, partitionings, and reruns. (floor-of-ln stability across
  * libm implementations at the 10⁻⁶ quantum was probed over 5·10⁵
  * integer samples up to 10¹³: zero JVM/DuckDB disagreements — a flip
  * needs ln(x)·10⁶ within ~10⁻⁸ of an integer, measure ~10⁻¹⁴ per
  * value.)
  *
  * Distributed shape, shared by every operator here: one partial-agg'd
  * count shuffle on the category key, margins as PARTITIONED window sums
  * over the post-aggregation count table (O(categories) rows, never the
  * corpus), global totals as a 1-row broadcast crossJoin — no
  * unpartitioned windows, no driver traffic, no all-pairs products.
  */
object InfoTheory {

  /** ln quantum: 6 decimal digits, the house trunc6 precision. */
  private val LogScale = 1000000L

  /** Quantized natural log of a positive integer: floor(ln(x)·10⁶) as
    * BIGINT. DuckDB twin: `floor(ln(x::DOUBLE) * 1000000)::BIGINT`.
    * Integer arguments up to ~2⁵³ convert to double exactly; callers
    * keep products within that (documented per call site). */
  def qlog(x: Column): Column =
    floor(log(x.cast("double")) * LogScale.toDouble).cast("long")

  /** Exact wide accumulator for summed qlog terms (term magnitude ≤
    * count·ln(2⁵³)·10⁶ ≈ count·3.7·10⁷ — int64 per term, decimal(38,0)
    * for the sum so 100-TB category tables cannot wrap). */
  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Shannon entropy (nats) of the `cat` distribution per `group` — the
    * diversity gauge that separates varied prose (high entropy) from
    * templated/boilerplate text (low). Uses the join-free identity
    * H·N = N·ln N − Σ cᵢ·ln cᵢ: ONE (group, cat) count shuffle, ONE
    * per-group agg — the per-group total never needs joining back.
    * entropy_scaled = N·qlog(N) − Σ cᵢ·qlog(cᵢ) is exact BIGINT
    * (|entropy_scaled| ≤ N·ln(N)·10⁶ — past 2⁵³ ≈ N of 3·10⁸ the final
    * double division loses ulps; the scaled column stays exact to 2⁶³);
    * `entropy` is one double division. NULL groups/categories drop.
    * Emits (group, n_total, n_categories, entropy_scaled, entropy). */
  def entropy(df: DataFrame, group: String, cat: String): DataFrame = {
    val emitted = Seq("n_total", "n_categories", "entropy_scaled", "entropy",
      "_c", "_tot", "_sclc")
    require(!emitted.contains(group) && !emitted.contains(cat),
      s"entropy emits/uses ${emitted.mkString(", ")}; rename inputs")
    df.filter(col(group).isNotNull && col(cat).isNotNull)
      .groupBy(col(group), col(cat)).agg(count(lit(1)).as("_c"))
      .groupBy(col(group))
      .agg(sum(col("_c")).as("_tot"),
        count(lit(1)).as("n_categories"),
        sum(dec(col("_c") * qlog(col("_c")))).as("_sclc"))
      .select(col(group), col("_tot").as("n_total"), col("n_categories"),
        (dec(col("_tot")) * qlog(col("_tot")) - col("_sclc"))
          .cast("long").as("entropy_scaled"))
      .withColumn("entropy",
        col("entropy_scaled").cast("double")
          / (col("n_total").cast("double") * LogScale.toDouble))
  }

  /** Entropy columns from a CategoryCountAgg distribution — the
    * one-shuffle sibling of `entropy` (and the only legal streaming
    * form: the two-level groupBy is one aggregation too many for a
    * streaming query). `counts` is array<struct<cat,n>>; all folds are
    * exact integer/decimal aggregates over the array, then the same
    * single double division — identical outputs to `entropy` on the
    * same data (pinned in InfoTheorySpec). Returns the (n_total,
    * n_categories, entropy_scaled, entropy) columns to select; callers
    * filter empty distributions first (size(counts) > 0). */
  def entropyFromCounts(counts: Column): Seq[Column] = {
    val tot = aggregate(counts, lit(0L), (a, x) => a + x.getField("n"))
    val sclc = aggregate(counts, lit(0L).cast("decimal(38,0)"),
      (a, x) => a + dec(x.getField("n") * qlog(x.getField("n"))))
    val scaled = (dec(tot) * qlog(tot) - sclc).cast("long")
    Seq(tot.as("n_total"),
      size(counts).cast("long").as("n_categories"),
      scaled.as("entropy_scaled"),
      (scaled.cast("double") / (tot.cast("double") * LogScale.toDouble))
        .as("entropy"))
  }

  /** KL(P‖Q) columns from a CategoryCountAgg distribution against a
    * PLAN-LITERAL reference distribution — the one-aggregation form of
    * klDrift for streaming windows: the window's counts ride one
    * CategoryCountAgg; the reference (a STATIC frame, collected once at
    * plan time, O(categories)) folds in as a literal map, so the whole
    * divergence is a stateless projection after the single streaming
    * aggregation — no join, no second shuffle. Same add-one smoothing
    * over the UNION category set and the same quantized term
    * cp′·(qlog(cp′·NQ′) − qlog(cq′·NP′)) as klDrift, summed exactly
    * over the array. Returns (n_categories, n_p, n_q, kl_scaled, kl)
    * columns; callers filter empty windows first. */
  def klFromCounts(counts: Column, ref: Map[String, Long]): Seq[Column] = {
    require(ref.nonEmpty, "klFromCounts needs a non-empty reference")
    require(ref.values.forall(_ > 0),
      "klFromCounts reference counts must be positive")
    val mp = map_from_entries(counts)
    val refMap = typedlit(ref)
    val cats = array_union(map_keys(mp), map_keys(refMap))
    val k = size(cats).cast("long")
    val tp = aggregate(counts, lit(0L), (a, x) => a + x.getField("n"))
    val tq = lit(ref.values.sum)
    def cp1(c: Column) = coalesce(element_at(mp, c), lit(0L)) + lit(1L)
    def cq1(c: Column) = coalesce(element_at(refMap, c), lit(0L)) + lit(1L)
    val klScaled = aggregate(cats, lit(0L).cast("decimal(38,0)"),
      (a, c) => a + dec(cp1(c)
        * (qlog(cp1(c) * (tq + k)) - qlog(cq1(c) * (tp + k)))))
      .cast("long")
    Seq(k.as("n_categories"), tp.as("n_p"), tq.as("n_q"),
      klScaled.as("kl_scaled"),
      (klScaled.cast("double")
        / ((tp + k).cast("double") * LogScale.toDouble)).as("kl"))
  }

  /** Per-group hellingerDrift — the ksStatisticByGroup pattern: the same
    * term-floored Bhattacharyya algebra once per group value, in ONE
    * (group, category)-keyed count shuffle plus an O(groups)-row margin
    * agg — which segment's distribution moved, not just whether any did.
    * Groups where either side is empty emit hellinger NULL (undefined,
    * like the global form). Emits one row per group
    * (group, n_categories, n_p, n_q, bc_scaled, hellinger). */
  def hellingerDriftByGroup(df: DataFrame, group: String, cat: String,
                            isP: Column): DataFrame = {
    val emitted = Seq("n_categories", "n_p", "n_q", "bc_scaled", "hellinger",
      "_cp", "_cq", "_t")
    require(!emitted.contains(cat) && !emitted.contains(group),
      s"hellingerDriftByGroup emits/uses ${emitted.mkString(", ")}; " +
        "rename inputs")
    df.filter(col(cat).isNotNull && col(group).isNotNull)
      .groupBy(col(group), col(cat))
      .agg(sum(when(isP, 1L).otherwise(0L)).as("_cp"),
        sum(when(isP, 0L).otherwise(1L)).as("_cq"))
      .select(col(group),
        dec(floor(sqrt((col("_cp") * col("_cq")).cast("double"))
          * LogScale.toDouble)).as("_t"),
        col("_cp"), col("_cq"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_categories"), sum(col("_cp")).as("n_p"),
        sum(col("_cq")).as("n_q"),
        sum(col("_t")).cast("long").as("bc_scaled"))
      .select(col(group), col("n_categories"), col("n_p"), col("n_q"),
        col("bc_scaled"),
        when(col("n_p") > 0L && col("n_q") > 0L,
          floor(sqrt(greatest(lit(0d),
              lit(1d) - col("bc_scaled").cast("double")
                / (sqrt((col("n_p") * col("n_q")).cast("double"))
                   * LogScale.toDouble)))
            * LogScale.toDouble) / LogScale.toDouble).as("hellinger"))
  }

  /** PSI columns from a CategoryCountAgg distribution against a
    * PLAN-LITERAL reference — klFromCounts' algebra swapped for the
    * population-stability term, so a live stream can carry the industry
    * drift score per window with ONE aggregation: term =
    * ((cp′·(NQ′) − cq′·(NP′))·(qlog(cp′·NQ′) − qlog(cq′·NP′)) over the
    * union category set (primes = add-one smoothed), every term ≥ 0,
    * summed in decimal inside the array fold; psi = one fixed double
    * chain. Returns (n_categories, n_p, n_q, psi_scaled, psi). */
  def psiFromCounts(counts: Column, ref: Map[String, Long]): Seq[Column] = {
    require(ref.nonEmpty, "psiFromCounts needs a non-empty reference")
    require(ref.values.forall(_ > 0),
      "psiFromCounts reference counts must be positive")
    val mp = map_from_entries(counts)
    val refMap = typedlit(ref)
    val cats = array_union(map_keys(mp), map_keys(refMap))
    val k = size(cats).cast("long")
    val tp = aggregate(counts, lit(0L), (a, x) => a + x.getField("n"))
    val tq = lit(ref.values.sum)
    def cp1(c: Column) = coalesce(element_at(mp, c), lit(0L)) + lit(1L)
    def cq1(c: Column) = coalesce(element_at(refMap, c), lit(0L)) + lit(1L)
    val num = aggregate(cats, lit(0L).cast("decimal(38,0)"),
      (a, c) => a + dec((cp1(c) * (tq + k) - cq1(c) * (tp + k))
        * (qlog(cp1(c) * (tq + k)) - qlog(cq1(c) * (tp + k)))))
    Seq(k.as("n_categories"), tp.as("n_p"), tq.as("n_q"),
      num.cast("double").as("psi_scaled"),
      (num.cast("double")
        / ((tp + k).cast("double") * (tq + k).cast("double")
           * LogScale.toDouble)).as("psi"))
  }

  /** Hellinger columns from a CategoryCountAgg distribution against a
    * PLAN-LITERAL reference — hellingerDrift's algebra in the
    * klFromCounts/psiFromCounts one-aggregation streaming form, so a
    * live window can carry the BOUNDED SYMMETRIC drift score (H ∈
    * [0,1], no smoothing distortion: zero-count categories contribute
    * √0 = 0) with ONE aggregation and a stateless projection. Each term
    * enters as floor(√(cpᵢ·cqᵢ)·10⁶) over the union category set —
    * exact below the hellingerDrift 2⁵³ product bound — summed exactly
    * in decimal; bc/hellinger are the same fixed double chain as the
    * batch form, so the two forms are parity-pinned against one oracle.
    * Returns (n_categories, n_p, n_q, bc_scaled, hellinger); callers
    * filter empty windows first (an empty side's distance is undefined,
    * which the batch form signals with NULL — here n_p > 0 whenever the
    * window exists, and ref is required non-empty). */
  def hellingerFromCounts(counts: Column, ref: Map[String, Long])
      : Seq[Column] = {
    require(ref.nonEmpty, "hellingerFromCounts needs a non-empty reference")
    require(ref.values.forall(_ > 0),
      "hellingerFromCounts reference counts must be positive")
    val mp = map_from_entries(counts)
    val refMap = typedlit(ref)
    val cats = array_union(map_keys(mp), map_keys(refMap))
    val k = size(cats).cast("long")
    val tp = aggregate(counts, lit(0L), (a, x) => a + x.getField("n"))
    val tq = lit(ref.values.sum)
    def cp(c: Column) = coalesce(element_at(mp, c), lit(0L))
    def cq(c: Column) = coalesce(element_at(refMap, c), lit(0L))
    val bcScaled = aggregate(cats, lit(0L).cast("decimal(38,0)"),
      (a, c) => a + dec(floor(sqrt((cp(c) * cq(c)).cast("double"))
        * LogScale.toDouble)))
      .cast("long")
    Seq(k.as("n_categories"), tp.as("n_p"), tq.as("n_q"),
      bcScaled.as("bc_scaled"),
      when(tp > 0L && tq > 0L,
        floor(sqrt(greatest(lit(0d),
            lit(1d) - bcScaled.cast("double")
              / (sqrt((tp * tq).cast("double")) * LogScale.toDouble)))
          * LogScale.toDouble) / LogScale.toDouble).as("hellinger"))
  }

  /** JSD columns from a CategoryCountAgg distribution against a
    * PLAN-LITERAL reference — jsDivergence's algebra in the
    * klFromCounts/hellingerFromCounts one-aggregation streaming form, so
    * a live window can carry the bounded (≤ ln 2) SMOOTHING-FREE drift
    * score with ONE aggregation and a stateless projection. The two
    * partial sums fold separately over the union category set (different
    * denominators), each term the exact BIGINT of jsdTerms; jsd is the
    * same fixed double chain as the batch form, so the two forms are
    * parity-pinned against one oracle. Returns (n_categories, n_p, n_q,
    * jsd_p_scaled, jsd_q_scaled, jsd); callers filter empty windows
    * first. */
  def jsdFromCounts(counts: Column, ref: Map[String, Long]): Seq[Column] = {
    require(ref.nonEmpty, "jsdFromCounts needs a non-empty reference")
    require(ref.values.forall(_ > 0),
      "jsdFromCounts reference counts must be positive")
    val mp = map_from_entries(counts)
    val refMap = typedlit(ref)
    val cats = array_union(map_keys(mp), map_keys(refMap))
    val k = size(cats).cast("long")
    val tp = aggregate(counts, lit(0L), (a, x) => a + x.getField("n"))
    val tq = lit(ref.values.sum)
    def cp(c: Column) = coalesce(element_at(mp, c), lit(0L))
    def cq(c: Column) = coalesce(element_at(refMap, c), lit(0L))
    val spScaled = aggregate(cats, lit(0L).cast("decimal(38,0)"),
      (a, c) => a + jsdTerms(cp(c), cq(c), tp, tq)._1).cast("long")
    val sqScaled = aggregate(cats, lit(0L).cast("decimal(38,0)"),
      (a, c) => a + jsdTerms(cp(c), cq(c), tp, tq)._2).cast("long")
    Seq(k.as("n_categories"), tp.as("n_p"), tq.as("n_q"),
      spScaled.as("jsd_p_scaled"), sqScaled.as("jsd_q_scaled"),
      when(tp > 0L && tq > 0L,
        (spScaled.cast("double") / tp.cast("double")
          + sqScaled.cast("double") / tq.cast("double"))
          / (2d * LogScale.toDouble)).as("jsd"))
  }

  /** KL divergence KL(P‖Q) in nats between the `cat` distributions of the
    * `isP` and ¬`isP` slices of one frame — the drift gauge with
    * direction and magnitude in one number (TVD's unsigned cousin,
    * categoricalDrift). Add-one smoothing over the UNION category set
    * keeps every term finite (cᵢ'=cᵢ+1, N'=N+K); the quantized term is
    * cpᵢ'·(qlog(cpᵢ'·NQ') − qlog(cqᵢ'·NP')) — exact BIGINT per term
    * (products ≤ cᵢ'·N' must stay under 2⁵³: corpora to ~9·10⁷ rows per
    * side are safe even when one category holds every row; ANSI fails
    * loud past that), decimal(38,0) sum, one double division out.
    * Shape: ONE count shuffle building both sides' counts in the same
    * row, totals as a 1-row broadcast. Quantization bounds the result
    * within ~2·10⁻⁶ of true smoothed KL (one qlog each side of the
    * difference), so identical distributions may emit a tiny NEGATIVE
    * kl — a quantization artifact, documented rather than clamped.
    * Emits ONE row (n_categories, n_p, n_q, kl_scaled, kl). */
  def klDrift(df: DataFrame, cat: String, isP: Column): DataFrame = {
    val emitted = Seq("n_categories", "n_p", "n_q", "kl_scaled", "kl",
      "_cp", "_cq", "_k", "_tp", "_tq")
    require(!emitted.contains(cat),
      s"klDrift emits/uses ${emitted.mkString(", ")}; rename inputs")
    val counts = df.filter(col(cat).isNotNull)
      .groupBy(col(cat))
      .agg(sum(when(isP, 1L).otherwise(0L)).as("_cp"),
        sum(when(isP, 0L).otherwise(1L)).as("_cq"))
    val totals = counts.groupBy()
      .agg(count(lit(1)).as("_k"), sum(col("_cp")).as("_tp"),
        sum(col("_cq")).as("_tq")) // 1 row
    counts.crossJoin(broadcast(totals))
      .select(col("_k"), col("_tp"), col("_tq"),
        dec((col("_cp") + 1L)
          * (qlog((col("_cp") + 1L) * (col("_tq") + col("_k")))
            - qlog((col("_cq") + 1L) * (col("_tp") + col("_k")))))
          .as("_t"))
      .groupBy(col("_k"), col("_tp"), col("_tq"))
      .agg(sum(col("_t")).cast("long").as("kl_scaled"))
      .select(col("_k").as("n_categories"), col("_tp").as("n_p"),
        col("_tq").as("n_q"), col("kl_scaled"),
        (col("kl_scaled").cast("double")
          / ((col("_tp") + col("_k")).cast("double") * LogScale.toDouble))
          .as("kl"))
  }

  /** Hellinger affinity / distance between the two category distributions
    * selected by `isP` — the bounded, symmetric drift gauge next to the
    * directed klDrift (H ∈ [0,1], defined even where KL needs smoothing:
    * zero-count categories contribute √0 = 0, so NO add-one distortion).
    *
    * Bhattacharyya coefficient BC = Σᵢ √(pᵢqᵢ) = Σᵢ √(cᵖᵢ·cᵠᵢ) / √(Nᵖ·Nᵠ);
    * H = √(1 − BC). Determinism: each term enters as
    * floor(√(cᵖᵢ·cᵠᵢ)·10⁶) — the integer product converts to double
    * exactly below 2⁵³ (cᵖᵢ·cᵠᵢ < 9·10¹⁵, i.e. ~9.4·10⁷ rows per side
    * single-category worst case; ANSI fails the long product loudly past
    * 2⁶³), and IEEE sqrt/multiply are correctly rounded, so the floored
    * term is bit-identical on any engine. Terms sum exactly
    * (decimal(38,0)); the emitted bc/hellinger run ONE fixed chain of
    * correctly-rounded ops (÷, √) from the exact integers — identical
    * everywhere. Identical distributions give bc exactly 1.0 and
    * hellinger exactly 0.0 (√(c·c)·10⁶ is exact integer math).
    *
    * Same distributed shape as klDrift: both sides' counts built in the
    * SAME row of one category-keyed count shuffle, totals as a 1-row
    * broadcast, output ONE row (n_categories, n_p, n_q, bc_scaled,
    * hellinger). NULL categories drop; an empty side emits hellinger
    * NULL (distance to a nonexistent distribution is undefined, not a
    * fake maximum). */
  def hellingerDrift(df: DataFrame, cat: String, isP: Column): DataFrame = {
    val emitted = Seq("n_categories", "n_p", "n_q", "bc_scaled", "hellinger",
      "_cp", "_cq", "_k", "_tp", "_tq", "_t")
    require(!emitted.contains(cat),
      s"hellingerDrift emits/uses ${emitted.mkString(", ")}; rename inputs")
    val counts = df.filter(col(cat).isNotNull)
      .groupBy(col(cat))
      .agg(sum(when(isP, 1L).otherwise(0L)).as("_cp"),
        sum(when(isP, 0L).otherwise(1L)).as("_cq"))
    counts
      .select(dec(floor(sqrt((col("_cp") * col("_cq")).cast("double"))
          * LogScale.toDouble)).as("_t"),
        col("_cp"), col("_cq"))
      .groupBy()
      .agg(count(lit(1)).as("n_categories"), sum(col("_cp")).as("n_p"),
        sum(col("_cq")).as("n_q"),
        sum(col("_t")).cast("long").as("bc_scaled"))
      .select(col("n_categories"), col("n_p"), col("n_q"), col("bc_scaled"),
        when(col("n_p") > 0L && col("n_q") > 0L,
          floor(sqrt(greatest(lit(0d),
              lit(1d) - col("bc_scaled").cast("double")
                / (sqrt((col("n_p") * col("n_q")).cast("double"))
                   * LogScale.toDouble)))
            * LogScale.toDouble) / LogScale.toDouble).as("hellinger"))
  }

  /** Mutual information I(A;B) in nats between two categorical columns —
    * "does knowing the language tell you the source?" — the dataset-bias
    * gauge for stratification decisions. I·N = Σ c_ab·(ln(c_ab·N) −
    * ln(c_a·c_b)) over the observed cells; margins are PARTITIONED window
    * sums over the post-aggregation cell table (O(cells) rows), the grand
    * total rides a 1-row broadcast. Quantized terms exact (products
    * c_ab·N and c_a·c_b under 2⁵³ — rows to ~9·10⁷ safe even
    * single-cell; ANSI fails loud), decimal sum, one double division.
    * NULL in either column drops the row. Emits ONE row
    * (n, n_cells, mi_scaled, mi); empty input emits zero rows. */
  def mutualInfo(df: DataFrame, a: String, b: String): DataFrame = {
    val emitted = Seq("n", "n_cells", "mi_scaled", "mi",
      "_c", "_ca", "_cb", "_nn")
    require(!emitted.contains(a) && !emitted.contains(b),
      s"mutualInfo emits/uses ${emitted.mkString(", ")}; rename inputs")
    val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).as("_c"))
    val withMargins = cells
      .withColumn("_ca", sum(col("_c")).over(Window.partitionBy(col(a))))
      .withColumn("_cb", sum(col("_c")).over(Window.partitionBy(col(b))))
    val total = cells.groupBy().agg(sum(col("_c")).as("_nn")) // 1 row
    withMargins.crossJoin(broadcast(total))
      .select(col("_nn"),
        dec(col("_c") * (qlog(col("_c") * col("_nn"))
          - qlog(col("_ca") * col("_cb")))).as("_t"))
      .groupBy(col("_nn"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("_t")).cast("long").as("mi_scaled"))
      .select(col("_nn").as("n"), col("n_cells"), col("mi_scaled"),
        (col("mi_scaled").cast("double")
          / (col("_nn").cast("double") * LogScale.toDouble)).as("mi"))
  }

  /** PMI collocations over adjacent word bigrams — which token pairs
    * co-occur beyond chance (named entities, technical terms, templated
    * phrases), the collocation miner behind phrase vocabularies and
    * boilerplate detection. Probabilities come from the bigram table
    * itself: pmi(a,b) = ln(n_ab·N / (n_a•·n_•b)) with positional margins
    * n_a• (first slot) and n_•b (second slot) as PARTITIONED window sums
    * over the post-aggregation gram table (the bigramLm shape —
    * O(observed grams), never the corpus) and N a 1-row broadcast.
    * pmi_scaled = qlog(n_ab·N) − qlog(n_a•·n_•b) is exact BIGINT
    * (products under 2⁵³ — bigram corpora to ~9·10⁷ are safe; ANSI
    * fails loud), pmi one double division. `minCount` prunes rare grams
    * AFTER margins so probabilities stay corpus-true; it is the output
    * bound (PMI of hapax pairs is noise anyway). Emits
    * (w1, w2, n_ab, n_w1, n_w2, n_total, pmi). */
  def pmiCollocations(docs: DataFrame, text: String,
                      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val grams = docs.select(explode(graft.expressions.HashKernelExpressions
        .shingleStrings(TextOps.normalized(col(text)), 2)).as("_gram"))
      .groupBy(col("_gram")).agg(count(lit(1)).as("n_ab"))
      .withColumn("w1", substring_index(col("_gram"), " ", 1))
      .withColumn("w2", substring_index(col("_gram"), " ", -1))
    val withMargins = grams
      .withColumn("n_w1", sum(col("n_ab")).over(Window.partitionBy(col("w1"))))
      .withColumn("n_w2", sum(col("n_ab")).over(Window.partitionBy(col("w2"))))
    val total = grams.groupBy().agg(sum(col("n_ab")).as("n_total")) // 1 row
    withMargins.crossJoin(broadcast(total))
      .filter(col("n_ab") >= minCount)
      .select(col("w1"), col("w2"), col("n_ab"), col("n_w1"), col("n_w2"),
        col("n_total"),
        ((qlog(col("n_ab") * col("n_total"))
          - qlog(col("n_w1") * col("n_w2"))).cast("double")
          / LogScale.toDouble).as("pmi"))
  }

  /** Zipf rank-frequency log-log table per group — feed to
    * CoreOps.exactRegression for the Zipf slope (natural text ≈ −1;
    * templated/synthetic corpora bend away). Per group each distinct
    * token gets its frequency and its DENSE total-order rank
    * (row_number over freq desc, token asc — deterministic tiebreak),
    * then both coordinates are quantized logs, so the downstream
    * regression runs on exact integers (the moment sums are
    * order-independent; the slope is exactRegression's fixed double
    * chain). The rank window is partitioned by group — never global.
    * Emits (group, log_rank, log_freq), one row per distinct
    * (group, token). */
  def zipfLogLog(docs: DataFrame, group: String, text: String): DataFrame = {
    val emitted = Seq("log_rank", "log_freq", "_tok", "_f", "_rank")
    require(!emitted.contains(group) && !emitted.contains(text),
      s"zipfLogLog emits/uses ${emitted.mkString(", ")}; rename inputs")
    docs.filter(col(group).isNotNull)
      .select(col(group), explode(TextOps.tokens(col(text))).as("_tok"))
      .groupBy(col(group), col("_tok")).agg(count(lit(1)).as("_f"))
      .withColumn("_rank", row_number().over(
        Window.partitionBy(col(group))
          .orderBy(col("_f").desc, col("_tok"))))
      .select(col(group), qlog(col("_rank")).as("log_rank"),
        qlog(col("_f")).as("log_freq"))
  }

  /** Shared (category × outcome) count frame for the WOE/IV/PSI family:
    * one partial-agg'd shuffle on the category building BOTH sides' counts
    * in the same row (the klDrift shape), with the O(1) totals
    * (n_categories, n_p, n_q) attached via a 1-row broadcast. */
  private def sideCounts(df: DataFrame, cat: String,
                         isP: Column): DataFrame = {
    val counts = df.filter(col(cat).isNotNull)
      .groupBy(col(cat))
      .agg(sum(when(isP, 1L).otherwise(0L)).as("_cp"),
        sum(when(isP, 0L).otherwise(1L)).as("_cq"))
    val totals = counts.groupBy()
      .agg(count(lit(1)).as("_k"), sum(col("_cp")).as("_tp"),
        sum(col("_cq")).as("_tq"))
    counts.crossJoin(broadcast(totals))
  }

  /** Weight of evidence per category — the credit-scoring encoder next to
    * leave-one-out target encoding: WOE(c) = ln(P(c|pos)/P(c|neg)),
    * add-one smoothed over the category union (the klDrift convention, so
    * a side's zero count shifts the ratio instead of exploding it):
    *
    *   woe_scaled = qlog((cᵖ+1)·(Nᵠ+K)) − qlog((cᵠ+1)·(Nᵖ+K))
    *
    * — exact BIGINT per category (both products < 2⁵³ for rows to ~9·10⁷
    * single-category worst case, ANSI loud past 2⁶³), one double division
    * for `woe`. ONE count shuffle on the category + a 1-row totals
    * broadcast; O(categories) output rows (cat, n_pos, n_neg, woe_scaled,
    * woe). NULL categories drop; NULL outcomes count as negative (mirror
    * the caller's boolean). */
  def weightOfEvidence(df: DataFrame, cat: String, isP: Column): DataFrame = {
    val emitted = Seq("n_pos", "n_neg", "woe_scaled", "woe",
      "_cp", "_cq", "_k", "_tp", "_tq")
    require(!emitted.contains(cat),
      s"weightOfEvidence emits/uses ${emitted.mkString(", ")}; rename inputs")
    sideCounts(df, cat, isP)
      .select(col(cat), col("_cp").as("n_pos"), col("_cq").as("n_neg"),
        (qlog((col("_cp") + 1L) * (col("_tq") + col("_k")))
          - qlog((col("_cq") + 1L) * (col("_tp") + col("_k"))))
          .as("woe_scaled"))
      .withColumn("woe",
        col("woe_scaled").cast("double") / LogScale.toDouble)
  }

  /** Information value — the one-number summary of weightOfEvidence
    * (industry bands: <0.02 useless, >0.5 suspicious):
    * IV = Σ_c (P(c|pos) − P(c|neg))·WOE(c), add-one smoothed on both
    * factors. With the shares put over the common denominator
    * D = (Nᵖ+K)·(Nᵠ+K), each term's numerator
    * ((cᵖ+1)·(Nᵠ+K) − (cᵠ+1)·(Nᵖ+K))·woe_scaled is exact and ALWAYS
    * ≥ 0 (both factors share a sign), summed in decimal(38,0); `iv` is
    * one fixed double chain (cast, two multiplies, one divide — all
    * correctly rounded, engine-identical). `iv_scaled` is the exact
    * decimal sum surfaced as a correctly-rounded double (exact to 2⁵³).
    * Same single-shuffle shape. Emits ONE row
    * (n_categories, n_p, n_q, iv_scaled, iv). */
  def informationValue(df: DataFrame, cat: String, isP: Column): DataFrame = {
    val emitted = Seq("n_categories", "n_p", "n_q", "iv_scaled", "iv",
      "_cp", "_cq", "_k", "_tp", "_tq", "_t")
    require(!emitted.contains(cat),
      s"informationValue emits/uses ${emitted.mkString(", ")}; rename inputs")
    sideCounts(df, cat, isP)
      .select(col("_k"), col("_tp"), col("_tq"),
        dec(((col("_cp") + 1L) * (col("_tq") + col("_k"))
            - (col("_cq") + 1L) * (col("_tp") + col("_k")))
          * (qlog((col("_cp") + 1L) * (col("_tq") + col("_k")))
            - qlog((col("_cq") + 1L) * (col("_tp") + col("_k")))))
          .as("_t"))
      .groupBy(col("_k"), col("_tp"), col("_tq"))
      .agg(sum(col("_t")).as("_s"))
      .select(col("_k").as("n_categories"), col("_tp").as("n_p"),
        col("_tq").as("n_q"), col("_s").cast("double").as("iv_scaled"),
        (col("_s").cast("double")
          / ((col("_tp") + col("_k")).cast("double")
             * (col("_tq") + col("_k")).cast("double")
             * LogScale.toDouble)).as("iv"))
  }

  /** Population stability index — the model-monitoring drift score the
    * industry reads before retraining (bands: <0.1 stable, >0.25 shifted):
    * PSI = Σ_c (p_c − q_c)·ln(p_c/q_c), add-one smoothed — algebraically
    * informationValue with the two distributions as the "sides", and the
    * identical exact-integer shape: every term ≥ 0, decimal sum, one
    * fixed double chain at the end. Emits ONE row
    * (n_categories, n_p, n_q, psi_scaled, psi). */
  def psi(df: DataFrame, cat: String, isP: Column): DataFrame =
    informationValue(df, cat, isP)
      .select(col("n_categories"), col("n_p"), col("n_q"),
        col("iv_scaled").as("psi_scaled"), col("iv").as("psi"))

  /** Conditional entropy H(to | from) in nats from a transition-count
    * cell table — "how predictable is the NEXT event given the current
    * one", the one-number sequel to transitionMatrix (a low value means
    * journeys are deterministic and a Markov feature will carry signal;
    * ln(K)-ish means the next step is anyone's guess). Uses the join-free
    * per-row entropy identity summed over rows:
    * H·N = Σ_i [rᵢ·qlog(rᵢ) − Σ_j cᵢⱼ·qlog(cᵢⱼ)] — exact BIGINT terms,
    * decimal sums, ONE double division out. Shape: one (from, to) cell
    * frame in (the caller aggregates it — transitionMatrix's `counts`
    * shape), one keyed agg + one global fold here. NULL cells drop;
    * empty input emits n_transitions 0 with h NULL. Emits ONE row
    * (n_transitions, n_from_states, n_cells, h_scaled, h). */
  def conditionalEntropy(cells: DataFrame, fromCol: String,
                         nCol: String): DataFrame = {
    val emitted = Seq("n_transitions", "n_from_states", "n_cells",
      "h_scaled", "h", "_r", "_rt", "_ct", "_k")
    require(!emitted.contains(fromCol) && !emitted.contains(nCol),
      s"conditionalEntropy emits/uses ${emitted.mkString(", ")}; " +
        "rename inputs")
    cells.filter(col(fromCol).isNotNull && col(nCol).isNotNull)
      .groupBy(col(fromCol))
      .agg(sum(col(nCol)).as("_r"), count(lit(1)).as("_k"),
        sum(dec(col(nCol) * qlog(col(nCol)))).as("_ct"))
      .select(col("_r"), col("_k"),
        (dec(col("_r")) * qlog(col("_r")) - col("_ct")).as("_rt"))
      .agg(coalesce(sum(col("_r")), lit(0L)).as("n_transitions"),
        count(lit(1)).as("n_from_states"),
        coalesce(sum(col("_k")), lit(0L)).as("n_cells"),
        coalesce(sum(col("_rt")), dec(lit(0L))).cast("long")
          .as("h_scaled"))
      .select(col("n_transitions"), col("n_from_states"), col("n_cells"),
        col("h_scaled"),
        when(col("n_transitions") > 0L,
          col("h_scaled").cast("double")
            / (col("n_transitions").cast("double") * LogScale.toDouble))
          .as("h"))
  }

  /** The two quantized Jensen-Shannon partial sums, shared by the global
    * and by-group forms. P-side term (zero when cᵖᵢ = 0, the exact JSD
    * convention — 0·ln 0 = 0, NO smoothing needed because the mixture
    * dominates both components):
    * cᵖᵢ·(qlog(2·cᵖᵢ·Nᵠ) − qlog(cᵖᵢ·Nᵠ + cᵠᵢ·Nᵖ)); Q-side mirrored. */
  private def jsdTerms(cp: Column, cq: Column, tp: Column,
                       tq: Column): (Column, Column) = {
    val mix = cp * tq + cq * tp
    (when(cp > 0L, dec(cp * (qlog(lit(2L) * cp * tq) - qlog(mix))))
       .otherwise(dec(lit(0L))),
     when(cq > 0L, dec(cq * (qlog(lit(2L) * cq * tp) - qlog(mix))))
       .otherwise(dec(lit(0L))))
  }

  /** Jensen-Shannon divergence (nats) between the `cat` distributions of
    * the `isP` and ¬`isP` slices — the drift gauge that completes the
    * family: symmetric like Hellinger, KL-shaped like klDrift, but
    * BOUNDED (JSD ∈ [0, ln 2]) and defined WITHOUT smoothing (each side
    * is absolutely continuous w.r.t. the mixture M = ½(P+Q), so
    * zero-count categories contribute exactly 0 — no add-one distortion
    * of the score, unlike klDrift/psi).
    *
    * JSD = ½·KL(P‖M) + ½·KL(Q‖M) with pᵢ/mᵢ = 2·cᵖᵢ·Nᵠ/(cᵖᵢ·Nᵠ+cᵠᵢ·Nᵖ):
    * the P-side term enters as the exact BIGINT
    * cᵖᵢ·(qlog(2·cᵖᵢ·Nᵠ) − qlog(cᵖᵢ·Nᵠ + cᵠᵢ·Nᵖ)) (Q-side mirrored);
    * the two partial sums accumulate separately in decimal(38,0) because
    * they carry different denominators, and the emitted
    * jsd = (Sᵖ/Nᵖ + Sᵠ/Nᵠ)/(2·10⁶) is ONE fixed double chain.
    * Quantization keeps the result within ~2·10⁻⁶ of true JSD; identical
    * slices may emit a tiny NEGATIVE jsd (quantization artifact,
    * documented rather than clamped, the klDrift convention). Products
    * 2·cᵢ·N stay exact in the qlog double conversion below 2⁵³ — ~6.7·10⁷
    * rows per side worst-case; the long multiply itself fails loud under
    * ANSI past 2⁶³.
    *
    * Shape: klDrift's exactly — ONE category-keyed count shuffle building
    * both sides in the same row, totals as a 1-row broadcast. NULL
    * categories drop; an EMPTY side emits jsd NULL (the distance to a
    * nonexistent distribution is undefined, not ln 2). Emits ONE row
    * (n_categories, n_p, n_q, jsd_p_scaled, jsd_q_scaled, jsd). */
  def jsDivergence(df: DataFrame, cat: String, isP: Column): DataFrame = {
    val emitted = Seq("n_categories", "n_p", "n_q", "jsd_p_scaled",
      "jsd_q_scaled", "jsd", "_cp", "_cq", "_k", "_tp", "_tq", "_sp", "_sq")
    require(!emitted.contains(cat),
      s"jsDivergence emits/uses ${emitted.mkString(", ")}; rename inputs")
    val (tP, tQ) = (col("_tp"), col("_tq"))
    val (termP, termQ) = jsdTerms(col("_cp"), col("_cq"), tP, tQ)
    sideCounts(df, cat, isP)
      .select(col("_k"), tP, tQ, termP.as("_sp"), termQ.as("_sq"))
      .groupBy(col("_k"), tP, tQ)
      .agg(sum(col("_sp")).cast("long").as("jsd_p_scaled"),
        sum(col("_sq")).cast("long").as("jsd_q_scaled"))
      .select(col("_k").as("n_categories"), tP.as("n_p"), tQ.as("n_q"),
        col("jsd_p_scaled"), col("jsd_q_scaled"),
        when(tP > 0L && tQ > 0L,
          (col("jsd_p_scaled").cast("double") / tP.cast("double")
            + col("jsd_q_scaled").cast("double") / tQ.cast("double"))
            / (2d * LogScale.toDouble)).as("jsd"))
  }

  /** Per-group jsDivergence — WHICH segment's distribution moved, on the
    * bounded no-smoothing scale (the hellingerDriftByGroup pattern with
    * the jsDivergence algebra). Margins Nᵖ/Nᵠ per group ride PARTITIONED
    * window sums over the post-aggregation O(cells) count table — never
    * the corpus rows. Groups where either side is empty emit jsd NULL.
    * Emits one row per group (group, n_categories, n_p, n_q,
    * jsd_p_scaled, jsd_q_scaled, jsd). */
  def jsDivergenceByGroup(df: DataFrame, group: String, cat: String,
                          isP: Column): DataFrame = {
    val emitted = Seq("n_categories", "n_p", "n_q", "jsd_p_scaled",
      "jsd_q_scaled", "jsd", "_cp", "_cq", "_tp", "_tq", "_sp", "_sq")
    require(!emitted.contains(cat) && !emitted.contains(group),
      s"jsDivergenceByGroup emits/uses ${emitted.mkString(", ")}; " +
        "rename inputs")
    val w = Window.partitionBy(col(group))
    val (termP, termQ) = jsdTerms(col("_cp"), col("_cq"), col("_tp"),
      col("_tq"))
    df.filter(col(cat).isNotNull && col(group).isNotNull)
      .groupBy(col(group), col(cat))
      .agg(sum(when(isP, 1L).otherwise(0L)).as("_cp"),
        sum(when(isP, 0L).otherwise(1L)).as("_cq"))
      .withColumn("_tp", sum(col("_cp")).over(w))
      .withColumn("_tq", sum(col("_cq")).over(w))
      .select(col(group), col("_tp"), col("_tq"), termP.as("_sp"),
        termQ.as("_sq"))
      .groupBy(col(group), col("_tp"), col("_tq"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("_sp")).cast("long").as("jsd_p_scaled"),
        sum(col("_sq")).cast("long").as("jsd_q_scaled"))
      .select(col(group), col("n_categories"), col("_tp").as("n_p"),
        col("_tq").as("n_q"), col("jsd_p_scaled"), col("jsd_q_scaled"),
        when(col("_tp") > 0L && col("_tq") > 0L,
          (col("jsd_p_scaled").cast("double") / col("_tp").cast("double")
            + col("jsd_q_scaled").cast("double") / col("_tq").cast("double"))
            / (2d * LogScale.toDouble)).as("jsd"))
  }
}
