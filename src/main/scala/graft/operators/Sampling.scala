package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines (beyond the
  * reference surface).
  *
  * Spark's own `sample()` draws from a partition-seeded RNG, so the kept set
  * changes with partitioning, task retries, and engine — unusable when a
  * sample must be reproducible, auditable, or consistent across reruns of a
  * 100 TB curation job. These operators key the decision on md5 of the row's
  * id instead: keep iff hash(id || salt) < rate · 2^32. The same row is kept
  * by every engine, every partitioning, every rerun — and changing `salt`
  * draws an independent sample. Pure codegen'd filter, no shuffle, pushes
  * nothing but the id column ahead of the scan's other columns.
  */
object Sampling {

  /** The 32-bit keep-decision hash for `id` under `salt`. */
  private def keyHash(id: Column, salt: String): Column =
    graft.expressions.Md5Expressions.md5Int(concat(id.cast("string"), lit(salt)))

  /** Threshold for a keep-rate in [0, 1] over the 2^32 hash space — public
    * so oracle SQL generators embed the identical integer. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    (rate * 4294967296.0).toLong
  }

  /** Cumulative band cutoffs for splitAssign's fractions, clamped so float
    * accumulation error cannot push an intermediate sum past 1.0 — public
    * so oracle SQL generators run the IDENTICAL arithmetic and embed the
    * identical integers. */
  def cumulativeThresholds(fractions: Seq[Double]): Seq[Long] =
    fractions.scanLeft(0.0)(_ + _).tail
      .map(c => threshold(math.min(c, 1.0)))

  /** Keep ~`rate` of rows, decided by md5(id || salt): deterministic,
    * engine-reproducible, independent across salts. */
  def hashSample(df: DataFrame, id: String, rate: Double,
                 salt: String = ""): DataFrame =
    df.filter(keyHash(col(id), salt) < threshold(rate))

  /** Per-ROW keep probability — importance/quality-weighted deterministic
    * sampling: keep iff md5(id || salt) < rate(row) · 2^32, where `rate` is
    * any Column in [0, 1] (values below 0 keep nothing, above 1 keep
    * everything — the hash-band comparison clamps naturally; a NULL rate
    * drops the row, like a NULL predicate). The continuous generalization
    * of stratifiedSample: weight retention by a quality score instead of a
    * finite stratum map (importance-sampling the corpus toward high-quality
    * docs). The decision hash is still a function of (id, salt) alone, so
    * RAISING a row's rate can only ADD it — rows kept under a lower rate
    * never churn out — and the kept set is identical on every engine and
    * partitioning. Cross-engine exactness: feed an exactly-representable
    * rate (integer-count fractions on the 1e6 floor-truncation grid, like
    * qualityScore's ratios, possibly rescaled by IEEE-exact ops); the
    * threshold multiply is then the same double everywhere. Pure codegen'd
    * filter, zero shuffle. */
  def hashSampleWeighted(df: DataFrame, id: String, rate: Column,
                         salt: String = ""): DataFrame =
    df.filter(keyHash(col(id), salt).cast("double") <
      rate.cast("double") * lit(4294967296.0))

  /** Exact-k weighted sampling WITHOUT replacement — Efraimidis-Spirakis
    * A-Res (public, Inf. Proc. Letters 2006) with md5 uniforms: each row
    * draws u = (md5(id‖salt)+1)/2³², and the k rows with the largest
    * u^(1/w) win — heavier weights win more often, no row twice, and the
    * draw is a pure function of (id, salt): engine-reproducible where
    * seeded RNG never is, and stable under corpus growth (a new row can
    * displace at most one incumbent). hashSampleWeighted keeps an
    * EXPECTED fraction; this draws an EXACT count.
    *
    * Ranking: maximizing u^(1/w) ⟺ minimizing (−ln u)/w. −ln u enters as
    * the exact BIGINT L = qlog(2³²) − qlog(h+1) (floor-of-ln quantized at
    * 10⁻⁶, the InfoTheory contract), and the sort key is the quantized
    * integer (L·10⁶) div w with id as tiebreak — deterministic on both
    * engines; the emitted ranking is DEFINED as this quantized-key
    * algorithm. Weights must be positive integers (fail-loud guard, the
    * weightedMedian convention). TakeOrderedAndProject — never a global
    * sort. Emits the k winners (id, weight, es_key). */
  def weightedSampleK(df: DataFrame, id: String, weight: String, k: Int,
                      salt: String = "wsk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("es_key"),
      "weightedSampleK emits an 'es_key' column; rename the input's first")
    val guard = assert_true(col(weight) > 0,
      concat(lit("weightedSampleK: non-positive weight (an upstream data " +
        "bug — a zero weight can never win and a negative one inverts " +
        "the ranking); got "), col(weight).cast("string")))
    Seq("_es_l", "_es_w").foreach(c => require(!df.columns.contains(c),
      s"weightedSampleK uses an internal '$c' column; rename the input's"))
    require(CoreOps.integralTypes.contains(df.schema(weight).dataType),
      s"weightedSampleK needs an integral weight column (the lorenzCurve " +
        s"convention — `div` is exact integer math); got " +
        s"${df.schema(weight).dataType} for '$weight'")
    val h = keyHash(col(id), salt)
    val lScaled = (floor(log(lit(4294967296.0)) * 1000000d)
      - floor(log((h + 1L).cast("double")) * 1000000d)).cast("long")
    // weight enters through the internal '_es_w' rename, never spliced raw
    // into SQL text — names needing quoting (spaces, dots) stay safe.
    df.filter(col(weight).isNotNull).filter(guard.isNull)
      .withColumn("_es_l", lScaled)
      .withColumn("_es_w", col(weight).cast("long"))
      .withColumn("es_key",
        expr("(_es_l * CAST(1000000 AS BIGINT)) div _es_w"))
      .select(col(id), col(weight).cast("long").as(weight), col("es_key"))
      .orderBy(col("es_key"), col(id))
      .limit(k)
  }

  /** Per-stratum keep rates — the data-mixture rebalancing step of a corpus
    * pipeline (e.g. downsample the dominant language, keep the rest whole).
    * `rates` maps stratum values to keep-rates; unlisted strata keep
    * `defaultRate`. The decision stays a function of (id, salt) alone, so
    * changing the mixture does not reshuffle which rows of an unchanged
    * stratum survive — reruns touch only the strata whose rate moved. */
  def stratifiedSample(df: DataFrame, stratum: String, id: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = ""): DataFrame = {
    val cutoff = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (value, rate)) =>
        when(col(stratum) === value, lit(threshold(rate))).otherwise(acc)
    }
    df.filter(keyHash(col(id), salt) < cutoff)
  }

  /** Deterministic train/val/test split assignment: label every row with
    * the FIRST split whose cumulative hash band contains md5(id || salt) —
    * bands partition the 2^32 hash space in the given order, so fractions
    * are disjoint and exhaustive (the last split absorbs rounding
    * remainder; fractions must sum to ~1). The same row lands in the same
    * split on every engine, partitioning, and rerun — and because the
    * decision is a pure function of (id, salt), growing the corpus NEVER
    * moves an existing row between splits (the leakage-safety property a
    * random split lacks: yesterday's training doc cannot become tomorrow's
    * eval doc). Pure codegen'd map, zero shuffle. For GROUP-level holdout
    * (all docs of one author/domain in the same split — leakage-safe when
    * near-identical docs cluster within groups), pass the group column as
    * `id`: the band decision then keys on the group value, so members can
    * never straddle splits. */
  def splitAssign(df: DataFrame, id: String,
                  splits: Seq[(String, Double)], out: String = "split",
                  salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must be non-negative and sum to 1, got $splits")
    require(!df.columns.contains(out),
      s"splitAssign emits '$out'; rename the input's first")
    val h = keyHash(col(id), salt)
    val cuts = cumulativeThresholds(splits.map(_._2))
    val labeled = splits.map(_._1).zip(cuts).init
      .foldRight(lit(splits.last._1)) { case ((name, cut), rest) =>
        when(h < cut, name) otherwise rest
      }
    df.withColumn(out, labeled)
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * md5(id || salt) mod k — the same leakage-safety contract as
    * splitAssign (a pure function of (id, salt): the same row lands in
    * the same fold on every engine, partitioning, and rerun, and growing
    * the corpus never moves an existing row between folds). Folds are
    * 0-based and near-equal-sized (each ≈ 1/k of the 2^32 hash space).
    * Pure codegen'd map, zero shuffle. For GROUP-level folds (all docs of
    * one author in one fold), pass the group column as `id`. Distinct
    * salts give independent fold systems — repeated CV without reusing
    * yesterday's boundaries. */
  def kfoldAssign(df: DataFrame, id: String, k: Int,
                  out: String = "fold", salt: String = ""): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    require(!df.columns.contains(out),
      s"kfoldAssign emits '$out'; rename the input's first")
    // keyHash is non-negative (a 32-bit value in a long), so % ≡ pmod —
    // the expression mirrors the oracle's BIGINT % literally
    df.withColumn(out, keyHash(col(id), salt) % lit(k.toLong))
  }

  /** Per-group QUOTA sampling: exactly `n` rows per stratum (fewer when the
    * stratum is smaller), drawn in deterministic md5 order — "keep 1000
    * documents per source" where the rate-based samplers can't promise a
    * count. Composes CoreOps.groupTopK, so it compiles to WindowGroupLimit:
    * each task retains at most n rows per group before the exchange, and no
    * group's full ranking materializes. Emits `rank` (1-based draw order) —
    * nested quotas (a smaller n under the same salt) are prefixes of larger
    * ones, the same auditability hashSample gives rates. */
  def quotaSample(df: DataFrame, stratum: String, id: String, n: Int,
                  salt: String = ""): DataFrame =
    CoreOps.groupTopK(df, Seq(stratum), keyHash(col(id), salt), id, n)

  /** Fractional repeat-factor mixing — the "epochs per domain" step of an
    * LLM data mixture (e.g. code ×2.5, web ×0.3): each row is emitted
    * `floor(weight)` times, plus one more iff md5(id || salt) falls under
    * the fractional remainder, so a stratum with weight 2.5 averages 2.5
    * copies with the SAME deterministic guarantees as the samplers above
    * (weights < 1 downsample, weights > 1 upsample — one operator covers
    * both directions). Emits a 0-based `copy` column so downstream shuffles
    * can distinguish repeats. Fractional thresholds are computed driver-side
    * from the literal weight map — never per-row float arithmetic, so every
    * engine agrees on the boundary rows. Output volume is decided
    * row-locally (explode over a ≤⌈weight⌉-element sequence): a pure map
    * stage, no shuffle, no skew beyond the weights themselves. */
  def mixtureRepeat(df: DataFrame, stratum: String, id: String,
                    weights: Map[String, Double], defaultWeight: Double,
                    salt: String = ""): DataFrame = {
    require(!df.columns.contains("copy"),
      "mixtureRepeat emits a 'copy' column; rename the input's existing one first")
    def copiesFor(w: Double): Column = {
      require(w >= 0.0, s"mixture weight must be >= 0, got $w")
      lit(math.floor(w).toLong) +
        when(keyHash(col(id), salt) < threshold(w - math.floor(w)), lit(1L))
          .otherwise(lit(0L))
    }
    val n = weights.toSeq.sortBy(_._1).foldLeft(copiesFor(defaultWeight)) {
      case (acc, (value, w)) => when(col(stratum) === value, copiesFor(w)).otherwise(acc)
    }
    df.withColumn("copy",
      explode(when(n > 0, sequence(lit(0L), n - 1)).otherwise(array().cast("array<long>"))))
  }

  /** Deterministic hard-negative sampling for contrastive training: for
    * each anchor, `k` pseudo-random negatives drawn from a bounded
    * candidate pool, excluding the anchor itself AND anything in the
    * anchor's near-dup cluster (a near-dup labelled "negative" poisons a
    * contrastive objective — that exclusion is the whole point of wiring
    * `clusters` in). Every choice is a pure function of (ids, salt):
    * the pool is the `poolSize` corpus ids with the smallest
    * md5(id || ':' salt), and each anchor ranks pool members by
    * md5(anchor '|' neg '|' salt) — so reruns, engines, and partitionings
    * all agree row for row, and growing the corpus only perturbs the pool
    * at the hash boundary.
    *
    * Scale shape: the pool is a TakeOrderedAndProject (top-poolSize by
    * hash — no full sort) joined to cluster ids and BROADCAST; per-anchor
    * candidate generation is a map-side nested-loop over poolSize rows,
    * and the per-anchor top-k is a rank window that WindowGroupLimit caps
    * at k rows per anchor per task. Driver/broadcast traffic is
    * O(poolSize); nothing anchors-sized ever collects. `clusters` is
    * dupClusters output; docs in no cluster count as their own cluster.
    * Emits (anchor_id, neg_id, rank). */
  def negativeSample(corpus: DataFrame, id: String, anchors: DataFrame,
                     clusters: DataFrame, poolSize: Int, k: Int,
                     salt: String = ""): DataFrame = {
    require(poolSize > 0 && k > 0,
      s"poolSize and k must be positive, got $poolSize, $k")
    require(clusters.columns.contains("doc_id") &&
        clusters.columns.contains("cluster_id"),
      "negativeSample expects dupClusters output: (doc_id, cluster_id)")
    val cl = clusters.select(col("doc_id"), col("cluster_id"))
    val pool = corpus.select(col(id).as("neg_id"))
      .withColumn("_ord", keyHash(col("neg_id"), ":" + salt))
      .orderBy(col("_ord"), col("neg_id")).limit(poolSize)
      .join(cl.select(col("doc_id").as("neg_id"),
        col("cluster_id").as("_ncl")), Seq("neg_id"), "left")
      .select(col("neg_id"), coalesce(col("_ncl"), col("neg_id")).as("_ncl"))
    val anch = anchors.select(col(id).as("anchor_id"))
      .join(cl.select(col("doc_id").as("anchor_id"),
        col("cluster_id").as("_acl")), Seq("anchor_id"), "left")
      .select(col("anchor_id"), coalesce(col("_acl"), col("anchor_id")).as("_acl"))
    val pairHash = graft.expressions.Md5Expressions.md5Int(
      concat(col("anchor_id").cast("string"), lit("|"),
        col("neg_id").cast("string"), lit("|" + salt)))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("_r"), col("neg_id"))
    anch.crossJoin(broadcast(pool))
      .filter(col("anchor_id") =!= col("neg_id") &&
        col("_acl") =!= col("_ncl"))
      .withColumn("_r", pairHash)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("neg_id"), col("rank"))
  }

  /** Temperature-flattened mixture shares over pre-aggregated per-group
    * sizes — the multilingual/multi-source sampling rule (weight
    * ∝ n^(1/T)) that keeps big corpora from drowning small ones, with
    * T = 2^halvings so the power is computable EXACTLY: each halving is
    * one integer square-root step w' = ⌊√(w·10⁶)⌋, and IEEE-754 requires
    * sqrt to be correctly rounded (unlike exp/ln/pow), so every step —
    * and therefore every share — is bit-identical on any engine with no
    * quantized-transcendental caveat at all. After k halvings
    * w ≈ n^(1/2^k)·10^(3·(1−2^{-k})); shares normalize the scale factor
    * away. Bounds fail LOUD: each step needs its argument under 2⁵² for
    * the double to be exact (n ≤ 4.5·10⁹ at the first step — feed token
    * counts in millions past that). NULL groups/sizes drop; negative
    * sizes refuse. One 1-row broadcast total; O(groups) output. Emits
    * (group, n, w_scaled, share). */
  def temperatureShares(df: DataFrame, group: String, n: String,
                        halvings: Int): DataFrame = {
    require(halvings >= 1 && halvings <= 3,
      s"halvings must be in [1,3] (T = 2..8), got $halvings")
    val emitted = Seq("w_scaled", "share", "_tw")
    require(!emitted.contains(group) && !emitted.contains(n),
      s"temperatureShares emits ${emitted.mkString(", ")}; rename inputs")
    val bound = (1L << 52) / 1000000L
    val guard = assert_true(col(n).isNull || (col(n) >= 0 && col(n) <= bound),
      concat(lit(s"temperatureShares: sizes must be in [0, $bound] (the " +
        "sqrt argument must stay under 2^52 to be exact; rescale to " +
        "millions); got "), col(n).cast("string")))
    var w: org.apache.spark.sql.Column = col(n).cast("long")
    for (_ <- 1 to halvings)
      w = floor(sqrt((w * lit(1000000L)).cast("double"))).cast("long")
    val scored = df.filter(guard.isNull)
      .filter(col(group).isNotNull && col(n).isNotNull)
      .select(col(group), col(n), w.as("w_scaled"))
    val total = scored.groupBy().agg(sum(col("w_scaled")).as("_tw"))
    scored.crossJoin(broadcast(total))
      .select(col(group), col(n), col("w_scaled"),
        when(col("_tw") > 0,
          floor(col("w_scaled").cast("double") / col("_tw").cast("double")
            * 1000000d) / 1000000d).as("share"))
  }

  /** Cumulative Poisson(1) CDF thresholds over the 10⁶ draw space,
    * T_k = ⌊CDF(k)·10⁶⌋ for k = 0..maxK — public so oracle SQL generators
    * embed the IDENTICAL integers (the cumulativeThresholds convention).
    * A uniform draw u ∈ [0, 10⁶) maps to weight #{k : u ≥ T_k}, i.e. a
    * Poisson(1) variate truncated at maxK+1. */
  def poissonOneThresholds(maxK: Int): Seq[Long] = {
    require(maxK >= 0, s"maxK must be >= 0, got $maxK")
    var cum = 0.0
    var term = math.exp(-1.0) // e⁻¹/0!
    (0 to maxK).map { k =>
      cum += term
      term /= (k + 1).toDouble
      math.min((cum * 1e6).toLong, 1000000L)
    }
  }

  /** Poisson-bootstrap confidence interval for the mean of an integral
    * column — the resampling-free bootstrap (Chamberlain/Owen; the
    * standard distributed form): each row enters resample b with
    * multiplicity ~ Poisson(1), drawn DETERMINISTICALLY through the
    * quantized CDF thresholds above from word (b mod 4) of
    * md5(id:salt:⌊b/4⌋) — the digest's four 32-bit words are four
    * independent uniforms, so B resamples cost B/4 digests (+ B/4
    * per-row string concats) instead of B; md5 and the concat dominate
    * this pass. The "randomness" stays a pure function of (ids, salt) —
    * identical on any engine, partitioning, or rerun, and the whole
    * statistic is oracle-checkable where a seeded RNG bootstrap never is.
    *
    * Shape: ONE partial-agg'd pass computes all 2·B resample sums as
    * separate aggregate expressions over per-row integer weights — no
    * B× row fan-out, no shuffle keyed on anything (a single global agg);
    * the B means then explode from the one result row and collapse
    * through exact `percentile` interpolation (O(B) memory). Per-resample
    * means and the CI bounds are trunc6'd; empty resamples (possible only
    * on tiny inputs) are skipped by the percentile and reported via
    * n_resamples. Truncating multiplicity at maxK+1 loses
    * P(X > maxK) ≈ 10⁻⁷ of draws at maxK = 8 — quantified, deterministic,
    * and identical on both engines, so it is a definition, not an error.
    * NULL ids/values drop. Emits ONE row
    * (n_rows, n_resamples, mean, ci_lo, ci_hi). */
  def bootstrapMeanCI(df: DataFrame, id: String, value: String,
                      resamples: Int = 32, maxK: Int = 8,
                      loQ: Double = 0.025, hiQ: Double = 0.975,
                      salt: String = "boot"): DataFrame = {
    require(resamples >= 2, s"resamples must be >= 2, got $resamples")
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ,
      s"need 0 <= loQ < hiQ <= 1, got $loQ/$hiQ")
    val ths = poissonOneThresholds(maxK)
    val groups = (resamples + 3) / 4
    // ALL B multiplicities per row from ONE native kernel call
    // (BootstrapWeights: digest + word split + threshold walk in a tight
    // JVM loop) — the equivalent Column form (B sums of |ths| CASE terms)
    // generated ~300 expression nodes per row and dominated the pass;
    // Md5ExprSpec pins the kernel to that Column form bit for bit
    val staged = df.filter(col(id).isNotNull && col(value).isNotNull)
      .select(col(value).cast("long").as("_v"),
        graft.expressions.Md5Expressions.bootstrapWeights(
          col(id).cast("string"), salt, groups, ths).as("_ws"))
    val base = staged
      .select(Seq(col("_v")) ++
        (0 until resamples).map(b => col("_ws")(b).as(s"_w$b")): _*)
    val aggs =
      (0 until resamples).flatMap(b => Seq(
        sum(col(s"_w$b") * col("_v")).as(s"_swx$b"),
        sum(col(s"_w$b")).as(s"_sw$b"))) ++
      Seq(count(lit(1)).as("n_rows"), sum(col("_v")).as("_sx"))
    val one = base.agg(aggs.head, aggs.tail: _*)
    val means = (0 until resamples).map(b =>
      when(col(s"_sw$b") > 0L,
        floor(col(s"_swx$b").cast("double") / col(s"_sw$b").cast("double")
          * 1000000d) / 1000000d))
    one.select(col("n_rows"), col("_sx"),
        explode(array(means: _*)).as("_m"))
      .groupBy(col("n_rows"), col("_sx"))
      .agg(count(col("_m")).as("n_resamples"),
        (floor(percentile(col("_m"), lit(loQ)) * 1000000d) / 1000000d)
          .as("ci_lo"),
        (floor(percentile(col("_m"), lit(hiQ)) * 1000000d) / 1000000d)
          .as("ci_hi"))
      .select(col("n_rows"), col("n_resamples"),
        when(col("n_rows") > 0L,
          floor(col("_sx").cast("double") / col("n_rows").cast("double")
            * 1000000d) / 1000000d).as("mean"),
        col("ci_lo"), col("ci_hi"))
  }
}
