package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier training/evaluation tier — multinomial Naive Bayes, confusion
  * matrices, per-class precision/recall/F1, Cohen's kappa, ROC curves — the
  * label-quality loop of a training-data pipeline (score an automatic
  * labeler, audit annotator agreement, pick an operating threshold).
  *
  * Extension tier beyond the reference surface (the reference —
  * chapter6_exercise/AnalyzeBrowserEvents.java:83-181 — aggregates event
  * streams; it has no classification or evaluation analytics).
  *
  * Determinism contract: every transcendental enters as a quantized
  * integer (InfoTheory.qlog — floor(ln·10⁶) BIGINT on integer arguments),
  * every sum is exact integer arithmetic (order-independent under any
  * partitioning), and every emitted ratio is ONE final trunc6'd double
  * division of exact integers — so all outputs are bit-identical across
  * engines, partitionings, and reruns.
  */
object Eval {

  private def trunc6(c: Column): Column = floor(c * 1000000d) / 1000000d

  /** Multinomial Naive Bayes with add-one (Laplace) smoothing, trained and
    * scored on the SAME (id, feature-occurrence, label) frame — the
    * resubstitution audit that asks "are these labels even self-consistent
    * under a bag-of-features model?" (a noisy-label screen next to
    * knnLabelDisagreement, from counts instead of embeddings).
    *
    * Input: one row per feature OCCURRENCE (pre-exploded — multiplicity is
    * evidence); `label` must be functionally determined by `id`. Rows with
    * a NULL id, feature, or label drop; ids with NO surviving feature rows
    * are ABSENT from the output (no evidence, no prediction — the
    * languageId convention).
    *
    * Score (all-integer, exact): with V = |vocab|, N_L = feature
    * occurrences under label L, d_L = distinct ids under L, D = total ids,
    * c(f,L) = occurrences of f under L and n(d,f) the doc's own counts,
    *
    *   score_scaled(d, L) = Σ_f n(d,f)·qlog(c(f,L)+1)
    *                        − n_feats(d)·qlog(N_L + V)
    *                        + qlog(d_L) − qlog(D)
    *
    * i.e. 10⁶·(log-posterior up to the per-doc constant), except every log
    * is quantized AT THE TERM. Features a label never saw contribute
    * qlog(0+1) = 0, so only JOIN HITS are summed and the smoothing
    * normalizer folds into the closed n_feats(d)·qlog(N_L+V) term — the
    * all-pairs (doc × vocab) product never materializes. The argmax is a
    * max over (score_scaled, label) structs: ties break toward the
    * lexicographically LARGEST label (the languageId array_max
    * convention, documented there too).
    *
    * Distributed shape: one (id, label, feature) count shuffle for the
    * doc-term table, one (label, feature) count shuffle for the model, the
    * hit join shuffles on the feature key (fan-out per feature ≤ |labels|),
    * one (id, label) score shuffle, and the label-candidate expansion is a
    * |labels|-row BROADCAST cross join. Totals (V, D) ride a 1-row
    * broadcast. No driver traffic, no unpartitioned windows; at 100 TB the
    * widest frame is the exploded corpus itself.
    *
    * Emits (id, label_true, label_pred, score_scaled). */
  def naiveBayes(labeled: DataFrame, id: String, feat: String,
                 label: String): DataFrame = {
    val internal = Seq("_cnt", "_c", "_ml", "_nl", "_dl", "_v", "_nd",
      "_ntoks", "_hit", "_sc", "_best", "label_true", "label_pred",
      "score_scaled")
    val clash = Seq(id, feat, label).filter(internal.contains)
    require(clash.isEmpty,
      s"naiveBayes uses internal columns ${internal.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
    val base = labeled
      .filter(col(id).isNotNull && col(feat).isNotNull && col(label).isNotNull)
      .select(col(id), col(feat), col(label))
    // per-(id, feature) evidence counts; the label rides along (it is
    // functionally dependent on id, so the extra grouping key is free)
    val docTerm = base.groupBy(col(id), col(label), col(feat))
      .agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(true) // feeds the model join AND the n_feats agg
    // (label, feature) occurrence model — same rows, coarser key
    val model = docTerm.groupBy(col(label).as("_ml"), col(feat))
      .agg(sum(col("_cnt")).as("_c"))
      .localCheckpoint(true) // feeds the hit join, V, and per-label totals
    // O(|labels|)-row frames: per-label occurrence + document totals
    val langTotals = model.groupBy(col("_ml")).agg(sum(col("_c")).as("_nl"))
    val priors = base.select(col(id), col(label)).distinct()
      .groupBy(col(label).as("_ml")).agg(count(lit(1)).as("_dl"))
    // 1-row totals: vocabulary size and document count
    val totals = model.select(col(feat)).distinct()
      .agg(count(lit(1)).as("_v"))
      .crossJoin(base.select(col(id)).distinct()
        .agg(count(lit(1)).as("_nd")))
    // per-doc feature mass, then the |labels|-way candidate expansion
    val docs = docTerm.groupBy(col(id), col(label).as("label_true"))
      .agg(sum(col("_cnt")).as("_ntoks"))
      .crossJoin(broadcast(langTotals.join(priors, Seq("_ml"))))
    // hit sums: only (doc, label) pairs sharing at least one feature
    val hits = docTerm
      .join(model, Seq(feat))
      .groupBy(col(id), col("_ml"))
      .agg(sum(col("_cnt") * InfoTheory.qlog(col("_c") + 1)).as("_hit"))
    docs.join(hits, Seq(id, "_ml"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("_sc",
        coalesce(col("_hit"), lit(0L))
          - col("_ntoks") * InfoTheory.qlog(col("_nl") + col("_v"))
          + InfoTheory.qlog(col("_dl")) - InfoTheory.qlog(col("_nd")))
      .groupBy(col(id), col("label_true"))
      .agg(max(struct(col("_sc"), col("_ml"))).as("_best"))
      .select(col(id), col("label_true"),
        col("_best").getField("_ml").as("label_pred"),
        col("_best").getField("_sc").as("score_scaled"))
  }

  /** Confusion matrix over a (true, predicted) label frame: one
    * partial-agg'd count shuffle on the label pair — O(classes²) output
    * rows. NULL labels drop (an unscored row is not a confusion).
    * Emits (label_true, label_pred, n_rows). */
  def confusionMatrix(pred: DataFrame, trueCol: String,
                      predCol: String): DataFrame = {
    require(trueCol != "n_rows" && predCol != "n_rows",
      "confusionMatrix emits n_rows; rename inputs")
    pred.filter(col(trueCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(trueCol), col(predCol))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Per-class precision / recall / F1 from exact one-vs-rest counts.
    * Classes are the UNION of true and predicted labels (a class the
    * model never predicts still gets its recall row, with precision
    * NULL — undefined, not zero; same for recall of a never-true class).
    * F1 = 2·tp / (2·tp + fp + fn) — computed directly from the integer
    * counts, ONE trunc6'd division, no precision·recall float detour.
    *
    * Shape: one confusion-matrix shuffle (O(classes²) rows), then two
    * O(classes)-row margin aggregations unioned and re-aggregated —
    * everything after the first shuffle is post-aggregation-sized.
    * Emits (label, n_tp, n_fp, n_fn, precision, recall, f1). */
  def classMetrics(pred: DataFrame, trueCol: String,
                   predCol: String): DataFrame = {
    val cm = confusionMatrix(pred, trueCol, predCol)
    val byTrue = cm.groupBy(col(trueCol).as("label"))
      .agg(sum(when(col(predCol) === col(trueCol), col("n_rows"))
          .otherwise(0L)).as("_tp"),
        sum(when(col(predCol) =!= col(trueCol), col("n_rows"))
          .otherwise(0L)).as("_fn"),
        lit(0L).as("_fp"), lit(1L).as("_seenTrue"))
    val byPred = cm.groupBy(col(predCol).as("label"))
      .agg(lit(0L).as("_tp"),
        lit(0L).as("_fn"),
        sum(when(col(predCol) =!= col(trueCol), col("n_rows"))
          .otherwise(0L)).as("_fp"),
        lit(0L).as("_seenTrue"))
    byTrue.unionByName(byPred.withColumn("_seenPred", lit(1L)),
        allowMissingColumns = true)
      .na.fill(0L, Seq("_seenPred"))
      .groupBy(col("label"))
      .agg(sum(col("_tp")).as("n_tp"), sum(col("_fp")).as("n_fp"),
        sum(col("_fn")).as("n_fn"),
        max(col("_seenTrue")).as("_st"), max(col("_seenPred")).as("_sp"))
      .select(col("label"), col("n_tp"), col("n_fp"), col("n_fn"),
        when(col("_sp") === 1L, trunc6(col("n_tp").cast("double") /
          (col("n_tp") + col("n_fp")).cast("double"))).as("precision"),
        when(col("_st") === 1L, trunc6(col("n_tp").cast("double") /
          (col("n_tp") + col("n_fn")).cast("double"))).as("recall"),
        when(col("n_tp") + col("n_fp") + col("n_fn") > 0L,
          trunc6((col("n_tp") * 2).cast("double") /
            (col("n_tp") * 2 + col("n_fp") + col("n_fn")).cast("double")))
          .as("f1"))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelings
    * (annotator audit; also the honest "is this classifier better than
    * its class prior" gauge). From exact integers only:
    *
    *   kappa = (N·agree − Σ_c row_c·col_c) / (N² − Σ_c row_c·col_c)
    *
    * (the usual (p_o−p_e)/(1−p_e) with both sides multiplied by N²), so
    * the only float is ONE trunc6'd division. Over the same class union
    * as classMetrics. Perfect-chance degeneracy (denominator 0 — every
    * row in one class on both sides) emits kappa NULL. Shape: one
    * confusion shuffle, two O(classes)-row margin frames joined on the
    * class, one 1-row agg. Emits (n_rows, n_agree, kappa). */
  def cohenKappa(pred: DataFrame, trueCol: String,
                 predCol: String): DataFrame = {
    val cm = confusionMatrix(pred, trueCol, predCol).localCheckpoint(true)
    val rowM = cm.groupBy(col(trueCol).as("_cls"))
      .agg(sum(col("n_rows")).as("_row"))
    val colM = cm.groupBy(col(predCol).as("_cls"))
      .agg(sum(col("n_rows")).as("_col"))
    // full outer on the class: a never-predicted class has col margin 0
    // and contributes nothing to the expected-agreement sum
    val pe = rowM.join(colM, Seq("_cls"), "full_outer")
      .agg(sum(coalesce(col("_row"), lit(0L)) *
        coalesce(col("_col"), lit(0L))).as("_pe"))
    val tot = cm.agg(sum(col("n_rows")).as("n_rows"),
      sum(when(col(trueCol) === col(predCol), col("n_rows"))
        .otherwise(0L)).as("n_agree"))
    tot.crossJoin(broadcast(pe))
      .select(col("n_rows"), col("n_agree"),
        when(col("n_rows") * col("n_rows") =!= col("_pe"),
          trunc6((col("n_rows") * col("n_agree") - col("_pe")).cast("double")
            / (col("n_rows") * col("n_rows") - col("_pe")).cast("double")))
          .as("kappa"))
  }

  /** ROC curve at every achievable operating point: for each DISTINCT
    * score value s, the exact (TP, FP) counts of the "predict positive
    * when score ≥ s" rule, with trunc6'd TPR/FPR. The threshold-picking
    * companion to the rank-based AUC (CoreOps.aucShift computes the area;
    * this emits the curve the area integrates).
    *
    * Shape: ONE count shuffle collapses the corpus to its distinct score
    * values (pos/neg counts per score), then the cumulative TP/FP run
    * through CoreOps.orderedPrefixSum on the POST-aggregation frame —
    * the distributed bucket-scan, never an unpartitioned window — and
    * the (P, N) totals ride a 1-row broadcast. O(distinct scores) rows
    * everywhere after the first shuffle. NULL scores/labels drop.
    * Scores must be integral (exact ordering and exact prefix sums);
    * quantize floats to a grid first, as the money queries do.
    * Emits (threshold, n_tp, n_fp, tpr, fpr), one row per distinct
    * score, descending thresholds carrying ascending cumulative counts. */
  def rocCurve(df: DataFrame, score: String, isPos: Column): DataFrame =
    rocCum(df, score, isPos)
      .select(col("threshold"), col("n_tp"), col("n_fp"),
        when(col("_P") > 0L, trunc6(col("n_tp").cast("double")
          / col("_P").cast("double"))).as("tpr"),
        when(col("_N") > 0L, trunc6(col("n_fp").cast("double")
          / col("_N").cast("double"))).as("fpr"))

  /** Shared exact ROC cumulatives: one row per distinct score with
    * (threshold, n_tp, n_fp) and the (P, N) totals attached — rocCurve,
    * youdenPoint, and gainsTable are views over this frame. */
  private def rocCum(df: DataFrame, score: String, isPos: Column)
      : DataFrame = {
    val internal = Seq("_np", "_nn", "_P", "_N", "threshold", "n_tp",
      "n_fp", "tpr", "fpr")
    require(!internal.contains(score),
      s"rocCurve emits/uses ${internal.mkString(", ")}; rename the score")
    val byScore = df.filter(col(score).isNotNull && isPos.isNotNull)
      .groupBy(col(score).cast("long").as("threshold"))
      .agg(sum(when(isPos, 1L).otherwise(0L)).as("_np"),
        sum(when(isPos, 0L).otherwise(1L)).as("_nn"))
    val cum = CoreOps.orderedPrefixSum(
      CoreOps.orderedPrefixSum(byScore, -col("threshold"),
        "threshold", "_np", "n_tp"),
      -col("threshold"), "threshold", "_nn", "n_fp")
    val tots = byScore.agg(sum(col("_np")).as("_P"), sum(col("_nn")).as("_N"))
    cum.crossJoin(broadcast(tots))
  }

  /** Average precision (the exact area under the precision-recall curve,
    * step interpolation): AP = Σ_t (R_t − R_{t−1})·P_t over DISTINCT
    * descending thresholds — the ranking-quality one-number that, unlike
    * ROC-AUC, does not reward a model for ordering the easy negatives
    * (the right gauge under class imbalance, e.g. a rare-language
    * detector). Ties in the score form one threshold block by
    * construction (the rocCum distinct-threshold frame), so the result
    * is well-defined and deterministic — no per-row permutation enters.
    *
    * Exactness: ΔR_t·P_t = (p_t/P)·(TP_t/N_t) enters as the integer term
    * (p_t·TP_t·10⁶) div N_t — the product must stay under 2⁶³ (P ≲ 3·10⁶
    * positives at worst-case p_t = TP_t = P; ANSI fails loud past it —
    * at larger corpora feed a sampled or per-segment frame), terms sum
    * exactly in int64 (the sum is ≤ P·10⁶ because TP_t ≤ N_t), and the
    * emitted `average_precision` is ONE double division. Same
    * O(distinct scores) distributed shape as rocCurve — the cumulatives
    * ride the bucket prefix scan, never an unpartitioned window. Emits
    * ONE row (n_pos, ap_scaled, average_precision); zero positives emit
    * NULL ap (undefined, not a fake 0); empty input emits nothing. */
  def averagePrecision(df: DataFrame, score: String,
                       isPos: Column): DataFrame =
    rocCum(df, score, isPos)
      .select(col("_P"),
        expr("(_np * n_tp * CAST(1000000 AS BIGINT)) div (n_tp + n_fp)")
          .as("_t"))
      .groupBy(col("_P"))
      .agg(sum(col("_t")).as("ap_scaled"))
      .select(col("_P").as("n_pos"), col("ap_scaled"),
        when(col("_P") > 0L, trunc6(col("ap_scaled").cast("double")
          / (col("_P").cast("double") * 1000000d)))
          .as("average_precision"))

  /** The Youden-J operating point: the threshold maximizing TPR − FPR,
    * chosen by the EXACT integer argmax of J·P·N = n_tp·N − n_fp·P over
    * the ROC cumulatives (no float enters the comparison), ties toward
    * the LARGEST threshold — the most conservative rule among equals.
    * The emitted `j` is one trunc6'd division of the integer numerator.
    * ONE post-aggregation argmax over O(distinct scores) rows; P·N
    * overflows loudly under ANSI past ~3·10⁹ rows per side. Emits one
    * row (threshold, n_tp, n_fp, j); empty/degenerate input (P or N
    * zero) emits j NULL. */
  def youdenPoint(df: DataFrame, score: String, isPos: Column): DataFrame =
    rocCum(df, score, isPos)
      .withColumn("_j", col("n_tp") * col("_N") - col("n_fp") * col("_P"))
      .agg(max(struct(col("_j"), col("threshold"), col("n_tp"),
        col("n_fp"), col("_P"), col("_N"))).as("_b"))
      .select(col("_b.threshold").as("threshold"),
        col("_b.n_tp").as("n_tp"), col("_b.n_fp").as("n_fp"),
        when(col("_b._P") > 0L && col("_b._N") > 0L,
          trunc6(col("_b._j").cast("double")
            / (col("_b._P") * col("_b._N")).cast("double"))).as("j"))

  /** Cumulative gains / lift table: for each of `nBuckets` equal-width
    * coverage targets (top d/nBuckets of rows by score, descending), the
    * FIRST achievable operating point at or past the target — targets
    * are exact integer ceilings, the pick is a min over the strictly
    * increasing cumulative row count, and gain/lift are single trunc6'd
    * divisions of exact integer products (lift = n_tp·N_all/(P·n_rows)).
    * The bucket expansion is an nBuckets-row BROADCAST against the
    * O(distinct scores) cumulative frame. Emits one row per bucket
    * (bucket, threshold, n_rows, n_pos, gain, lift); empty input emits
    * nothing. */
  def gainsTable(df: DataFrame, score: String, isPos: Column,
                 nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    val buckets = spark.range(1, nBuckets + 1L).toDF("bucket")
    val cum = rocCum(df, score, isPos)
      .withColumn("_ct", col("n_tp") + col("n_fp"))
    cum.crossJoin(broadcast(buckets))
      // ceil(d·N_all/nBuckets) as exact integer arithmetic
      .withColumn("_tgt",
        expr(s"(bucket * (_P + _N) + ${nBuckets - 1}) div $nBuckets"))
      .filter(col("_ct") >= col("_tgt"))
      .groupBy(col("bucket"))
      .agg(min(struct(col("_ct"), col("threshold"), col("n_tp"),
        col("_P"), col("_N"))).as("_b"))
      .select(col("bucket"), col("_b.threshold").as("threshold"),
        col("_b._ct").as("n_rows"), col("_b.n_tp").as("n_pos"),
        when(col("_b._P") > 0L, trunc6(col("_b.n_tp").cast("double")
          / col("_b._P").cast("double"))).as("gain"),
        when(col("_b._P") > 0L,
          trunc6((col("_b.n_tp") * (col("_b._P") + col("_b._N")))
            .cast("double")
            / (col("_b._P") * col("_b._ct")).cast("double"))).as("lift"))
  }

  /** Qini curve — gainsTable for UPLIFT: rank units by a targeting score
    * (descending), and at each of `nBuckets` coverage targets report the
    * incremental conversions the treated top slice produced over its
    * control twin, g(k) = Yₜ(k) − Y꜀(k)·Nₜ(k)/N꜀(k) (Radcliffe 2007).
    * The read-out a treatment-targeting policy is judged by: a random
    * score walks the diagonal, a good uplift score front-loads the
    * incremental conversions. Same machinery as gainsTable: one
    * score-grouped conditional-count pass, descending cumulatives
    * through the distributed orderedPrefixSum (never an unpartitioned
    * window), exact integer bucket ceilings, min-struct picks over the
    * strictly increasing cumulative row count. qini_ppm enters as ONE
    * truncating decimal div of exact integers,
    * ((yₜ·n꜀ − y꜀·nₜ)·10⁶) div n꜀ — NULL while the slice has no
    * control rows (undefined, not zero). Emits one row per bucket
    * (bucket, threshold, n_rows, n_t, n_c, y_t, y_c, qini_ppm). */
  def qiniCurve(df: DataFrame, score: String, treat: Column, isPos: Column,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val internal = Seq("bucket", "threshold", "n_rows", "n_t", "n_c",
      "y_t", "y_c", "qini_ppm", "_nt", "_nc", "_yt", "_yc", "_ct", "_tgt",
      "_tot", "_b")
    require(!internal.contains(score),
      s"qiniCurve emits/uses ${internal.mkString(", ")}; rename the score")
    val spark = df.sparkSession
    val byScore = df
      .filter(col(score).isNotNull && treat.isNotNull && isPos.isNotNull)
      .groupBy(col(score).cast("long").as("threshold"))
      .agg(sum(when(treat, 1L).otherwise(0L)).as("_nt"),
        sum(when(!treat, 1L).otherwise(0L)).as("_nc"),
        sum(when(treat && isPos, 1L).otherwise(0L)).as("_yt"),
        sum(when(!treat && isPos, 1L).otherwise(0L)).as("_yc"))
      .localCheckpoint(true) // shared: the totals row and the prefix chain
    val tots = byScore.agg(sum(col("_nt") + col("_nc")).as("_tot"))
    val cum = CoreOps.orderedPrefixSum(
      CoreOps.orderedPrefixSum(
        CoreOps.orderedPrefixSum(
          CoreOps.orderedPrefixSum(byScore, -col("threshold"),
            "threshold", "_nt", "n_t"),
          -col("threshold"), "threshold", "_nc", "n_c"),
        -col("threshold"), "threshold", "_yt", "y_t"),
      -col("threshold"), "threshold", "_yc", "y_c")
    val buckets = spark.range(1, nBuckets + 1L).toDF("bucket")
    cum.withColumn("_ct", col("n_t") + col("n_c"))
      .crossJoin(broadcast(tots))
      .crossJoin(broadcast(buckets))
      .withColumn("_tgt",
        expr(s"(bucket * _tot + ${nBuckets - 1}) div $nBuckets"))
      .filter(col("_ct") >= col("_tgt"))
      .groupBy(col("bucket"))
      .agg(min(struct(col("_ct"), col("threshold"), col("n_t"), col("n_c"),
        col("y_t"), col("y_c"))).as("_b"))
      .select(col("bucket"), col("_b.threshold").as("threshold"),
        col("_b._ct").as("n_rows"), col("_b.n_t").as("n_t"),
        col("_b.n_c").as("n_c"), col("_b.y_t").as("y_t"),
        col("_b.y_c").as("y_c"),
        when(col("_b.n_c") > 0L,
          expr("((CAST(_b.y_t AS DECIMAL(38,0)) * _b.n_c"
            + " - CAST(_b.y_c AS DECIMAL(38,0)) * _b.n_t) * 1000000)"
            + " div CAST(_b.n_c AS DECIMAL(38,0))").cast("long"))
          .as("qini_ppm"))
  }

  /** Poisson rate-ratio test — the experimentation read-out for COUNT
    * outcomes where abProportionTest reads binary conversion: events per
    * unit of exposure (here: per active user-day), compared between
    * arms. RR = (x_a/t_a)/(x_b/t_b); ln RR enters as the qlog identity
    * lnrr = qlog(x_a·t_b) − qlog(x_b·t_a) (exact-integer products,
    * keep x·t under 2⁵³ — document per call site), and
    * z = ln RR / √(1/x_a + 1/x_b) (the classical Poisson delta-method
    * SE) runs as ONE fixed trunc6'd double chain. NULL lnrr/z while any
    * cell is empty (an arm with zero events has an undefined ratio, not
    * an infinite one). One conditional-count aggregate pass (two exact
    * counts + two conditional distinct counts) → one row. Emits
    * (x_a, t_a, x_b, t_b, lnrr_ppm, z). */
  def rateRatioTest(df: DataFrame, cohortA: Column, isEvent: Column,
                    exposure: Column): DataFrame = {
    val agg = df.filter(cohortA.isNotNull)
      .agg(
        sum(when(cohortA && isEvent, 1L).otherwise(0L)).as("x_a"),
        count_distinct(when(cohortA, exposure)).as("t_a"),
        sum(when(!cohortA && isEvent, 1L).otherwise(0L)).as("x_b"),
        count_distinct(when(!cohortA, exposure)).as("t_b"))
    val ok = col("x_a") > 0L && col("x_b") > 0L && col("t_a") > 0L &&
      col("t_b") > 0L
    val lnrr = InfoTheory.qlog(col("x_a") * col("t_b")) -
      InfoTheory.qlog(col("x_b") * col("t_a"))
    agg.withColumn("lnrr_ppm", when(ok, lnrr))
      .select(col("x_a"), col("t_a"), col("x_b"), col("t_b"),
        col("lnrr_ppm"),
        when(ok, floor(col("lnrr_ppm").cast("double") / 1000000d
          / sqrt(lit(1d) / col("x_a").cast("double")
            + lit(1d) / col("x_b").cast("double")) * 1000000d) / 1000000d)
          .as("z"))
  }

  /** Split-conformal prediction interval with finite-sample coverage —
    * the distribution-free "how wrong is this model, with guarantees"
    * audit (Vovk et al.; the modern ML-eval staple). The frame splits
    * 50/50 by md5(id:salt) (deterministic, engine-reproducible — the
    * splitAssign convention); the CALIBRATION half fits a per-group
    * integer-mean predictor (sum div n — exact floor division, no float)
    * and supplies the conformal radius q_hat = the
    * ⌈(n_cal+1)·(1−α)⌉-th smallest absolute residual (clamped to n_cal);
    * the TEST half reports the realized coverage of ±q_hat, which the
    * conformal theorem guarantees ≥ 1−α in expectation.
    *
    * Exactness: residuals are integer |v − μ_g|; the rank selection runs
    * over the per-residual count frame through the distributed bucket
    * prefix scan (orderedPrefixSum — never an unpartitioned window) and
    * picks min{r : cum(r) ≥ rank} — an exact order statistic; coverage
    * is one trunc6'd division. Test rows whose group never appears in
    * the calibration half have NO prediction and are EXCLUDED from
    * coverage (undefined is not a miss), reported via n_test. NULL
    * ids/groups/values drop. `alphaPct` is α in percent (integer, so
    * the rank ceiling is exact integer arithmetic). Emits ONE row
    * (n_cal, n_test, q_hat, coverage). */
  def conformalInterval(df: DataFrame, group: String, value: String,
                        id: String, alphaPct: Int = 10,
                        salt: String = "conf"): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99,
      s"alphaPct must be in [1, 99], got $alphaPct")
    val base = df.filter(col(id).isNotNull && col(group).isNotNull
        && col(value).isNotNull)
      .select(col(group).as("_g"), col(value).cast("long").as("_v"),
        (pmod(graft.expressions.Md5Expressions.md5Int(
          concat(col(id).cast("string"), lit(s":$salt"))), lit(2L)) === 0L)
          .as("_cal"))
      .localCheckpoint(true) // feeds the model, the ranks, and the test
    val model = base.filter(col("_cal"))
      .groupBy(col("_g"))
      .agg(expr("sum(_v) div count(1)").as("_mu"))
    val resid = base.join(model, Seq("_g"))
      .select(col("_cal"), abs(col("_v") - col("_mu")).as("_r"))
      .localCheckpoint(true)
    val calCounts = resid.filter(col("_cal"))
      .groupBy(col("_r")).agg(count(lit(1)).as("_n"))
    val cum = CoreOps.orderedPrefixSum(calCounts, col("_r"), "_r",
      "_n", "_cum")
    val nCal = resid.filter(col("_cal")).agg(count(lit(1)).as("n_cal"))
    // rank = min(⌈(n_cal+1)·(1−α)⌉, n_cal), exact integer arithmetic
    val qHat = cum.crossJoin(broadcast(nCal))
      .withColumn("_rank",
        least(expr(s"((n_cal + 1) * ${100 - alphaPct} + 99) div 100"),
          col("n_cal")))
      .filter(col("_cum") >= col("_rank"))
      .agg(min(col("_r")).as("q_hat"))
    val test = resid.filter(!col("_cal"))
      .crossJoin(broadcast(qHat))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("_r") <= col("q_hat"), 1L).otherwise(0L)).as("_in"))
    nCal.crossJoin(broadcast(qHat)).crossJoin(broadcast(test))
      .select(col("n_cal"), col("n_test"), col("q_hat"),
        when(col("n_test") > 0L, trunc6(col("_in").cast("double")
          / col("n_test").cast("double"))).as("coverage"))
  }

  /** Expected calibration error over the SAME exact integer binning as
    * CoreOps.calibrationCurve — the one-number companion to the curve.
    * With conf_b normalized onto [0,1] by (S_b − lo·n_b)/(n_b·width),
    * the per-bin gap n_b·|acc_b − conf_b| collapses to the EXACT integer
    * |n_pos_b·width − (S_b − lo·n_b)|, so
    *   ECE = Σ_b |n_pos_b·width − S_b + lo·n_b| / (width·N)
    * is one trunc6'd division of exact integers — no float until the
    * final ratio. Plan: calibrationCurve's single partial-agg'd hash onto
    * ≤ nBins rows, then a 1-row fold. NULL scores/outcomes drop;
    * out-of-range scores clamp into the edge bins (and their clamped
    * score sums shift conf accordingly — the spike-at-the-edge signal
    * stays visible). Emits one row (n_rows, n_bins, ece_num, ece). */
  def expectedCalibrationError(df: DataFrame, score: String, outcome: Column,
                               lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(hi > lo, s"need lo < hi, got [$lo, $hi)")
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val width = hi - lo
    val num = (col(score).cast("long") - lo) * nBins.toLong
    val rawBin = ((num - pmod(num, lit(width))) / lit(width)).cast("long")
    val bin = least(greatest(rawBin, lit(0L)), lit(nBins.toLong - 1L))
    df.filter(col(score).isNotNull && outcome.isNotNull)
      .groupBy(bin.as("_bin"))
      .agg(count(lit(1)).as("_n"),
        count(when(outcome, lit(1))).as("_npos"),
        sum(col(score).cast("long") - lo).as("_s"))
      .agg(sum(col("_n")).as("n_rows"), count(lit(1)).as("n_bins"),
        sum(abs(col("_npos") * width - col("_s"))).as("ece_num"))
      .select(col("n_rows"), col("n_bins"), col("ece_num"),
        when(col("n_rows") > 0L, trunc6(col("ece_num").cast("double")
          / (col("n_rows").cast("double") * width.toDouble))).as("ece"))
  }

  /** Brier score — mean squared error of the probability forecast, the
    * PROPER scoring companion to ECE (ECE measures calibration alone; a
    * constant base-rate forecast can have ECE ≈ 0, but Brier also
    * charges for never separating the classes). Same input convention
    * as expectedCalibrationError: `score` on the integer [lo, hi) grid
    * read as probability (score − lo)/(hi − lo).
    *
    * Exactness: the per-row deviation (score − lo) − y·(hi − lo) is
    * exact int64; the emitted `brier` = Σdev² / (n·width²) is ONE
    * trunc6'd double division of the exact integer sum. Σdev² must stay
    * under 2⁶³ — n·maxdev² ≲ 9·10¹⁸, i.e. ~10⁸ rows at deviations to
    * 10⁵; ANSI fails loud past it. One aggregation, no shuffle beyond
    * the final fold. Emits ONE row (n_rows, brier_num, brier); empty
    * input emits n_rows 0 with brier NULL. */
  def brierScore(df: DataFrame, score: String, outcome: Column,
                 lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"need lo < hi, got [$lo, $hi)")
    val width = hi - lo
    val dev = (col(score).cast("long") - lo) -
      when(outcome, lit(width)).otherwise(lit(0L))
    df.filter(col(score).isNotNull && outcome.isNotNull)
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(dev * dev), lit(0L)).as("brier_num"))
      .select(col("n_rows"), col("brier_num"),
        when(col("n_rows") > 0L, trunc6(col("brier_num").cast("double")
          / (col("n_rows").cast("double") * width.toDouble
             * width.toDouble))).as("brier"))
  }

  /** Quantized binary-log discount: floor(log₂(x)·10⁶) as BIGINT — the
    * qlog sibling on the DCG discount's natural base. DuckDB twin:
    * `floor(log2(x::DOUBLE) * 1000000)::BIGINT`. Arguments here are the
    * tiny integers rank+1 ≤ k+1, where floor-stability is trivial (the
    * only exact log₂ values are powers of two, exact in both engines). */
  private def qlog2(x: Column): Column =
    floor(log2(x.cast("double")) * 1000000d).cast("long")

  /** nDCG per ranked list — the graded ranking-quality gauge for a
    * retrieval/ANN surface (averagePrecision reads a global scored POOL;
    * nDCG reads each query's ORDERED result list and charges misordering
    * by position). Input is one row per (query, rank) with an integer
    * relevance grade ≥ 0; `rank` must be 1-based and unique per query
    * (the bruteForceTopK/lshTopK output contract).
    *
    * DCG = Σ relᵣ/log₂(r+1) enters per term as the exact BIGINT
    * (relᵣ·10¹²) div qlog2(r+1) (positive operands, so DuckDB `//`
    * truncation and SQL div agree); the ideal ordering re-ranks the SAME
    * grades rel-desc with rank as the deterministic tiebreak, so
    * idcg_scaled is exact over a permutation of the identical terms. The
    * emitted ndcg is ONE trunc6'd division of the two exact integers.
    * rel·10¹² must stay under 2⁶³ (grades to ~9·10⁶ — ANSI fails loud
    * past it).
    *
    * Shape: windows PARTITIONED by query over lists of ≤ k rows — never
    * an unpartitioned window, no shuffle beyond the query key. Lists
    * with no relevant rows emit ndcg NULL (0/0 is undefined, not a fake
    * 0 — count them separately if coverage matters). Emits one row per
    * query (query, n_ranked, dcg_scaled, idcg_scaled, ndcg). */
  def ndcgPerQuery(ranked: DataFrame, query: String, rank: String,
                   rel: Column): DataFrame = {
    val internal = Seq("n_ranked", "dcg_scaled", "idcg_scaled", "ndcg",
      "_rel", "_rank", "_irank", "_t", "_it")
    require(!internal.contains(query) && !internal.contains(rank),
      s"ndcgPerQuery emits/uses ${internal.mkString(", ")}; rename inputs")
    import org.apache.spark.sql.expressions.Window
    val iw = Window.partitionBy(col(query))
      .orderBy(col("_rel").desc, col(rank).asc)
    // rank enters through the internal '_rank' rename, never spliced raw
    // into SQL text — names needing quoting (spaces, dots) stay safe.
    ranked.filter(rel.isNotNull)
      .withColumn("_rel", rel.cast("long"))
      .withColumn("_rank", col(rank))
      .withColumn("_irank", row_number().over(iw).cast("long"))
      .select(col(query), col("_rel"),
        expr("(_rel * CAST(1000000000000 AS BIGINT)) div " +
          "(CAST(floor(log2(CAST(_rank AS DOUBLE) + 1d) * 1000000) AS BIGINT))")
          .as("_t"),
        expr("(_rel * CAST(1000000000000 AS BIGINT)) div " +
          "(CAST(floor(log2(CAST(_irank AS DOUBLE) + 1d) * 1000000) AS BIGINT))")
          .as("_it"))
      .groupBy(col(query))
      .agg(count(lit(1)).as("n_ranked"), sum(col("_t")).as("dcg_scaled"),
        sum(col("_it")).as("idcg_scaled"))
      .select(col(query), col("n_ranked"), col("dcg_scaled"),
        col("idcg_scaled"),
        when(col("idcg_scaled") > 0L,
          trunc6(col("dcg_scaled").cast("double")
            / col("idcg_scaled").cast("double"))).as("ndcg"))
  }

  /** Mean reciprocal rank over ranked lists — the "how deep is the first
    * hit" one-number (the navigational-retrieval companion to
    * ndcgPerQuery's graded gauge). Same input contract as ndcgPerQuery.
    * Per query: rr = 1/first relevant rank, entering as the exact BIGINT
    * 10⁶ div first_rank (0 when the list has NO relevant row — the
    * standard MRR convention keeps empty-hit queries in the
    * denominator). The emitted mrr is ONE trunc6'd division of the exact
    * integer sum. ONE query-keyed agg + ONE global fold; no windows at
    * all. Emits ONE row (n_queries, n_hit, mrr_scaled, mrr); empty input
    * emits n_queries 0 with mrr NULL. */
  def meanReciprocalRank(ranked: DataFrame, query: String, rank: String,
                         rel: Column): DataFrame = {
    val internal = Seq("n_queries", "n_hit", "mrr_scaled", "mrr", "_fr")
    require(!internal.contains(query) && !internal.contains(rank),
      s"meanReciprocalRank emits/uses ${internal.mkString(", ")}; " +
        "rename inputs")
    ranked.filter(rel.isNotNull)
      .groupBy(col(query))
      .agg(min(when(rel.cast("long") > 0L, col(rank).cast("long")))
        .as("_fr"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("_fr").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        coalesce(sum(coalesce(
          expr("CAST(1000000 AS BIGINT) div _fr"), lit(0L))), lit(0L))
          .as("mrr_scaled"))
      .select(col("n_queries"), col("n_hit"), col("mrr_scaled"),
        when(col("n_queries") > 0L, trunc6(col("mrr_scaled").cast("double")
          / (col("n_queries").cast("double") * 1000000d))).as("mrr"))
  }

  /** Fleiss' kappa — chance-corrected agreement among n raters over N
    * items (Fleiss 1971): the multi-rater generalization of cohenKappa,
    * the QC gauge an annotation/RLHF pipeline reads before trusting a
    * labeling round. `ratings` is one row per (item, rating); the rater
    * identity is irrelevant to the statistic, but every item MUST carry
    * the SAME number of ratings n >= 2 — enforced fail-loud (silently
    * mixing arities biases P̄; pad or filter upstream).
    *
    * Exact-integer algebra end to end: per item Σ_j n_ij² − n over the
    * shared denominator n(n−1) gives P̄ = A / (N·n·(n−1)); category
    * totals give P_e = Σ tot_j² / (N·n)². Then
    *   kappa = (A·E − C·B) / (B·(E − C))   with B = N·n·(n−1),
    *   C = Σ tot_j², E = (N·n)² — four exact int64 inputs whose products
    * ride decimal(38,0) (HUGEINT on the oracle side; int64 alone
    * overflows near N ~ 10⁶·n), and the emitted kappa is ONE trunc6'd
    * double division. Degenerate chance (every rating one category,
    * E = C) emits NULL.
    *
    * Shape: one (item, category) count shuffle (map-side combine), one
    * item agg, one O(categories) margin agg, 1-row broadcast crossJoins
    * for the fold — no windows, no driver traffic. Emits ONE row
    * (n_items, n_raters, n_categories, pi_sum, cat_sq_sum, kappa). */
  def fleissKappa(ratings: DataFrame, item: String,
                  category: String): DataFrame = {
    val internal = Seq("n_items", "n_raters", "n_categories", "pi_sum",
      "cat_sq_sum", "kappa", "_nij", "_n", "_pi", "_tj")
    require(!internal.contains(item) && !internal.contains(category),
      s"fleissKappa emits/uses ${internal.mkString(", ")}; rename inputs")
    val cells = ratings
      .filter(col(item).isNotNull && col(category).isNotNull)
      .groupBy(col(item), col(category)).agg(count(lit(1)).as("_nij"))
      .localCheckpoint(true) // three consumers: items, margins, arity
    val items = cells.groupBy(col(item))
      .agg(sum(col("_nij")).as("_n"),
        sum(col("_nij") * col("_nij")).as("_pi"))
      .localCheckpoint(true) // two consumers: arity guard + the fold
    val arity = items.groupBy()
      .agg(count(lit(1)).as("n_items"), min(col("_n")).as("_mn"),
        max(col("_n")).as("_mx"), sum(col("_pi")).as("pi_sum"))
    val arityGuard = assert_true(
      col("_mn") === col("_mx") && col("_mn") >= 2L,
      concat(lit("fleissKappa: every item needs the SAME number of "),
        lit("ratings >= 2; got min "), col("_mn").cast("string"),
        lit(" max "), col("_mx").cast("string"),
        lit(" — pad or filter items upstream, a silent mix biases P̄")))
    val margins = cells.groupBy(col(category))
      .agg(sum(col("_nij")).as("_tj"))
      .groupBy()
      .agg(count(lit(1)).as("n_categories"),
        sum(col("_tj") * col("_tj")).as("cat_sq_sum"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    arity.withColumn("_g", arityGuard).filter(col("_g").isNull)
      .crossJoin(broadcast(margins))
      .select(col("n_items"), col("_mn").as("n_raters"),
        col("n_categories"), col("pi_sum"), col("cat_sq_sum"))
      .withColumn("_b",
        dec(col("n_items")) * dec(col("n_raters"))
          * dec(col("n_raters") - 1L))
      .withColumn("_e",
        dec(col("n_items") * col("n_raters"))
          * dec(col("n_items") * col("n_raters")))
      .withColumn("_a",
        dec(col("pi_sum")) - dec(col("n_items") * col("n_raters")))
      .withColumn("kappa",
        when(col("_e") =!= dec(col("cat_sq_sum")),
          trunc6((col("_a") * col("_e")
              - dec(col("cat_sq_sum")) * col("_b")).cast("double")
            / (col("_b") * (col("_e") - dec(col("cat_sq_sum"))))
              .cast("double"))))
      .select(col("n_items"), col("n_raters"), col("n_categories"),
        col("pi_sum"), col("cat_sq_sum"), col("kappa"))
  }

  /** Krippendorff's alpha (nominal) — the agreement gauge fleissKappa
    * cannot be: rating counts may VARY per item (the real shape of
    * crowd-sourced labels, where Fleiss' constant-arity contract fails
    * loud). Items with a single rating are unpairable and excluded (the
    * standard convention); alpha = 1 − (n−1)·D_o / (n² − Σ_c n_c²),
    * with the observed-disagreement sum
    * D_o = Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1) over the pairable items.
    *
    * Determinism: each item's D_o term is a small rational with its own
    * denominator, so exact common-denominator arithmetic would blow up
    * — instead every per-item term enters as floor(term·10⁶) (the qlog
    * quantized-sum convention: the emitted alpha is DEFINED over the
    * quantized sum, identical on any engine and partitioning). The
    * chance side stays fully exact; products ride decimal(38,0) /
    * HUGEINT (n²·10⁶ passes int64 near n ~ 3·10⁶); the emitted alpha is
    * ONE trunc6'd division. One-category degeneracy emits NULL.
    *
    * Shape: one (item, category) count shuffle, one item agg (quantized
    * term), one O(categories) margin agg, 1-row broadcast crossJoin —
    * no windows, no driver traffic. Emits ONE row (n_items, n_values,
    * n_categories, do_scaled, diff_sq, alpha). */
  def krippendorffAlpha(ratings: DataFrame, item: String,
                        category: String): DataFrame = {
    val internal = Seq("n_items", "n_values", "n_categories", "do_scaled",
      "diff_sq", "alpha", "_nij", "_m", "_sq", "_do", "_tj")
    require(!internal.contains(item) && !internal.contains(category),
      s"krippendorffAlpha emits/uses ${internal.mkString(", ")}; rename " +
        "inputs")
    val cells = ratings
      .filter(col(item).isNotNull && col(category).isNotNull)
      .groupBy(col(item), col(category)).agg(count(lit(1)).as("_nij"))
      .localCheckpoint(true) // two consumers: items and margins
    val items = cells.groupBy(col(item))
      .agg(sum(col("_nij")).as("_m"),
        sum(col("_nij") * col("_nij")).as("_sq"))
      .filter(col("_m") >= 2L) // single-rating items are unpairable
      .localCheckpoint(true) // two consumers: the fold and the margins
    val fold = items
      .select((expr("((_m * _m - _sq) * CAST(1000000 AS BIGINT)) " +
        "div (_m - CAST(1 AS BIGINT))")).as("_do"), col("_m"))
      .groupBy()
      .agg(count(lit(1)).as("n_items"),
        coalesce(sum(col("_do")), lit(0L)).as("do_scaled"),
        coalesce(sum(col("_m")), lit(0L)).as("n_values"))
    // margins over PAIRABLE items only — an excluded item's values must
    // not shift the chance distribution
    val margins = cells
      .join(items.select(col(item)), Seq(item), "left_semi")
      .groupBy(col(category)).agg(sum(col("_nij")).as("_tj"))
      .groupBy()
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("_tj") * col("_tj")), lit(0L)).as("cat_sq_sum"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    fold.crossJoin(broadcast(margins))
      .select(col("n_items"), col("n_values"), col("n_categories"),
        col("do_scaled"),
        (dec(col("n_values")) * dec(col("n_values"))
          - dec(col("cat_sq_sum"))).as("diff_sq"))
      .withColumn("alpha",
        when(col("diff_sq") > 0,
          trunc6((col("diff_sq") * dec(lit(1000000L))
              - dec(col("n_values") - 1L) * dec(col("do_scaled")))
              .cast("double")
            / (col("diff_sq") * dec(lit(1000000L))).cast("double"))))
      .select(col("n_items"), col("n_values"), col("n_categories"),
        col("do_scaled"), col("diff_sq").cast("long").as("diff_sq"),
        col("alpha"))
  }

  /** McNemar's paired test (Psychometrika 1947) — do two classifiers
    * graded on the SAME items actually differ, or does one just look
    * better on the shared-easy majority? Accuracy deltas over paired
    * predictions are dominated by the items both get right/wrong;
    * McNemar discards them and tests only the DISCORDANT cells:
    * b = A-right-B-wrong, c = A-wrong-B-right, statistic
    * (|b−c|−1)²/(b+c) with the standard continuity correction (χ²₁ under
    * H₀: b ≍ c). The model-promotion gate a pipeline runs before swapping
    * a quality/lang classifier. One filtered count agg over the joined
    * prediction frame → a single row; counts exact BIGINT, the statistic
    * quantized to ppm by integer div ((|b−c|−1)²·10⁶ ≤ ~10²⁴ needs
    * decimal(38,0), the Fleiss chance-algebra convention). NULL statistic
    * when b + c = 0 (the classifiers never disagreed — the test is
    * undefined, not "no difference proven"). Rows where either prediction
    * or the truth is NULL are excluded (they grade neither classifier).
    * Emits one row (n_pairs, n_a_only, n_b_only, mcnemar_ppm). */
  def mcnemar(preds: DataFrame, truth: String, predA: String,
              predB: String): DataFrame = {
    val emitted = Seq("n_pairs", "n_a_only", "n_b_only", "mcnemar_ppm")
    val clash = Seq(truth, predA, predB).filter(emitted.contains)
    require(clash.isEmpty,
      s"mcnemar emits ${emitted.mkString(", ")}; rename ${clash.mkString(", ")}")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val okA = col(predA) === col(truth)
    val okB = col(predB) === col(truth)
    preds
      .filter(col(truth).isNotNull && col(predA).isNotNull
        && col(predB).isNotNull)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(okA && !okB, 1L).otherwise(0L)).as("n_a_only"),
        sum(when(!okA && okB, 1L).otherwise(0L)).as("n_b_only"))
      .withColumn("_d2",
        dec(abs(col("n_a_only") - col("n_b_only")) - 1L)
          * dec(abs(col("n_a_only") - col("n_b_only")) - 1L)
          * dec(lit(1000000L)))
      .select(col("n_pairs"), col("n_a_only"), col("n_b_only"),
        when(col("n_a_only") + col("n_b_only") > 0,
          expr("_d2 div CAST(n_a_only + n_b_only AS DECIMAL(38,0))")
            .cast("long"))
          .as("mcnemar_ppm"))
  }

  /** Cochran's Q (Biometrika 1950) — mcnemar for k ≥ 3 classifiers graded
    * on the SAME items: do the k accuracy rates differ at all, before any
    * pairwise drill-down? Q = (k−1)·(k·ΣTⱼ² − (ΣTⱼ)²) / Σᵢ uᵢ(k−uᵢ)
    * where Tⱼ = classifier j's correct count and uᵢ = item i's
    * correct-classifier count (χ²ₖ₋₁ under H₀). The omnibus gate a
    * pipeline runs across a whole CANDIDATE SET of quality/lang
    * classifiers — k·(k−1)/2 McNemars without it is a multiple-
    * comparisons trap. One conditional-count aggregate pass over the
    * paired frame (Σuᵢ, Σuᵢ², and each Tⱼ in the same row) → one row;
    * all counts exact BIGINT, the statistic quantized to ppm by integer
    * div with the numerator in decimal(38,0) (k·T² reaches k·n²·10⁶ —
    * past int64 at corpus n, the mcnemar convention). NULL q_ppm when
    * every item is unanimous (denominator 0: the classifiers never
    * disagreed — undefined, not "no difference"). Rows with NULL truth
    * or ANY NULL prediction are excluded (they grade some classifiers
    * but not others — the paired design needs complete rows). Emits one
    * row (n_items, n_classifiers, disagree_weight, q_ppm). */
  def cochranQ(preds: DataFrame, truth: String,
               predCols: Seq[String]): DataFrame = {
    require(predCols.size >= 2,
      s"cochranQ needs >= 2 classifiers, got ${predCols.size}")
    val emitted = Seq("n_items", "n_classifiers", "disagree_weight", "q_ppm")
    val clash = (truth +: predCols).filter(emitted.contains)
    require(clash.isEmpty,
      s"cochranQ emits ${emitted.mkString(", ")}; rename ${clash.mkString(", ")}")
    val k = predCols.size
    def dec(c: Column) = c.cast("decimal(38,0)")
    val ok = predCols.map(p => when(col(p) === col(truth), 1L).otherwise(0L))
    val u = ok.reduce(_ + _)
    val tSums = predCols.zipWithIndex.map { case (p, i) =>
      sum(when(col(p) === col(truth), 1L).otherwise(0L)).as(s"_t$i")
    }
    val aggs = Seq(count(lit(1)).as("n_items"),
      sum(u * (lit(k.toLong) - u)).as("disagree_weight")) ++ tSums
    val sumT = (0 until k).map(i => dec(col(s"_t$i"))).reduce(_ + _)
    val sumT2 = (0 until k).map(i => dec(col(s"_t$i")) * dec(col(s"_t$i")))
      .reduce(_ + _)
    val num = dec(lit(k - 1L)) *
      (dec(lit(k.toLong)) * sumT2 - sumT * sumT) * dec(lit(1000000L))
    preds
      .filter((col(truth).isNotNull +: predCols.map(col(_).isNotNull))
        .reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_num", num)
      .select(col("n_items"), lit(k.toLong).as("n_classifiers"),
        col("disagree_weight"),
        when(col("disagree_weight") > 0L,
          expr("_num div CAST(disagree_weight AS DECIMAL(38,0))")
            .cast("long")).as("q_ppm"))
  }
}
