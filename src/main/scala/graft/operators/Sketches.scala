package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.{KmvExpressions, Md5Expressions}

/** K-Minimum-Values (KMV) distinct sketches with SET-OPERATION estimation
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007 — public literature).
  *
  * Beyond the reference surface. The corpus-governance gap this fills:
  * `approx_count_distinct` (HLL) answers "how many distinct?" per group but
  * its sketches cannot estimate an INTERSECTION, so "how much vocabulary do
  * two sources share?" needs the exact all-shingle join (`sourceOverlap`) —
  * a full second corpus shuffle. A KMV sketch is just the k smallest hash
  * values of a set; union sketches merge by taking the k smallest of the
  * concatenation, and intersection is estimated by counting union-sketch
  * members present in both sides (ρ = |K∪ ∩ Sₐ ∩ S_b| / k, est = ρ·|A∪B|̂).
  * One corpus-scale pass builds every group's k-row sketch; EVERYTHING
  * after — union, intersection, any pair of groups — is O(groups²·k)
  * sketch-only arithmetic, never touching the corpus again. At 100 TB the
  * sketches for a thousand sources fit on one executor.
  *
  * Determinism: hashes are md5Int (32-bit, engine-reproducible — the
  * Sampling/MinHash convention, NOT a seeded RNG), the k-th minimum is a
  * group-partitioned row_number, and the estimator ((k−1)·2³²) div h₍ₖ₎ is
  * pure BIGINT math ((k−1)·2³² ≤ 2³⁸ for any sane k — no overflow), so any
  * engine replays the exact integers. Hash collisions collapse identically
  * on every engine (the estimate is DEFINED over the hashed set).
  */
object Sketches {

  /** md5Int's hash space: [0, 2^32). */
  private val Space = 4294967296L

  /** Distinct (group, h) token-hash universe — the one corpus-scale stage
    * (explode + map-side-combined distinct). */
  private def distinctTokenHashes(docs: DataFrame, group: String,
                                  text: String): DataFrame =
    docs.filter(col(group).isNotNull)
      .select(col(group), explode(TextOps.tokens(col(text))).as("_tok"))
      .select(col(group),
        graft.expressions.Md5Expressions.md5Int(col("_tok")).as("_h"))
      .distinct()

  private def guard(df: DataFrame, op: String, cols: Seq[String]): Unit = {
    val clash = cols.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op emits/uses internal columns ${cols.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
  }

  /** The KMV estimate column over a full sketch's (m, hk): exact below k
    * (the sketch IS the set), ((k−1)·2³²) div h₍ₖ₎ at k. */
  private def kmvEstimate(k: Int, m: Column, hk: Column): Column =
    when(m < k, m).otherwise(
      expr(s"(CAST(${k - 1} AS BIGINT) * CAST($Space AS BIGINT)) div _hk"))

  /** Per-group distinct-token estimate beside the exact count (the error is
    * visible in the output; at 100 TB only the sketch half survives —
    * `n_exact` is the bench-scale truth pin, same convention as
    * q_block_quality vs its sampled twin). Emits (group, n_exact,
    * est_distinct). Shapes: one distinct shuffle over (group, token-hash),
    * one group-partitioned row_number (never an unpartitioned window), two
    * group-keyed aggs over the shared frame. */
  def kmvDistinct(docs: DataFrame, group: String, text: String,
                  k: Int): DataFrame = {
    require(k >= 2 && (k.toLong - 1) * Space > 0,
      s"sketch size k must be >= 2, got $k")
    guard(docs, "kmvDistinct",
      Seq("n_exact", "est_distinct", "_tok", "_h", "_rk", "_m", "_hk"))
    val d = distinctTokenHashes(docs, group, text)
      .localCheckpoint(true) // shared: the exact count and the sketch
    val exact = d.groupBy(col(group)).agg(count(lit(1)).as("n_exact"))
    val sk = d
      .withColumn("_rk",
        row_number().over(Window.partitionBy(col(group)).orderBy(col("_h"))))
      .filter(col("_rk") <= k)
      .groupBy(col(group))
      .agg(count(lit(1)).as("_m"), max(col("_h")).as("_hk"))
    exact.join(sk, Seq(group))
      .select(col(group), col("n_exact"),
        kmvEstimate(k, col("_m"), col("_hk")).as("est_distinct"))
  }

  /** Pairwise source-overlap ESTIMATION from sketches alone — the 100 TB
    * path beside the exact `sourceOverlap` shingle join: after the one
    * sketch-building pass, every (a, b) estimate is O(k) arithmetic. Per
    * pair: the union sketch is the k smallest of Sₐ ∪ S_b (k-min of a
    * union is computable from the sides' k-mins — the standard KMV merge),
    * n_both counts union-sketch hashes present in BOTH sides' sketches,
    * est_union is the KMV estimate over the union sketch, and
    * est_inter = (n_both · est_union) div m (ρ-scaling, all BIGINT). Emits
    * (source_a, source_b, n_both, est_union, est_inter) for every group
    * pair, a < b (the pair frame is a broadcast nested-loop over the tiny
    * distinct-group list — O(groups²) rows by construction, the
    * sourceOverlap output contract). Zero-overlap pairs ARE emitted
    * (n_both = 0): absence would read as "not measured", and unlike
    * sourceOverlap the pair list here is already materialized. */
  def kmvOverlap(docs: DataFrame, group: String, text: String,
                 k: Int): DataFrame = {
    require(k >= 2, s"sketch size k must be >= 2, got $k")
    guard(docs, "kmvOverlap",
      Seq("source_a", "source_b", "n_both", "est_union", "est_inter",
        "_tok", "_h", "_rk", "_m", "_hk", "_in_a", "_in_b"))
    val d = distinctTokenHashes(docs, group, text)
    val sk = d
      .withColumn("_rk",
        row_number().over(Window.partitionBy(col(group)).orderBy(col("_h"))))
      .filter(col("_rk") <= k)
      .drop("_rk")
      .localCheckpoint(true) // shared: group list + both pair sides
    val groups = sk.select(col(group)).distinct()
    val pairs = groups.select(col(group).as("source_a"))
      .join(broadcast(groups.select(col(group).as("source_b"))),
        col("source_a") < col("source_b"))
    val sideA = pairs.join(sk.select(col(group).as("source_a"), col("_h")),
        Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("_h"),
        lit(1).as("_in_a"), lit(0).as("_in_b"))
    val sideB = pairs.join(sk.select(col(group).as("source_b"), col("_h")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("_h"),
        lit(0).as("_in_a"), lit(1).as("_in_b"))
    val unioned = sideA.unionByName(sideB)
      .groupBy(col("source_a"), col("source_b"), col("_h"))
      .agg(max(col("_in_a")).as("_in_a"), max(col("_in_b")).as("_in_b"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("source_a"), col("source_b"))
          .orderBy(col("_h"))))
      .filter(col("_rk") <= k)
    unioned
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("_m"), max(col("_h")).as("_hk"),
        sum(when(col("_in_a") === 1 && col("_in_b") === 1, 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("source_a"), col("source_b"), col("n_both"),
        kmvEstimate(k, col("_m"), col("_hk")).as("est_union"),
        expr("(n_both * (CASE WHEN _m < " + k +
          s" THEN _m ELSE (CAST(${k - 1} AS BIGINT) * " +
          s"CAST($Space AS BIGINT)) div _hk END)) div _m").as("est_inter"))
  }

  /** Per-window NOVELTY from sketches alone — "how much of today's
    * distinct content did yesterday not have?", the feed-freshness gauge
    * a crawl/ingest dashboard plots daily. Each window's KMV sketch
    * (the mergeable KmvSketchAgg) meets its predecessor's by the
    * kmvOverlap set algebra: union sketch = k smallest of A∪B (array
    * ops on two k-arrays), intersection by co-membership ρ-scaling, and
    * novel_ppm = ((est_w − est_inter)·10⁶) div est_w with the estimator
    * difference CLAMPED at zero (two noisy estimates can invert; a
    * negative novelty is sampling noise, not signal — the clamp also
    * keeps the div in the engine-identical non-negative regime). The
    * predecessor join is an EQUI-join on the regular window grid
    * (start = start − windowMs) — no lag window exists, so nothing is
    * unpartitioned. One corpus-scale aggregation builds all sketches;
    * everything after is O(windows·k) array arithmetic. The first
    * window has no predecessor → NULL novelty (unmeasured, not new).
    * Emits (window_start_ms, n_sketch, est_distinct, est_inter,
    * novel_ppm). */
  def kmvWindowNovelty(df: DataFrame, value: String, ts: String,
                       windowMs: Long, k: Int): DataFrame = {
    require(k >= 2, s"sketch size k must be >= 2, got $k")
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    guard(df, "kmvWindowNovelty",
      Seq("window_start_ms", "n_sketch", "est_distinct", "est_inter",
        "novel_ppm", "_w", "_sk", "_pw", "_psk", "_u", "_m", "_nb", "_eu",
        "_ew", "_ei", "_num"))
    val msCol = CoreOps.ms(col(ts))
    val h = Md5Expressions.md5Int(col(value).cast("long").cast("string"))
    val sk = df.filter(col(ts).isNotNull && col(value).isNotNull)
      .groupBy(((msCol - pmod(msCol, lit(windowMs))))
        .cast("long").as("_w"))
      .agg(KmvExpressions.kmvSketch(h, k).as("_sk"))
      .localCheckpoint(true) // shared: both sides of the predecessor join
    val prev = sk.select((col("_w") + windowMs).as("_pw"),
      col("_sk").as("_psk"))
    val divNN = (a: Column, b: Column) => ((a - pmod(a, b)) / b).cast("long")
    val joined = sk.join(prev, sk("_w") === prev("_pw"), "left")
      .withColumn("_u", when(col("_psk").isNotNull,
        slice(array_sort(array_union(col("_sk"), col("_psk"))), 1, k)))
      .withColumn("_m", size(col("_u")).cast("long"))
      .withColumn("_nb", size(array_intersect(
        array_intersect(col("_u"), col("_sk")), col("_psk"))).cast("long"))
      .withColumn("_eu", KmvExpressions.kmvEstimate(col("_u"), k))
      .withColumn("_ew", KmvExpressions.kmvEstimate(col("_sk"), k))
      .withColumn("_ei", when(col("_m") > 0L,
        divNN(col("_nb") * col("_eu"), col("_m"))).otherwise(lit(0L)))
    // novel_ppm numerator (est_ew − est_ei)·10⁶ can reach ~2.7e17 > 2⁵³
    // (est_distinct tops out near (k−1)·2³²), so the make-divisible double
    // trick is NOT safe here — use the exact integer `div` instead.
    joined
      .withColumn("_num", greatest(col("_ew") - col("_ei"), lit(0L)) * 1000000L)
      .select(col("_w").as("window_start_ms"),
        size(col("_sk")).cast("long").as("n_sketch"),
        col("_ew").as("est_distinct"),
        when(col("_psk").isNotNull, col("_ei")).as("est_inter"),
        when(col("_psk").isNotNull && col("_ew") > 0L,
          expr("_num div _ew")).as("novel_ppm"))
  }
}
