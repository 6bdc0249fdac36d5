package graft

import graft.operators.{Curation, Sampling}
import org.apache.spark.sql.functions._

/** Deterministic sampling + the curation composition. */
class SamplingCurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("hashSample is deterministic, partitioning-independent, ~rate-accurate") {
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").as[Long].collect().toSet
    val a = ids(Sampling.hashSample(docs, "doc_id", 0.5, "t"))
    val b = ids(Sampling.hashSample(docs.repartition(7), "doc_id", 0.5, "t"))
    assert(a == b) // the keep decision is a function of (id, salt) alone
    val n = docs.count()
    assert(a.size > n / 4 && a.size < 3 * n / 4, s"${a.size} of $n at rate 0.5")
    // independent draw under another salt
    assert(a != ids(Sampling.hashSample(docs, "doc_id", 0.5, "u")))
    // nested: a lower rate under the same salt is a subset (same hash, lower
    // threshold) — growing a sample never un-keeps rows
    val quarter = ids(Sampling.hashSample(docs, "doc_id", 0.25, "t"))
    assert(quarter.subsetOf(a))
  }

  test("hashSampleWeighted: per-row rates, monotone in rate, deterministic, " +
      "NULL rate drops, out-of-range rates clamp") {
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").as[Long].collect().toSet
    val rated = docs.withColumn("r",
      when(col("lang") === "en", 0.9).otherwise(0.1))
    val a = ids(Sampling.hashSampleWeighted(rated, "doc_id", col("r"), "t"))
    // deterministic + partitioning-independent
    assert(a == ids(Sampling.hashSampleWeighted(rated.repartition(7), "doc_id",
      col("r"), "t")))
    // rate 0 keeps nothing, rate 1 keeps everything, negative/super-1 clamp
    assert(ids(Sampling.hashSampleWeighted(docs, "doc_id", lit(0.0), "t")).isEmpty)
    assert(ids(Sampling.hashSampleWeighted(docs, "doc_id", lit(1.0), "t")).size
      == docs.count())
    assert(ids(Sampling.hashSampleWeighted(docs, "doc_id", lit(-3.0), "t")).isEmpty)
    assert(ids(Sampling.hashSampleWeighted(docs, "doc_id", lit(7.0), "t")).size
      == docs.count())
    // NULL rate drops the row like a NULL predicate
    assert(ids(Sampling.hashSampleWeighted(docs, "doc_id",
      lit(null).cast("double"), "t")).isEmpty)
    // monotone: raising every row's rate only ADDS rows (same hash, higher
    // threshold) — kept rows never churn out as quality scores drift up
    val lower = ids(Sampling.hashSampleWeighted(rated, "doc_id",
      col("r") * 0.5, "t"))
    assert(lower.subsetOf(a))
    // the per-row rate actually differentiates: en kept at ~0.9, rest ~0.1
    val en = docs.filter(col("lang") === "en").count().toDouble
    val keptEn = Sampling.hashSampleWeighted(rated, "doc_id", col("r"), "t")
      .filter(col("lang") === "en").count().toDouble
    assert(keptEn / en > 0.6, s"en keep rate ${keptEn / en} << 0.9")
  }

  test("stratifiedSample applies per-stratum rates with stable decisions") {
    val en = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.0), 1.0, "m")
    assert(en.filter(col("lang") === "en").count() == 0) // rate 0 drops the stratum
    assert(en.count() == docs.filter(col("lang") =!= "en").count()) // rate 1 keeps the rest
    // raising one stratum's rate only ADDS rows of that stratum — decisions
    // for unchanged strata never churn
    def ids(r: Double) = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> r), 0.5, "m").select("doc_id").as[Long].collect().toSet
    assert(ids(0.2).subsetOf(ids(0.8)))
  }

  test("quotaSample: exact per-stratum counts, nested prefixes, group-limit plan") {
    val q10 = Sampling.quotaSample(docs, "lang", "doc_id", 10, "t")
    val counts = q10.groupBy("lang").count().as[(String, Long)].collect().toMap
    val strataSizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    strataSizes.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(10L, n), s"$lang: ${counts(lang)}")
    }
    // a smaller quota under the same salt is a prefix of the larger draw
    val q5 = Sampling.quotaSample(docs, "lang", "doc_id", 5, "t")
      .select("doc_id").as[Long].collect().toSet
    val q10ids = q10.select("doc_id").as[Long].collect().toSet
    assert(q5.subsetOf(q10ids))
    val plan = q10.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"per-group limit not pushed:\n$plan")
  }

  test("splitAssign: disjoint+exhaustive bands, rows never move as the corpus grows") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val all = Sampling.splitAssign(docs, "doc_id", fr, salt = "t")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(all.size == docs.count()) // exactly one label per row
    assert(all.values.toSet.subsetOf(Set("train", "val", "test")))
    // ~fractions at this corpus size (loose band: 500 docs)
    val share = all.values.groupBy(identity).view.mapValues(_.size / 500.0)
    assert(share("train") > 0.7 && share("train") < 0.9)
    // leakage safety: assignment over HALF the corpus agrees row-for-row
    val half = Sampling.splitAssign(docs.filter(col("doc_id") < 250),
        "doc_id", fr, salt = "t")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, s) => all(id) == s })
    assertThrows[IllegalArgumentException](
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.6)))
  }

  test("kfoldAssign: folds in [0,k), deterministic, partition-independent, " +
      "near-balanced, never moved by corpus growth") {
    def folds(d: org.apache.spark.sql.DataFrame) =
      Sampling.kfoldAssign(d, "doc_id", 5, salt = "cv")
        .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    val a = folds(docs)
    assert(a.values.forall(f => f >= 0 && f < 5))
    assert(a == folds(docs.repartition(7))) // pure function of (id, salt)
    // growing the corpus never moves an existing row between folds
    val grown = folds(docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 1000000L)))
    assert(a.forall { case (id, f) => grown(id) == f })
    // near-balanced: each fold within 2x of fair share on 500 docs
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 5 && sizes.min > a.size / 10, s"fold sizes $sizes")
    // another salt is an independent fold system
    assert(a != Sampling.kfoldAssign(docs, "doc_id", 5, salt = "cv2")
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap)
    assertThrows[IllegalArgumentException](
      Sampling.kfoldAssign(docs, "doc_id", 1))
  }

  test("mixtureRepeat: whole epochs exact, fractional epochs deterministic") {
    import org.apache.spark.sql.DataFrame
    def copies(d: DataFrame) =
      d.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // integer weights: exactly w copies, 0 drops the stratum entirely
    val whole = Sampling.mixtureRepeat(docs, "lang", "doc_id",
      Map("en" -> 2.0, "de" -> 0.0), 1.0, "w")
    val langOf = docs.select("doc_id", "lang").as[(Long, String)].collect().toMap
    val byId = copies(whole)
    langOf.foreach { case (id, lang) =>
      val expect = lang match { case "en" => Some(2L); case "de" => None; case _ => Some(1L) }
      assert(byId.get(id) == expect, s"doc $id lang $lang")
    }
    // fractional weight 1.5: every row 1 or 2 copies, decision = the same
    // md5 gate hashSample uses, so it is partitioning-independent
    val frac = Sampling.mixtureRepeat(docs, "lang", "doc_id",
      Map.empty, 1.5, "f")
    val fracRe = Sampling.mixtureRepeat(docs.repartition(7), "lang", "doc_id",
      Map.empty, 1.5, "f")
    assert(copies(frac) == copies(fracRe))
    assert(copies(frac).values.forall(c => c == 1L || c == 2L))
    val extra = copies(frac).values.count(_ == 2L)
    val n = langOf.size
    assert(extra > n / 4 && extra < 3 * n / 4, s"$extra of $n at +0.5")
    // copy ids are 0-based and dense
    assert(whole.filter(col("lang") === "en").groupBy("doc_id")
      .agg(collect_set(col("copy")).as("cs"))
      .filter(not(col("cs") === array(lit(0L), lit(1L)) ||
        col("cs") === array(lit(1L), lit(0L)))).count() == 0)
  }

  test("tokenBudget keeps the best-priority prefix within the budget") {
    val scored = Seq(
      (1L, 10L, 0.9), (2L, 10L, 0.8), (3L, 10L, 0.7), (4L, 10L, 0.7), (5L, 10L, 0.1))
      .toDF("doc_id", "n_tokens", "score")
    val got = Curation.tokenBudget(scored, "doc_id", "n_tokens", "score", 35L)
      .as[(Long, Long, Long)].collect().map { case (d, _, c) => d -> c }.toMap
    // priority order 1,2,3,4,5 (0.7 tie broken by id); cum 10,20,30,40 — doc 4
    // would cross 35, doc 5 never reached
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
  }

  test("concatPack assigns pack ranges like concat-then-chunk: spans, exact " +
      "boundaries, zero-token docs, fail-loud on NULL/negative counts") {
    val d = Seq(
      (1L, 300L), // [0,300)    → pack 0, offset 0
      (2L, 212L), // [300,512)  → pack 0, offset 300 — ends EXACTLY at the edge
      (3L, 0L),   // zero-width at 512 → pack 1, offset 0, occupies nothing
      (4L, 1200L) // [512,1712) → packs 1..3 (spans three)
    ).toDF("doc_id", "n_tokens")
    val got = Curation.concatPack(d, col("doc_id"), "doc_id", "n_tokens", 512L)
      .select("doc_id", "pack_first", "pack_last", "offset_in_pack")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L)))
    assert(got(2L) == ((2L, 0L, 0L, 300L)))
    assert(got(3L) == ((3L, 1L, 1L, 0L)))
    assert(got(4L) == ((4L, 1L, 3L, 0L)))
    val bad = Seq((1L, Option(5L)), (2L, Option.empty[Long])).toDF("doc_id", "n_tokens")
    val err = intercept[Exception] {
      Curation.concatPack(bad, col("doc_id"), "doc_id", "n_tokens", 512L).collect()
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse(""))
      .contains("non-NULL"))
    assertThrows[IllegalArgumentException](
      Curation.concatPack(d, col("doc_id"), "doc_id", "n_tokens", 0L))
  }

  test("batchByLength groups by length bucket and chunks deterministically, " +
      "equals the plain per-bucket ranking under any partitioning") {
    val rows = (1L to 23L).map(i => (i, (i * 7) % 95)) // token counts 0..94
    val df = rows.toDF("doc_id", "n_tokens").repartition(5)
    val got = Curation.batchByLength(df, "doc_id", "n_tokens", Seq(30L, 60L), 4)
      .select("doc_id", "bucket", "batch", "batch_pos")
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    // brute force: per bucket, sort by (tokens, id), number, chunk by 4
    val expected = rows.groupBy { case (_, t) =>
      if (t < 30) 0 else if (t < 60) 1 else 2
    }.flatMap { case (bk, rs) =>
      rs.sortBy { case (id, t) => (t, id) }.zipWithIndex.map {
        case ((id, _), rn) => id -> ((id, bk, rn.toLong / 4, rn.toLong % 4))
      }
    }
    assert(got == expected)
    val bad = Seq((1L, Option.empty[Long])).toDF("doc_id", "n_tokens")
    val err = intercept[Exception] {
      Curation.batchByLength(bad, "doc_id", "n_tokens", Seq(10L), 4).collect()
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse(""))
      .contains("non-NULL"))
    assertThrows[IllegalArgumentException](
      Curation.batchByLength(df, "doc_id", "n_tokens", Seq(60L, 30L), 4))
    assertThrows[IllegalArgumentException](
      Curation.batchByLength(df, "doc_id", "n_tokens", Seq(30L), 0))
  }

  test("negativeSample draws k deterministic negatives per anchor, never " +
      "the anchor or its dup cluster, invariant under partitioning") {
    val corpus = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val anchors = corpus.filter(col("doc_id") <= 3)
    // anchors 1 and 2 share a cluster with docs 10, 11; doc 3 unclustered
    val clusters = Seq((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L))
      .toDF("doc_id", "cluster_id")
    val got = Sampling.negativeSample(corpus, "doc_id", anchors, clusters,
        50, 5).as[(Long, Long, Long)].collect()
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.keySet == Set(1L, 2L, 3L))
    byAnchor.foreach { case (a, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(!rows.map(_._2).contains(a)) // never the anchor itself
    }
    // cluster-mates of anchors 1/2 (docs 1, 2, 10, 11) are never negatives
    Seq(1L, 2L).foreach { a =>
      assert(byAnchor(a).map(_._2).toSet
        .intersect(Set(1L, 2L, 10L, 11L)).isEmpty)
    }
    // the unclustered anchor may draw clustered docs, just not itself
    val again = Sampling.negativeSample(corpus.repartition(13), "doc_id",
        anchors.repartition(3), clusters, 50, 5)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet == again.toSet)
    assertThrows[IllegalArgumentException](Sampling.negativeSample(
      corpus, "doc_id", anchors, clusters, 0, 5))
    assertThrows[IllegalArgumentException](Sampling.negativeSample(
      corpus, "doc_id", anchors,
      clusters.withColumnRenamed("cluster_id", "c"), 50, 5))
  }

  test("curate composes dedup-canonical, language and quality gates") {
    val fixture = Seq(
      (1L, "the cat and the dog sat in the house for a while and it was good"),
      (2L, "the cat and the dog sat in the house for a while and it was good"), // dup of 1
      (3L, "der hund und die katze sind nicht mit dem mann in das haus und den garten gegangen heute"), // de
      (4L, "too short"),
      (5L, "a plain enough sentence that has the right number of words and is mostly it for the test")
    ).toDF("doc_id", "text")
    val kept = Curation.curate(fixture, "doc_id", "text",
        Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
        Map("en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
            "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")),
        "en", 5, 50, 0.05)
      .as[(Long, Long)].collect().toMap
    // doc 2 lost to doc 1 (canonical keep), doc 3 is German, doc 4 too short
    assert(kept.keySet == Set(1L, 5L))
    assert(kept(1L) == 16L)
  }

  test("kAnonymity: classes, risk flags and the release gate from a hand " +
      "fixture; NULL quasi-values form their own class") {
    val rows = Seq(
      ("a", Some(1L)), ("a", Some(1L)), ("a", Some(1L)), // class size 3
      ("a", Some(2L)),                                    // size 1: risky
      ("b", None), ("b", None))                           // NULL bucket, size 2
      .toDF("t", "bkt")
    val classes = Curation.kAnonymityClasses(rows, Seq("t", "bkt"), 3L)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(classes == Map(
      ("a", Some(1L)) -> ((3L, false)),
      ("a", Some(2L)) -> ((1L, true)),
      ("b", None) -> ((2L, true))))
    val gate = Curation.kAnonymitySummary(rows, Seq("t", "bkt"), 3L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(gate == ((3L, 2L, 3L, 1L)))
  }

  test("lDiversity: distinct sensitive values per class; NULL sensitive " +
      "ignored; a big single-user class is risky") {
    val rows = Seq(
      ("a", 1L, Some(10L)), ("a", 1L, Some(10L)), ("a", 1L, Some(10L)),
      ("a", 1L, Some(10L)), // 4 rows, ONE user: k-anonymous yet exposed
      ("b", 2L, Some(1L)), ("b", 2L, Some(2L)), ("b", 2L, None))
      .toDF("t", "bkt", "uid")
    val got = Curation.lDiversityClasses(rows, Seq("t", "bkt"), "uid", 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      ("a", 1L) -> ((4L, 1L, true)),
      ("b", 2L) -> ((3L, 2L, false))))
  }

  test("temperatureShares: one halving is an exact integer sqrt step; " +
      "big corpora flatten, shares sum to ~1; oversize sizes refuse") {
    val df = Seq(("big", 1000000L), ("small", 10000L)).toDF("src", "n")
    val got = Sampling.temperatureShares(df, "src", "n", 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def step(n: Long) = math.floor(math.sqrt((n * 1000000L).toDouble)).toLong
    val (wb, ws) = (step(1000000L), step(10000L))
    def t6(x: Double) = math.floor(x * 1e6) / 1e6
    assert(got("big") == ((1000000L, wb, t6(wb.toDouble / (wb + ws)))))
    assert(got("small") == ((10000L, ws, t6(ws.toDouble / (wb + ws)))))
    // raw ratio 100:1 flattens to 10:1 at T=2
    assert(got("big")._3 / got("small")._3 < 11d)
    val e = intercept[Exception] {
      Sampling.temperatureShares(Seq(("x", Long.MaxValue)).toDF("src", "n"),
        "src", "n", 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("temperatureShares")))
  }

  test("poissonOneThresholds quantizes the Poisson(1) CDF; " +
      "bootstrapMeanCI brackets the mean, is rerun-identical, and " +
      "reports empty input honestly") {
    import spark.implicits._
    val ths = Sampling.poissonOneThresholds(8)
    assert(ths.head == 367879L)         // ⌊e⁻¹·10⁶⌋
    assert(ths == ths.sorted && ths.last <= 1000000L)
    val df = (1L to 400L).map(i => (i, i % 100)).toDF("id", "v")
    val r = Sampling.bootstrapMeanCI(df, "id", "v").head()
    assert(r.getLong(0) == 400L && r.getLong(1) == 32L)
    val mean = r.getDouble(2)
    assert(mean == math.floor(
      (1L to 400L).map(_ % 100).sum.toDouble / 400d * 1e6) / 1e6)
    // the CI brackets the point estimate, and is a real interval
    assert(r.getDouble(3) <= mean && mean <= r.getDouble(4))
    assert(r.getDouble(3) < r.getDouble(4))
    // a pure function of (ids, salt): rerun is bit-identical
    val r2 = Sampling.bootstrapMeanCI(df, "id", "v").head()
    assert(r.toSeq == r2.toSeq)
    // a different salt moves the draws (CI shifts, mean does not)
    val r3 = Sampling.bootstrapMeanCI(df, "id", "v", salt = "other").head()
    assert(r3.getDouble(2) == mean)
    assert(r3.getDouble(3) != r.getDouble(3) ||
      r3.getDouble(4) != r.getDouble(4))
    val e = Sampling.bootstrapMeanCI(df.filter(col("v") < 0), "id", "v")
      .head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(2))
  }

  test("weightedSampleK: deterministic exact-k draw; raising a weight " +
      "never worsens a row's key; non-positive weights fail loud") {
    val df = (1L to 40L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val a = Sampling.weightedSampleK(df, "id", "w", 10).collect()
    val b = Sampling.weightedSampleK(df, "id", "w", 10).collect()
    assert(a.toSeq == b.toSeq) // pure function of (id, salt)
    assert(a.length == 10 && a.map(_.getLong(0)).distinct.length == 10)
    // keys ascend in emission order (smallest-key winners)
    assert(a.map(_.getLong(2)).toSeq == a.map(_.getLong(2)).toSeq.sorted)
    // weight monotonicity: doubling every weight halves-or-better the key
    val doubled = Sampling.weightedSampleK(
      df.withColumn("w", col("w") * 2L), "id", "w", 40)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val base = Sampling.weightedSampleK(df, "id", "w", 40)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(base.forall { case (id, k) => doubled(id) <= k })
    val e = intercept[Exception] {
      Sampling.weightedSampleK(
        Seq((1L, 0L)).toDF("id", "w"), "id", "w", 1).collect()
    }
    assert(e.getMessage.contains("weightedSampleK"))
  }

  test("tClosenessClasses: classes matching the global mix score 0, " +
      "skewed classes the exact hand TVD; NULL sensitive drops") {
    // A: {x:3, y:1}, B: {x:1, y:3} → global {x:4, y:4}
    val df = (Seq.fill(3)(("A", Some("x"))) ++ Seq(("A", Some("y"))) ++
      Seq(("B", Some("x"))) ++ Seq.fill(3)(("B", Some("y"))) ++
      Seq(("A", None))).toDF("cls", "s")
    val got = Curation.tClosenessClasses(df, Seq("cls"), "s", 0.2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // each class mix (0.75, 0.25) vs global (0.5, 0.5) → TVD 0.25 > 0.2
    assert(got("A") == ((4L, 2L, 0.25, true)))
    assert(got("B") == ((4L, 2L, 0.25, true)))
    // identical mixes → exactly 0, not risky; absent category in closed
    // form: class C sees only x where global has x and z
    val df2 = Seq(("A", "x"), ("A", "z"), ("B", "x"), ("B", "z"),
      ("C", "x"), ("C", "x")).toDF("cls", "s")
    val got2 = Curation.tClosenessClasses(df2, Seq("cls"), "s", 0.2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got2("A") == ((2L, math.floor(1d / 6d * 1e6) / 1e6)))
    // C: mix (1, 0) vs global (4/6, 2/6) → TVD = 1/3
    assert(got2("C") == ((2L, math.floor(1d / 3d * 1e6) / 1e6)))
  }

  test("dsirWeights: hand-quantized unigram LLR; target docs absent from " +
      "the output; identical LMs weight every token ~0") {
    def qlog(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    // target: "a a b" (TT=3); raw: "a c" (TR=2); vocab {a,b,c} K=3
    val df = Seq((1L, "a a b", true), (2L, "a c", false))
      .toDF("id", "text", "tgt")
    val out = Curation.dsirWeights(df, "id", "text", col("tgt")).collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L)
    val wA = qlog(3L * 5L) - qlog(2L * 6L) // (ct+1)(TR+K) vs (cr+1)(TT+K)
    val wC = qlog(1L * 5L) - qlog(2L * 6L)
    assert(out.head.getLong(1) == 2L) // n_tokens
    assert(out.head.getLong(2) == wA + wC)
    assert(out.head.getDouble(3) == (wA + wC).toDouble / 2e6)
    // identical target and raw: every weight is qlog(m) − qlog(m) = 0
    val same = Seq((1L, "a b", true), (2L, "a b", false))
      .toDF("id", "text", "tgt")
    assert(Curation.dsirWeights(same, "id", "text", col("tgt"))
      .head().getLong(2) == 0L)
  }

  test("snapshotTokenDelta: four-status rollup with hand token deltas, " +
      "incl. the unchanged line the per-id diff drops") {
    val old = Seq((1L, "a b"), (2L, "x"), (3L, "q r s")).toDF("id", "text")
    val v2 = Seq((1L, "a b"), (2L, "x y"), (4L, "zz")).toDF("id", "text")
    val out = Curation.snapshotTokenDelta(old, v2, "id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      "unchanged" -> ((1L, 2L, 2L, 0L)),
      "changed" -> ((1L, 1L, 2L, 1L)),
      "removed" -> ((1L, 3L, 0L, -3L)),
      "added" -> ((1L, 0L, 1L, 1L))))
  }
}
