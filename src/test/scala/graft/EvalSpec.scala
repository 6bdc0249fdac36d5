package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def qlog(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e6).toLong

  test("naiveBayes matches an exact brute-force fold, including the " +
      "largest-label tie break and zero-hit labels") {
    // (doc, token, label) occurrences; the corpus is engineered so the
    // "c" evidence is perfectly symmetric between X and Y (same c-counts,
    // per-label totals, and doc priors), so doc 5's argmax is a TIE
    // resolved toward the larger label
    val rows = Seq(
      (1L, "a", "X"), (1L, "a", "X"), (1L, "c", "X"),
      (2L, "b", "Y"), (2L, "b", "Y"), (2L, "c", "Y"),
      (5L, "c", "X"),
      (6L, "c", "Y"))
    val got = Eval.naiveBayes(rows.toDF("id", "tok", "label"),
        "id", "tok", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet

    // brute force: the same formula, computed sequentially
    val byLabelTok = rows.groupBy(r => (r._3, r._2)).map { case (k, v) =>
      k -> v.size.toLong }
    val nL = rows.groupBy(_._3).map { case (l, v) => l -> v.size.toLong }
    val dL = rows.groupBy(_._3).map { case (l, v) =>
      l -> v.map(_._1).distinct.size.toLong }
    val vocab = rows.map(_._2).distinct.size.toLong
    val nDocs = rows.map(_._1).distinct.size.toLong
    val labels = rows.map(_._3).distinct.sorted
    def score(doc: Long, l: String): Long = {
      val toks = rows.filter(_._1 == doc).map(_._2)
      toks.map(t => qlog(byLabelTok.getOrElse((l, t), 0L) + 1)).sum -
        toks.size * qlog(nL(l) + vocab) + qlog(dL(l)) - qlog(nDocs)
    }
    val expect = rows.groupBy(_._1).map { case (doc, docRows) =>
      // max on (score, label): ties toward the largest label
      val best = labels.map(l => (score(doc, l), l)).max
      (doc, docRows.head._3, best._2, best._1)
    }.toSet
    assert(got == expect)
    // the engineered tie really is a tie, and really resolves to Y
    assert(score(5L, "X") == score(5L, "Y"))
    assert(got.exists(r => r._1 == 5L && r._2 == "X" && r._3 == "Y"))
  }

  test("classMetrics: exact counts, NULL precision for a never-predicted " +
      "class, zero recall for a never-correct one") {
    val pred = Seq(("A", "A"), ("A", "B"), ("B", "B"), ("B", "B"),
      ("C", "B")).toDF("t", "p")
    val got = Eval.classMetrics(pred, "t", "p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        if (r.isNullAt(6)) null else r.getDouble(6))).toSet
    assert(got == Set(
      ("A", 1L, 0L, 1L, 1.0, 0.5, 0.666666),
      ("B", 2L, 2L, 0L, 0.5, 1.0, 0.666666),
      ("C", 0L, 0L, 1L, null, 0.0, 0.0)))
  }

  test("cohenKappa: textbook 0.4 case, exact 1.0 on perfect agreement, " +
      "NULL on the single-class degeneracy") {
    // confusion [[20,5],[10,15]]: kappa = (50·35 − 1250)/(2500 − 1250) = 0.4
    val rows = Seq.fill(20)(("A", "A")) ++ Seq.fill(5)(("A", "B")) ++
      Seq.fill(10)(("B", "A")) ++ Seq.fill(15)(("B", "B"))
    val r1 = Eval.cohenKappa(rows.toDF("t", "p"), "t", "p").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2)) == (50L, 35L, 0.4))
    val r2 = Eval.cohenKappa(
      Seq(("A", "A"), ("B", "B")).toDF("t", "p"), "t", "p").head()
    assert(r2.getDouble(2) == 1.0)
    val r3 = Eval.cohenKappa(
      Seq(("A", "A"), ("A", "A")).toDF("t", "p"), "t", "p").head()
    assert(r3.isNullAt(2)) // pe == N²: chance-perfect, kappa undefined
  }

  test("youdenPoint: integer argmax of J, ties toward the largest " +
      "threshold") {
    // scores 3,2,1 with pos at 3 and 1: J is maximal (and equal) at
    // thresholds 3 and 2 → the tie resolves to 3
    val df = Seq((3L, true), (2L, false), (1L, true)).toDF("s", "pos")
    val r = Eval.youdenPoint(df, "s", col("pos")).head()
    // jn = n_tp·N − n_fp·P: t=3 → 1; t=2 → −1; t=1 → 0: t=3 wins outright
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.5)
    // genuine tie: scores 4(pos), 3(neg), 2(pos), 1(neg):
    // jn at t=4 is 2 and at t=2 is 2 again (J = 0.5 both) → largest
    // threshold 4 wins
    val df2 = Seq((4L, true), (3L, false), (2L, true), (1L, false))
      .toDF("s", "pos")
    val r2 = Eval.youdenPoint(df2, "s", col("pos")).head()
    assert(r2.getLong(0) == 4L && r2.getDouble(3) == 0.5)
  }

  test("gainsTable: exact coverage targets, gains and lift") {
    // 4 rows, 2 pos at the top scores; buckets of 25% coverage
    val df = Seq((4L, true), (3L, true), (2L, false), (1L, false))
      .toDF("s", "pos")
    val got = Eval.gainsTable(df, "s", col("pos"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == Set(
      (1L, 4L, 1L, 1L, 0.5, 2.0),  // top 25%: 1 row, 1 pos → lift 2
      (2L, 3L, 2L, 2L, 1.0, 2.0),  // top 50%: both pos found
      (3L, 2L, 3L, 2L, 1.0, 1.333333),
      (4L, 1L, 4L, 2L, 1.0, 1.0)))
  }

  test("expectedCalibrationError: exact integer numerator, perfect " +
      "calibration at the bin grain gives 0") {
    // [0,10) in 2 bins of width... width 10, bins [0,5) and [5,10).
    // bin 0: scores 1,4 (conf (1+4)/(2·10)=0.25), 0 pos of 2 → acc 0
    //   gap num = |0·10 − 5| = 5
    // bin 1: scores 6,8 (conf 0.7), 2 pos → acc 1 → |2·10 − 14| = 6
    // ECE = 11 / (4·10) = 0.275
    val df = Seq((1L, false), (4L, false), (6L, true), (8L, true))
      .toDF("s", "y")
    val r = Eval.expectedCalibrationError(df, "s", col("y"), 0L, 10L, 2)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      (4L, 2L, 11L, 0.275))
    // conf exactly matching the realized rate → ECE 0: one bin,
    // n=3, npos=1, S=10 → |1·10 − 10| = 0
    val row2 = Eval.expectedCalibrationError(
      Seq((0L, false), (0L, false), (10L, true)).toDF("s", "y"),
      "s", col("y"), 0L, 10L, 1).head()
    assert(row2.getLong(2) == 0L && row2.getDouble(3) == 0.0)
  }

  test("conformalInterval: the radius is the exact conformal order " +
      "statistic of the calibration residuals and coverage counts only " +
      "predictable test rows") {
    // one group, constant value → every residual 0 → q_hat 0 and
    // coverage exactly 1 regardless of the split
    val const = (1L to 40L).map(i => ("g", 50L, i)).toDF("g", "v", "id")
    val r0 = Eval.conformalInterval(const, "g", "v", "id").head()
    assert(r0.getLong(2) == 0L && r0.getDouble(3) == 1.0)
    assert(r0.getLong(0) + r0.getLong(1) == 40L)
    // brute-force mirror on a mixed frame: recompute split, model, rank
    val rows = (1L to 60L).map(i => (s"t${i % 3}", (i * 7) % 23, i))
    val df = rows.toDF("g", "v", "id")
    val r = Eval.conformalInterval(df, "g", "v", "id").head()
    def h(id: Long): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:conf".getBytes("UTF-8"))
      val hex = md5.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val cal = rows.filter(t => h(t._3))
    val mu = cal.groupBy(_._1).map { case (g, v) =>
      g -> v.map(_._2).sum / v.size }
    val calRes = cal.map(t => math.abs(t._2 - mu(t._1))).sorted
    val rank = math.min((cal.size + 1) * 90 / 100 +
      (if ((cal.size + 1) * 90 % 100 == 0) 0 else 1), cal.size)
    val qHat = calRes(rank - 1)
    val test = rows.filter(t => !h(t._3)).filter(t => mu.contains(t._1))
    val cov = math.floor(test.count(t =>
      math.abs(t._2 - mu(t._1)) <= qHat).toDouble / test.size * 1e6) / 1e6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      (cal.size.toLong, test.size.toLong, qHat.toLong, cov))
  }

  test("rocCurve: exact cumulative counts per distinct threshold, " +
      "NULL scores and labels drop") {
    val df = Seq((Some(3L), Some(true)), (Some(2L), Some(false)),
      (Some(2L), Some(true)), (Some(1L), Some(false)),
      (Some(9L), None), (None, Some(true)))
      .toDF("s", "pos")
    val got = Eval.rocCurve(df, "s", col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(
      (3L, 1L, 0L, 0.5, 0.0),
      (2L, 2L, 1L, 1.0, 0.5),
      (1L, 2L, 2L, 1.0, 1.0)))
  }

  test("brierScore: exact squared-deviation sum on the forecast grid; " +
      "perfect forecasts score 0, the worst score 1") {
    val df = Seq((50000L, true), (0L, false), (25000L, true),
      (25000L, false)).toDF("c", "y")
    val r = Eval.brierScore(df, "c", col("y"), 0L, 50000L).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 1250000000L)
    assert(r.getDouble(2) == 0.125)
    val perfect = Seq((50000L, true), (0L, false)).toDF("c", "y")
    assert(Eval.brierScore(perfect, "c", col("y"), 0L, 50000L)
      .head().getDouble(2) == 0.0)
    val worst = Seq((0L, true), (50000L, false)).toDF("c", "y")
    assert(Eval.brierScore(worst, "c", col("y"), 0L, 50000L)
      .head().getDouble(2) == 1.0)
    // NULL score or outcome drops (the ECE convention)
    val nulls = Seq((Some(0L), Some(false)), (None, Some(true)),
      (Some(1L), None)).toDF("c", "y")
    assert(Eval.brierScore(nulls, "c", col("y"), 0L, 50000L)
      .head().getLong(0) == 1L)
  }

  test("averagePrecision: exact step AP over distinct thresholds; a " +
      "perfect ranking scores 1.0; zero positives emit NULL") {
    // ranking (3:pos, 2:neg, 1:pos): AP = 1/2·1 + 1/2·(2/3), each term
    // floored at 1e-6 → (1e6 + 666666)/2e6 trunc6'd
    val df = Seq((3L, true), (2L, false), (1L, true)).toDF("s", "pos")
    val r = Eval.averagePrecision(df, "s", col("pos")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1666666L)
    assert(r.getDouble(2) == math.floor(1666666d / 2e6 * 1e6) / 1e6)
    // positives tied at the top threshold form one block: AP exactly 1.0
    val perfect = Seq((2L, true), (2L, true), (1L, false)).toDF("s", "pos")
    assert(Eval.averagePrecision(perfect, "s", col("pos"))
      .head().getDouble(2) == 1.0)
    // no positives: AP undefined, NULL — never a fake zero
    val nopos = Seq((2L, false), (1L, false)).toDF("s", "pos")
    assert(Eval.averagePrecision(nopos, "s", col("pos")).head().isNullAt(2))
  }

  test("ndcgPerQuery: the ideal ordering scores exactly 1.0, a misordered " +
      "list matches the hand-quantized fold, all-zero relevance is NULL") {
    def qlog2(x: Long) = math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6).toLong
    def term(rel: Long, r: Long) = rel * 1000000000000L / qlog2(r + 1)
    // q1 already ideal (1,1,0); q2 misordered (0,1,1); q3 no hits
    val df = Seq(
      ("q1", 1L, 1L), ("q1", 2L, 1L), ("q1", 3L, 0L),
      ("q2", 1L, 0L), ("q2", 2L, 1L), ("q2", 3L, 1L),
      ("q3", 1L, 0L), ("q3", 2L, 0L)).toDF("q", "rank", "r")
    val out = Eval.ndcgPerQuery(df, "q", "rank", col("r"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("q1").getDouble(4) == 1.0)
    assert(out("q1").getLong(2) == out("q1").getLong(3))
    val dcg2 = term(1, 2) + term(1, 3)
    val idcg2 = term(1, 1) + term(1, 2)
    assert(out("q2").getLong(2) == dcg2 && out("q2").getLong(3) == idcg2)
    assert(out("q2").getDouble(4) ==
      math.floor(dcg2.toDouble / idcg2.toDouble * 1e6) / 1e6)
    assert(out("q3").isNullAt(4)) // 0/0 undefined, not a fake zero
    assert(out.values.forall(r => r.isNullAt(4) ||
      (r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)))
  }

  test("meanReciprocalRank: exact integer rr sum; zero-hit lists stay in " +
      "the denominator; empty input emits NULL mrr") {
    val df = Seq(
      ("q1", 1L, 1L), ("q1", 2L, 0L), // first hit rank 1 → 1e6
      ("q2", 1L, 0L), ("q2", 3L, 1L), // first hit rank 3 → 333333
      ("q3", 1L, 0L), ("q3", 2L, 0L)  // no hit → 0
    ).toDF("q", "rank", "r")
    val out = Eval.meanReciprocalRank(df, "q", "rank", col("r")).head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 1000000L + 333333L)
    assert(out.getDouble(3) == math.floor(1333333d / 3e6 * 1e6) / 1e6)
    val empty = Seq.empty[(String, Long, Long)].toDF("q", "rank", "r")
    val e = Eval.meanReciprocalRank(empty, "q", "rank", col("r")).head()
    assert(e.getLong(0) == 0L && e.isNullAt(3))
  }

  test("fleissKappa: the textbook two-item walk lands exactly -0.2; " +
      "mixed arity fails loud; unanimous single category is NULL") {
    // item 1: (a,a,b) -> P1 = 1/3; item 2: (a,a,a) -> P2 = 1
    // A = 14-6 = 8, B = 12, C = 26, E = 36
    // kappa = (8*36 - 26*12) / (12*(36-26)) = -24/120 = -0.2
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a")).toDF("it", "cat")
    val out = Eval.fleissKappa(df, "it", "cat").head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4)) == ((2L, 3L, 2L, 14L, 26L)))
    assert(out.getDouble(5) == math.floor(-0.2 * 1e6) / 1e6)
    // one item with a different rating count must refuse
    val bad = df.union(Seq((3L, "a"), (3L, "b")).toDF("it", "cat"))
    val err = intercept[Exception] {
      Eval.fleissKappa(bad, "it", "cat").collect()
    }
    assert(err.getMessage.contains("SAME number of ratings"))
    // every rating one category: P_e = 1, kappa undefined -> NULL
    val unan = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("it", "cat")
    assert(Eval.fleissKappa(unan, "it", "cat").head().isNullAt(5))
  }

  test("krippendorffAlpha: chance-level hand walk is exactly 0, perfect " +
      "agreement 1; single-rating items stay out of the margins") {
    // u1 (a,b): D_o term (4-2)/1 = 2; u2 (a,a): 0; u3 single (c): OUT
    // n.. = 4, n_a = 3, n_b = 1 -> diff_sq = 16 - 10 = 6
    // alpha = (6e6 - 3 * 2e6) / 6e6 = 0
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"), (3L, "c"))
      .toDF("it", "cat")
    val out = Eval.krippendorffAlpha(df, "it", "cat").head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4)) == ((2L, 4L, 2L, 2000000L, 6L)))
    assert(out.getDouble(5) == 0.0)
    // perfect agreement across two categories
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("it", "cat")
    assert(Eval.krippendorffAlpha(perfect, "it", "cat")
      .head().getDouble(5) == 1.0)
    // one category only: diff_sq 0 -> NULL
    val unan = Seq((1L, "a"), (1L, "a")).toDF("it", "cat")
    assert(Eval.krippendorffAlpha(unan, "it", "cat").head().isNullAt(5))
  }

  test("mcnemar: discordant cells and the continuity-corrected statistic " +
      "against a hand count; NULL rows excluded; never-disagree → NULL " +
      "statistic") {
    // truth "t"; A right on 1-4 (b candidates where B wrong), B right on 5
    val rows = Seq(
      ("t", "t", "t"),  // both right — concordant, discarded
      ("t", "t", "x"),  // A only
      ("t", "t", "x"),  // A only
      ("t", "t", "x"),  // A only
      ("t", "x", "t"),  // B only
      ("t", "x", "x"),  // both wrong — concordant, discarded
      (null, "t", "t"), // null truth — excluded entirely
      ("t", null, "t")  // null pred — excluded entirely
    ).toDF("truth", "pa", "pb")
    val r = Eval.mcnemar(rows, "truth", "pa", "pb").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 3L, 1L)))
    // ((|3-1|-1)^2 * 1e6) div (3+1) = 1e6/4
    assert(r.getLong(3) == 250000L)

    val agree = Seq(("t", "t", "t"), ("t", "x", "x")).toDF("truth", "pa", "pb")
    assert(Eval.mcnemar(agree, "truth", "pa", "pb").head().isNullAt(3))
  }

  test("cochranQ: the k=3 statistic against a hand fold; rows with any " +
      "NULL drop; unanimous items only → NULL q_ppm") {
    // item rows: (truth, p1, p2, p3) → correctness x = (1,1,0) etc.
    val rows = Seq(
      ("t", "t", "t", "x"),  // u=2
      ("t", "t", "x", "x"),  // u=1
      ("t", "t", "t", "t"),  // u=3 (unanimous — weight 0)
      ("t", "x", "x", "x"),  // u=0 (weight 0)
      ("t", "t", "x", "t"),  // u=2
      ("t", null, "t", "t"), // dropped
      (null, "t", "t", "t")  // dropped
    ).toDF("truth", "p1", "p2", "p3")
    val r = Eval.cochranQ(rows, "truth", Seq("p1", "p2", "p3")).head()
    // kept items: T = (4, 2, 2), Σu(3−u) = 2+2+0+0+2 = 6
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 6L)))
    // Q = 2·(3·(16+4+4) − 64)/6 = 2·8/6 → ppm = 16e6 div 6
    assert(r.getLong(3) == 16000000L / 6L)
    val unan = Seq(("t", "t", "t", "t"), ("t", "x", "x", "x"))
      .toDF("truth", "p1", "p2", "p3")
    assert(Eval.cochranQ(unan, "truth", Seq("p1", "p2", "p3"))
      .head().isNullAt(3))
  }

  test("qiniCurve: bucket picks and the incremental-conversion formula " +
      "against a hand fold; control-free top slice → NULL qini") {
    // (user, score, converted); even users treated
    val rows = Seq((0L, 80L, 1L), (2L, 60L, 0L), (4L, 40L, 1L),
      (6L, 20L, 0L), (1L, 70L, 0L), (3L, 50L, 0L), (5L, 30L, 0L),
      (7L, 10L, 1L)).toDF("user_id", "score", "conv")
    val got = Eval.qiniCurve(rows, "score",
        pmod(col("user_id"), lit(2)) === 0, col("conv") === 1L, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // half-coverage slice = scores >= 50: nt=2 nc=2 yt=1 yc=0 → 1e6
    assert(got(1L) == ((50L, 4L, 2L, 2L, 1L, 0L, 1000000L)))
    // full coverage: yt=2 yc=1 → (2·4 − 1·4)·1e6 div 4 = 1e6
    assert(got(2L) == ((10L, 8L, 4L, 4L, 2L, 1L, 1000000L)))
    // top-eighth slice is the single treated row at 80 — no control twin
    val b1 = Eval.qiniCurve(rows, "score",
        pmod(col("user_id"), lit(2)) === 0, col("conv") === 1L, 8)
      .filter(col("bucket") === 1).head()
    assert(b1.getLong(4) == 0L && b1.isNullAt(7))
  }

  test("rateRatioTest: qlog ln-RR and the delta-method z against a hand " +
      "fold; an empty arm yields NULLs, not infinities") {
    // arm A (even uid): 4 events on 3 distinct exposures; B: 1 on 1
    val rows = Seq(
      (0L, true, "0:1"), (0L, true, "0:1"), (0L, true, "0:2"),
      (2L, true, "2:1"), (2L, false, "2:9"),
      (1L, true, "1:1")
    ).toDF("uid", "ev", "xp")
    val r = Eval.rateRatioTest(rows, pmod(col("uid"), lit(2)) === 0,
      col("ev"), col("xp")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 4L, 1L, 1L)))
    val lnrr = math.floor(math.log(4d * 1d) * 1e6).toLong -
      math.floor(math.log(1d * 4d) * 1e6).toLong
    assert(r.getLong(4) == lnrr) // symmetric rates → exactly 0
    assert(r.getDouble(5) ==
      math.floor(lnrr.toDouble / 1e6
        / math.sqrt(1d / 4d + 1d / 1d) * 1e6) / 1e6)
    val oneArm = Seq((0L, true, "0:1")).toDF("uid", "ev", "xp")
    val e = Eval.rateRatioTest(oneArm, pmod(col("uid"), lit(2)) === 0,
      col("ev"), col("xp")).head()
    assert(e.isNullAt(4) && e.isNullAt(5))
  }
}
