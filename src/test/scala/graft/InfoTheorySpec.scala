package graft

import org.apache.spark.sql.functions._
import graft.operators.{CoreOps, InfoTheory, TextOps}

/** InfoTheory operators vs brute-force Scala references computing the SAME
  * quantized-log statistic (qlog = floor(ln·10⁶)) — any partitioning or
  * plan change that altered a term or a sum would diverge from the fold. */
class InfoTheorySpec extends SparkSpec {
  import spark.implicits._

  private def qlog(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong

  test("entropy matches the brute-force quantized fold, and is 0 for a " +
    "single-category group") {
    val rows = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), ("a", "z"), ("a", "z"), ("a", "z"),
      ("b", "only"), ("b", "only"),
      ("c", "u"), ("c", "v"))
    val df = rows.toDF("g", "cat").repartition(4)
    val got = InfoTheory.entropy(df, "g", "cat")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    // brute force per group
    val want = rows.groupBy(_._1).map { case (g, gs) =>
      val counts = gs.groupBy(_._2).map(_._2.size.toLong).toSeq
      val tot = counts.sum
      val hs = tot * qlog(tot) - counts.map(c => c * qlog(c)).sum
      g -> ((tot, counts.size.toLong, hs, hs.toDouble / (tot.toDouble * 1e6)))
    }
    assert(got == want)
    assert(got("b")._3 == 0L) // single category ⇒ exactly zero, no residue
  }

  test("entropy drops NULL groups and categories") {
    val df = Seq((Some("a"), Some("x")), (Some("a"), None),
      (None, Some("y")), (Some("a"), Some("x"))).toDF("g", "cat")
    val out = InfoTheory.entropy(df, "g", "cat").collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 2L) // only the two (a, x) rows
  }

  test("klDrift matches the brute-force smoothed fold and is ~0 for " +
    "identical sides") {
    val cats = Seq("x", "x", "x", "y", "y", "z")
    val df = (cats.map(c => (c, true)) ++ cats.map(c => (c, false)))
      .toDF("cat", "p").repartition(3)
    val out = InfoTheory.klDrift(df, "cat", col("p")).collect().head
    // identical sides: every term is qlog(m) − qlog(m) = 0 exactly
    assert(out.getLong(3) == 0L && out.getDouble(4) == 0d)
    assert(out.getLong(0) == 3L && out.getLong(1) == 6L && out.getLong(2) == 6L)

    val skew = Seq(("x", true), ("x", true), ("x", true), ("y", true),
      ("x", false), ("y", false), ("y", false), ("z", false))
    val got = InfoTheory.klDrift(skew.toDF("cat", "p"), "cat", col("p"))
      .collect().head
    val cp = Map("x" -> 3L, "y" -> 1L, "z" -> 0L)
    val cq = Map("x" -> 1L, "y" -> 2L, "z" -> 1L)
    val (k, tp, tq) = (3L, 4L, 4L)
    val klScaled = cp.keys.map { c =>
      (cp(c) + 1) * (qlog((cp(c) + 1) * (tq + k)) - qlog((cq(c) + 1) * (tp + k)))
    }.sum
    assert(got.getLong(3) == klScaled)
    assert(got.getDouble(4) == klScaled.toDouble / ((tp + k).toDouble * 1e6))
  }

  test("mutualInfo matches the brute-force fold; independent columns give " +
    "~0 and a bijective pairing gives entropy-sized MI") {
    // independent: every (a, b) cell has the same count
    val ind = (for (a <- Seq("a1", "a2"); b <- Seq("b1", "b2"); _ <- 1 to 3)
      yield (a, b)).toDF("a", "b").repartition(4)
    val indRow = InfoTheory.mutualInfo(ind, "a", "b").collect().head
    // uniform cells: c·N = 3·12, ca·cb = 6·6 = 36 = c·N ⇒ every term 0
    assert(indRow.getLong(2) == 0L && indRow.getDouble(3) == 0d)

    val dep = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"))
      .toDF("a", "b").repartition(2)
    val got = InfoTheory.mutualInfo(dep, "a", "b").collect().head
    val cells = Map(("a1", "b1") -> 2L, ("a2", "b2") -> 1L)
    val ca = Map("a1" -> 2L, "a2" -> 1L); val cb = Map("b1" -> 2L, "b2" -> 1L)
    val n = 3L
    val miScaled = cells.map { case ((a, b), c) =>
      c * (qlog(c * n) - qlog(ca(a) * cb(b)))
    }.sum
    assert(got.getLong(0) == n && got.getLong(1) == 2L)
    assert(got.getLong(2) == miScaled)
    assert(got.getDouble(3) == miScaled.toDouble / (n.toDouble * 1e6))
  }

  test("mutualInfo on empty input emits zero rows") {
    val df = Seq.empty[(String, String)].toDF("a", "b")
    assert(InfoTheory.mutualInfo(df, "a", "b").collect().isEmpty)
  }

  test("pmiCollocations matches the brute-force fold over a tiny corpus") {
    val docs = Seq("the cat sat", "the cat ran", "a cat sat").toDF("text")
    val got = InfoTheory.pmiCollocations(docs, "text", 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap

    val grams = Seq("the cat", "cat sat", "the cat", "cat ran",
      "a cat", "cat sat")
    val nAb = grams.groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val n = grams.size.toLong
    val nW1 = grams.map(_.split(" ")(0)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val nW2 = grams.map(_.split(" ")(1)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val want = nAb.map { case (g, c) =>
      val Array(w1, w2) = g.split(" ")
      (w1, w2) -> ((c, nW1(w1), nW2(w2), n,
        (qlog(c * n) - qlog(nW1(w1) * nW2(w2))).toDouble / 1e6))
    }
    assert(got == want)
  }

  test("pmiCollocations minCount prunes output but keeps margins corpus-true") {
    val docs = Seq("x y", "x y", "x z").toDF("text")
    val out = InfoTheory.pmiCollocations(docs, "text", 2L).collect()
    assert(out.length == 1) // only "x y" (count 2) survives
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("x", "y"))
    assert(r.getLong(3) == 3L) // n_w1 for x counts the pruned "x z" gram too
  }

  test("zipf slope through exactRegression is exactly -1 for a perfect " +
    "power-law corpus, quantization aside") {
    // token k appears floor(60/k) times, k = 1..6 → freq ≈ c/rank
    val words = (1 to 6).flatMap(k => Seq.fill(60 / k)(s"w$k"))
    val docs = Seq(words.mkString(" ")).toDF("text")
      .withColumn("lang", lit("en"))
    val reg = CoreOps.exactRegression(
      InfoTheory.zipfLogLog(docs, "lang", "text"), "lang",
      "log_rank", "log_freq").collect().head
    assert(reg.getLong(1) == 6L)
    val slope = reg.getDouble(2)
    assert(slope < -0.9 && slope > -1.1, s"slope $slope not ~ -1")
  }

  test("zipfLogLog ranks deterministically (freq desc, token asc) and " +
    "quantizes both coordinates") {
    val docs = Seq("b b a a c").toDF("text").withColumn("lang", lit("xx"))
    val rows = InfoTheory.zipfLogLog(docs, "lang", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // a (freq 2) rank 1, b (freq 2) rank 2, c (freq 1) rank 3
    assert(rows == Set((qlog(1), qlog(2)), (qlog(2), qlog(2)),
      (qlog(3), qlog(1))))
  }

  test("entropyFromCounts over a CategoryCountAgg distribution == the " +
      "two-level entropy on the same data (one shuffle vs two)") {
    val rows = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"),
      ("g1", null), ("g2", "z"), ("g2", "w"))
    val df = rows.toDF("g", "cat").repartition(3)
    val one = df.groupBy(col("g"))
      .agg(graft.expressions.CategoryCountExpressions
        .categoryCounts(col("cat")).as("_cc"))
      .filter(size(col("_cc")) > 0)
      .select((col("g") +: InfoTheory.entropyFromCounts(col("_cc"))): _*)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val two = InfoTheory.entropy(df, "g", "cat")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(one == two)
  }

  test("CategoryCountAgg emits categories SORTED and merges across " +
      "partitions exactly") {
    val df = (1 to 100).map(i => s"c${i % 7}").toDF("cat").repartition(8)
    val arr = df.agg(graft.expressions.CategoryCountExpressions
        .categoryCounts(col("cat"))).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getString(0)) == (0 until 7).map(i => s"c$i"))
    assert(arr.map(_.getLong(1)).sum == 100L)
  }

  test("klFromCounts with a literal reference == klDrift on the same two " +
      "sides (one aggregation vs the two-sided count shuffle)") {
    val pSide = Seq("x", "x", "x", "y")
    val qSide = Seq("x", "y", "y", "z")
    val both = (pSide.map(c => (c, true)) ++ qSide.map(c => (c, false)))
      .toDF("cat", "p")
    val twoLevel = InfoTheory.klDrift(both, "cat", col("p")).collect().head
    val ref = qSide.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val one = pSide.toDF("cat")
      .agg(graft.expressions.CategoryCountExpressions
        .categoryCounts(col("cat")).as("_cc"))
      .select(InfoTheory.klFromCounts(col("_cc"), ref): _*)
      .collect().head
    assert(one.getLong(0) == twoLevel.getLong(0)) // n_categories
    assert(one.getLong(1) == twoLevel.getLong(1)) // n_p
    assert(one.getLong(2) == twoLevel.getLong(2)) // n_q
    assert(one.getLong(3) == twoLevel.getLong(3)) // kl_scaled
    assert(one.getDouble(4) == twoLevel.getDouble(4))
  }

  test("hellingerDrift: identical sides → exactly 0, disjoint sides → " +
      "exactly 1, a hand case matches the term-floored formula, an " +
      "empty side → NULL") {
    def drift(p: Seq[String], q: Seq[String]) =
      InfoTheory.hellingerDrift(
        (p.map(c => (c, true)) ++ q.map(c => (c, false))).toDF("cat", "p"),
        "cat", col("p")).collect().head
    val same = drift(Seq("x", "x", "y"), Seq("x", "x", "y"))
    // √(c·c)·10⁶ is exact integer math → bc exactly N·10⁶, h exactly 0
    assert(same.getLong(3) == 3000000L && same.getDouble(4) == 0.0)
    val disj = drift(Seq("x", "x"), Seq("y", "z"))
    assert(disj.getLong(3) == 0L && disj.getDouble(4) == 1.0)
    // hand case: p = {x:2, y:1}, q = {x:1, z:1}
    val mixed = drift(Seq("x", "x", "y"), Seq("x", "z"))
    val bc = math.floor(math.sqrt(2.0) * 1e6).toLong // only x overlaps
    assert(mixed.getLong(3) == bc)
    val h = math.floor(math.sqrt(math.max(0.0,
      1.0 - bc.toDouble / (math.sqrt(6.0) * 1e6))) * 1e6) / 1e6
    assert(mixed.getDouble(4) == h)
    val empty = drift(Seq("x"), Seq.empty)
    assert(empty.isNullAt(4)) // distance to a nonexistent distribution
  }

  test("weightOfEvidence + informationValue: hand-computed qlog algebra; " +
      "psi is exactly 0 on identical sides and > 0 on shifted ones") {
    def qlog(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    // cats: a → 2 pos/1 neg, b → 1 pos/2 neg; K=2, tp=3, tq=3
    val df = Seq(("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false)).toDF("cat", "y")
    val woe = InfoTheory.weightOfEvidence(df, "cat", col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expA = qlog(3L * 5L) - qlog(2L * 5L) // (cp+1)(tq+K) vs (cq+1)(tp+K)
    val expB = qlog(2L * 5L) - qlog(3L * 5L)
    assert(woe("a") == ((2L, 1L, expA)))
    assert(woe("b") == ((1L, 2L, expB)))
    val iv = InfoTheory.informationValue(df, "cat", col("y")).head()
    // numerators: a → 3·5 − 2·5 = 5; b → 2·5 − 3·5 = −5
    val expIv = 5L * expA + (-5L) * expB
    assert((iv.getLong(0), iv.getLong(1), iv.getLong(2)) == (2L, 3L, 3L))
    assert(iv.getDouble(3) == expIv.toDouble)
    assert(iv.getDouble(4) == expIv.toDouble / (5.0 * 5.0 * 1e6))
    // identical sides → every term numerator 0 → psi EXACTLY 0
    val same = Seq(("a", true), ("a", false), ("b", true), ("b", false))
      .toDF("cat", "y")
    val p0 = InfoTheory.psi(same, "cat", col("y")).head()
    assert(p0.getDouble(3) == 0.0 && p0.getDouble(4) == 0.0)
    // every term is (x − y)·(qlog x − qlog y) with both factors sharing
    // a sign → psi never negative
    assert(InfoTheory.psi(df, "cat", col("y")).head().getDouble(4) > 0.0)
  }

  test("hellingerDriftByGroup == hellingerDrift applied per group slice") {
    val rows = Seq(("g1", "x", true), ("g1", "x", false), ("g1", "y", true),
      ("g2", "x", true), ("g2", "z", false), ("g2", "z", false))
    val df = rows.toDF("g", "cat", "p")
    val grouped = InfoTheory.hellingerDriftByGroup(df, "g", "cat", col("p"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (g <- Seq("g1", "g2")) {
      val slice = InfoTheory.hellingerDrift(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("cat", "p"),
        "cat", col("p")).head().toSeq
      assert(grouped(g) == slice, s"group $g")
    }
  }

  test("psiFromCounts with a literal reference == psi on the same two " +
      "sides (one aggregation vs the two-sided count shuffle)") {
    val pSide = Seq("x", "x", "x", "y")
    val qSide = Seq("x", "y", "y", "z")
    val both = (pSide.map(c => (c, true)) ++ qSide.map(c => (c, false)))
      .toDF("cat", "p")
    val twoLevel = InfoTheory.psi(both, "cat", col("p")).collect().head
    val ref = qSide.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val one = pSide.toDF("cat")
      .agg(graft.expressions.CategoryCountExpressions
        .categoryCounts(col("cat")).as("_cc"))
      .select(InfoTheory.psiFromCounts(col("_cc"), ref): _*)
      .collect().head
    assert(one.getLong(0) == twoLevel.getLong(0))     // n_categories
    assert(one.getLong(1) == twoLevel.getLong(1))     // n_p
    assert(one.getLong(2) == twoLevel.getLong(2))     // n_q
    assert(one.getDouble(3) == twoLevel.getDouble(3)) // psi_scaled
    assert(one.getDouble(4) == twoLevel.getDouble(4)) // psi
  }

  test("jsDivergence: identical sides → exactly 0; disjoint sides → ~ln 2; " +
      "symmetric under side swap; hand case matches the quantized fold; " +
      "empty side → NULL") {
    def jsd(p: Seq[String], q: Seq[String]) =
      InfoTheory.jsDivergence(
        (p.map(c => (c, true)) ++ q.map(c => (c, false))).toDF("cat", "p")
          .repartition(3),
        "cat", col("p")).collect().head
    // identical: every term is c·(qlog(2cT) − qlog(2cT)) = 0 EXACTLY
    val same = jsd(Seq("x", "x", "y"), Seq("x", "x", "y"))
    assert(same.getLong(3) == 0L && same.getLong(4) == 0L)
    assert(same.getDouble(5) == 0.0)
    // disjoint: JSD = ln 2, within the 2·10⁻⁶ quantization band
    val disj = jsd(Seq("x", "x"), Seq("y", "z"))
    assert(math.abs(disj.getDouble(5) - math.log(2.0)) < 2e-6)
    // symmetry: swapping sides swaps (n_p, sp) with (n_q, sq), same jsd
    val a = jsd(Seq("x", "x", "y"), Seq("x", "z"))
    val b = jsd(Seq("x", "z"), Seq("x", "x", "y"))
    assert(a.getLong(1) == b.getLong(2) && a.getLong(2) == b.getLong(1))
    assert(a.getLong(3) == b.getLong(4) && a.getLong(4) == b.getLong(3))
    assert(a.getDouble(5) == b.getDouble(5))
    // hand fold: p = {x:2, y:1} (T=3), q = {x:1, z:1} (T=2)
    def t(c: Long, tOther: Long, mix: Long) =
      if (c == 0) 0L else c * (qlog(2 * c * tOther) - qlog(mix))
    val sp = t(2, 2, 2 * 2 + 1 * 3) + t(1, 2, 1 * 2 + 0 * 3) + t(0, 2, 0 * 2 + 1 * 3)
    val sq = t(1, 3, 2 * 2 + 1 * 3) + t(0, 3, 1 * 2 + 0 * 3) + t(1, 3, 0 * 2 + 1 * 3)
    assert(a.getLong(3) == sp && a.getLong(4) == sq)
    assert(a.getDouble(5) == (sp.toDouble / 3d + sq.toDouble / 2d) / 2e6)
    // empty side: distance to a nonexistent distribution is undefined
    assert(jsd(Seq("x"), Seq.empty).isNullAt(5))
  }

  test("conditionalEntropy: deterministic transitions score exactly 0; " +
      "the hand fold matches; empty input emits NULL h") {
    // a→x always, b→{y, z} evenly
    val cells = Seq(("a", 4L), ("b", 1L), ("b", 1L))
      .toDF("f", "n") // the (from, n) projection of a cell table
    val out = InfoTheory.conditionalEntropy(cells, "f", "n").head()
    assert(out.getLong(0) == 6L && out.getLong(1) == 2L
      && out.getLong(2) == 3L)
    // a-row: 4·qlog(4) − 4·qlog(4) = 0; b-row: 2·qlog(2) − 2·qlog(1)
    val expected = 2L * qlog(2) - 2L * qlog(1)
    assert(out.getLong(3) == expected)
    assert(out.getDouble(4) == expected.toDouble / (6d * 1e6))
    val det = Seq(("a", 5L), ("b", 3L)).toDF("f", "n")
    assert(InfoTheory.conditionalEntropy(det, "f", "n")
      .head().getLong(3) == 0L)
    val empty = Seq.empty[(String, Long)].toDF("f", "n")
    val e = InfoTheory.conditionalEntropy(empty, "f", "n").head()
    assert(e.getLong(0) == 0L && e.isNullAt(4))
  }

  test("jsdFromCounts with a literal reference == jsDivergence on the " +
      "same two sides (one aggregation vs the two-sided count shuffle)") {
    val pSide = Seq("x", "x", "x", "y")
    val qSide = Seq("x", "y", "y", "z")
    val both = (pSide.map(c => (c, true)) ++ qSide.map(c => (c, false)))
      .toDF("cat", "p")
    val twoLevel = InfoTheory.jsDivergence(both, "cat", col("p"))
      .collect().head
    val ref = qSide.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val one = pSide.toDF("cat")
      .agg(graft.expressions.CategoryCountExpressions
        .categoryCounts(col("cat")).as("_cc"))
      .select(InfoTheory.jsdFromCounts(col("_cc"), ref): _*)
      .collect().head
    assert(one.toSeq == twoLevel.toSeq)
  }

  test("jsDivergenceByGroup == jsDivergence applied per group slice") {
    val rows = Seq(("g1", "x", true), ("g1", "x", false), ("g1", "y", true),
      ("g2", "x", true), ("g2", "z", false), ("g2", "z", false),
      ("g3", "w", true)) // empty q side → NULL jsd
    val df = rows.toDF("g", "cat", "p")
    val grouped = InfoTheory.jsDivergenceByGroup(df, "g", "cat", col("p"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (g <- Seq("g1", "g2", "g3")) {
      val slice = InfoTheory.jsDivergence(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("cat", "p"),
        "cat", col("p")).head().toSeq
      assert(grouped(g) == slice, s"group $g")
    }
  }
}
