package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def h32(s: String): Long =
    graft.expressions.Md5Hash.first32(UTF8String.fromString(s))

  /** The estimator under test, folded by hand. */
  private def est(k: Int, hashes: Seq[Long]): Long = {
    val m = hashes.distinct.sorted.take(k)
    if (m.size < k) m.size.toLong
    else ((k - 1).toLong * 4294967296L) / m.last
  }

  test("kmvDistinct: exact below k, the (k-1)·2^32/h_k estimate at k, " +
      "against a hand fold of the same md5 k-minima") {
    val docs = Seq(
      ("s1", "a b c"),                 // 3 distinct < k=4 → exact
      ("s1", "c d"),                   // s1 universe: a b c d (= k)
      ("s2", "a b c d e f g h i j"),   // 10 distinct > k → estimated
      ("s3", "x")                      // singleton group
    ).toDF("source", "text")
    val got = Sketches.kmvDistinct(docs, "source", "text", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def toks(ss: String*) = ss.flatMap(_.split(" ")).distinct
    val u1 = toks("a b c", "c d").map(h32)
    val u2 = toks("a b c d e f g h i j").map(h32)
    val u3 = toks("x").map(h32)
    assert(got == Set(
      ("s1", 4L, est(4, u1)),
      ("s2", 10L, est(4, u2)),
      ("s3", 1L, est(4, u3))))
    // the full-sketch branch really engaged for s2 (estimate ≠ count is
    // overwhelmingly likely but not guaranteed; the branch itself is)
    assert(u2.distinct.size > 4)
  }

  test("kmvOverlap: union sketch, co-membership count, and ρ-scaled " +
      "intersection estimate match the hand fold; disjoint pairs emit " +
      "n_both = 0; identical groups estimate inter = union") {
    val docs = Seq(
      ("a", "p q r s t u v w"),
      ("b", "p q r s t u v w"),   // identical to a
      ("c", "x1 x2 x3 x4 x5 x6") // disjoint from both
    ).toDF("source", "text")
    val k = 4
    val got = Sketches.kmvOverlap(docs, "source", "text", k)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    def sketch(ss: String): Seq[Long] =
      ss.split(" ").map(h32).distinct.sorted.take(k)
    def fold(x: String, y: String): (Long, Long, Long) = {
      val (sx, sy) = (sketch(x), sketch(y))
      val union = (sx ++ sy).distinct.sorted.take(k)
      val m = union.size.toLong
      val eu = if (m < k) m else ((k - 1).toLong * 4294967296L) / union.last
      val both = union.count(h => sx.contains(h) && sy.contains(h)).toLong
      (both, eu, both * eu / m)
    }
    val ab = fold("p q r s t u v w", "p q r s t u v w")
    val ac = fold("p q r s t u v w", "x1 x2 x3 x4 x5 x6")
    val bc = ac // b ≡ a
    assert(got == Set(
      ("a", "b", ab._1, ab._2, ab._3),
      ("a", "c", ac._1, ac._2, ac._3),
      ("b", "c", bc._1, bc._2, bc._3)))
    // identical sides: every union-sketch member is in both → inter = union
    assert(ab._1 == k.toLong && ab._3 == ab._2)
    // disjoint sides: no co-members
    assert(ac._1 == 0L && ac._3 == 0L)
  }

  test("kmvDistinct estimate lands near the truth on a 500-token universe " +
      "(k=64 → ~12% relative error at 3σ-ish; this pins the estimator's " +
      "calibration, not just its determinism)") {
    val docs = (0 until 500).map(i => ("g", s"tok_$i")).toDF("source", "text")
    val r = Sketches.kmvDistinct(docs, "source", "text", 64).head()
    assert(r.getLong(1) == 500L)
    val e = r.getLong(2)
    assert(e > 300 && e < 800, s"estimate $e implausibly far from 500")
  }

  test("kmvDistinct refuses emitted-column collisions and k < 2") {
    val df = Seq(("s", "a")).toDF("source", "text")
    intercept[IllegalArgumentException](
      Sketches.kmvDistinct(df, "source", "text", 1))
    intercept[IllegalArgumentException](
      Sketches.kmvDistinct(df.withColumn("n_exact", lit(1L)),
        "source", "text", 4))
  }

  test("KmvSketchAgg: the mergeable aggregate keeps the k smallest " +
      "DISTINCT hashes sorted, evicts above k, ignores NULLs, and " +
      "kmvEstimate reads exact-below-k / ratio-at-k") {
    import graft.expressions.{KmvExpressions, Md5Expressions, Md5Hash}
    def h(v: Long): Long = Md5Hash.first32(
      org.apache.spark.unsafe.types.UTF8String.fromString(v.toString))
    val vals = Seq(Some(11L), Some(22L), Some(33L), Some(11L), None)
    val df = vals.toDF("v")
      .withColumn("_h", Md5Expressions.md5Int(col("v").cast("string")))
    val sk = df.agg(KmvExpressions.kmvSketch(col("_h"), 2).as("s"),
        KmvExpressions.kmvEstimate(
          KmvExpressions.kmvSketch(col("_h"), 2), 2).as("est"))
      .head()
    val expect = Seq(h(11), h(22), h(33)).sorted.take(2)
    assert(sk.getSeq[Long](0) == expect)
    assert(sk.getLong(1) == 4294967296L / expect(1))
    // below k: the sketch IS the set, estimate exact
    val small = Seq(7L).toDF("v")
      .withColumn("_h", Md5Expressions.md5Int(col("v").cast("string")))
    assert(small.agg(KmvExpressions.kmvEstimate(
      KmvExpressions.kmvSketch(col("_h"), 2), 2)).head().getLong(0) == 1L)
  }

  test("kmvWindowNovelty: in the exact regime (k above the distinct " +
      "counts) the set algebra is literal — day 1 vs day 0 overlap 2 of " +
      "3; the first window is unmeasured, not novel") {
    // day 0: {1,2,3}; day 1: {2,3,4} → inter 2, novelty (3−2)/3
    val rows = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 2L),
      (86400000L, 2L), (86400000L, 3L), (86400000L, 4L))
      .toDF("ms", "cents")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sketches.kmvWindowNovelty(rows, "cents", "ts", 86400000L, 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got(0L) == ((3L, 3L, None, None)))
    assert(got(86400000L) ==
      ((3L, 3L, Some(2L), Some(1000000L / 3L))))
  }
}
