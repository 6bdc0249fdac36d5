package graft

import graft.expressions.HashKernelExpressions
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The native single-pass kernels (ShingleHashes / TokenHashes /
  * MinhashSignature / SimhashVote) must be bit-identical to the interpreted
  * Column-expression forms they replace — that equivalence is what keeps the
  * DuckDB oracles (which mirror the Column forms) valid for q_minhash_pairs,
  * q_jaccard_pairs and q_simhash. */
class HashKernelSpec extends SparkSpec {
  import spark.implicits._

  // strings with the shapes that exercise every branch: multi-space runs,
  // tabs/newlines (ASCII \s), unicode, punctuation, empties, < k tokens
  private val edgeCases = Seq(
    "", " ", "   ", "a", "a b", "a  b", " a b ", "a\tb\nc", "héllo wörld",
    "世界 你好 世界", "one two three four five six", "a,b.c!d", "🚀 🚀 🚀 x",
    "trailing space ", "\ttab lead", "ab\fc\rd", "x:y z:w q:r")

  private def textGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.listOfN(8, Gen.oneOf("the", "quick brown", "fox,", "héllo", "世界", "",
      " ", "a\tb", "🚀")).map(_.mkString(" ")))

  test("shingle-hash kernel equals the Column form on edge cases, k in 1..4") {
    for (k <- 1 to 4) {
      val df = edgeCases.toDF("text").select(
        col("text"),
        Dedup.shingleHashes(col("text"), k).as("native"),
        Dedup.shingleHashesColumnForm(col("text"), k).as("legacy"))
      val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.mkString("; ")}")
    }
  }

  test("property: shingle-hash kernel equals the Column form on arbitrary text") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val r = SCTest.check(params, Prop.forAll(Gen.listOfN(20, textGen)) { strs =>
      val df = strs.toDF("text")
      df.select((Dedup.shingleHashes(col("text"), 3) <=>
          Dedup.shingleHashesColumnForm(col("text"), 3)).as("ok"))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("token-hash kernel equals the Column form (trim + \\s+ split + filter)") {
    val df = edgeCases.toDF("text").select(
      col("text"),
      Dedup.tokenHashes(col("text")).as("native"),
      Dedup.tokenHashesColumnForm(col("text")).as("legacy"))
    val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("property: token-hash kernel equals the Column form on arbitrary text") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val r = SCTest.check(params, Prop.forAll(Gen.listOfN(20, textGen)) { strs =>
      val df = strs.toDF("text")
      df.select((Dedup.tokenHashes(col("text")) <=>
          Dedup.tokenHashesColumnForm(col("text"))).as("ok"))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("minhash-signature kernel equals the Column form, including empty arrays") {
    val arrays: Seq[Seq[Long]] = Seq(
      Seq.empty[Long], Seq(0L), Seq(4294967295L), Seq(1L, 2L, 3L),
      (0L until 50L).map(i => (i * 1103515245L + 12345L) % (1L << 32)),
      (0L until 200L).map(i => (i * 2654435761L) % (1L << 32)))
    val df = arrays.toDF("hs").select(
      col("hs"),
      Dedup.minhashFromHashes(col("hs"), 16).as("native"),
      Dedup.minhashFromHashesColumnForm(col("hs"), 16).as("legacy"))
    val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("array kernels keep the Column forms' null-element semantics") {
    // array_min skips nulls (all-null → null slots); the simhash `when`
    // turns a null comparison into a -1 vote — the kernels must agree
    val df = spark.range(1).select(
      array(lit(null).cast("long"), lit(5L), lit(null).cast("long")).as("mixed"),
      array(lit(null).cast("long")).as("allnull"))
    val rows = df.select(
      Dedup.minhashFromHashes(col("mixed"), 4).as("m_native"),
      Dedup.minhashFromHashesColumnForm(col("mixed"), 4).as("m_legacy"),
      Dedup.minhashFromHashes(col("allnull"), 4).as("n_native"),
      Dedup.minhashFromHashesColumnForm(col("allnull"), 4).as("n_legacy"),
      Dedup.simhashFromHashes(col("mixed")).as("s_native"),
      Dedup.simhashFromHashesColumnForm(col("mixed")).as("s_legacy"))
    val bad = rows.filter(
      not(col("m_native") <=> col("m_legacy")) ||
      not(col("n_native") <=> col("n_legacy")) ||
      not(col("s_native") <=> col("s_legacy"))).count()
    assert(bad == 0, rows.collect().mkString(";"))
  }

  test("simhash-vote kernel equals the Column form, including empty arrays") {
    val arrays: Seq[Seq[Long]] = Seq(
      Seq.empty[Long], Seq(0L), Seq((1L << 60) - 1), Seq(5L, 9L, 12L),
      (0L until 100L).map(i => (i * 6364136223846793005L) & ((1L << 60) - 1)))
    val df = arrays.toDF("hs").select(
      col("hs"),
      Dedup.simhashFromHashes(col("hs")).as("native"),
      Dedup.simhashFromHashesColumnForm(col("hs")).as("legacy"))
    val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("jaccard kernel equals the Column form on distinct int64 arrays (incl. property)") {
    val edge: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty[Long], Seq.empty[Long]), (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(0L), Seq(0L)), (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)), (Seq(Long.MaxValue, 0L), Seq(0L)))
    val df = edge.toDF("a", "b").select(
      col("a"), col("b"),
      Dedup.jaccardHashes(col("a"), col("b")).as("native"),
      Dedup.jaccard(col("a"), col("b")).as("legacy"))
    val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
    // NULL elements count as their own distinct value (array_intersect /
    // array_union semantics) — the SQL surface can feed them even though the
    // engine's own callers never do
    val nullEdge = Seq(
      (Seq(Option(1L), None), Seq(Option.empty[Long], Option(2L))),
      (Seq(Option(1L), None), Seq(Option(1L))),
      (Seq(Option.empty[Long]), Seq(Option.empty[Long])))
      .toDF("a", "b").select(
        Dedup.jaccardHashes(col("a"), col("b")).as("native"),
        Dedup.jaccard(col("a"), col("b")).as("legacy"))
    val badNull = nullEdge.filter(not(col("native") <=> col("legacy"))).collect()
    assert(badNull.isEmpty, s"null-element mismatches: ${badNull.mkString("; ")}")
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val setGen = Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct)
    val r = SCTest.check(params, Prop.forAll(Gen.listOfN(12, Gen.zip(setGen, setGen))) { ps =>
      val d = ps.map { case (a, b) => (a, b) }.toDF("a", "b")
      d.select((Dedup.jaccardHashes(col("a"), col("b")) <=>
          Dedup.jaccard(col("a"), col("b"))).as("ok"))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("containment kernel equals the Column form on distinct int64 arrays") {
    val edge: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty[Long], Seq.empty[Long]), (Seq(1L, 2L), Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L)), (Seq(1L, 2L, 3L, 4L), Seq(2L, 3L)),
      (Seq(1L), Seq(2L)), (Seq(0L, 5L), Seq(0L, 5L)))
    val df = edge.toDF("a", "b").select(
      col("a"), col("b"),
      Dedup.containmentHashes(col("a"), col("b")).as("native"),
      Dedup.containmentColumnForm(col("a"), col("b")).as("legacy"))
    val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val setGen = Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct)
    val r = SCTest.check(params, Prop.forAll(Gen.listOfN(12, Gen.zip(setGen, setGen))) { ps =>
      val d = ps.toDF("a", "b")
      d.select((Dedup.containmentHashes(col("a"), col("b")) <=>
          Dedup.containmentColumnForm(col("a"), col("b"))).as("ok"))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("end-to-end: kernel-backed pipeline equals Column-form pipeline on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"), col("text"),
        Dedup.shingleHashes(col("text"), 3).as("hs"))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("hs"), 16).as("sig"),
        Dedup.simhashFromHashes(Dedup.tokenHashes(col("text"))).as("sh"))
    val legacy = docs.select(col("doc_id"), col("text"),
        Dedup.shingleHashesColumnForm(col("text"), 3).as("hs"))
      .select(col("doc_id"), Dedup.minhashFromHashesColumnForm(col("hs"), 16).as("sig"),
        Dedup.simhashFromHashesColumnForm(Dedup.tokenHashesColumnForm(col("text"))).as("sh"))
    val joined = native.as("n").join(legacy.as("l"), Seq("doc_id"))
    val bad = joined.filter(
      not(col("n.sig") <=> col("l.sig")) || not(col("n.sh") <=> col("l.sh"))).count()
    assert(bad == 0, s"$bad docs diverge between kernel and Column form")
    assert(native.count() > 0)
  }

  test("shingle-string kernel equals the Column form on normalized text") {
    for (k <- 1 to 3) {
      val df = (edgeCases ++ Seq("one two three four", "a b")).toDF("text").select(
        col("text"),
        graft.expressions.HashKernelExpressions
          .shingleStrings(TextOps.normalized(col("text")), k).as("native"),
        TextOps.ngramsColumnForm(col("text"), k).as("legacy"))
      val bad = df.filter(not(col("native") <=> col("legacy"))).collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.mkString("; ")}")
    }
  }

  test("winnow kernel selects sorted distinct window minima (independent reference)") {
    // independent reimplementation of winnowing for the spec
    def reference(hs: Seq[Long], w: Int): Seq[Long] =
      if (hs.isEmpty) Seq.empty
      else if (hs.size < w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq.distinct.sorted
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty[Long], Seq(7L), Seq(5L, 3L), Seq(9L, 1L, 8L, 1L, 7L, 6L),
      (0L until 50L).map(i => (i * 2654435761L) % 1000),
      Seq.fill(10)(42L)) // all-equal: one fingerprint
    for (w <- Seq(1, 3, 4)) {
      val df = cases.toDF("hs").select(col("hs"),
        graft.expressions.HashKernelExpressions.winnowSelect(col("hs"), w).as("native"))
      val got = df.as[(Seq[Long], Seq[Long])].collect()
      got.foreach { case (in, out) =>
        assert(out == reference(in, w), s"w=$w input=$in")
      }
    }
  }

  test("shared substrings of guarantee length share a winnow fingerprint") {
    // docs 1 and 2 share a 6-word run = w+k-1 (w=4, k=3): the guarantee says
    // they must share at least one selected fingerprint; doc 3 is disjoint
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two alpha beta gamma delta epsilon zeta nine ten"),
      (3L, "totally different words everywhere here now")).toDF("doc_id", "text")
    val fps = graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("the SQL function surface runs the whole minhash pipeline in one statement") {
    // register the exact builders GraftExtensions injects (same literal-arg
    // extraction path) and drive them through SQL resolution
    val s2 = spark.newSession()
    graft.expressions.GraftExtensions.builders.foreach { case (name, (_, b)) =>
      s2.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
    val got = s2.sql(
      """SELECT graft_minhash_signature(graft_shingle_hashes('the quick brown fox jumps', 3), 4) AS sig,
        |       graft_simhash_vote(graft_token_hashes('the quick brown fox')) AS sh""".stripMargin)
      .collect()(0)
    val expected = Seq(("the quick brown fox jumps", "the quick brown fox")).toDF("a", "b")
      .select(
        Dedup.minhashFromHashes(Dedup.shingleHashes(col("a"), 3), 4).as("sig"),
        Dedup.simhashFromHashes(Dedup.tokenHashes(col("b"))).as("sh"))
      .collect()(0)
    assert(got.getSeq[Long](0) == expected.getSeq[Long](0))
    assert(got.getLong(1) == expected.getLong(1))
    // a non-literal parameter must fail loudly, not silently misbehave
    val err = intercept[Exception] {
      s2.sql("SELECT graft_shingle_hashes('a b c', length('xx'))").collect()
    }
    assert(err.getMessage.contains("literal integer"), err.getMessage)
  }

  test("CmsMinProbe matches the Column-composition probe and never undercounts") {
    import graft.expressions.CountMinExpressions
    val df = Seq.tabulate(60)(i => "k" + (i % 7)).toDF("k")
    val tbl = df.agg(CountMinExpressions.cmsTable(col("k"), 3, 16).as("t"))
    val probes = df.distinct().crossJoin(broadcast(tbl))
      .select(col("k"),
        CountMinExpressions.cmsMin(col("t"), col("k"), 3, 16).as("native"),
        CountMinExpressions.cmsMinColumnForm(col("t"), col("k"), 3, 16).as("cf"))
      .as[(String, Long, Long)].collect()
    assert(probes.nonEmpty && probes.forall { case (_, n, c) => n == c })
    val exact = Seq.tabulate(60)(i => "k" + (i % 7)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(probes.forall { case (k, n, _) => n >= exact(k) })
  }

  test("the CMS SQL surface aggregates and probes through literal (d, w)") {
    val s2 = spark.newSession()
    graft.expressions.GraftExtensions.builders.foreach { case (name, (_, b)) =>
      s2.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
    // temp views are session-scoped, so feed s2 with inline VALUES
    val in = "(VALUES ('a'), ('b'), ('a'), ('c'), ('a')) AS v(k)"
    val got = s2.sql(
      s"""SELECT graft_cms_min(t, 'a', 4, 32) AS est
         |FROM (SELECT graft_cms_table(k, 4, 32) AS t FROM $in)""".stripMargin)
      .collect()(0).getLong(0)
    assert(got == 3L) // no collisions at w=32 over 3 keys
    val err = intercept[Exception] {
      s2.sql(s"SELECT graft_cms_table(k, length('xx'), 32) FROM $in").collect()
    }
    assert(err.getMessage.contains("literal integer"), err.getMessage)
  }

  test("kernel expressions fuse into whole-stage codegen") {
    val df = spark.range(8).select(
      HashKernelExpressions.simhashVote(
        HashKernelExpressions.tokenHashes(col("id").cast("string"))).as("v"),
      HashKernelExpressions.minhashSignature(
        HashKernelExpressions.shingleHashes(col("id").cast("string"), 2), 4).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"kernel project not codegen-fused:\n$plan")
    assert(df.count() == 8)
  }
}
