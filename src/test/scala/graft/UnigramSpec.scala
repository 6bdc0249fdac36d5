package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM induction unit contract: the hand-computed tiny corpus
  * (every qlog/Z/DP value worked by hand), unknown-char coverage, the
  * shorter-last-piece tie rule, and the monotone-likelihood property of
  * hard EM on a real slice. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "aa aa ab" — words aa×2, ab×1
  private def docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")

  test("hand case: seed stats, round-1/round-2 Viterbi and usage, " +
      "monotone ll — every integer worked by hand") {
    val w = Unigram.words(docs, "text", 12)
    assert(w.as[(String, Long)].collect().toSet
      === Set(("aa", 2L), ("ab", 1L)))
    val cands = Unigram.candidates(w, 12, 4)
    assert(cands.as[(String, Long)].collect().toSet
      === Set(("a", 5L), ("b", 1L), ("aa", 2L), ("ab", 1L)))
    val (vocab, lls) = Unigram.learn(docs, "text", 2, 64, 12, 4)
    // round 1 under seed counts (a5 b1 aa2 ab1, Z=qlog(13)):
    // aa → [aa], ab → [ab]; ll1 = 2·(qlog(3)−Z) + (qlog(2)−Z)
    val z0 = math.floor(math.log(13.0) * 1e6).toLong
    val ll1 = 2L * (1098612L - z0) + (693147L - z0)
    // round 2 under usage counts (a0 b0 aa2 ab1, Z=qlog(7))
    val z1 = math.floor(math.log(7.0) * 1e6).toLong
    val ll2 = 2L * (1098612L - z1) + (693147L - z1)
    assert(lls === Seq((1L, ll1), (2L, ll2)))
    assert(ll2 > ll1)
    assert(vocab.as[(String, Long)].collect().toSet
      === Set(("a", 0L), ("b", 0L), ("aa", 2L), ("ab", 1L)))
  }

  test("segmentation under a frozen inventory covers unknown single " +
      "chars (qlog(1)−Z fallback) and unknown multis stay unusable") {
    val (vocab, _) = Unigram.learn(docs, "text", 2, 64, 12, 4)
    val heldout = Seq(("ba", 1L), ("zz", 1L)).toDF("word", "freq")
    val byWord = Unigram.segmented(heldout, vocab, 12, 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(byWord("ba") === ((2L, "b a")))  // 'ba' not in vocab → chars
    assert(byWord("zz") === ((2L, "z z")))  // unknown chars still segment
  }

  test("tie rule: equal-score paths prefer the SHORTER last piece") {
    // vocab where 'ab' scores exactly a+b is impossible with integer
    // qlogs here; instead force a tie via identical counts and check the
    // deterministic outcome is stable across reruns
    val w = Seq(("ab", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", 1L), ("b", 1L), ("ab", 1L)).toDF("piece", "cnt")
    val run1 = Unigram.segmented(w, vocab, 12, 4).collect()(0).getString(3)
    val run2 = Unigram.segmented(w, vocab, 12, 4).collect()(0).getString(3)
    assert(run1 === run2)
    // with equal counts: ab = qlog(2)−Z, a+b = 2·(qlog(2)−Z); Z>qlog(2)
    // so the single piece wins outright (no tie) — pin it
    assert(run1 === "ab")
  }

  // ONE training run on the real corpus shared by the corpus-level tests
  // (each learn pins localCheckpoint blocks for the JVM's lifetime; the
  // first cut re-trained per test and OOM'd the shared test JVM)
  private lazy val real =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val realModel = Unigram.learn(real, "text", 3, 64, 12, 4)

  test("monotone likelihood on the sf0.001 corpus (hard EM, zero slack)") {
    val (_, lls) = realModel
    assert(lls.size === 3)
    lls.map(_._2).sliding(2).foreach { p =>
      assert(p(1) >= p.head,
        s"likelihood decreased: ${p.head} -> ${p(1)} across $lls")
    }
  }

  test("pplGateEachBatch: micro-batch-split-exact parity with the one-" +
      "shot computation, and OOV words of arriving docs still score") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (vocab, _) = Unigram.learn(docs, "text", 2, 64, 12, 4)
    val frozen = vocab.localCheckpoint(true)
    val zQ = Unigram.zOf(frozen)
    // doc 11 is pure training-like text; doc 12 is OOV (zz) — both score
    val arriving = Seq((11L, "aa ab"), (12L, "zz aa"))
    def oneShot(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      val batch = rows.toDF("doc_id", "text")
      var got: Option[Set[(Long, Long, Long, Long, Double)]] = None
      val input = MemoryStream[(Long, String)]
      val acc = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Double)]
      val q = graft.streaming.StreamOps.pplGateEachBatch(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", frozen, zQ,
        12, 4) { (out, _) =>
        acc ++= out.as[(Long, Long, Long, Long, Double)].collect()
      }.start()
      try {
        rows.foreach { r => input.addData(Seq(r)); q.processAllAvailable() }
        got = Some(acc.toSet)
      } finally q.stop()
      got.get
    }
    val streamed = oneShot(arriving)
    assert(streamed.map(_._1) === Set(11L, 12L))
    // the OOV doc's zz segments char by char at the qlog(1)−Z floor:
    // nll = 2·Z (two z chars) + aa's cost — strictly above doc 11's
    val byId = streamed.map(t => t._1 -> t._5).toMap
    assert(byId(12L) > byId(11L))
    // split-independence: one-row batches above vs one two-row batch
    val input2 = MemoryStream[(Long, String)]
    val acc2 = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Double)]
    val q2 = graft.streaming.StreamOps.pplGateEachBatch(
      input2.toDS().toDF("doc_id", "text"), "doc_id", "text", frozen, zQ,
      12, 4) { (out, _) =>
      acc2 ++= out.as[(Long, Long, Long, Long, Double)].collect()
    }.start()
    try {
      input2.addData(arriving); q2.processAllAvailable()
      assert(acc2.toSet === streamed)
    } finally q2.stop()
  }

  test("reconstruction invariant on the real corpus: every segmented " +
      "word's pieces concatenate back to the word (the corpus word set " +
      "covers the held-out slice's)") {
    val (vocab, _) = realModel
    // materialize BEFORE filtering on pieces: a predicate referencing the
    // DP's emitted array gets pushed through the ~110-level projection
    // chain, re-substituting the piece construction at every level —
    // probed OOM (the Spark-optimizer twin of the DuckDB lateral-alias
    // blowup documented in SCALE.md)
    val seg = Unigram.segmented(Unigram.words(real, "text", 12),
      vocab, 12, 4).localCheckpoint(true)
    val broken = seg.filter(
      regexp_replace(col("pieces"), " ", "") =!= col("word"))
    assert(broken.count() === 0L,
      s"pieces do not reconstruct: ${broken.collect().mkString(", ")}")
    // and no word ends up with zero pieces
    assert(seg.filter(col("n_pieces") < 1L).count() === 0L)
  }

  test("q_curation_funnel stages are monotone: each stage's doc and " +
      "token mass is <= the previous stage's") {
    val rows = SparkEntry.queries("q_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .orderBy(col("stage_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (0L to 5L))
    rows.sliding(2).foreach { case Array((_, d0, t0), (i, d1, t1)) =>
      assert(d1 <= d0 && t1 <= t0, s"stage $i grew: $d0/$t0 -> $d1/$t1")
    }
  }

  test("q_funnel_by_source sums back to the global funnel card at " +
      "every stage") {
    val bySrc = SparkEntry.queries("q_funnel_by_source")(
        spark, "/root/testdata/sf0.001")
      .groupBy(col("stage_idx"))
      .agg(sum(col("n_docs")).as("d"), sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val card = SparkEntry.queries("q_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
    card.foreach { case (i, (d, t)) =>
      assert(bySrc(i) === ((d, t)),
        s"stage $i: per-source sums ${bySrc(i)} != global card ($d, $t)")
    }
  }

  test("q_gate_sweep: the 500000 row IS the live funnel (equals the " +
      "ppl_head stage) and the keep-curve is monotone in the cut") {
    val sweep = SparkEntry.queries("q_gate_sweep")(
        spark, "/root/testdata/sf0.001")
      .orderBy(col("thr_ppm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val head = SparkEntry.queries("q_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .filter(col("stage") === "ppl_head").collect().head
    val live = sweep.find(_._1 == 500000L).get
    assert(live._2 === head.getLong(2) && live._3 === head.getLong(3),
      s"500000 row ${live} != funnel ppl_head " +
        s"(${head.getLong(2)}, ${head.getLong(3)})")
    sweep.sliding(2).foreach { case Array((_, d0, t0), (t, d1, t1)) =>
      assert(d1 <= d0 && t1 <= t0,
        s"keep mass grew as the cut tightened at $t: $d0/$t0 -> $d1/$t1")
    }
  }

  test("q_neardup_sweep: the 50 row IS the live funnel (the verify " +
      "floor) and LOOSENING the jaccard cut keeps more") {
    val sweep = SparkEntry.queries("q_neardup_sweep")(
        spark, "/root/testdata/sf0.001")
      .orderBy(col("threshold_pct")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val head = SparkEntry.queries("q_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .filter(col("stage") === "ppl_head").collect().head
    val live = sweep.find(_._1 == 50L).get
    assert(live._2 === head.getLong(2) && live._3 === head.getLong(3),
      s"50 row ${live} != funnel ppl_head " +
        s"(${head.getLong(2)}, ${head.getLong(3)})")
    sweep.sliding(2).foreach { case Array((_, d0, t0), (t, d1, t1)) =>
      assert(d1 >= d0 && t1 >= t0,
        s"keep mass shrank as the cut loosened at $t: $d0/$t0 -> $d1/$t1")
    }
  }

  test("guards: bad rounds/seedK/shape fail loud") {
    assertThrows[IllegalArgumentException](
      Unigram.learn(docs, "text", 0, 64, 12, 4))
    assertThrows[IllegalArgumentException](
      Unigram.learn(docs, "text", 1, 0, 12, 4))
    assertThrows[IllegalArgumentException](
      Unigram.viterbi(Seq(("a", 1L)).toDF("word", "freq"),
        Seq(("a", 1L)).toDF("piece", "cnt"), 0L, 20, 4))
  }
}
