package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** The Md5ExprSpec convention applied to the unigram Viterbi kernel: the
  * native UnigramViterbi expression must be BIT-IDENTICAL to the retained
  * Column-algebra DP (viterbiColumnAlgebra — the form the DuckDB oracle
  * mirrors) on real corpus words under both a seed and a trained
  * inventory, plus crafted tie/unknown-char edges. */
class UnigramKernelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 12
  private val L = 4

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("word"), col("freq"),
        array_join(col("pieces"), "|").as("p"),
        col("best_qll"), col("n_pieces"))
      .collect().map(_.toString).toSet

  test("kernel == Column-algebra DP on real corpus words, under the seed " +
      "inventory AND the trained one (bit-identical rows)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = Unigram.words(docs, "text", W).localCheckpoint(true)
    val seed = Unigram.seedVocab(Unigram.candidates(w, W, L), 64)
      .localCheckpoint(true)
    val zSeed = Unigram.zOf(seed)
    assert(rows(Unigram.viterbi(w, seed, zSeed, W, L)) ==
      rows(Unigram.viterbiColumnAlgebra(w, seed, zSeed, W, L)),
      "kernel diverged from the Column DP under the seed inventory")
    val (trained, lls) = Unigram.learn(docs, "text", 2, 64, W, L)
    assert(lls.size == 2 && lls(1)._2 >= lls(0)._2,
      s"EM likelihood not monotone through the kernel: $lls")
    val zT = Unigram.zOf(trained)
    assert(rows(Unigram.viterbi(w, trained, zT, W, L)) ==
      rows(Unigram.viterbiColumnAlgebra(w, trained, zT, W, L)),
      "kernel diverged from the Column DP under the trained inventory")
  }

  test("crafted edges match: unknown single chars (coverage), a tie that " +
      "must prefer the SHORTER last piece, and a max-length word") {
    // vocab with only 'ab' and 'a','b' such that "ab" as one piece ties
    // ... scoring makes pieces comparable: cnt chosen so
    // score(ab) == score(a) + score(b) + Z would need exact qlog algebra —
    // instead craft equality directly: cnt(ab)+1 = (cnt(a)+1)·(cnt(b)+1)
    // in qlog space only holds approximately, so ALSO rely on the
    // differential check which needs no tie engineering at all
    val vocab = Seq(("a", 3L), ("b", 3L), ("ab", 15L), ("zq", 9L))
      .toDF("piece", "cnt")
    val z = Unigram.zOf(vocab)
    val words = Seq(
      ("ab", 1L),            // multi-char vs char-pair
      ("xy", 1L),            // both chars UNKNOWN: coverage default
      ("abab", 2L),
      ("zqzq", 1L),
      ("a" * W, 1L))         // max-length word exercises every DP slot
      .toDF("word", "freq")
    assert(rows(Unigram.viterbi(words, vocab, z, W, L)) ==
      rows(Unigram.viterbiColumnAlgebra(words, vocab, z, W, L)),
      "kernel diverged on crafted edges")
    // the coverage default is exactly 0 − Z per unknown char
    val xy = Unigram.viterbi(words, vocab, z, W, L)
      .filter(col("word") === "xy").select(col("best_qll"))
      .as[Long].head()
    assert(xy == -2L * z, s"unknown-char score wrong: $xy vs ${-2L * z}")
  }

  test("a word longer than maxWordLen fails LOUD in the kernel (the " +
      "Column DP has no slot for it either)") {
    val vocab = Seq(("a", 1L)).toDF("piece", "cnt")
    val words = Seq(("a" * (W + 1), 1L)).toDF("word", "freq")
    val e = intercept[Exception] {
      Unigram.viterbi(words, vocab, Unigram.zOf(vocab), W, L).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("longer than maxWordLen")),
      s"wrong failure: ${chain(e)}")
  }
}
