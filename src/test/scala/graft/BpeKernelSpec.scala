package graft

import graft.expressions.BpeKernel
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The Md5ExprSpec convention applied to the BPE merge kernel: the native
  * BpeApplyMerges expression (the form training and inference now run on)
  * must be BIT-IDENTICAL to the retained five-window run-parity rule
  * (TextOps.bpeReplayWindowForm — the form the run-parity scaladoc
  * derives and the DuckDB oracle mirrors) on a real-corpus trained run
  * and on crafted run/overlap edges. */
class BpeKernelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 32

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("word"), col("freq"), col("n_pieces"), col("pieces"))
      .collect().map(_.toString).toSet

  private def mergesOf(m: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    m.orderBy(col("merge_rank")).select(col("lhs"), col("rhs"))
      .as[(String, String)].collect().toSeq

  test("kernel == window rule on a real-corpus trained run: the array " +
      "loop's own segmentation AND bpeEncode both replay bit-identically " +
      "through the retained five-window form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, segments) = TextOps.bpeLearn(docs, "text", 4, W)
    val ms = mergesOf(merges)
    assert(ms.size == 4, s"expected 4 merges, got $ms")
    val windowForm = rows(TextOps.bpeReplayWindowForm(docs, "text", ms, W))
    assert(rows(segments) == windowForm,
      "the training loop's kernel-applied segmentation diverged from the " +
        "window-rule replay of its own merge table")
    assert(rows(TextOps.bpeEncode(docs, "text", merges, W)) == windowForm,
      "bpeEncode's one-shot kernel application diverged from the " +
        "window-rule replay")
  }

  test("crafted run/overlap edges match the window rule: l = r odd-run " +
      "pairing, chained multi-char merges, overlapping l != r matches") {
    // every word over {a,b} up to length 7 catches run parity at all
    // offsets; the tables exercise l = r runs, a merged symbol as LEFT
    // and RIGHT of a later merge, and overlapping (a,b) chains
    val words = (1 to 7).flatMap(n =>
      Seq.fill(n)(Seq("a", "b")).foldLeft(Seq(Seq.empty[String]))(
        (acc, cs) => acc.flatMap(p => cs.map(p :+ _))).map(_.mkString))
    val docs = words.map(Tuple1(_)).toDF("text")
    val tables = Seq(
      Seq(("a", "a")),
      Seq(("a", "a"), ("aa", "aa")),
      Seq(("a", "b"), ("ab", "ab")),
      Seq(("b", "b"), ("a", "bb"), ("abb", "a")),
      Seq(("a", "a"), ("aa", "b"), ("aab", "aa")))
    tables.foreach { t =>
      val merges = t.zipWithIndex
        .map { case ((l, r), i) => (i + 1L, l, r, l + r, 1L) }
        .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      assert(rows(TextOps.bpeEncode(docs, "text", merges, W)) ==
        rows(TextOps.bpeReplayWindowForm(docs, "text", t, W)),
        s"kernel diverged from the window rule under table $t")
    }
  }

  test("a NULL symbol in the segmentation state fails LOUD (a silent " +
      "skip would desynchronize positions)") {
    val df = Seq(Tuple1(Seq("a", "b"))).toDF("syms")
      .select(array(col("syms").getItem(0), lit(null).cast("string"),
        col("syms").getItem(1)).as("syms"))
    val e = intercept[Exception] {
      df.select(BpeKernel.applyMerges(col("syms"), Seq(("a", "b"))))
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("NULL symbol")),
      s"wrong failure: ${chain(e)}")
  }
}
