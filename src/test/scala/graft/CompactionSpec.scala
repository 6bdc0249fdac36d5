package graft

import graft.streaming.{FunnelConfig, FunnelPipeline}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** compactStores' crash-safety contract, window by window: the stage
  * store's consolidated base swaps in behind atomic directory renames
  * with an `_UPTO` watermark, and `stageCard` must read a complete,
  * duplicate-free card at EVERY intermediate state a crash can leave
  * behind — base missing mid-swap (falls back to `stages_base_old`),
  * stale old beside a live base (prefers base), an interrupted fold's
  * tmp lying around (invisible), and folded deltas not yet deleted
  * (filtered by the watermark, not double-counted). A subsequent
  * compactStores invocation must HEAL each state back to the clean
  * layout without changing the card. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def runFunnel(): (String, Seq[(Long, String, Long, Option[Long])]) = {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again"),
      (2L, "en", "completely different words here body text"),
      (3L, "en", "another unrelated document body entirely fresh"),
      (4L, "en", "a fourth standalone body of words entirely its own"))
      .toDF("doc_id", "lang", "text")
    val vocab = ('a' to 'z').map(c => (c.toString, 1L)).toDF("piece", "cnt")
    val cfg = FunnelConfig(Array(0L, 0L, 0L),
      graft.operators.Unigram.zOf(vocab),
      Map("en" -> ((Long.MaxValue, Long.MaxValue))),
      3, 8, 2, 0.5, 4, 0.05, 127L, 12, 4, 8L, 512L,
      compactEvery = 0) // keep every delta; this suite folds by hand
    val dir = Files.createTempDirectory("graft_cmp").toString
    FunnelPipeline.runSliced(spark, docs,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 0),
      vocab, cfg, 4, dir)
    (dir, card(dir))
  }

  private def card(dir: String): Seq[(Long, String, Long, Option[Long])] =
    FunnelPipeline.stageCard(spark, dir)
      .as[(Long, String, Long, Option[Long])].collect().toSeq.sortBy(_._1)

  private def copyTree(src: String, dst: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Paths.get(src); val d = Paths.get(dst)
    val walk = Files.walk(s)
    try walk.iterator().asScala.toList.foreach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  test("every compactStores crash window reads the same card, and the " +
      "next invocation heals the layout") {
    val (dir, base) = runFunnel()
    assert(base.map(_._3) == Seq(4L, 4L, 4L, 4L, 4L, 4L), s"got $base")

    // window 1: fold crashed after writing stages_base_tmp (unswapped) —
    // the tmp is invisible to the reader and healed away
    Files.createDirectories(Paths.get(s"$dir/stages_base_tmp"))
    Files.writeString(Paths.get(s"$dir/stages_base_tmp/_UPTO"), "99")
    assert(card(dir) == base, "unswapped tmp leaked into the card")
    FunnelPipeline.compactStores(spark, dir, 4L) // heals + folds {0..3}
    assert(!Files.exists(Paths.get(s"$dir/stages_base_tmp")))
    assert(Files.exists(Paths.get(s"$dir/stages_base/_UPTO")))
    assert(card(dir) == base, "fold changed the card")

    // window 2: crash between the two renames — base moved aside, new
    // base not yet in place: the reader falls back to stages_base_old
    Files.move(Paths.get(s"$dir/stages_base"),
      Paths.get(s"$dir/stages_base_old"), StandardCopyOption.ATOMIC_MOVE)
    assert(card(dir) == base, "mid-swap state lost the consolidated rows")
    FunnelPipeline.compactStores(spark, dir, 4L) // heal: old moves back
    assert(Files.exists(Paths.get(s"$dir/stages_base")) &&
      !Files.exists(Paths.get(s"$dir/stages_base_old")))
    assert(card(dir) == base)

    // window 3: crash after the second rename, before the deletes — a
    // stale old copy AND a folded delta both still on disk: the reader
    // prefers the live base and the watermark filters the delta, so
    // nothing double-counts; heal removes both
    copyTree(s"$dir/stages_base", s"$dir/stages_base_old")
    val upTo = Files.readString(
      Paths.get(s"$dir/stages_base/_UPTO")).trim.toLong
    // resurrect a "folded but not yet deleted" delta AT the watermark —
    // the base's own rows re-materialized as stages/b=<upTo> (schema-
    // matching stage rows whose double-count would be unmissable)
    copyTree(s"$dir/stages_base", s"$dir/stages/b=$upTo")
    Files.deleteIfExists(Paths.get(s"$dir/stages/b=$upTo/_UPTO"))
    assert(card(dir) == base, "stale old/folded delta double-counted")
    FunnelPipeline.compactStores(spark, dir, 4L)
    assert(!Files.exists(Paths.get(s"$dir/stages_base_old")))
    assert(!Files.exists(Paths.get(s"$dir/stages/b=$upTo")),
      "heal left a folded delta behind")
    assert(card(dir) == base)
  }

  test("bandKeepFirst fails LOUD past maxBucket — a hot bucket cannot " +
      "silently go quadratic") {
    import graft.streaming.{BandProbe, StateMachines}
    // 4 docs whose shingle sets are IDENTICAL → same buckets, 4 members
    val probes = (1L to 4L).map(i =>
      BandProbe("0_42", i, "en", "same text", is_first = i == 1L,
        carrier = true, Array(7L, 8L, 9L))).toDS()
    val e = intercept[Exception] {
      StateMachines.bandKeepFirst(probes, 0.5, maxBucket = 3)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("maxBucket") &&
      m.contains("0_42")), s"wrong failure: ${chain(e)}")
  }
}
