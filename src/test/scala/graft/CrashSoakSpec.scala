package graft

import graft.streaming._
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Randomized (SEEDED — deterministic, never flaky) crash soak for the
  * production funnel: RecoverySpec walks single crash windows and
  * CompactionSpec walks each compaction window in isolation; this
  * composes them — a 24-trigger ingest with worst-window crashes
  * (`failBeforeCommitOnce`: side stores written, stages commit marker
  * not) injected at seeded batch ids INCLUDING compaction batches, plus
  * one simulated mid-compaction kill (a stale `stages_base_tmp` left on
  * disk, the unswapped-tmp window heal() must roll back). The soak
  * passes iff the final card, the export manifest, and the per-shard
  * position density all equal an uninterrupted run over the same
  * slices. */
class CrashSoakSpec extends SparkSpec {
  import spark.implicits._

  test("funnel crash soak: 24 seeded triggers, worst-window crashes at 5 " +
      "seeded batches (2 on compaction batches) + one mid-compaction " +
      "kill — card, export, and positions equal the uninterrupted run") {
    val rng = new scala.util.Random(42)
    val nSlices = 24
    val docsPerSlice = 10
    // ~20% of docs duplicate or near-duplicate an EARLIER doc, so the
    // dedup state machines matter across every crash and restart
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    val slices: Seq[Seq[(Long, String, String)]] =
      (0 until nSlices).map { k =>
        (0 until docsPerSlice).map { j =>
          val id = (k * docsPerSlice + j + 1).toLong
          val roll = rng.nextDouble()
          val text =
            if (roll < 0.1 && texts.nonEmpty)
              texts(rng.nextInt(texts.length)) // exact dup of history
            else if (roll < 0.2 && texts.nonEmpty)
              texts(rng.nextInt(texts.length)) + " extra tail" // near-dup
            else (1 to 8).map(w => s"s${id}w$w").mkString(" ")
          texts += text
          (id, "en", text)
        }
      }
    // 5 crash batches: 2 forced onto compaction batch ids (compactEvery=4)
    // and 3 seeded elsewhere — worst-window each time
    val crashAt: Set[Long] = Set(8L, 16L) ++
      rng.shuffle((1 until nSlices).filterNot(_ % 4 == 0).toList)
        .take(3).map(_.toLong)
    val vocab = ('a' to 'z').map(c => (c.toString, 1L)).toDF("piece", "cnt")
    val cfg = FunnelConfig(Array(0L, 0L, 0L),
      graft.operators.Unigram.zOf(vocab),
      Map("en" -> ((Long.MaxValue, Long.MaxValue))),
      3, 8, 2, 0.5, 4, 0.05, 127L, 12, 4, 8L, 512L,
      compactEvery = 4)
    val bench = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    val schema = slices.head.toDF("doc_id", "lang", "text").schema
    def addFile(dir: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "lang", "text").coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    def card(dir: String): Seq[(Long, String, Long, Option[Long])] =
      FunnelPipeline.stageCard(spark, dir)
        .as[(Long, String, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    def manifest(dir: String): Set[(Long, Long, Long)] =
      FunnelPipeline.exportManifest(spark, dir)
        .select(col("doc_id"), col("shard"), col("pos"))
        .as[(Long, Long, Long)].collect().toSet

    val dir = Files.createTempDirectory("graft_soak").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    def freshQuery() = FunnelPipeline.start(spark,
      spark.readStream.schema(schema).parquet(s"$dir/in"), dir, bench,
      vocab, cfg)
    var q = freshQuery()
    try {
      slices.zipWithIndex.foreach { case (slice, k) =>
        addFile(dir, slice)
        if (crashAt(k.toLong)) {
          FunnelPipeline.failBeforeCommitOnce = Some(k.toLong)
          val failed = intercept[Exception] { q.processAllAvailable() }
          def chain(t: Throwable): Seq[String] =
            Iterator.iterate(failed: Throwable)(_.getCause)
              .takeWhile(_ != null)
              .map(e => Option(e.getMessage).getOrElse("")).toSeq
          assert(chain(failed).exists(_.contains("injected crash")),
            s"batch $k failed for the wrong reason: ${chain(failed)}")
          FunnelPipeline.failBeforeCommitOnce = None
          q.stop() // the failed generation is dead
          if (k == 16) {
            // mid-compaction kill: the swap died after materializing the
            // new base under _tmp but BEFORE the rename — next
            // compaction's heal() must roll the orphan back
            val base = Paths.get(s"$dir/stages_base")
            if (Files.exists(base)) {
              val tmp = Paths.get(s"$dir/stages_base_tmp")
              Files.createDirectories(tmp)
              Files.list(base).forEach(p => Files.copy(p,
                tmp.resolve(p.getFileName)))
            }
          }
          q = freshQuery() // restart: foreachBatch replays batch k
          q.processAllAvailable()
        } else q.processAllAvailable()
      }
    } finally { FunnelPipeline.failBeforeCommitOnce = None; q.stop() }
    assert(!Files.exists(Paths.get(s"$dir/stages_base_tmp")),
      "heal() never rolled back the mid-compaction orphan")

    // the uninterrupted twin over the SAME slice arrivals
    val straight = Files.createTempDirectory("graft_soak2").toString
    Files.createDirectories(Paths.get(s"$straight/in"))
    val q2 = FunnelPipeline.start(spark,
      spark.readStream.schema(schema).parquet(s"$straight/in"), straight,
      bench, vocab, cfg)
    try slices.foreach { s => addFile(straight, s); q2.processAllAvailable() }
    finally q2.stop()

    assert(card(dir) == card(straight),
      s"soaked card diverged:\n${card(dir)}\nvs\n${card(straight)}")
    assert(card(dir).head._3 == (nSlices * docsPerSlice).toLong,
      s"ingested != every doc exactly once: ${card(dir).head}")
    assert(manifest(dir) == manifest(straight), "export manifest diverged")
    // positions stayed dense per shard through every crash + compaction
    val perShard = FunnelPipeline.exportManifest(spark, dir)
      .groupBy(col("shard"))
      .agg(org.apache.spark.sql.functions.max(col("pos")).as("mx"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(perShard.forall(r => r._2 == r._3),
      s"positions not dense per shard: ${perShard.toSeq}")
  }
}
