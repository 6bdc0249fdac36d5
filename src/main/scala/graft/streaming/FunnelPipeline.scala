package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{CoreOps, Dedup, LogReg, TextOps, Unigram}
import java.nio.file.{Files, Paths}

/** The curation funnel's gate artifacts and parameters, frozen at pipeline
  * construction — the way a production ingest ships calibration-corpus
  * artifacts (classifier weights, tokenizer inventory + normalizer, the
  * per-language perplexity boundary) rather than re-deriving them on the
  * stream. `cutNppByLang` maps lang → (npp, doc_id) of the LAST head/middle
  * doc: boundary membership IS tercile membership, because the kept docs
  * are a prefix of each language's total (npp, doc_id) order. */
case class FunnelConfig(weights: Array[Long], zQ: Long,
                        cutNppByLang: Map[String, (Long, Long)],
                        mhK: Int, mhBands: Int, mhRows: Int,
                        minJaccard: Double, winnowW: Int,
                        minContainment: Double, tokCap: Long,
                        uniW: Int, uniL: Int,
                        shardCount: Long, packTokens: Long)

/** The PRODUCTION form of the composed five-gate curation funnel — the
  * reference's E8 move (compose the whole chapter into one program,
  * chapter6_exercise/AnalyzeBrowserEvents.java:28) with E6/E7's durability
  * lesson applied (exactly-once sink, chapter4/EventTimeOperations.java:206;
  * restorable keyed state, chapter5/StatefulOperations.java:83-128): every
  * piece of pipeline state survives the process.
  *
  * Replaces the test-scale parity harness (StreamOps.curationFunnelStream,
  * which re-collects the corpus to the driver and re-runs exact-dedup +
  * LSH over ALL accumulated docs every trigger — O(n²) total work, with
  * stage counters in driver arrays no checkpoint restores) with
  * INCREMENTAL state, all of it durable:
  *
  *   - gate 1 (exact dedup keep-first): StateMachines.keepFirst — one
  *     boolean of GroupState per content fingerprint in the Spark state
  *     store, restored from `checkpoint/` across restarts; O(batch) work
  *     per trigger.
  *   - gate 2 (near-dup keep-first): a STANDING band index under
  *     `index/` — each trigger appends the batch's MinHash band buckets +
  *     distinct shingle-hash sets (one immutable `b=<batchId>` directory,
  *     the Delta-style state-in-the-lake pattern) and probes batch bands
  *     against the whole index: candidates only ever expand inside shared
  *     buckets (never corpus × batch), verification is the exact
  *     shingle-set Jaccard over only colliding pairs, and per-trigger work
  *     is O(batch + collisions), not O(corpus).
  *   - gates 3-5 (decontamination / trained quality / perplexity): per-row
  *     against the frozen artifacts, exactly the harness's per-batch forms.
  *   - stage accounting: ONE aggregate per trigger reshaped to six rows
  *     and written under `stages/b=<batchId>` — no driver-side counters,
  *     no collect; the six-row card is a sum over the store, so a restart
  *     loses nothing.
  *   - training export: survivors append to the shard manifest under
  *     `export/b=<batchId>` with per-shard positions CONTINUED across
  *     triggers (cumulative per-shard offsets under `offsets/`), and the
  *     physical corpus lands via CorpusLayout.writePartitioned under
  *     `corpus/b=<batchId>/shard=<s>/` — the incremental form of
  *     q_shard_manifest (within-shard order = (arrival batch, md5 key),
  *     vs the batch manifest's global md5 order; the slice-deterministic
  *     replay makes that order oracle-checkable, q_shard_manifest_stream).
  *
  * Exactly-once: foreachBatch re-runs an uncommitted batch with the SAME
  * batchId after a failure; every per-batch directory write is
  * mode("overwrite") into a batchId-named path, and the `stages/` write
  * commits the batch LAST — a batch whose stages directory exists is
  * complete and skipped verbatim on replay, so a crash between writes
  * redoes (idempotently) rather than duplicates.
  *
  * Correctness gate: the accumulated card equals q_curation_funnel's
  * batch oracle (the SAME DuckDB SQL) under an id-ascending replay, where
  * keep-first ≡ min-id canonical and the band-index probe sees exactly
  * the pairs the batch LSH all-pairs run verifies.
  */
object FunnelPipeline {

  private def committed(dir: String, bid: Long): Boolean =
    Files.exists(Paths.get(s"$dir/stages/b=$bid/_SUCCESS"))

  /** TEST-ONLY fault injection: when set, processBatch throws ONCE right
    * after the given batch id's export/offsets writes land but BEFORE the
    * stages commit marker — the worst crash window (side stores written,
    * batch uncommitted). RecoverySpec uses it to prove the replay
    * contract: foreachBatch re-runs the batch with the SAME id, every
    * per-batch directory is overwritten idempotently, and nothing
    * double-counts. Never set outside tests. */
  @volatile private[graft] var failBeforeCommitOnce: Option[Long] = None

  /** Start the composed funnel over any streaming frame with columns
    * (doc_id, lang, text). `bench` is the static decontamination
    * benchmark; `vocab` the frozen unigram inventory. All pipeline state
    * lives under `dir` (checkpoint, band index, stage/export/offset
    * stores) — restart with the same `dir` to resume. */
  def start(spark: SparkSession, stream: DataFrame, dir: String,
            bench: DataFrame, vocab: DataFrame,
            cfg: FunnelConfig): StreamingQuery = {
    require(cfg.mhBands > 0 && cfg.mhRows > 0 && cfg.mhK > 0,
      s"need positive MinHash params, got k=${cfg.mhK} bands=${cfg.mhBands} " +
        s"rows=${cfg.mhRows}")
    require(cfg.shardCount > 0 && cfg.packTokens > 0,
      s"need positive shardCount/packTokens, got ${cfg.shardCount}/" +
        s"${cfg.packTokens}")
    import spark.implicits._
    // frozen static artifacts, materialized ONCE for the query's lifetime
    val benchS = bench.localCheckpoint(true)
    val vocabS = vocab.localCheckpoint(true)
    val cuts = cfg.cutNppByLang.toSeq.map { case (l, (n, d)) => (l, n, d) }
      .toDF("lang", "_cut_npp", "_cut_id").localCheckpoint(true)
    val hashed = stream.filter(col("text").isNotNull)
      .select(TextOps.fingerprint(col("text")).as("th"),
        col("doc_id").cast("long").as("doc_id"), col("lang"), col("text"))
      .as[HashedDoc]
    StateMachines.keepFirst(hashed).toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/checkpoint")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(spark, batch, bid, dir, benchS, vocabS, cuts, cfg)
      }
      .start()
  }

  /** One trigger: index append → gate flags → stage rows → export, every
    * write an idempotent overwrite of a batchId-named directory, stages
    * last (the commit marker). */
  private def processBatch(spark: SparkSession, batch: DataFrame, bid: Long,
                           dir: String, bench: DataFrame, vocab: DataFrame,
                           cuts: DataFrame, cfg: FunnelConfig): Unit = {
    if (committed(dir, bid)) return // fully processed before a restart
    val b = batch.localCheckpoint(true)
    val n = cfg.mhBands * cfg.mhRows

    // ── the standing band index: append this batch's signatures ──
    val staged = b.filter(col("text").isNotNull)
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), cfg.mhK).as("_hs"))
      .select(col("doc_id"), array_distinct(col("_hs")).as("sh"),
        Dedup.minhashFromHashes(col("_hs"), n).as("sig"))
      .localCheckpoint(true) // feeds both index writes and the probe
    val bucketCols = (0 until cfg.mhBands).map { bnd =>
      concat(lit(s"${bnd}_"), concat_ws(",",
        (0 until cfg.mhRows).map(j =>
          col("sig")(bnd * cfg.mhRows + j).cast("string")): _*))
    }
    val banded = staged.select(col("doc_id"),
      explode(array(bucketCols: _*)).as("bucket"))
    banded.write.mode("overwrite").parquet(s"$dir/index/bands/b=$bid")
    staged.select(col("doc_id"), col("sh"))
      .write.mode("overwrite").parquet(s"$dir/index/grams/b=$bid")

    // ── gate flags over the ingested slice ──
    val s0 = b.filter(col("text").isNotNull)
      .withColumn("_nt",
        size(TextOps.tokens(lower(col("text")))).cast("long"))
      .filter(col("_nt") > 0L)
      .localCheckpoint(true) // gates 3-4 and the flag frame all read it
    // gate 2: probe batch bands against the WHOLE index (prior batches +
    // the b=bid directory just written, which supplies the intra-batch
    // lower-id pairs); candidates dedup BEFORE the exact-Jaccard verify
    val idxBands = spark.read.parquet(s"$dir/index/bands")
      .select(col("bucket"), col("doc_id").as("_rid"))
    val cand = banded.select(col("doc_id").as("_lid"), col("bucket"))
      .join(idxBands, Seq("bucket"))
      .filter(col("_rid") < col("_lid"))
      .select(col("_lid"), col("_rid")).distinct()
    val idxGrams = spark.read.parquet(s"$dir/index/grams")
      .select(col("doc_id").as("_rid"), col("sh").as("_sh_r"))
    val nearDrop = cand
      .join(staged.select(col("doc_id").as("_lid"), col("sh").as("_sh_l")),
        Seq("_lid"))
      .join(idxGrams, Seq("_rid"))
      .filter(Dedup.jaccardHashes(col("_sh_l"), col("_sh_r"))
        >= cfg.minJaccard)
      .select(col("_lid").as("doc_id")).distinct()
      .withColumn("_d2", lit(true))
    // gate 3: benchmark containment, per-row vs the frozen benchmark
    val cont = Dedup.contaminationPairs(s0, bench, "doc_id", "text",
        cfg.mhK, cfg.winnowW, cfg.minContainment)
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id")).distinct()
      .withColumn("_d3", lit(true))
    // gate 4: the trained classifier under frozen ppm weights, map-only
    val feats = s0
      .withColumn("_toks", TextOps.tokens(lower(col("text"))))
      .withColumn("_ntk", size(col("_toks")).cast("long"))
      .withColumn("_ndk", size(array_distinct(col("_toks"))).cast("long"))
      .withColumn("x_len", least(col("_ntk"), lit(cfg.tokCap)))
      .withColumn("x_div", expr("(_ndk * 100) div _ntk"))
    val scored = LogReg.scoreUnlabeled(feats, Seq("x_len", "x_div"),
        cfg.weights, Seq("doc_id"))
      .filter(col("pred")).select(col("doc_id"))
      .withColumn("_k4", lit(true))
    val flagged = s0
      .join(nearDrop, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .join(scored, Seq("doc_id"), "left")
      .withColumn("_s1", col("is_first")) // gate 1: the keyed state machine
      .withColumn("_s2", col("_s1") && col("_d2").isNull)
      .withColumn("_s3", col("_s2") && col("_d3").isNull)
      .withColumn("_s4", col("_s3") && coalesce(col("_k4"), lit(false)))
      .localCheckpoint(true) // feeds the ppl gate, the agg, the export
    // gate 5: exact µnat NLL under the frozen inventory, Viterbi over the
    // SURVIVORS' OWN words (identical membership, far less DP)
    val cand5 = flagged.filter(col("_s4"))
      .select(col("doc_id"), col("lang"), col("text"))
    val seg = Unigram.viterbi(Unigram.words(cand5, "text", cfg.uniW),
        vocab, cfg.zQ, cfg.uniW, cfg.uniL)
      .select(col("word"), col("n_pieces"), col("best_qll"))
    val pplKeep = cand5.select(col("doc_id"), col("lang"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          w => w =!= "" && length(w) <= cfg.uniW)).as("word"))
      .groupBy(col("doc_id"), col("lang"), col("word"))
      .agg(count(lit(1)).as("_n"))
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("(-sum(_n * best_qll)) div sum(_n * n_pieces)").as("_npp"))
      .join(broadcast(cuts), Seq("lang"), "left")
      .filter(col("_cut_npp").isNotNull &&
        (col("_npp") < col("_cut_npp") ||
          (col("_npp") === col("_cut_npp") &&
            col("doc_id") <= col("_cut_id"))))
      .select(col("doc_id")).withColumn("_k5", lit(true))
    val withPpl = flagged.join(pplKeep, Seq("doc_id"), "left")
      .withColumn("_s5", col("_s4") && coalesce(col("_k5"), lit(false)))
      .localCheckpoint(true) // the stage agg AND the export read it

    // ── training export: positions continued across triggers ──
    val surv = withPpl.filter(col("_s5"))
      .select(col("doc_id"), col("_nt")) // the manifest needs nothing else
      .withColumn("_ok", graft.expressions.Md5Expressions.md5Long(
        col("doc_id").cast("string")))
      .withColumn("shard", col("_ok") % cfg.shardCount)
      .withColumn("_one", lit(1L))
    val ranked = CoreOps.orderedPrefixSumsKeyed(surv, col("shard"),
        col("_ok"), "doc_id", Seq("_one" -> "_bpos", "_nt" -> "_btok"))
      .localCheckpoint(true) // manifest and the new offsets both read it
    val offSchema = "shard BIGINT, n_docs BIGINT, n_tokens BIGINT"
    val prevOff =
      if (Files.exists(Paths.get(s"$dir/offsets/b=${bid - 1}")))
        spark.read.parquet(s"$dir/offsets/b=${bid - 1}")
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(offSchema))
    val manifest = ranked
      .join(prevOff.select(col("shard"), col("n_docs").as("_pd"),
        col("n_tokens").as("_pt")), Seq("shard"), "left")
      .withColumn("pos", coalesce(col("_pd"), lit(0L)) + col("_bpos"))
      .withColumn("_excl",
        coalesce(col("_pt"), lit(0L)) + col("_btok") - col("_nt"))
      .select(col("doc_id"), col("shard"), col("pos"),
        col("_nt").as("n_tokens"),
        expr(s"_excl div ${cfg.packTokens}").as("pack_first"),
        expr(s"(_excl + _nt - 1) div ${cfg.packTokens}").as("pack_last"),
        expr(s"_excl % ${cfg.packTokens}").as("offset_in_pack"))
      .localCheckpoint(true) // export write + physical corpus write
    manifest.write.mode("overwrite").parquet(s"$dir/export/b=$bid")
    // the physical corpus: hive shard directories, in-shard position order
    graft.sources.CorpusLayout.writePartitioned(
      withPpl.filter(col("_s5"))
        .select(col("doc_id"), col("lang"), col("text"),
          col("_nt").as("n_tokens"))
        .join(manifest.select(col("doc_id"), col("shard"), col("pos")),
          Seq("doc_id")),
      s"$dir/corpus/b=$bid", Seq("shard"), Seq("pos"))
    val bt = ranked.groupBy(col("shard"))
      .agg(count(lit(1)).as("_bd"), sum(col("_nt")).as("_bt"))
    prevOff.join(bt, Seq("shard"), "full_outer")
      .select(col("shard"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("_bd"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)) + coalesce(col("_bt"), lit(0L)))
          .as("n_tokens"))
      .write.mode("overwrite").parquet(s"$dir/offsets/b=$bid")

    failBeforeCommitOnce.filter(_ == bid).foreach { _ =>
      failBeforeCommitOnce = None
      throw new IllegalStateException(
        s"injected crash before the stages commit of batch $bid (test hook)")
    }

    // ── stage accounting: ONE aggregate, reshaped relationally (no
    // driver-side counters, no collect), written LAST = the commit ──
    val flags = Seq(lit(true), col("_s1"), col("_s2"), col("_s3"),
      col("_s4"), col("_s5"))
    val aggs = flags.zipWithIndex.flatMap { case (f, i) =>
      Seq(count(when(f, lit(1))).as(s"_c$i"),
        sum(when(f, col("_nt"))).as(s"_t$i"))
    }
    val stacked = stageNames.zipWithIndex.map { case (nm, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(nm).as("stage"),
        col(s"_c$i").as("n_docs"), col(s"_t$i").as("n_tokens"))
    }
    withPpl.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stacked: _*)).as("_s")).select(col("_s.*"))
      .write.mode("overwrite").parquet(s"$dir/stages/b=$bid")
  }

  private val stageNames = Seq("ingested", "exact_dedup", "near_dedup",
    "decontaminated", "quality_kept", "ppl_head")

  /** OFFLINE maintenance for the standing band index: fold the
    * per-trigger `b=<id>` delta directories of `index/bands` and
    * `index/grams` into ONE consolidated snapshot (kept under the highest
    * committed batch id, so the probe's read path never changes). The
    * per-trigger appends are exactly the small-files failure
    * CorpusLayout's scaladoc warns about — after N triggers every probe
    * lists and opens N delta directories; compaction restores O(1).
    * Contract: run while the pipeline is STOPPED (any offline compaction's
    * contract). Crash-safe by semantics, not by atomicity: duplicate
    * index rows are harmless (the probe dedups candidate pairs and the
    * verified drop set), so a crash between the consolidated write and
    * the delta deletes only leaves redundant rows — re-running heals.
    * The snapshot materializes eagerly BEFORE any directory is touched
    * (it reads the very directories it replaces). */
  def compactIndex(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    Seq("bands", "grams").foreach { store =>
      val root = Paths.get(s"$dir/index/$store")
      if (Files.exists(root)) {
        val listing = Files.list(root)
        val deltas = try listing.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("b="))
          .map(_.getFileName.toString.stripPrefix("b=").toLong)
          .toList finally listing.close()
        if (deltas.size > 1) {
          val maxBid = deltas.max
          val snap = spark.read.parquet(root.toString).drop("b")
            .repartition(math.max(
              spark.sessionState.conf.numShufflePartitions / 4, 1))
            .localCheckpoint(true) // materialize before touching dirs
          snap.write.mode("overwrite").parquet(s"$root/b=$maxBid")
          deltas.filter(_ != maxBid).foreach { bid =>
            val victim = root.resolve(s"b=$bid")
            val walk = Files.walk(victim)
            try walk.iterator().asScala.toList.reverse
              .foreach(Files.deleteIfExists(_))
            finally walk.close()
          }
        }
      }
    }
  }

  /** The six-row data card accumulated across every committed trigger —
    * a sum over the durable stage store, so it reads the same after a
    * crash/restart as after an uninterrupted run. Empty stages carry
    * NULL token mass (SQL sum-over-nothing), matching the batch oracle. */
  def stageCard(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/stages")
      .groupBy(col("stage_idx"), col("stage"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))

  /** The accumulated incremental training-export manifest — one row per
    * surviving doc with its shard, within-shard position (continued
    * across triggers), and packed-sequence coordinates. */
  def exportManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/export")
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        col("pack_first"), col("pack_last"), col("offset_in_pack"))

  /** Drive the funnel from the FILE-MONITOR source over a deterministic
    * id-ascending slicing of a static corpus — the reference's actual
    * ingest shape (a continuously monitored directory,
    * chapter2/BasicStreamingOperations.java:56-62), and the replay that
    * makes the card and the incremental manifest oracle-checkable:
    * slice k holds doc_ids in [lo + k·span, lo + (k+1)·span) with
    * span = (hi − lo) div numBatches + 1, each slice lands as ONE file
    * written AFTER the previous slice drained, so batch k = slice k
    * exactly. No data moves through the driver — the slices are
    * filter+write jobs; the only driver traffic is the O(1) id-bounds
    * aggregate. Returns the pipeline directory (read the results via
    * stageCard / exportManifest). */
  def runSliced(spark: SparkSession, docs: DataFrame, bench: DataFrame,
                vocab: DataFrame, cfg: FunnelConfig, numBatches: Int,
                dir: String): String = {
    require(numBatches >= 1, s"need numBatches >= 1, got $numBatches")
    val in = s"$dir/in"
    Files.createDirectories(Paths.get(in))
    val src = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("lang"), col("text"))
    // driver-bounded: O(1) — the two id bounds defining the slices
    val bounds = src.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val q = start(spark,
      spark.readStream.schema(src.schema).parquet(in), dir, bench, vocab,
      cfg)
    try {
      if (bounds.isNullAt(0)) { // empty corpus: one empty slice file
        src.limit(0).coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      } else {
        val lo = bounds.getLong(0)
        val span = (bounds.getLong(1) - lo) / numBatches + 1
        (0 until numBatches).foreach { k =>
          src.filter(col("doc_id") >= lo + k * span &&
              col("doc_id") < lo + (k + 1) * span)
            .coalesce(1).write.mode("append").parquet(in)
          q.processAllAvailable() // drain slice k before slice k+1 lands
        }
      }
    } finally q.stop()
    dir
  }
}
