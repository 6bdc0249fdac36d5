package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity relational + window operators, re-expressed Spark-first.
  *
  * Every operator is a pure `DataFrame => DataFrame` transformation built from
  * Column expressions only (no UDFs) so Catalyst can push filters/projections
  * into the parquet scan, choose broadcast vs shuffle joins, and keep the whole
  * pipeline inside whole-stage codegen. The same functions run on batch
  * (`spark.read`) and streaming (`spark.readStream`) inputs.
  *
  * Reference semantics (file:line into /root/reference/):
  *  - keyed running reduce: chapter2/KeyedStreamOperations.java:76-78
  *  - global tumbling count: chapter2/BasicStreamingOperations.java:84-91,
  *    common/MapCountPrinter.java:12-34
  *  - sliding count/min/max: chapter3/WindowOperations.java:85-100
  *  - keyed (user,action) window count: chapter6_exercise/AnalyzeBrowserEvents.java:83-96
  *  - windowed stream-stream equi-join (cartesian per key+window):
  *    chapter3/WindowJoin.java:119-158
  *  - predicate split via side output: chapter2/StreamSplitAndMerge.java:68-102
  *  - connect/CoMap tagged merge: chapter2/StreamSplitAndMerge.java:120-153
  */
object CoreOps {

  /** Exact money/measure sums: accumulate in DECIMAL so the result is
    * order-independent and identical on any engine, then return DOUBLE.
    * Double summation order varies with partitioning at scale; decimal makes
    * the aggregate deterministic under any degree of parallelism. */
  def exactSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** exactSum for *computed* double expressions (e.g. price * (1-discount)).
    * Cast-to-decimal rounding of a computed double can land exactly on a
    * representable .xx5 boundary, where engines disagree (HALF_UP vs
    * HALF_EVEN). floor() of an identical IEEE double is identical everywhere,
    * so truncate to cents first, then sum exactly. */
  def exactSumFloor(c: Column): Column =
    (sum(floor(c * 100).cast("decimal(28,0)")).cast("double") / 100).cast("double")

  /** Epoch milliseconds of a timestamp column (truncating, like DuckDB epoch_ms). */
  def ms(c: Column): Column = unix_millis(c)

  /** Deterministic range bucket over a long column, bounds from an O(1)
    * aggregate (no sampling, so re-execution is stable). NULLs map to bucket
    * 0 to match Window.orderBy's NULLS FIRST, so bucketed prefix-scan twins
    * order exactly like their single-window forms. None when the input has
    * no non-null values. Shared by runningSumSalted and
    * StatefulTwins.withLateFlag. */
  private[operators] def timeRangeBucket(df: DataFrame, longCol: Column,
                                         n: Int): Option[Column] = {
    val bounds = df.agg(min(longCol).as("lo"), max(longCol).as("hi")).head()
    if (bounds.isNullAt(0)) None
    else {
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val width = math.max((hi - lo) / n + 1, 1L)
      Some(when(longCol.isNull, lit(0))
        .otherwise(least(floor((longCol - lit(lo)) / lit(width)), lit(n - 1)))
        .cast("int"))
    }
  }

  // ─── §2.5 aggregations ────────────────────────────────────────────────────

  /** Keyed total: Flink `keyBy(user).reduce(sum)` collapsed to its final value
    * per key (chapter2/KeyedStreamOperations.java:76-78). Partial aggregation
    * (map-side combine) + single hash shuffle on the key — the same exchange
    * Flink's keyBy performs. */
  def keyedSum(df: DataFrame, key: String, value: String, out: String): DataFrame =
    df.groupBy(col(key)).agg(exactSum(col(value)).as(out))

  /** Per-event running total — the faithful twin of Flink's keyed reduce,
    * which emits one output per input. Window function with a deterministic
    * (ts, tiebreak) ordering; state is one partial sum per key, linear scan
    * per partition after a single shuffle+sort on the key. */
  def runningSum(df: DataFrame, key: String, ts: String, tiebreak: String,
                 value: String, out: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(col(value).cast("decimal(18,2)")).over(w).cast("double"))
  }

  /** Skew-hardened runningSum: the same per-event running total, but a hot
    * key no longer serializes into one task. Rows are bucketed by time range
    * (bounds from an O(1) aggregate, deterministic); each (key, bucket) runs
    * its local prefix sum in parallel, and per-bucket offsets are combined by
    * a second window over the tiny (key, bucket) totals — O(keys × buckets)
    * rows, never the data. Identical output to runningSum (decimal partials,
    * exact adds). Costs one extra shuffle + join: use when a key-frequency
    * profile shows real skew, the plain form otherwise (see SCALE.md). */
  def runningSumSalted(df: DataFrame, key: String, ts: String, tiebreak: String,
                       value: String, out: String, numBuckets: Int = 0): DataFrame = {
    val n = if (numBuckets > 0) numBuckets
      else math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // bucket is a function of ts alone, so equal-ts rows share a bucket and
    // the (ts, tiebreak) order is preserved across bucket boundaries
    val bucket = timeRangeBucket(df, ms(col(ts)), n)
      .getOrElse(return runningSum(df, key, ts, tiebreak, value, out))
    val b = df.withColumn("_b", bucket)
    val dec = col(value).cast("decimal(18,2)")
    val wLocal = Window.partitionBy(col(key), col("_b"))
      .orderBy(col(ts), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrefix = Window.partitionBy(col(key)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col(key), col("_b")).agg(sum(dec).as("_t"))
      .withColumn("_off", sum(col("_t")).over(wPrefix))
      .select(col(key), col("_b"), col("_off"))
    b.withColumn("_local", sum(dec).over(wLocal))
      .join(offsets, Seq(key, "_b"))
      // NULL-prefix rows (every value so far in this bucket NULL) must fall
      // back to the earlier-bucket total, exactly like the single-window
      // form's sum-ignores-NULLs; off+NULL would wrongly null them out
      .withColumn(out,
        when(col("_local").isNull, col("_off"))
          .otherwise(coalesce(col("_off"), lit(0).cast("decimal(18,2)")) + col("_local"))
          .cast("double"))
      .select(df.columns.map(col) :+ col(out): _*)
  }

  /** Exact per-group quantile profile (continuous/interpolated, the classic
    * latency-percentile report). Spark's `percentile` is an exact aggregate
    * whose per-partition value maps merge map-side — one shuffle of
    * O(groups × distinct values), not a global sort. Both Spark and the SQL
    * oracle interpolate at rank (n-1)·p over the sorted values; outputs are
    * floor-truncated to 6 decimals so the interpolated doubles hash-match
    * across engines. For 100 TB telemetry where distinct-value maps get
    * large, swap in approx_percentile (fixed-size sketch) the same way
    * dedupProfileApprox twins dedupProfile. */
  def quantileProfile(df: DataFrame, group: String, value: String,
                      ps: Seq[Double]): DataFrame = {
    val qs = ps.map { p =>
      (floor(percentile(col(value), lit(p)) * 1e6) / 1e6)
        .as(s"p${math.round(p * 100)}")
    }
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n"), qs: _*)
  }

  /** The 100 TB twin of quantileProfile: approx_percentile's fixed-size
    * KLL-style sketch merges map-side, so only O(groups) sketches cross the
    * shuffle regardless of distinct-value count — the same exact-vs-sketch
    * pairing as dedupProfile/dedupProfileApprox. Rank error is bounded by
    * n/accuracy; estimates are engine-specific, so the registered query is
    * rows-only checked and the error bound is pinned by a spec against the
    * exact profile. */
  def quantileProfileApprox(df: DataFrame, group: String, value: String,
                            ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val qs = ps.map { p =>
      approx_percentile(col(value), lit(p), lit(accuracy))
        .as(s"p${math.round(p * 100)}_approx")
    }
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n"), qs: _*)
  }

  /** Hot-key profile: exact per-key counts, top N by frequency with a
    * deterministic key tiebreak. Compiles to partial agg + one exchange +
    * TakeOrderedAndProject — each partition keeps only its local top N, so
    * no global sort materializes. This is the profiling step that decides
    * whether a skewed key warrants the salted running-sum variant's extra
    * shuffle (SCALE.md "Skew hardening"). */
  def keyProfile(df: DataFrame, key: String, topN: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col(key))
      .limit(topN)

  /** Global tumbling-window count (chapter2/BasicStreamingOperations.java:84-91).
    * Flink's `timeWindowAll` is key-less; in Spark we just group by the window
    * column alone — which still parallelizes (hash on window bucket) instead of
    * Flink's forced parallelism-1 all-window. */
  def tumblingCount(df: DataFrame, ts: String, duration: String): DataFrame =
    df.groupBy(window(col(ts), duration))
      .agg(count(lit(1)).as("cnt"), min(ms(col(ts))).as("min_ms"), max(ms(col(ts))).as("max_ms"))
      .select(ms(col("window.start")).as("window_start_ms"),
        col("cnt"), col("min_ms"), col("max_ms"))

  /** Sliding-window count+min+max (chapter3/WindowOperations.java:85-100):
    * 10s window / 5s slide in the reference; size and slide are parameters.
    * Spark's window() replicates each row into size/slide buckets before the
    * hash aggregate — same cost model as Flink's sliding pane assignment. */
  def slidingSummary(df: DataFrame, ts: String, size: String, slide: String): DataFrame =
    df.groupBy(window(col(ts), size, slide))
      .agg(count(lit(1)).as("cnt"), min(ms(col(ts))).as("min_ms"), max(ms(col(ts))).as("max_ms"))
      .select(ms(col("window.start")).as("window_start_ms"),
        col("cnt"), col("min_ms"), col("max_ms"))

  /** Keyed tumbling-window count by composite key
    * (chapter6_exercise/AnalyzeBrowserEvents.java:83-96: keyBy(user, action)). */
  def keyedWindowCount(df: DataFrame, keys: Seq[String], ts: String, duration: String): DataFrame =
    df.groupBy(keys.map(col) :+ window(col(ts), duration): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(keys.map(col) :+ ms(col("window.start")).as("window_start_ms") :+ col("cnt"): _*)

  /** Session-window summary keyed by `key` with inactivity gap
    * (chapter3/WindowOperations.java:124-138; semantics
    * chapter3/About Windowing.md:15-19): a session closes when the key sees no
    * event for `gap`. Uses Spark's native session_window (state-store merge of
    * overlapping sessions in streaming; sort-based merge in batch). Output
    * reports min/max event time rather than the [start, last+gap) window struct
    * so results are engine-convention independent. */
  def sessionSummary(df: DataFrame, key: String, ts: String, gap: String): DataFrame =
    df.groupBy(col(key), session_window(col(ts), gap))
      .agg(count(lit(1)).as("cnt"), min(ms(col(ts))).as("min_ms"), max(ms(col(ts))).as("max_ms"))
      .select(col(key), col("min_ms").as("session_start_ms"), col("cnt"), col("max_ms"))

  // ─── §2.6 join ────────────────────────────────────────────────────────────

  /** Windowed stream-stream equi-join (chapter3/WindowJoin.java:119-158).
    * Within a (key, window) bucket the output is the cartesian product of the
    * matching rows from each side (comment at :142-145) — exactly an inner
    * equi-join on (key, window_bucket). Spark picks SMJ/shuffled-hash/broadcast
    * physically; both sides shuffle once on (key, window). */
  def windowJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                 duration: String): DataFrame = {
    val l = left.select(col(key).as("k"), window(col(ts), duration)("start").as("w"),
      col("event_id").as("left_id"))
    val r = right.select(col(key).as("k"), window(col(ts), duration)("start").as("w"),
      col("event_id").as("right_id"))
    l.join(r, Seq("k", "w"), "inner")
      .select(col("k").as(key), ms(col("w")).as("window_start_ms"),
        col("left_id"), col("right_id"))
  }

  /** As-of join: attach to each left row the LATEST right row with
    * right.`ts` <= left.`ts` for the same key (inclusive) — the
    * event-to-slowly-changing-metadata join every training pipeline needs
    * and Spark has no native operator for. Scalable encoding: tag + union
    * both sides, then per-key last-non-null carry-forward over one
    * (ts, side) sort — ONE shuffle on the key, never a per-row range probe
    * or an O(|L|·|R|) bucket product, so it scales exactly like runningSum.
    * Right rows sort before left rows at equal ts, giving the inclusive
    * bound. Left rows with no prior right row keep NULL payloads (left-join
    * semantics).
    *
    * `right` must be unique per (key, ts) — pre-aggregate otherwise — or the
    * tie chosen among equal-ts right rows is nondeterministic. Both inputs
    * must share the `key` and `ts` column names; `rightCols` are the payload
    * columns carried from `right` (alias right's own ts into the payload to
    * know WHICH row matched). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val lNorm = left.select(
      col(key) +: col(ts) +: lit(1).as("_side") +:
        (leftCols.map(col) ++
          rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rNorm = right.select(
      col(key) +: col(ts) +: lit(0).as("_side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightCols.map(col)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lNorm.unionByName(rNorm)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }

  // ─── §2.7 / §2.8 split & merge ────────────────────────────────────────────

  /** Predicate split (chapter2/StreamSplitAndMerge.java:68-102). Spark has no
    * side outputs; idiomatic form is two filters over one (cached/shared)
    * source — Catalyst reuses the scan, and in streaming the two branches can
    * run as two queries over the same source or one foreachBatch fan-out.
    * NULL predicates route to the "rest" side (the reference's else-branch
    * catches everything non-matching): plain !pred would drop them, since
    * both pred and !pred evaluate to NULL. */
  def splitBy(df: DataFrame, pred: Column): (DataFrame, DataFrame) =
    (df.filter(pred), df.filter(coalesce(!pred, lit(true))))

  /** Tagged union — Flink connect + CoMapFunction to a common shape
    * (chapter2/StreamSplitAndMerge.java:120-153). Each side is projected to the
    * common schema with a stream tag, then vertically merged. Union is a
    * zero-shuffle operator in Spark (plan concatenation). */
  def taggedUnion(a: DataFrame, tagA: String, b: DataFrame, tagB: String,
                  cols: Seq[String]): DataFrame = {
    def shape(df: DataFrame, tag: String) =
      df.select(lit(tag).as("stream") +: cols.map(col): _*)
    shape(a, tagA).unionByName(shape(b, tagB))
  }
}
