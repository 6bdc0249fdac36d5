package graft

import graft.streaming.{StreamObs, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** The streaming observability frame: metric names/types pinned across a
  * real MemoryStream run of a watermarked stateful query — throughput,
  * state size, and the late-drop counter all surface where a dashboard
  * can query them. */
class StreamObsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("progressFrame: pinned schema; input rows, state rows, watermark " +
      "and the late-drop counter all surface across micro-batches") {
    val input = MemoryStream[(Long, Timestamp)]
    val counts = StreamOps.eventTimeTumblingCount(
      input.toDS().toDF("event_id", "event_time"),
      "event_time", "10 seconds", "10 seconds")
    val q = counts.writeStream.outputMode("update").format("memory")
      .queryName("obs_probe").start()
    try {
      // batch 1: establish event time far ahead → watermark advances
      input.addData(Seq((1L, new Timestamp(100000L)),
        (2L, new Timestamp(101000L)), (3L, new Timestamp(200000L))))
      q.processAllAvailable()
      // batch 2: one fresh row + one row far behind the watermark
      // (200s − 10s lateness = 190s; 5s is long gone) → dropped
      input.addData(Seq((4L, new Timestamp(201000L)),
        (5L, new Timestamp(5000L))))
      q.processAllAvailable()

      val frame = StreamObs.progressFrame(spark, Seq("tumbling" -> q))
      // the dashboard contract: these names and types, exactly
      val want = Seq(
        "query_name" -> StringType, "batch_id" -> LongType,
        "trigger_ts" -> StringType, "input_rows" -> LongType,
        "input_rows_per_sec" -> DoubleType,
        "processed_rows_per_sec" -> DoubleType,
        "batch_duration_ms" -> LongType, "state_rows" -> LongType,
        "state_rows_updated" -> LongType,
        "rows_dropped_by_watermark" -> LongType,
        "watermark" -> StringType)
      assert(frame.schema.map(f => f.name -> f.dataType) === want)

      val rows = frame.collect()
      assert(rows.nonEmpty && rows.forall(_.getString(0) == "tumbling"))
      // all 5 fed rows were seen as input across batches
      val inputTotal = frame.agg(sum(col("input_rows"))).head().getLong(0)
      assert(inputTotal === 5L)
      // windowed agg holds state
      assert(frame.agg(max(col("state_rows"))).head().getLong(0) >= 1L)
      // the late row was dropped BY THE WATERMARK and the counter saw it
      val dropped = frame.agg(sum(col("rows_dropped_by_watermark")))
        .head().getLong(0)
      assert(dropped >= 1L, s"expected a watermark drop, frame:\n" +
        frame.collect().mkString("\n"))
      // the watermark string surfaces once it advances
      assert(frame.filter(col("watermark").isNotNull
        && col("watermark") =!= "1970-01-01T00:00:00.000Z").count() >= 1L)
      // multi-query form unions under distinct names
      val two = StreamObs.progressFrame(spark,
        Seq("a" -> q, "b" -> q))
      assert(two.select("query_name").distinct().count() === 2L)
    } finally q.stop()
  }
}
