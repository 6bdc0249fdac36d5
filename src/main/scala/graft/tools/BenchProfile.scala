package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement aid (guide §1): per bench entry, wall seconds plus the
  * Spark-side job/stage/task counts and summed task time, so a slow entry
  * can be attributed to "many small jobs" (fixed per-action overhead:
  * driver rounds, codegen, scheduling) vs "few heavy stages" (real
  * compute/shuffle). Mirrors Bench's environment exactly (same master,
  * shuffle partitions, memoized-build-first ordering) but runs ONE pass
  * and never records; purely a diagnosis tool.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   sbt "runMain graft.tools.BenchProfile [entry,entry,...]"
  * With no args, profiles every build then every query.
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = args.headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          if (m.shuffleWriteMetrics != null)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0); shufW.set(0) }
    def report(name: String, wallS: Double): Unit = {
      // listener bus is async; give it a beat to drain before reading
      Thread.sleep(150)
      println(f"PROF $name%-38s wall=$wallS%7.2fs jobs=${jobs.get}%4d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%6d " +
        f"taskTime=${taskMs.get / 1000.0}%8.1fs shufW=${shufW.get / 1024}%8dKB")
    }
    def timed(name: String)(body: => Unit): Unit = {
      reset()
      val t0 = System.nanoTime()
      body
      report(name, (System.nanoTime() - t0) / 1e9)
    }
    graft.SparkEntry.jvmWarmup(spark) // mirror Bench: untimed startup absorb
    reset()
    graft.SparkEntry.builds
      .filter { case (n, _) => only.forall(_.contains(s"_build:$n")) }
      .foreach { case (name, fn) =>
        timed(s"_build:$name")(fn(spark, sfDir)) }
    graft.SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        timed(name)(
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()) }
    spark.stop()
  }
}
