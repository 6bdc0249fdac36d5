package graft.tools

import graft.sources.ReferenceData
import graft.streaming.{StateMachines, StreamOps, StreamSinks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** End-to-end streaming demo ≙ the reference's E1 + E8 pipelines: feed the
  * reference's own CSV records through the file-monitor source one file at a
  * time (like datasource/FileStreamDataGenerator.java), run the windowed
  * count and the stateful session analysis continuously, print each
  * micro-batch. Usage: runMain graft.tools.StreamDemo [srcDir]. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0)
      else "src/test/resources/fixtures/raw_browser_events"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val watched = Files.createTempDirectory("graft_stream_demo")
    val stream = ReferenceData.browserFileStream(spark, watched.toString, 1)

    // E1 shape: global tumbling count on event time (the record's own ts),
    // with a per-batch record-count observer (the MapCountPrinter twin)
    val counts = StreamOps.eventTimeTumblingCount(
      StreamSinks.observed(ReferenceData.withEventTime(stream), "ingested"),
      "event_time", "2 seconds", "3 seconds")
    val q1 = counts.writeStream.outputMode("update").format("console")
      .option("truncate", false).start()

    // E8 shape: per-user action durations via keyed state
    val durations = StateMachines.actionDurations(
      StateMachines.keyedEvents(stream, col("user"), col("timestamp"),
        col("id"), col("action")), "Login", "Logout")
    val q2 = StreamSinks.console(durations.toDF())

    // replay the fixture files into the watched dir like the generator
    // thread — in numeric index order (Files.list has no ordering guarantee,
    // and cross-batch arrival order affects the state machines' output)
    val listing = Files.list(Paths.get(srcDir))
    val files = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.filter(_.toString.endsWith(".csv")).toSeq
        .sortBy(p => p.getFileName.toString.replaceAll("[^0-9]", "").toLong)
    } finally listing.close()
    // drain after EVERY file: copies in one burst share an mtime, and the
    // file source then orders them lexicographically (10 before 2), which
    // would reintroduce out-of-order arrival the generator never produced
    var n = 0
    files.foreach { f =>
      Files.copy(f, watched.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING)
      n += 1
      q1.processAllAvailable(); q2.processAllAvailable()
    }
    q1.processAllAvailable(); q2.processAllAvailable()
    val observed = q1.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("graft_ingested")).map(_.getLong(0))).sum
    println(s"[demo] streamed $n files from $srcDir through 2 continuous queries" +
      s" (observer counted $observed ingested records)")
    q1.stop(); q2.stop(); spark.stop()
  }
}
