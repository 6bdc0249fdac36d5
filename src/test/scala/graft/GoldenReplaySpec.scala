package graft

import graft.sources.ReferenceData
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Replay the reference's own committed sample data (the CSVs under
  * data/raw_audit_trail and data/raw_browser_events, copied into test
  * fixtures) and assert timing-independent aggregates. Expectations are
  * computed by an INDEPENDENT parse (the reference's own strip-quotes/split
  * algorithm, chapter2/AuditTrail.java:17-19) in plain Scala. */
class GoldenReplaySpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def rawLines(dir: String): Seq[Array[String]] =
    Files.list(Paths.get(dir)).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".csv"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(_.nonEmpty)
      .map(_.replace("\"", "").split(",")) // the reference's own parse

  test("audit-trail replay: counts by (user, entity, operation) match a hand parse") {
    val dir = fixture("raw_audit_trail")
    val expected = rawLines(dir)
      .groupBy(f => (f(1), f(2), f(3))).view.mapValues(_.size.toLong).toMap
    val got = ReferenceData.auditFiles(spark, dir)
      .groupBy("user", "entity", "operation").count()
      .as[(String, String, String, Long)].collect()
      .map { case (u, e, o, c) => (u, e, o) -> c }.toMap
    assert(got == expected)
    assert(got.values.sum == 30) // 30 one-record files in the reference
  }

  test("audit-trail replay: duration/count sums and timestamp range survive the parse") {
    val dir = fixture("raw_audit_trail")
    val lines = rawLines(dir)
    val got = ReferenceData.auditFiles(spark, dir)
      .agg(sum("duration"), sum("count"), min("timestamp"), max("timestamp"))
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((lines.map(_(5).toLong).sum, lines.map(_(6).toLong).sum,
      lines.map(_(4).toLong).min, lines.map(_(4).toLong).max)))
  }

  test("browser-events replay via the Kafka-string parser drops id and keeps (user, action)") {
    val dir = fixture("raw_browser_events")
    val expected = rawLines(dir)
      .groupBy(f => (f(1), f(2))).view.mapValues(_.size.toLong).toMap
    // feed the raw lines through the string-record parser (the Kafka path)
    val lines = spark.read.text(dir).toDF("value")
    val parsed = ReferenceData.parseBrowserLines(lines, "value")
    assert(parsed.columns.toSeq == Seq("user", "action", "timestamp"))
    val got = parsed.groupBy("user", "action").count()
      .as[(String, String, Long)].collect()
      .map { case (u, a, c) => (u, a) -> c }.toMap
    assert(got == expected)
  }

  test("malformed records parse to nulls instead of crashing (delta vs the reference)") {
    // the reference's positional Integer.valueOf parse throws on bad input
    // (chapter2/AuditTrail.java:22-28); the engine's csv/from_csv path yields
    // null fields so one poison record cannot kill a continuous pipeline
    val lines = Seq(
      "\"0\",\"Tom\",\"Customer\",\"Create\",\"1000\",\"1\",\"1\"", // well-formed
      "\"not-a-number\",\"Bob\",\"Customer\",\"Query\",\"2000\",\"x\",\"1\"", // bad casts
      "garbage without quotes or enough fields").toDF("value")
    val parsed = ReferenceData.parseAuditLines(lines, "value")
    assert(parsed.count() == 3) // every line yields a row...
    assert(parsed.filter(col("id").isNotNull).count() == 1) // ...bad ids are null
    assert(parsed.filter(col("user") === "Bob").count() == 1) // salvageable fields kept
  }

  test("stateful session analysis over the reference's browser data (E8 end-to-end)") {
    val dir = fixture("raw_browser_events")
    val df = ReferenceData.browserFiles(spark, dir)
    val ke = graft.streaming.StateMachines.keyedEvents(df,
      col("user"), col("timestamp"), col("id"), col("action"))
    val durations = graft.streaming.StateMachines.actionDurations(ke, "Login", "Logout")
    // structural invariants of the reference pipeline: durations are positive,
    // only non-Logout actions appear as emitted spans, users ⊆ generator domain
    val rows = durations.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.duration_ms >= 0))
    assert(rows.map(_.key).toSet.subsetOf(Set("Tom", "Harry", "Bob")))
    assert(!rows.map(_.action).contains("Logout"))
  }
}
