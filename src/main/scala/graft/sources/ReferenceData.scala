package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two CSV event formats (quoted, positional), as first-class
  * sources in both batch and streaming mode.
  *
  * AuditTrail — chapter2/AuditTrail.java:5-30: strip quotes, split on comma,
  * positional casts to (id, user, entity, operation, timestamp, duration,
  * count). Sample: `"0","Harry","SalesRep","Modify","1712637005879","5","3"`.
  *
  * BrowserEvent — chapter6_exercise/AnalyzeBrowserEvents.java:60-77: same
  * hand parse to (id, user, action, timestamp); the id column is dropped at
  * :72-75.
  *
  * Spark's CSV reader handles the quoting natively, so the batch and
  * file-stream forms need no custom parse at all; `parseAuditLines` /
  * `parseBrowserLines` cover the Kafka path where each record arrives as one
  * string value (chapter3/WindowOperations.java:72-77).
  */
object ReferenceData {

  val auditSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("user", StringType),
    StructField("entity", StringType),
    StructField("operation", StringType),
    StructField("timestamp", LongType), // epoch millis
    StructField("duration", IntegerType),
    StructField("count", IntegerType)))

  val browserSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("user", StringType),
    StructField("action", StringType),
    StructField("timestamp", LongType)))

  // ── batch readers ─────────────────────────────────────────────────────────

  def auditFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(auditSchema).csv(dir)

  def browserFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(browserSchema).csv(dir)

  // ── streaming readers (file-monitor source) ───────────────────────────────

  /** Continuous directory monitor ≙ `readFile(..., PROCESS_CONTINUOUSLY, 1000)`
    * (chapter2/BasicStreamingOperations.java:56-62). Structured Streaming's
    * file source lists the directory each micro-batch; `maxFilesPerTrigger`
    * bounds per-batch intake the way the reference's 1s poll cadence did. */
  def auditFileStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(auditSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).csv(dir)

  def browserFileStream(spark: SparkSession, dir: String,
                        maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(browserSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).csv(dir)

  // ── string-record parsers (Kafka value path) ──────────────────────────────

  /** One quoted-CSV line per row in `valueCol` → typed audit columns. */
  def parseAuditLines(lines: DataFrame, valueCol: String): DataFrame =
    lines.withColumn("_r", from_csv(col(valueCol), auditSchema, Map.empty[String, String]))
      .select(col("_r.*"))

  /** One quoted-CSV line per row → browser tuple; drops the id column like
    * chapter6_exercise/AnalyzeBrowserEvents.java:72-75. */
  def parseBrowserLines(lines: DataFrame, valueCol: String): DataFrame =
    lines.withColumn("_r", from_csv(col(valueCol), browserSchema, Map.empty[String, String]))
      .select(col("_r.user"), col("_r.action"), col("_r.timestamp"))

  /** Event-time column from the record's own epoch-millis timestamp
    * (chapter4/EventTimeOperations.java:93-99). */
  def withEventTime(df: DataFrame, tsMillisCol: String = "timestamp"): DataFrame =
    df.withColumn("event_time", timestamp_millis(col(tsMillisCol)))
}
