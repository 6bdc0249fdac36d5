package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import scala.util.Try

/** Kafka source/sink configuration (chapter3/WindowOperations.java:46-69;
  * chapter4/EventTimeOperations.java:183-220), kept behind a capability check:
  * the option plumbing is pure and unit-testable, while `source`/`sink`
  * require the spark-sql-kafka connector on the classpath and a broker.
  *
  * Delivery-semantics delta (documented, accepted — SURVEY §7.3): the
  * reference's producer uses Semantic.EXACTLY_ONCE (transactional,
  * chapter4/EventTimeOperations.java:206); Spark's Kafka sink is
  * at-least-once (checkpointed offsets + possible replay on retry) —
  * deduplicate downstream on a message key when exactness matters.
  */
case class KafkaSourceConfig(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "latest", // ≙ consumer.setStartFromLatest() (:66)
    groupId: Option[String] = None,
    extra: Map[String, String] = Map.empty)

case class KafkaSinkConfig(
    bootstrapServers: String,
    topic: String,
    extra: Map[String, String] = Map.empty)

object KafkaIO {

  /** True when the spark-sql-kafka connector is on the classpath. */
  def connectorAvailable: Boolean =
    Try(Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  /** The full option map the reader is configured with — pure, testable. */
  def sourceOptions(c: KafkaSourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> c.topic,
      "startingOffsets" -> c.startingOffsets) ++
      c.groupId.map("kafka.group.id" -> _) ++ c.extra

  def sinkOptions(c: KafkaSinkConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "topic" -> c.topic) ++ c.extra

  /** Streaming source: topic records with value decoded to string, ready for
    * ReferenceData.parseAuditLines (the reference's SimpleStringSchema path).
    * Fails fast with a clear message when the connector is absent. */
  def source(spark: SparkSession, c: KafkaSourceConfig): DataFrame = {
    require(connectorAvailable,
      "spark-sql-kafka connector not on classpath; KafkaIO.source unavailable")
    spark.readStream.format("kafka").options(sourceOptions(c)).load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "timestamp")
  }

  /** Streaming sink writer (unstarted — caller sets checkpoint and starts).
    * Input must have a string/binary `value` column (and optional `key`). */
  def sink(df: DataFrame, c: KafkaSinkConfig): DataStreamWriter[Row] = {
    require(connectorAvailable,
      "spark-sql-kafka connector not on classpath; KafkaIO.sink unavailable")
    df.writeStream.format("kafka").options(sinkOptions(c))
  }
}
