package graft

import graft.streaming.{KafkaIO, KafkaSinkConfig, KafkaSourceConfig}

class KafkaIOSpec extends SparkSpec {

  test("source options carry broker, topic, offsets and pass-through config") {
    val c = KafkaSourceConfig("broker1:9092,broker2:9092", "audit.in",
      startingOffsets = "earliest", groupId = Some("graft"),
      extra = Map("kafka.security.protocol" -> "SASL_PLAINTEXT"))
    val opts = KafkaIO.sourceOptions(c)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "audit.in")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("kafka.group.id") == "graft")
    assert(opts("kafka.security.protocol") == "SASL_PLAINTEXT")
  }

  test("source defaults to latest offsets like the reference consumer") {
    // ≙ consumer.setStartFromLatest(), chapter3/WindowOperations.java:66
    assert(KafkaIO.sourceOptions(KafkaSourceConfig("b:9092", "t"))("startingOffsets") == "latest")
  }

  test("sink options carry broker and topic") {
    val opts = KafkaIO.sinkOptions(KafkaSinkConfig("b:9092", "audit.out"))
    assert(opts == Map("kafka.bootstrap.servers" -> "b:9092", "topic" -> "audit.out"))
  }

  test("source/sink fail fast with a clear message when the connector is absent") {
    assume(!KafkaIO.connectorAvailable) // sandbox has no spark-sql-kafka jar
    val e = intercept[IllegalArgumentException] {
      KafkaIO.source(spark, KafkaSourceConfig("b:9092", "t"))
    }
    assert(e.getMessage.contains("connector not on classpath"))
  }
}
