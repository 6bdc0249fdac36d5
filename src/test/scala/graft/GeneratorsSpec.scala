package graft

import graft.sources.{Generators, ReferenceData}
import java.nio.file.Files

class GeneratorsSpec extends SparkSpec {
  import spark.implicits._

  test("audit generator is seed-deterministic and round-trips through the reader") {
    val d1 = Files.createTempDirectory("gen_a1").toString
    val d2 = Files.createTempDirectory("gen_a2").toString
    Generators.writeAuditFiles(d1, 30, seed = 42)
    Generators.writeAuditFiles(d2, 30, seed = 42)
    val a = ReferenceData.auditFiles(spark, d1).orderBy("id")
    val b = ReferenceData.auditFiles(spark, d2).orderBy("id")
    assert(a.collect().toSeq == b.collect().toSeq) // same seed → identical data
    assert(a.count() == 30)
    val users = a.select("user").distinct().as[String].collect().toSet
    assert(users.subsetOf(Set("Tom", "Harry", "Bob")))
    val ops = a.select("operation").distinct().as[String].collect().toSet
    assert(ops.subsetOf(Set("Create", "Modify", "Query", "Delete")))
  }

  test("different seeds generate different data") {
    val d1 = Files.createTempDirectory("gen_b1").toString
    val d2 = Files.createTempDirectory("gen_b2").toString
    Generators.writeBrowserFiles(d1, 20, seed = 1)
    Generators.writeBrowserFiles(d2, 20, seed = 2)
    val a = ReferenceData.browserFiles(spark, d1).orderBy("id").collect().toSeq
    val b = ReferenceData.browserFiles(spark, d2).orderBy("id").collect().toSeq
    assert(a != b)
  }

  test("rate-source audit stream emits schema-true records from the generator domains") {
    val q = Generators.auditRateStream(spark, rowsPerBatch = 5)
      .writeStream.outputMode("append").format("memory").queryName("rate_audit").start()
    try {
      // a rate source never exhausts, so processAllAvailable would spin
      // forever — poll until at least one batch has landed
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("rate_audit").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("rate_audit")
      assert(rows.count() >= 5)
      assert(rows.columns.toSeq ==
        Seq("id", "user", "entity", "operation", "timestamp", "duration", "count"))
      import org.apache.spark.sql.functions.col
      assert(rows.filter(!col("user").isin("Tom", "Harry", "Bob")).count() == 0)
      assert(rows.filter(col("duration") < 1 || col("duration") > 10).count() == 0)
    } finally q.stop()
  }

  test("kafka-value records parse through the string-record path") {
    val values = Generators.auditKafkaValues(20, seed = 7)
    val parsed = ReferenceData.parseAuditLines(
      values.map(_._2).toDF("value"), "value")
    assert(parsed.count() == 20)
    assert(parsed.columns.toSeq ==
      Seq("id", "user", "entity", "operation", "timestamp", "duration", "count"))
    assert(parsed.filter(parsed("user").isNull).count() == 0)
  }
}
