package graft

import graft.sources.CorpusLayout
import org.apache.spark.sql.functions._

/** The partitioned-parquet layout writer: directory pruning, in-file sort,
  * lossless round trip. */
class CorpusLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned: hive dirs, sorted files, lossless readback") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_layout").toString
    try {
      CorpusLayout.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))

      // hive-style partition directories exist per lang value
      val langs = docs.select("lang").distinct().as[String].collect().toSet
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("lang=")).map(_.stripPrefix("lang=")).toSet
      assert(dirs == langs, s"expected dirs for $langs, got $dirs")

      // lossless round trip (lang comes back from the directory key)
      val back = spark.read.parquet(out)
      assert(back.count() == docs.count())
      val origRows = docs.select("doc_id", "lang", "source").as[(Long, String, String)]
        .collect().toSet
      val backRows = back.select("doc_id", "lang", "source").as[(Long, String, String)]
        .collect().toSet
      assert(backRows == origRows)

      // a partition-pruned read only touches its own directory: the scan of
      // lang=en must list no file outside lang=en/
      val pruned = spark.read.parquet(out).filter(col("lang") === "en")
      val files = pruned.select(input_file_name()).distinct().as[String].collect()
      assert(files.nonEmpty && files.forall(_.contains("lang=en")),
        s"pruning leaked: ${files.toSeq}")

      // rows inside each file are sorted by doc_id (tight parquet min/max)
      val perFile = spark.read.parquet(out)
        .select(input_file_name().as("f"), col("doc_id"))
        .as[(String, Long)].collect().groupBy(_._1).values
      perFile.foreach { rows =>
        val ids = rows.map(_._2).toSeq
        assert(ids == ids.sorted, "file not sorted by doc_id")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
