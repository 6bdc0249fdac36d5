package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev sanity check: Spark must read every driver parquet table (incl. the
  * ns-precision events.ts and the list<float> embeddings column). */
object ReadCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"$t rows=${df.count()} schema=${df.schema.simpleString}")
    }
    spark.stop()
  }
}
