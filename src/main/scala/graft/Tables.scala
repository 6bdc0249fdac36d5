package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * Every loader takes the scale-factor directory so the same query code
  * runs at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, on a
  * real cluster, at any path. Parquet + explicit column pruning at the
  * call-sites keeps the scan minimal (Catalyst pushes projections and
  * filters into the vectorized parquet reader).
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** events.parquet's `ts` physical type has varied across driver data
    * generations — parquet TIMESTAMP(NANOS) (which Spark's reader rejects by
    * default, [PARQUET_TYPE_ILLEGAL]; read via the documented nanosAsLong
    * escape hatch), TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark 4
    * infers as TIMESTAMP_NTZ), or a plain UTC timestamp. All three are
    * normalized here to ONE millisecond-precision TimestampType column so
    * every downstream window/session/lag computation is bit-identical to the
    * DuckDB oracle's epoch_ms(ts) regardless of which writer produced the
    * file, removing sub-ms boundary flakes. The NTZ cast maps wall-clock to
    * instant through the session time zone, which every entry point (and
    * SparkSpec) pins to UTC — the same naive-as-UTC reading DuckDB applies. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos since epoch
        raw.withColumn("ts", timestamp_millis(expr("ts div 1000000")))
      case TimestampNTZType => // naive micros; session TZ is pinned UTC
        raw.withColumn("ts",
          timestamp_millis(unix_millis(col("ts").cast(TimestampType))))
      case _ =>        // already an instant; truncate to ms for determinism
        raw.withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
    }
  }
}
