package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical layout for a curated corpus at rest — the write side of a
  * 100 TB pipeline, where the layout decisions (partition directories,
  * in-file sort order, file sizing) are what make every DOWNSTREAM read
  * cheap: hive-style `partitionBy` directories give readers partition
  * pruning for free (a `lang = 'en'` scan never opens the other
  * directories), and sorting within files gives parquet tight min/max
  * column statistics, so predicate pushdown skips row groups even inside a
  * partition.
  *
  * Beyond the reference surface (its file sink is an unpartitioned CSV
  * stream, `chapter2/BasicStreamingOperations.java:105-115`); this is the
  * batch layout a training corpus needs.
  */
object CorpusLayout {

  /** Write `df` as hive-partitioned parquet: one directory tree level per
    * partition column, rows sorted by `sortCols` within each file.
    *
    * The `repartition(partitionCols)` ahead of the write is load-bearing:
    * without it every input task writes a file into EVERY partition
    * directory it sees rows for — tasks × partitions small files, the
    * classic 100 TB layout failure. With it, one shuffle co-locates each
    * partition's rows, so each directory gets files from one task.
    * `maxRecordsPerFile` (0 = unlimited) then bounds file size from above —
    * at scale, set it so files land in the 100 MB–1 GB band the parquet
    * reader likes. Skew note: one dominant partition value serializes into
    * one task; list the skewed column FIRST in `sortCols` instead and salt
    * the repartition if a single directory outweighs the rest. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       sortCols: Seq[String], maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(maxRecordsPerFile >= 0L,
      s"maxRecordsPerFile must be >= 0, got $maxRecordsPerFile")
    val laid = df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    val writer = laid.write.mode("overwrite").partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0L)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .parquet(path)
  }
}
