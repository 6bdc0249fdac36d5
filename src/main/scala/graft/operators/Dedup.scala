package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (beyond the reference
  * surface). All hash material derives from md5 — bit-identical across
  * engines, so every stage is oracle-checkable — and every op is a
  * Column-expression pipeline: one map stage, then exactly one shuffle on the
  * dedup key (groupBy), which is the minimum any dedup can do.
  *
  * Scale notes (100 TB): exact dedup shuffles once on a 16-byte digest —
  * uniform keys, no skew. MinHash-LSH shuffles once per band on the band
  * signature; candidate pairs then join only within tiny buckets, avoiding the
  * O(n²) all-pairs comparison entirely.
  */
object Dedup {

  /** 64-bit integer hash of any string column, derived from md5 (first 15 hex
    * chars → always non-negative, < 2^60). Cross-engine reproducible, unlike
    * Spark's murmur3 `hash()` / DuckDB's `hash()`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit variant (first 8 hex chars, < 2^32). Used wherever the hash is
    * multiplied by another constant: the product stays < 2^48, so the same
    * arithmetic is exact int64 in every engine (no silent Java wraparound,
    * no DuckDB overflow error). */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Exact dedup: group by the normalized-text fingerprint, keep the smallest
    * id as the canonical representative. Output one row per distinct content
    * with its duplicate count. */
  def exactDedup(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(TextOps.fingerprint(col(text)).as("fp"), col(id))
      .groupBy(col("fp"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of the normalized text: the standard MinHash input unit. */
  def shingles(text: Column, k: Int): Column = {
    val norm = TextOps.normalized(text)
    val toks = split(norm, " ")
    // shingle starts 0..size-k (1-based slice below), size-k+1 shingles total
    val starts = sequence(lit(0), size(toks) - k)
    when(size(toks) >= k,
      transform(starts, i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(norm))
  }

  /** MinHash signature: for each of `numHashes` permutations, the minimum of
    * (a_i * h(shingle) + b_i) mod p over all shingles, where h = md5Int.
    * Returns an array<long> signature column. The permutation constants are
    * deterministic functions of the hash index, so Spark and the SQL oracle
    * generate identical families; h < 2^32 and a_i < 2^16 keep every product
    * comfortably inside int64 on any engine. */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val p = 2147483647L // 2^31 - 1 (Mersenne prime)
    val sh = shingles(text, k)
    val hashes = transform(sh, s => md5Int(s))
    val sigs = (0 until numHashes).map { i =>
      val a = 1117 * (i + 1) + 31
      val b = 271828 * (i + 1) + 1828
      array_min(transform(hashes, h => (h * a + b) % p))
    }
    array(sigs: _*)
  }

  /** MinHash-LSH near-duplicate pairs: band the signature (`numHashes` =
    * bands * rowsPerBand), bucket docs by (band index, band slice), and emit
    * candidate pairs that share a bucket, deduplicated, with their exact
    * estimated Jaccard = fraction of matching signature positions.
    *
    * Plan shape: map (signature) → explode bands (xbands rows per doc) →
    * shuffle on band key → self-join within buckets (tiny groups) → distinct
    * pairs. No all-pairs product at any point. */
  def minhashPairs(docs: DataFrame, id: String, text: String, k: Int,
                   bands: Int, rowsPerBand: Int, minJaccard: Double): DataFrame = {
    val n = bands * rowsPerBand
    val withSig = docs.select(col(id).as("doc"), minhashSignature(col(text), k, n).as("sig"))
    val banded = withSig.select(col("doc"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>").as("key")))).as("bk"))
      .select(col("doc"), col("sig"),
        concat_ws("_", col("bk.band").cast("string"),
          concat_ws(",", col("bk.key"))).as("bucket"))
    val l = banded.select(col("bucket"), col("doc").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("bucket"), col("doc").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("bucket")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / n).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minJaccard)
  }

  /** SimHash: 64-bit locality-sensitive fingerprint — bit j of the output is
    * the sign of the sum over tokens of (+1 if bit j of md5Long(token) else
    * -1). Near-dup docs differ in few bits (Hamming distance). Pure map. */
  def simhash(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => md5Long(t))
    val bits = (0 until 60).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** n-gram Jaccard similarity of two already-tokenized shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, 0.0)
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** Exact n-gram Jaccard near-dup pairs over a candidate set — candidates
    * come from LSH buckets (minhashPairs) so the exact pass touches only
    * bucket-mates, never all pairs. */
  def jaccardPairs(docs: DataFrame, id: String, text: String, k: Int,
                   candidates: DataFrame, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(id).as("d"), array_distinct(shingles(col(text), k)).as("sh"))
    candidates
      .join(sh.select(col("d").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("d").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
