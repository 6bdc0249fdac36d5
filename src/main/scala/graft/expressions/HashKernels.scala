package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Single-pass JVM kernels for the MinHash / SimHash tier.
  *
  * The Column-expression forms of these loops (`transform`/`aggregate`
  * higher-order functions) evaluate in Spark's interpreted expression walker —
  * no whole-stage codegen, no fusion — and dominated the round-2 bench
  * (q_minhash_pairs + q_jaccard_pairs = 55% of total). Each kernel below does
  * the identical arithmetic in one tight JIT'd loop and participates in
  * whole-stage codegen through `doGenCode`. Bit-compatibility with the Column
  * forms (and therefore with the DuckDB oracles) is pinned by HashKernelSpec.
  *
  * All four are pure per-row functions: they keep every dedup pipeline a
  * codegen'd map stage followed by exactly one shuffle, which is what makes
  * the design hold at 100 TB — the change here is per-row CPU cost only.
  */
object HashKernels {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** md5 of bytes [from, until) → first 4 digest bytes as unsigned int,
    * ≡ Md5Hash.first32 of the corresponding substring. */
  private def md5First32(bytes: Array[Byte], from: Int, until: Int): Long = {
    val d = digests.get(); d.reset()
    d.update(bytes, from, until - from)
    val dig = d.digest()
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  /** md5 of bytes [from, until) → first 15 hex digits (60 bits),
    * ≡ Md5Hash.first60 of the corresponding substring. */
  private def md5First60(bytes: Array[Byte], from: Int, until: Int): Long = {
    val d = digests.get(); d.reset()
    d.update(bytes, from, until - from)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }

  /** md5Int of every word k-shingle of an (already normalized) string —
    * ≡ transform(Dedup.shingles(norm, k), s => md5Int(s)).
    *
    * `split(norm, " ")` splits on single spaces, so consecutive tokens in the
    * source buffer are separated by exactly one 0x20 byte, and the k-token
    * shingle "tok_i … tok_{i+k-1}" joined with single spaces IS the contiguous
    * byte range from tok_i's start to tok_{i+k-1}'s end — each shingle hashes
    * straight off the input buffer with zero string allocation. UTF-8 is
    * self-synchronizing for ASCII, so byte-level 0x20 scanning equals
    * character-level splitting. Fewer than k tokens → one shingle = the whole
    * string (the Column form's `otherwise(array(norm))` branch). */
  def shingleHashes(norm: UTF8String, k: Int): ArrayData = {
    val bytes = norm.getBytes
    // token boundaries: starts[i] .. ends[i] (exclusive), split on single ' '
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) {
      // < k tokens (note "" splits to one empty token): single whole-string shingle
      return new GenericArrayData(Array[Long](md5First32(bytes, 0, bytes.length)))
    }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val out = new Array[Long](nTok - k + 1)
    var s = 0
    while (s <= nTok - k) {
      out(s) = md5First32(bytes, starts(s), ends(s + k - 1))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The word k-shingles of an (already normalized, single-space-separated)
    * string as STRINGS — the vocabulary-building twin of shingleHashes,
    * sharing its contiguous-byte-range trick: each shingle is a zero-copy
    * UTF8String view over the input buffer. Unlike shingleHashes (which
    * degrades to a whole-string shingle for MinHash stability), documents
    * with fewer than k tokens yield an EMPTY array — a vocabulary wants real
    * n-grams, not padded stubs. Empty input → empty array. */
  def shingleStrings(norm: UTF8String, k: Int): ArrayData = {
    val bytes = norm.getBytes
    if (bytes.length == 0) return new GenericArrayData(Array.empty[Any])
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val out = new Array[Any](nTok - k + 1)
    var s = 0
    while (s <= nTok - k) {
      out(s) = UTF8String.fromBytes(bytes, starts(s), ends(s + k - 1) - starts(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass repetition statistics over an (already normalized,
    * single-space-separated) string: token count, distinct-token count, and
    * the most frequent word k-gram with its count, ties broken toward the
    * binary-smallest gram (≡ Spark's and DuckDB's default string order).
    * Replaces an explode + two-shuffle groupBy pipeline with a per-row map:
    * one token scan, one distinct set, one gram-count map, all over
    * zero-copy views of the input buffer. Sub-k documents (and empty input)
    * report a NULL top gram with count 0. */
  def repetitionStats(norm: UTF8String, k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = norm.getBytes
    if (bytes.length == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, null, 0L))
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val distinct = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < nTok) {
      distinct.add(UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)))
      i += 1
    }
    if (nTok < k)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nTok.toLong, distinct.size.toLong, null, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var best: UTF8String = null
    var bestC = 0
    var s = 0
    while (s <= nTok - k) {
      val g = UTF8String.fromBytes(bytes, starts(s), ends(s + k - 1) - starts(s))
      val prev = counts.get(g)
      val c = if (prev == null) 1 else prev + 1
      counts.put(g, c)
      if (c > bestC || (c == bestC && g.compareTo(best) < 0)) { best = g; bestC = c }
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok.toLong, distinct.size.toLong, best, bestC.toLong))
  }

  private def isAsciiSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** md5Long of every whitespace token —
    * ≡ transform(TextOps.tokens(text), t => md5Long(t)), where tokens =
    * filter(split(trim(text), "\\s+"), _ =!= ""). Tokens are the maximal runs
    * of non-ASCII-whitespace bytes: Java's \s (no UNICODE_CHARACTER_CLASS)
    * matches exactly {space, \t, \n, \x0B, \f, \r}, all single-byte in UTF-8,
    * and the filter drops the empty fragments split() leaves at the edges. */
  def tokenHashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) { // count token runs
      if (!isAsciiSpace(bytes(i))) {
        n += 1
        while (i < bytes.length && !isAsciiSpace(bytes(i))) i += 1
      } else i += 1
    }
    val out = new Array[Long](n)
    var t = 0
    i = 0
    while (i < bytes.length) {
      if (!isAsciiSpace(bytes(i))) {
        val start = i
        while (i < bytes.length && !isAsciiSpace(bytes(i))) i += 1
        out(t) = md5First60(bytes, start, i)
        t += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: element i = min over h of (h*a_i + b_i) mod p with
    * p = 2^31-1 and (a_i, b_i) the same index-derived family as the Column
    * form — ≡ Dedup.minhashFromHashesColumnForm(hashes, n). One pass over the
    * hash array computes all n permutation minima (the Column form walked the
    * array n times through the interpreted evaluator). Overflow headroom:
    * h < 2^32 and a_i = 1117(i+1)+31, so h*a_i + b_i < 2^32 · 1148·n — inside
    * int64 for any n below ~1.6 million hash functions.
    *
    * Null elements are skipped like array_min does; an all-null or empty
    * input yields null signature slots (matching array_min's null). */
  def minhashSignature(hashes: ArrayData, n: Int): ArrayData = {
    val p = 2147483647L
    val a = new Array[Long](n)
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = 1117L * (i + 1) + 31; b(i) = 271828L * (i + 1) + 1828; i += 1 }
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val len = hashes.numElements()
    var j = 0
    while (j < len) {
      if (!hashes.isNullAt(j)) {
        any = true
        val h = hashes.getLong(j)
        i = 0
        while (i < n) {
          val v = (h * a(i) + b(i)) % p
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(new Array[Any](n)) // n nulls
    else new GenericArrayData(mins)
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken's MOSS
    * algorithm): slide a window of `w` consecutive k-gram hashes and select
    * each window's minimum; the distinct selected values (sorted ascending
    * for a canonical array form) are the document's fingerprints. Guarantees
    * any shared substring of length >= w+k-1 contributes a shared
    * fingerprint. Fewer than w hashes → the single global minimum (standard
    * short-document degeneration). Null elements are skipped. */
  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    val vals = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) { vals(m) = hashes.getLong(i); m += 1 }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m < w) {
      var mn = Long.MaxValue
      i = 0
      while (i < m) { if (vals(i) < mn) mn = vals(i); i += 1 }
      selected.add(mn)
    } else {
      var s = 0
      while (s <= m - w) { // w is small (4-16): direct scan beats a deque
        var mn = Long.MaxValue
        i = s
        while (i < s + w) { if (vals(i) < mn) mn = vals(i); i += 1 }
        selected.add(mn)
        s += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Jaccard similarity of two DISTINCT-element int64 arrays in one pass:
    * |∩| via an open-addressing probe set over the smaller side, and
    * |∪| = |a| + |b| − |∩| (exact because elements are distinct per side).
    * The Column form (Dedup.jaccardColumnForm) builds three hash sets per
    * pair — array_union twice (condition + else branch) plus
    * array_intersect — which dominates LSH/winnow verification; this does
    * one set build and one probe pass, no boxing. Both-empty → 0.0,
    * matching the Column form's when-branch. A NULL element counts as its
    * own distinct value (array_intersect/array_union semantics): it joins
    * the intersection iff both sides carry one. PRECONDITION: each array's
    * elements are distinct (array_distinct upstream) — duplicates would
    * overcount the union. */
  def jaccardDistinct(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la + lb == 0) return 0.0
    val (small, big) = if (la <= lb) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0.0
    // open-addressing long set, power-of-two capacity >= 2n, linear probing;
    // `used` marks occupied slots so value 0 needs no sentinel trickery
    var cap = 4
    while (cap < 2 * n) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var nullSmall = false
    var i = 0
    while (i < n) {
      if (small.isNullAt(i)) nullSmall = true
      else {
        val k = small.getLong(i)
        var s = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
        while (used(s) && keys(s) != k) s = (s + 1) & mask
        keys(s) = k; used(s) = true
      }
      i += 1
    }
    var inter = 0L
    val m = big.numElements()
    i = 0
    while (i < m) {
      if (big.isNullAt(i)) { if (nullSmall) inter += 1 }
      else {
        val k = big.getLong(i)
        var s = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
        while (used(s) && keys(s) != k) s = (s + 1) & mask
        if (used(s)) inter += 1
      }
      i += 1
    }
    inter.toDouble / (la + lb - inter).toDouble
  }

  /** Containment |a∩b| / |b| of two DISTINCT-element int64 arrays — the
    * decontamination metric: how much of benchmark doc `b` appears in
    * corpus doc `a`. Deliberately asymmetric (a short benchmark item buried
    * in a long document has low Jaccard but full containment). Same
    * open-addressing probe-set pass as jaccardDistinct; NULL elements count
    * as their own distinct value; |b| = 0 → 0.0 (nothing to contain). Same
    * distinct-elements precondition. */
  def containmentDistinct(a: ArrayData, b: ArrayData): Double = {
    val lb = b.numElements()
    if (lb == 0) return 0.0
    val n = a.numElements()
    if (n == 0) return 0.0
    var cap = 4
    while (cap < 2 * n) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var nullA = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullA = true
      else {
        val k = a.getLong(i)
        var s = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
        while (used(s) && keys(s) != k) s = (s + 1) & mask
        keys(s) = k; used(s) = true
      }
      i += 1
    }
    var inter = 0L
    i = 0
    while (i < lb) {
      if (b.isNullAt(i)) { if (nullA) inter += 1 }
      else {
        val k = b.getLong(i)
        var s = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
        while (used(s) && keys(s) != k) s = (s + 1) & mask
        if (used(s)) inter += 1
      }
      i += 1
    }
    inter.toDouble / lb.toDouble
  }

  /** SimHash 60-bit vote: bit j of the result is set iff the sum over
    * elements of (+1 if bit j of the hash else -1) is positive —
    * ≡ Dedup.simhashFromHashesColumnForm(hashes). A null element votes -1 on
    * every bit (the Column form's `otherwise(-1)` under a null comparison),
    * i.e. it counts in the total but never in the ones. */
  def simhashVote(hashes: ArrayData): Long = {
    val ones = new Array[Int](60)
    val len = hashes.numElements()
    var j = 0
    while (j < len) {
      if (!hashes.isNullAt(j)) {
        val h = hashes.getLong(j)
        var bit = 0
        while (bit < 60) {
          if (((h >> bit) & 1L) == 1L) ones(bit) += 1
          bit += 1
        }
      }
      j += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      // vote = ones - (len - ones) > 0  ⟺  2·ones > len
      if (2L * ones(bit) > len) out |= 1L << bit
      bit += 1
    }
    out
  }
}

/** string → array<long>: md5Int of every word k-shingle of a normalized
  * string. Replaces the interpreted transform-over-slices pipeline in
  * Dedup.shingleHashes (ref: training-data dedup tier, SURVEY §2 ext). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** string → array<string>: the word k-shingles of a normalized string as
  * zero-copy string views (empty for sub-k documents). */
case class ShingleStrings(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.shingleStrings(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.shingleStrings($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_strings"
}

/** string → array<long>: md5Long of every whitespace token. Replaces the
  * interpreted transform in Dedup.tokenHashes. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_token_hashes"
}

/** array<long> → array<long>: all n MinHash permutation minima in one pass.
  *
  * PRECONDITION: input elements must be < 2^32 (md5Int / ShingleHashes
  * output). The int64 overflow headroom of h*a_i + b_i only holds for 32-bit
  * h; feeding 60-bit TokenHashes values silently overflows into garbage
  * signatures. Stated (not masked) so misuse differs loudly from the Column
  * form rather than producing a plausible-but-wrong masked signature. */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1, "signature needs at least one hash function")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhashSignature(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashKernels.minhashSignature($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_signature"
}

/** array<long> → array<long>: winnowing fingerprint selection (sorted
  * distinct window minima) over a k-gram hash array. */
case class WinnowSelect(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, "winnowing window must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.winnow(input.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.winnow($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_select"
}

/** (array<long>, array<long>) → double: one-pass Jaccard over
  * distinct-element int64 arrays — see HashKernels.jaccardDistinct for the
  * distinct-elements precondition. */
case class JaccardDistinct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccardDistinct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.HashKernels.jaccardDistinct($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardDistinct = copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaccard_distinct"
}

/** (array<long>, array<long>) → double: one-pass containment |a∩b|/|b| over
  * distinct-element int64 arrays — see HashKernels.containmentDistinct. */
case class ContainmentDistinct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.containmentDistinct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.HashKernels.containmentDistinct($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ContainmentDistinct = copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_containment_distinct"
}

/** string → struct(n_tokens, n_distinct, top_gram, top_count): one-pass
  * per-document repetition statistics — see HashKernels.repetitionStats. */
case class RepetitionStats(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "gram size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_gram", StringType, nullable = true),
    org.apache.spark.sql.types.StructField("top_count", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.repetitionStats(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.repetitionStats($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "graft_repetition_stats"
}

/** array<long> → long: single-pass 60-bit SimHash sign vote. */
case class SimhashVote(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhashVote(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.simhashVote($c)")
  override protected def withNewChildInternal(newChild: Expression): SimhashVote =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash_vote"
}

object HashKernelExpressions {
  /** Column wrappers. Preconditions (stated here because the Column type
    * can't enforce them):
    *  - shingleHashes/shingleStrings take NORMALIZED text — trimmed, tokens
    *    separated by exactly one space (what TextOps.normalized produces);
    *    raw text with tabs or doubled spaces yields empty-token shingles
    *    that match neither the Column form nor a regexp tokenizer. Prefer
    *    the normalizing entry points Dedup.shingleHashes / TextOps.ngramVocab.
    *  - minhashSignature takes 32-bit hashes (md5Int / shingleHashes
    *    output), NOT 60-bit tokenHashes values — see MinhashSignature. */
  def shingleHashes(norm: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(norm), k))
  def shingleStrings(norm: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleStrings(GraftColumnBridge.expression(norm), k))
  def tokenHashes(text: Column): Column =
    GraftColumnBridge.column(TokenHashes(GraftColumnBridge.expression(text)))
  def minhashSignature(hashes: Column, n: Int): Column =
    GraftColumnBridge.column(MinhashSignature(GraftColumnBridge.expression(hashes), n))
  def simhashVote(hashes: Column): Column =
    GraftColumnBridge.column(SimhashVote(GraftColumnBridge.expression(hashes)))
  def repetitionStats(norm: Column, k: Int): Column =
    GraftColumnBridge.column(RepetitionStats(GraftColumnBridge.expression(norm), k))
  def winnowSelect(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowSelect(GraftColumnBridge.expression(hashes), w))
  def jaccardDistinct(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardDistinct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def containmentDistinct(a: Column, b: Column): Column =
    GraftColumnBridge.column(ContainmentDistinct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
