package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM Viterbi segmentation DP as ONE native kernel — the
  * whole-operator collapse of Unigram.viterbiColumnAlgebra's
  * explode → broadcast-join → ~W·L-column pivot aggregate → W-level
  * best/backtrace projection chain (reference anchor: the reference
  * computes per-record derived values in ONE map operator,
  * chapter2/BasicStreamingOperations.java:72-79 — not a join pipeline).
  * The Column form costs a SHUFFLE (the pivot groupBy) plus a generated
  * class that recompiles whenever any literal moves; this kernel is a
  * map-only projection over the word frame with the piece inventory
  * riding as a REFERENCE OBJECT (the BootstrapWeights convention), so
  * the generated code is identical across EM rounds and vocab changes —
  * codegen cache hits, no recompiles, no exchange.
  *
  * Bit-parity contract (UnigramKernelSpec pins it against the retained
  * Column-algebra form on real corpus words): `scores` maps piece →
  * qlog(cnt+1) − Z in µnats, computed by the SAME InfoTheory.qlog
  * expression the Column form used; an unknown SINGLE character scores
  * `unkCharScore` (= 0 − Z, the coverage guarantee); unknown multi-char
  * pieces are unusable; best_i = max over piece lengths, ties on the
  * backtrace prefer the SHORTEST last piece (the Column form's ascending
  * coalesce); pieces return in word order. Words longer than
  * `maxWordLen` fail LOUD — the Column DP has no slot for them and every
  * caller filters first; silence here would segment a truncation. */
case class UnigramViterbi(child: Expression, scores: Map[String, Long],
                          unkCharScore: Long, maxWordLen: Int,
                          maxPieceLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxWordLen >= 1 && maxWordLen <= 16,
    s"maxWordLen must be in [1,16], got $maxWordLen")
  require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
    s"maxPieceLen must be in [1,$maxWordLen], got $maxPieceLen")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("best_qll", LongType, nullable = false)))

  @transient private lazy val idx: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](scores.size * 2)
    scores.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  def compute(w: UTF8String): InternalRow = {
    val word = w.toString
    val n = word.length
    if (n > maxWordLen) throw new IllegalStateException(
      s"UnigramViterbi: word '$word' is longer than maxWordLen=" +
        s"$maxWordLen — filter words first (the Column DP has no slot " +
        "for it either; segmenting a truncation would be silent loss)")
    val best = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var b = Long.MinValue
      var pick = 0
      val lm = math.min(maxPieceLen, i)
      var l = 1
      while (l <= lm) {
        val piece = word.substring(i - l, i)
        val sc = idx.get(piece)
        val usable = sc != null || l == 1
        if (usable) {
          val s = if (sc != null) sc.longValue else unkCharScore
          val cand = best(i - l) + s
          if (cand > b) { b = cand; pick = l } // ties keep the smaller l
        }
        l += 1
      }
      best(i) = b
      bl(i) = pick
      i += 1
    }
    var c = n
    var np = 0
    val rev = new Array[UTF8String](n)
    while (c > 0) {
      val l = bl(c)
      rev(np) = UTF8String.fromString(word.substring(c - l, c))
      np += 1
      c -= l
    }
    val pieces = new Array[AnyRef](np)
    var k = 0
    while (k < np) { pieces(k) = rev(np - 1 - k); k += 1 }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.update(0, new GenericArrayData(pieces))
    row.setLong(1, best(n))
    row
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftUniViterbi", this,
      classOf[UnigramViterbi].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
  override def prettyName: String = "graft_unigram_viterbi"
}

object UnigramKernel {
  /** Column wrapper (the Md5Expressions convention). */
  def viterbi(word: Column, scores: Map[String, Long], unkCharScore: Long,
              maxWordLen: Int, maxPieceLen: Int): Column =
    GraftColumnBridge.column(UnigramViterbi(
      GraftColumnBridge.expression(word), scores, unkCharScore,
      maxWordLen, maxPieceLen))
}
