package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Single-pass JVM kernels for the embedding-similarity tier.
  *
  * The Column forms (`aggregate(zip_with(...))` sequential folds) are
  * higher-order functions, which Spark evaluates interpreted — every cosine
  * cost three tree-walking folds per candidate pair. These kernels do the
  * identical left-fold double arithmetic (same operand order, same IEEE
  * results, so scores and ranks still hash-match the DuckDB oracles) in tight
  * JIT'd loops inside whole-stage codegen. Parity is pinned by
  * VectorKernelSpec. */
object VectorKernels {

  /** Sequential left-fold dot product — ≡ aggregate(zip_with(a, b, (x,y) =>
    * x*y), 0.0, (acc,v) => acc+v) over array<double>. zip_with null-pads on
    * length mismatch and a null product poisons the whole fold, hence the
    * boxed null returns. */
  def dotFold(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Product-quantization reconstruct: for each subspace, pick the codebook
    * centroid with the highest cosine against the vector's slice (sequential
    * fold, same operand order as dotFold; ties toward the smallest cell id —
    * iterating cells in ascending id order with a strict > keeps the first)
    * and copy it into the output — the decode-side of PQ encoding fused into
    * one pass, like Similarity.sqReconstruct. `codebooks(m)` holds subspace
    * m's surviving (cellId-ascending) centroids; all centroids of a subspace
    * share the slice width. Null elements or a width mismatch null the whole
    * reconstruction (the Column consumers treat that as a dropped row). */
  def pqReconstruct(vec: ArrayData,
                    codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    if (vec.numElements() != m * sub) return null
    val out = new Array[Double](m * sub)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var na = 0.0d
      var j = 0
      while (j < sub) {
        if (vec.isNullAt(off + j)) return null
        val v = vec.getDouble(off + j)
        na += v * v
        j += 1
      }
      val cells = codebooks(mi)
      var best = -1
      var bestCos = 0.0d
      var c = 0
      while (c < cells.length) {
        val cb = cells(c)
        var dot = 0.0d
        var nb = 0.0d
        j = 0
        while (j < sub) {
          dot += vec.getDouble(off + j) * cb(j)
          nb += cb(j) * cb(j)
          j += 1
        }
        val cos = dot / (math.sqrt(na) * math.sqrt(nb))
        if (best == -1 || cos > bestCos) { best = c; bestCos = cos }
        c += 1
      }
      System.arraycopy(cells(best), 0, out, off, sub)
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Whole hyperplane signature in one pass: bit p is set iff the sequential
    * fold of vec·plane_p is >= 0 — ≡ the per-plane
    * when(aggregate(zip_with(...)) >= 0, 1L << p) bits OR'd together. A null
    * element or length mismatch nulls that plane's fold, which the Column
    * form's `when` turns into an unset bit. */
  def hyperplaneSig(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    val n = vec.numElements()
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      if (n == plane.length) {
        var s = 0.0d
        var ok = true
        var d = 0
        while (d < n) {
          if (vec.isNullAt(d)) { ok = false; d = n }
          else { s += vec.getDouble(d) * plane(d); d += 1 }
        }
        if (ok && s >= 0) sig |= 1L << p
      }
      p += 1
    }
    sig
  }
}

/** array<double> × array<double> → double: sequential-fold dot product.
  * Callers cast float embeddings to array<double> first (exact widening). */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorKernels.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.expressions.VectorKernels.dotFold($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_fold"
}

/** array<double> → long: full random-hyperplane LSH signature in one pass.
  * The ±1 plane matrix is derived driver-side (same md5 family as the SQL
  * oracle) and rides into generated code as a referenced object. */
case class HyperplaneSigExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneSig(input.asInstanceOf[ArrayData], matrix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPlanes", matrix, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.VectorKernels.hyperplaneSig($v, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_sig"
}

/** array<double> → array<double>: per-subspace nearest-codebook-centroid
  * reconstruction — see VectorKernels.pqReconstruct. Codebooks ride into
  * generated code as a reference object like HyperplaneSigExpr's planes. */
case class PqReconstructExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "every subspace needs at least one centroid")
  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.pqReconstruct(input.asInstanceOf[ArrayData], cbs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCodebooks", cbs, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.expressions.VectorKernels.pqReconstruct($v, $ref);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): PqReconstructExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_reconstruct"
}

object VectorKernelExpressions {
  private def asDoubles(c: Column): Column = c.cast("array<double>")
  /** Column wrappers; float arrays are widened to double (exact) up front so
    * the kernels read primitives. */
  def dotFold(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotFold(
      GraftColumnBridge.expression(asDoubles(a)),
      GraftColumnBridge.expression(asDoubles(b))))
  def hyperplaneSig(vec: Column, planes: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(HyperplaneSigExpr(
      GraftColumnBridge.expression(asDoubles(vec)), planes))
  def pqReconstruct(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqReconstructExpr(
      GraftColumnBridge.expression(asDoubles(vec)), codebooks))
}
