package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy left-to-right BPE merge application as ONE native kernel — the
  * whole-operator collapse of TextOps.applyMerge's five-window chain
  * (mark → run-group → run-rank → drop-consumed → renumber) into a local
  * array walk per word (reference anchor: the reference computes
  * per-record derived values in ONE map operator,
  * chapter2/BasicStreamingOperations.java:72-79 — not a window pipeline).
  * The window form costs an in-partition sort per window PER MERGE and,
  * on the inference path (TextOps.bpeEncode), replays the whole trained
  * table as up to 4096 chained window passes; this kernel applies the
  * entire merge list in one map-only projection over the vocab-sized
  * word frame, with the merges riding as a REFERENCE OBJECT (the
  * UnigramViterbi convention) so the generated code is identical across
  * training rounds and merge tables — codegen cache hits, no recompiles,
  * no exchange, no sort.
  *
  * Bit-parity contract (BpeKernelSpec pins it against the retained
  * window-rule form): each merge (l, r) rewrites the symbol sequence
  * greedily left to right, consuming non-overlapping adjacent (l, r)
  * occurrences into l+r. For l != r marked positions can never overlap,
  * so "merge every match" agrees with the window rule's full mark set;
  * for l == r a run of k identical symbols pairs up as
  * (1,2)(3,4)… — exactly the window rule's odd-run-rank selection.
  * NULL symbols fail LOUD (the segmentation state never contains them;
  * a silent skip would desynchronize positions). */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  require(merges.nonEmpty, "BpeApplyMerges needs at least one merge")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  def compute(in: ArrayData): ArrayData = {
    val n = in.numElements()
    var cur = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = in.getUTF8String(i)
      if (u == null) throw new IllegalStateException(
        "BpeApplyMerges: NULL symbol in the segmentation state — the " +
          "initial char split never produces one; refusing to skip it")
      cur(i) = u.toString
      i += 1
    }
    var len = n
    merges.foreach { case (l, r) =>
      if (len >= 2) {
        val out = new Array[String](len)
        var w = 0
        var j = 0
        while (j < len) {
          if (j + 1 < len && cur(j) == l && cur(j + 1) == r) {
            out(w) = l + r; w += 1; j += 2
          } else {
            out(w) = cur(j); w += 1; j += 1
          }
        }
        cur = out; len = w
      }
    }
    val res = new Array[AnyRef](len)
    var k = 0
    while (k < len) { res(k) = UTF8String.fromString(cur(k)); k += 1 }
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeMerges", this,
      classOf[BpeApplyMerges].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_apply_merges"
}

object BpeKernel {
  /** Column wrapper (the Md5Expressions convention). */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeApplyMerges(
      GraftColumnBridge.expression(syms), merges))
}
