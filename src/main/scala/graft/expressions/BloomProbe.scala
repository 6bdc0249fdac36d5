package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** int64 → boolean membership probe against a driver-built Bloom filter.
  *
  * The filter is built once on the small side (`df.stat.bloomFilter`) and
  * rides into generated code as a referenced object, exactly like
  * HyperplaneSigExpr's plane matrix — the probe runs inside whole-stage
  * codegen with no UDF wrapper, no serialization per batch, and no string
  * round trip. `BloomFilterImpl` is `java.io.Serializable`, so the
  * expression ships to executors with the task closure like any literal.
  *
  * Contract: no false negatives (a `false` is definitive), false positives
  * at the filter's configured fpp — callers MUST exact-verify the `true`
  * side (CoreOps.bloomSemiJoin / bloomAntiJoin do). NULL input → NULL out,
  * like every scalar expression; join-shaped callers coalesce to the
  * semantics their join form needs. */
case class BloomProbeExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainLong($v)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_probe"
}

object BloomProbeExpressions {
  /** Column wrapper; integral keys are widened to long (exact). */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(BloomProbeExpr(
      GraftColumnBridge.expression(key.cast("long")), bloom))
}
