package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Count-Min sketch over a string key as a typed imperative aggregate: the
  * buffer is the full d×w counter table (flattened row-major long array),
  * update increments one cell per hash row, merge is element-wise addition —
  * so the result is ORDER-INDEPENDENT (every cell is a plain sum) and
  * therefore deterministic under any partitioning, unlike most sketches.
  * Cell hashes are the engine's md5 family, `md5Int(i + ":" + key) % w`,
  * which an external SQL engine can reproduce verbatim — the reason to
  * hand-roll this instead of using Spark's built-in `count_min_sketch`,
  * whose murmur-based `util.sketch` layout no other engine can mirror (the
  * DuckDB oracle rebuilds this table cell-for-cell and hash-matches the
  * estimates).
  *
  * Estimates are `min` over the key's d cells (upper bound: never below the
  * true count, above it only by hash-collision mass ≤ εN with
  * ε = e/w at the standard sizing). The aggregate ships ONE fixed-size
  * d·w·8-byte buffer per partition regardless of row count or key
  * cardinality — the property that makes it a streaming/mergeable profile
  * where an exact groupBy would ship a row per distinct key. */
case class CmsAggregate(
    child: Expression, d: Int, w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {
  require(d >= 1 && w >= 1, s"need d >= 1 and w >= 1, got d=$d w=$w")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < d) {
        b(i * w + CmsAggregate.cell(i, key, w)) += 1
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAggregate =
    copy(child = newChild)
  override def prettyName: String = "graft_cms_table"
}

object CmsAggregate {
  /** Row-i cell of a key: md5Int("i:key") % w — mirrored verbatim by the
    * SQL oracle and by the Column-side probe (CountMinExpressions.cmsMin). */
  def cell(i: Int, key: String, w: Int): Int =
    (Md5Hash.first32(UTF8String.fromString(i + ":" + key)) % w).toInt

  /** min over the key's d cells — the estimate; shared by interpreted eval
    * and generated code. */
  def probe(tbl: org.apache.spark.sql.catalyst.util.ArrayData,
            key: UTF8String, d: Int, w: Int): Long = {
    val k = key.toString
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = tbl.getLong(i * w + cell(i, k, w))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/** (array<long> table, string key) → bigint estimate: the point probe for a
  * CmsAggregate table with the same (d, w). Native twin of the Column
  * composition (CountMinExpressions.cmsMinColumnForm — parity pinned in
  * CoreOpsSpec): one pass, d md5 calls, no element_at chain. */
case class CmsMinProbe(table: Expression, key: Expression, d: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  require(d >= 1 && w >= 1, s"need d >= 1 and w >= 1, got d=$d w=$w")
  override def left: Expression = table
  override def right: Expression = key
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any, k: Any): Any =
    CmsAggregate.probe(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      k.asInstanceOf[UTF8String], d, w)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.expressions.CmsAggregate.probe($t, $k, $d, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsMinProbe =
    copy(table = newLeft, key = newRight)
  override def prettyName: String = "graft_cms_min"
}

object CountMinExpressions {
  import org.apache.spark.sql.functions._

  /** The d×w counter table of `key`'s values as one array<long> aggregate. */
  def cmsTable(key: Column, d: Int, w: Int): Column =
    GraftColumnBridge.column(
      CmsAggregate(GraftColumnBridge.expression(key), d, w)
        .toAggregateExpression())

  /** Point estimate for `key` against a table column produced by cmsTable
    * with the same (d, w): min over the key's d cells, as one native
    * codegen'd probe. */
  def cmsMin(table: Column, key: Column, d: Int, w: Int): Column =
    GraftColumnBridge.column(CmsMinProbe(
      GraftColumnBridge.expression(table),
      GraftColumnBridge.expression(key), d, w))

  /** Interpreted Column composition of the probe — CoreOpsSpec's parity
    * oracle for CmsMinProbe (it mirrors the DuckDB oracle SQL). */
  private[graft] def cmsMinColumnForm(table: Column, key: Column,
                                      d: Int, w: Int): Column =
    (0 until d).map { i =>
      element_at(table,
        (pmod(Md5Expressions.md5Int(concat(lit(s"$i:"), key)), lit(w)) +
          lit(i * w) + lit(1)).cast("int"))
    }.reduceLeft((a, b) => least(a, b))
}
