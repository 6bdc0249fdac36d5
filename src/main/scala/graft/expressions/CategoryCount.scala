package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer
import scala.collection.mutable

/** Exact per-category counts as ONE mergeable aggregate — the buffer is a
  * category→count hash map, update increments, merge adds, eval emits the
  * entries SORTED BY CATEGORY as array<struct<cat,n>> — so the result is
  * order-independent (plain sums) and deterministic under any
  * partitioning, and a whole categorical DISTRIBUTION travels through a
  * single shuffle as one value.
  *
  * Why it exists: the two-level shape (groupBy(group, cat) then
  * groupBy(group)) that computes a distribution per group costs two
  * exchanges in batch and is ILLEGAL in streaming (one aggregation per
  * query); this aggregate collapses it to one groupBy, which is what lets
  * windowed entropy/drift run as a true streaming aggregate in update
  * mode. The buffer is bounded by the CATEGORY CARDINALITY of its group
  * (event types, languages — not rows); it is the exact-count sibling of
  * CmsAggregate, for domains small enough to not need a sketch. */
case class CategoryCountAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cat", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
                      row: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      b.update(key, b.getOrElse(key, 0L) + 1L)
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
                     o: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    o.foreach { case (k, n) => b.update(k, b.getOrElse(k, 0L) + n) }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(b.toSeq.sortBy(_._1).map { case (k, n) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), n))
    }.toArray[Any])

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = b.toSeq.map { case (k, n) =>
      (k.getBytes("UTF-8"), n)
    }
    val size = 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.foreach { case (kb, n) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = mutable.HashMap.empty[String, Long]
    val k = bb.getInt()
    var i = 0
    while (i < k) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      out.update(new String(kb, "UTF-8"), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): CategoryCountAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CategoryCountAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CategoryCountAgg =
    copy(child = c)
  override def prettyName: String = "graft_category_counts"
}

object CategoryCountExpressions {

  /** The category→count distribution of `cat`'s values as one
    * array<struct<cat,n>> aggregate, sorted by category. */
  def categoryCounts(cat: Column): Column =
    GraftColumnBridge.column(
      CategoryCountAgg(GraftColumnBridge.expression(cat))
        .toAggregateExpression())
}

/** K-minimum-values sketch as ONE mergeable aggregate — the k smallest
  * DISTINCT 32-bit hashes of the input, emitted sorted ascending as
  * array<long>. The k-minima of a union are computable from the sides'
  * k-minima, so update/merge keep exactly k longs of state and the
  * result is arrival- and partition-order independent — the algebraic
  * form of `Sketches.kmvDistinct`'s relational pipeline and
  * `StateMachines.kmvSnapshots`' keyed state, usable where those can't
  * go: a WINDOWED streaming aggregation (one aggregation per query, so
  * the distinct→row_number pipeline is illegal there). The caller feeds
  * the md5Int hash column (hashing stays outside — the aggregate is
  * generic over any 32-bit hash) and reads the estimate off the array
  * via `KmvExpressions.kmvEstimate`. Exact-count sibling relationship
  * to CmsAggregate mirrors CategoryCountAgg's: this one is for DISTINCT
  * cardinality, CMS for frequencies. */
case class KmvSketchAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {
  require(k >= 2, s"sketch size k must be >= 2, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def insert(b: mutable.TreeSet[Long], h: Long): Unit =
    if (!b.contains(h) && (b.size < k || h < b.last)) {
      b += h
      if (b.size > k) b -= b.last
    }

  override def update(b: mutable.TreeSet[Long],
                      row: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(row)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: mutable.TreeSet[Long],
                     o: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    o.foreach(insert(b, _))
    b
  }

  override def eval(b: mutable.TreeSet[Long]): Any =
    new GenericArrayData(b.toArray[Any])

  override def serialize(b: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = mutable.TreeSet.empty[Long]
    val n = bb.getInt()
    var i = 0
    while (i < n) { out += bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
  override def prettyName: String = "graft_kmv_sketch"
}

object KmvExpressions {

  /** The k smallest distinct values of a LONG hash column, sorted
    * ascending, as one mergeable aggregate. */
  def kmvSketch(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvSketchAgg(GraftColumnBridge.expression(hash), k)
        .toAggregateExpression())

  /** The KMV estimate over a kmvSketch array: exact below k (the sketch
    * IS the set), ((k−1)·2³²) div h₍ₖ₎ at k — pure BIGINT via the
    * make-divisible-then-divide trick (the calibrationCurve idiom:
    * numerator ≤ 2³⁸ stays double-exact), the Sketches.kmvEstimate
    * algebra on a Column. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val a = lit((k - 1L) * 4294967296L)
    val hk = element_at(sketch, k)
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(((a - pmod(a, hk)) / hk).cast("long"))
  }
}
