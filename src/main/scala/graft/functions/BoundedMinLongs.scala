package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded bottom-k MULTISET aggregate over a long column — the capped
  * twin of [[KmvMinima]] (which dedups): `bounded_min_longs(x, k)` keeps
  * the k smallest values INCLUDING duplicates in O(k) state per group,
  * map-side combined and mergeable, returning them sorted ascending.
  *
  * Purpose (r17, guide §2.3/§2.4): the LSH band-candidate pipeline needs,
  * per band bucket, EITHER the full member list (≤ bandCap members) OR
  * the fact that the bucket is over-cap (degenerate boilerplate → it
  * contributes no pairs). The two-phase formulation (map-combined count →
  * broadcast anti-join → collect_list) existed so that no reducer ever
  * materializes a degenerate bucket's member list; this aggregate gives
  * the same guarantee in ONE exchange: with k = bandCap + 1 the buffer is
  * bounded at every stage, a result of size k means "over cap, drop", and
  * a result of size ≤ bandCap is exactly collect_list's multiset (sorted —
  * the in-group pair expansion is order-insensitive after least/greatest).
  *
  * Multiset (not set) semantics matter for exactness: count(*) > cap is
  * a ROW count, and the pair expansion runs over the row multiset — a
  * dedup here would change both in the (cryptographically unlikely but
  * structurally possible) band0 == band1 case.
  */
case class BoundedMinLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinLongs.Buf]
  with UnaryLike[Expression] {

  import BoundedMinLongs.Buf

  require(k >= 1, s"bounded_min_longs k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_longs"

  override def createAggregationBuffer(): Buf = new Buf()

  private def add(buf: Buf, v: Long): Unit = {
    if (buf.total < k) {
      buf.m.merge(v, 1, (a, b) => a + b)
      buf.total += 1
    } else if (v < buf.m.lastKey()) {
      buf.m.merge(v, 1, (a, b) => a + b)
      val last = buf.m.lastEntry()
      if (last.getValue > 1) buf.m.put(last.getKey, last.getValue - 1)
      else buf.m.remove(last.getKey)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var i = 0
      while (i < e.getValue) { add(buf, e.getKey); i += 1 }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      var i = 0
      while (i < e.getValue) { out(j) = e.getKey; j += 1; i += 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.m.size() * 12)
    bb.putInt(buf.m.size())
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putInt(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val v = bb.getLong; val c = bb.getInt
      buf.m.put(v, c); buf.total += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedMinLongs = copy(child = newChild)
}

object BoundedMinLongs {
  /** value → multiplicity, plus the running Σ multiplicities (≤ k). */
  final class Buf {
    val m = new java.util.TreeMap[Long, Int]()
    var total: Int = 0
  }

  /** Column API: `BoundedMinLongs($"doc_id", cap + 1)`. */
  def apply(col: Column, k: Int): Column =
    Bridge.column(
      BoundedMinLongs(Bridge.expression(col), k).toAggregateExpression())
}
