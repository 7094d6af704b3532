package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Sufficient statistics for a d-dim integer vector column as ONE native
  * Catalyst aggregate — the PCA/covariance moment pass (q205/q210) without
  * row multiplication.
  *
  * `vec_moments(q, d)` over an `Array[Long]` column returns a flat
  * `Array[Long]` of length 1 + d + d(d+1)/2 laid out as
  * `[count, per-dim sums, upper-triangle Σ qᵢ·qⱼ (i ≤ j, row-major)]` —
  * exactly the cell layout the q205 driver-side eigensolve consumes. The
  * state is a fixed O(d²) Long array per partition (d=64 → 2,145 cells,
  * ~17 KB), merged by elementwise addition: map-side partial aggregation
  * works, the shuffle carries one ≤17 KB buffer per partition, and the
  * result is partition-count invariant because Long addition is
  * commutative/associative and the arithmetic is overflow-free by the
  * caller's quantization contract (see VectorOps.pcaScale).
  *
  * Why not `posexplode(cells)` + groupBy (the r13 plan): that multiplies
  * every scanned row ×(1+d+d(d+1)/2) BEFORE the aggregation — 2,000
  * vectors became 4.2M rows and 2.1 s (the r13 ratio violation); here the
  * same sums accumulate in-place at scan speed.
  *
  * vs the reference: no analytics surface — its nearest analog is the
  * per-column running counters in Ctx.cpp, single-node in-memory only.
  */
case class VecMoments(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d >= 1 && d <= 1024, s"vec_moments d must be in [1,1024], got $d")

  private val stateLen = 1 + d + d * (d + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_moments"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](stateLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val q = v.asInstanceOf[ArrayData].toLongArray()
      require(q.length == d,
        s"vec_moments: expected $d-dim vector, got ${q.length}")
      buf(0) += 1L
      var i = 0
      var k = 1 + d
      while (i < d) {
        val qi = q(i)
        buf(1 + i) += qi
        var j = i
        while (j < d) { buf(k) += qi * q(j); k += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < stateLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(stateLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](stateLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMoments =
    copy(child = newChild)
}

object VecMoments {
  /** Column API: `VecMoments(col("q"), 64)`. */
  def apply(col: Column, d: Int): Column =
    Bridge.column(
      VecMoments(Bridge.expression(col), d).toAggregateExpression())
}
