package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the bounded-state "novel sketch" primitive for corpus
  * cardinality at 100 TB (Bar-Yossef et al. 2002; the BJKST family).
  *
  * `kmv_minima(h, k)` keeps the k lexicographically smallest DISTINCT
  * values of a string column (feed it `md5(x)` for a uniform hash) in a
  * size-capped TreeSet: O(k) state per group regardless of input rows,
  * mergeable across partitions (map-side partial aggregation works — the
  * shuffle carries ≤k strings per group, never the input), deterministic
  * output. The estimate `(k-1) / F(v_k)` (v_k = k-th minimum as a
  * hash-space fraction) is left to plain SQL over the returned array so
  * the DuckDB oracle can restate it exactly — see q106.
  *
  * Why not approx_count_distinct: HLL++ registers are engine-specific
  * (Spark and DuckDB disagree), so it can never be oracle-gated. KMV over
  * md5 is engine-portable bit-for-bit, with the same O(k) bound.
  *
  * vs the reference: its metrics layer counts exactly per-key in memory
  * (Ctx.cpp counters) — viable single-node, not at corpus scale.
  */
case class KmvMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_minima k must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_minima"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(
      buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      buf: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[String], v: String): Unit = {
    // admit only values that can enter the k-minimum set; TreeSet dedups
    if (buf.size < k || v < buf.last()) {
      buf.add(v)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  // newline join: inputs are hash hex in practice, but stay safe for any
  // string by escaping the delimiter
  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new StringBuilder
    val it = buf.iterator()
    while (it.hasNext) {
      val s = it.next().replace("\\", "\\\\").replace("\n", "\\n")
      sb.append(s).append('\n')
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = createAggregationBuffer()
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split("\n", -1).dropRight(1).foreach { esc =>
      buf.add(esc.replace("\\n", "\n").replace("\\\\", "\\"))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinima =
    copy(child = newChild)
}

object KmvMinima {
  /** Column API: `kmvMinima(md5($"x"), 64)`. */
  def apply(col: Column, k: Int): Column =
    Bridge.column(
      KmvMinima(Bridge.expression(col), k).toAggregateExpression())
}
