package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native BM25 scorer (q109's hot loop): merge the document's
  * token-sorted (token, tf) array against the query's token-sorted
  * (token, df) array in one pass and accumulate the Robertson-Walker
  * term scores IN TOKEN ORDER — the same matched-terms-only,
  * token-ordered double fold as the DuckDB `list(ORDER BY token)` +
  * `list_reduce` oracle, with every arithmetic step parenthesized
  * identically, so scores are bit-identical. Replaces the exploded
  * (doc, token) ⋈ query-terms ⋈ df join + collect_list/sort/fold path:
  * the corpus-sized exchange disappears entirely — scoring happens at
  * the scan and only (q_id, doc_id, score) rows reach the top-k.
  * k1 = 1.2, b = 0.75 baked; nDocs/avgdl arrive as driver-computed
  * constants (the q55/q109 dimension-artifact discipline).
  */
case class Bm25Score(first: Expression, second: Expression,
    third: Expression, nDocs: Double, avgdl: Double)
  extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(_: StructType, _), ArrayType(_: StructType, _),
          IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bm25_score needs (array<struct>, array<struct>, int), " +
          s"got ${a.sql}/${b.sql}/${c.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bm25_score"

  override def nullSafeEval(dv: Any, qv: Any, dlv: Any): Any = {
    val dtf = dv.asInstanceOf[ArrayData]    // (token, tf) sorted by token
    val terms = qv.asInstanceOf[ArrayData]  // (token, df) sorted by token
    val dl = dlv match {
      case i: Int => i.toDouble
      case l: Long => l.toDouble
    }
    val n = dtf.numElements()
    val m = terms.numElements()
    // the dl-dependent factor is per-document — hoist it, preserving the
    // oracle's exact expression shape
    val lenNorm = 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))
    var i = 0
    var j = 0
    var acc = 0.0
    while (i < n && j < m) {
      val dRow = dtf.getStruct(i, 2)
      val qRow = terms.getStruct(j, 2)
      val cmp = dRow.getUTF8String(0).compareTo(qRow.getUTF8String(0))
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else {
        val tf = dRow.getInt(1).toDouble
        val df = qRow.getLong(1).toDouble
        val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
        acc += idf * ((tf * 2.2) / (tf + lenNorm))
        i += 1
        j += 1
      }
    }
    acc
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Bm25Score =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Bm25Native {
  def score(docTf: Column, terms: Column, dl: Column, nDocs: Double,
      avgdl: Double): Column =
    Bridge.column(Bm25Score(Bridge.expression(docTf),
      Bridge.expression(terms), Bridge.expression(dl), nDocs, avgdl))
}
