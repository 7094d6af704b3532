package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Dictionary checkpoint serde + versioned evolution semantics. */
class DictionarySpec extends AnyFunSuite {

  private val t1 = DbTable(100L, 101L, "APP", "ORDERS",
    Seq(
      DbColumn("id", 2, precision = 10, scale = 0, numPk = 1, nullable = false),
      DbColumn("payload\"quoted", 1, length = 4000),
      DbColumn("hidden_col", 1, hidden = true)),
    keyList = Seq("id"), tagType = "pk", conditionExpr = "[op] == 'i'",
    options = Set("debug"), validFromScn = 0L, validToScn = 5000L)

  private val sel = TableSelector("APP.*", "ORD.*")

  test("toJson/fromJson roundtrip preserves everything") {
    val dict = Dictionary(Seq(t1), Seq(sel))
    val back = Dictionary.fromJson(Dictionary.toJson(dict))
    assert(back.tables == dict.tables)
    assert(back.selectors.map(s => (s.ownerPattern, s.namePattern)) ==
      Seq(("APP.*", "ORD.*")))
    // roundtrip is a fixpoint
    assert(Dictionary.toJson(back) == Dictionary.toJson(dict))
  }

  test("evolve closes the old version and opens the new at the scn") {
    val dict = Dictionary(Seq(t1.copy(validToScn = Long.MaxValue)))
    val evolved = dict.evolve(t1.copy(name = "ORDERS_V2"), 3000L)
    assert(evolved.lookup(100L, 2999L).get.name == "ORDERS")
    assert(evolved.lookup(100L, 3000L).get.name == "ORDERS_V2")
    // serde of the evolved (two-version) dictionary also roundtrips
    val back = Dictionary.fromJson(Dictionary.toJson(evolved))
    assert(back.lookup(100L, 2999L).get.name == "ORDERS")
    assert(back.lookup(100L, 3000L).get.name == "ORDERS_V2")
  }

  test("visibility, keys, tags derive from metadata") {
    assert(t1.keyColumns.map(_.name) == Seq("id"))
    assert(t1.visibleColumns().map(_.name) ==
      Seq("id", "payload\"quoted"))
    assert(t1.resolvedTagCols == Seq("id"))
  }
}
