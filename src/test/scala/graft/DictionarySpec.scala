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
    // storage maps (partition aliases + LOB segments) survive the trip
    val stored = dict.withStorage(Map(111L -> 100L, 112L -> 100L),
      Seq(graft.cdc.LobSegment(200L, 100L, 2, "payload\"quoted", 5L)))
    val back2 = Dictionary.fromJson(Dictionary.toJson(stored))
    assert(back2.partitionOf == stored.partitionOf)
    assert(back2.lobSegments == stored.lobSegments)
    assert(back2.lookup(111L, 1000L).map(_.name).contains("ORDERS"))
    assert(Dictionary.toJson(back2) == Dictionary.toJson(stored))
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

  test("withAdaptive synthesizes an entry that versions like a real one") {
    val dict = Dictionary(Seq(t1))
      .withAdaptive(777L, Seq("a", "b"), firstScn = 100L)
    // known obj is a no-op
    assert(dict.withAdaptive(100L, Seq("x"), 1L).tables.size ==
      dict.tables.size)
    val syn = dict.lookup(777L, 100L).get
    assert(syn.owner == "UNKNOWN" && syn.name == "OBJ_777")
    assert(syn.columns.map(_.name) == Seq("a", "b"))
    assert(dict.lookup(777L, 99L).isEmpty) // not valid before first sight
    // ...and a later DDL versions it exactly like a catalog-born table
    val evolved = dict.evolve(
      syn.copy(name = "OBJ_777_ALTERED",
        columns = syn.columns :+ graft.cdc.DbColumn("c", 1)), 5000L)
    assert(evolved.lookup(777L, 4999L).get.name == "OBJ_777")
    assert(evolved.lookup(777L, 5000L).get.name == "OBJ_777_ALTERED")
    assert(evolved.lookup(777L, 5000L).get.columns.map(_.name) ==
      Seq("a", "b", "c"))
    // serde keeps the synthesized lineage
    val back = Dictionary.fromJson(Dictionary.toJson(evolved))
    assert(back.lookup(777L, 4999L).get.name == "OBJ_777")
    assert(back.lookup(777L, 5000L).get.name == "OBJ_777_ALTERED")
  }
}
