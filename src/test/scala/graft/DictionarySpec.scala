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

  test("OLR checkpoint import: the reference's own serialized schema " +
      "(SerializerJson field layout) parses to a working Dictionary") {
    val (meta, d) = OlrCheckpoint.importJson(DictionarySpec.olrFixture)
    // positioning metadata, min-tran variant takes precedence
    assert(meta.scn == 123456L && meta.seq == 42L && meta.offset == 8192L)
    assert(meta.database == "ORCL" && meta.conId == 3 &&
      meta.conName == "PDB1")
    assert(meta.nlsCharacterSet == "AL32UTF8" &&
      meta.nlsNcharCharacterSet == "AL16UTF16")
    assert(meta.schemaScn == 123400L && !meta.bigEndian)
    // tables: OBJ$ type 2 with a TAB$ row; the type-4 view is excluded
    assert(d.tables.map(_.fullName).toSet == Set("APP.ORDERS", "APP.DOCS"))
    val orders = d.tables.find(_.name == "ORDERS").get
    // seg-col 0 (virtual) rows are skipped — Schema.cpp:654
    assert(orders.columns.map(_.name) == Seq("ID", "VAL", "HID", "SYS_NC_G"))
    val id = orders.columns.find(_.name == "ID").get
    assert(id.numPk == 1 && !id.nullable && id.precision == 10)
    assert(orders.keyColumns.map(_.name) == Seq("ID"))
    // guard seg from sys-ecol keyed on (tab-obj, int-col)
    assert(orders.columns.find(_.name == "VAL").get.guardSeg == 1)
    // charset-form 1 resolves to the database set (feed contract id 0)
    assert(orders.columns.find(_.name == "VAL").get.charsetId == 0)
    // HIDDEN through the real [low,high] word encoding (high word set)
    assert(orders.columns.find(_.name == "HID").get.hidden)
    // the guard bitmap column itself: GUARD = property bit 39
    assert(orders.guardColName.contains("SYS_NC_G"))
    // partition chain: tabpart + tabcompart + tabsubpart (through parent)
    assert(d.partitionOf == Map(310L -> 300L, 311L -> 300L, 312L -> 300L))
    assert(d.lookup(312L, 1L).map(_.name).contains("DOCS"))
    // LOB chain: root 500, comp-part 501, fragments through both parents
    Seq(500L, 501L, 502L, 503L).foreach { lobj =>
      assert(d.lobOwner(lobj).contains((300L, "BODY")), s"lobj $lobj")
    }
    // XDB token tables load into XmlCtx from the per-suffix arrays
    assert(d.xmlCtx.isDefined)
    assert(d.xmlCtx.get.ttSet.map(_.tokSuf) == Seq("1AB"))
    assert(d.xmlCtx.get.xnm.map(_.nmSpcUri) == Seq("http://x"))
    assert(d.xmlCtx.get.xqn.map(_.localName) == Seq("a"))
    // the imported dictionary survives OUR checkpoint serde unchanged
    val rt = Dictionary.fromJson(Dictionary.toJson(d))
    assert(rt.tables == d.tables && rt.partitionOf == d.partitionOf &&
      rt.lobSegments == d.lobSegments)
  }

  test("OLR checkpoint EXPORT round-trips through import (the reverse " +
      "migration path: this engine's schema as an OLR checkpoint)") {
    val (meta, d) = OlrCheckpoint.importJson(DictionarySpec.olrFixture)
    val out = OlrCheckpoint.exportJson(meta, d)
    val (meta2, d2) = OlrCheckpoint.importJson(out)
    assert(meta2 == meta)
    assert(d2.tables == d.tables)
    assert(d2.partitionOf == d.partitionOf)
    assert(d2.lobSegments == d.lobSegments)
    assert(d2.xmlCtx == d.xmlCtx)
    // export → import → export is a fixpoint (stable row synthesis)
    assert(OlrCheckpoint.exportJson(meta2, d2) == out)
  }

  test("OLR checkpoint import fails loudly on non-checkpoint input " +
      "(a silently-empty schema would drop every event downstream)") {
    intercept[IllegalArgumentException](OlrCheckpoint.importJson("{not json"))
    intercept[IllegalArgumentException](OlrCheckpoint.importJson("[]"))
    val e = intercept[IllegalArgumentException](
      OlrCheckpoint.importJson("""{"scn": 5}"""))
    assert(e.getMessage.contains("sys-obj"))
  }
}

object DictionarySpec {
  /** Golden fixture hand-built to the reference serializer's exact field
    * set (SerializerJson.cpp:52-537): kebab-case keys, row-id strings,
    * [low64, high64] array-encoded 128-bit words exactly as IntX::toString
    * emits them (HID's property is [32, 64] — hidden bit in the low
    * word, nonzero HIGH word proving the word order), per-suffix xdb
    * arrays; a bare integer stays accepted for hand-authored files. */
  val olrFixture: String =
    """{
      |"database":"ORCL","scn":123456,"resetlogs":88,"activation":99,
      |"time":1700000000,"seq":7,"offset":0,
      |"big-endian":0,"context":"ctx","con-id":3,"con-name":"PDB1",
      |"db-timezone":"+02:00","db-recovery-file-dest":"",
      |"db-block-checksum":"TYPICAL","log-archive-dest":"",
      |"log-archive-format":"o1_mf_%t_%s_%h_.arc",
      |"nls-character-set":"AL32UTF8","nls-nchar-character-set":"AL16UTF16",
      |"supp-log-db-primary":1,"supp-log-db-all":0,
      |"online-redo":[{"group":1,"path":["/u01/redo01.log"]}],
      |"incarnations":[{"incarnation":1,"resetlogs-scn":0,
      |  "prior-resetlogs-scn":0,"status":"CURRENT","resetlogs":88,
      |  "prior-incarnation":0}],
      |"users":["APP"],
      |"min-tran":{"seq":42,"offset":8192,"xid":"0x0001.001.00000001"},
      |"schema-scn":123400,"schema-ref-scn":123400,
      |"sys-user":[{"row-id":"AAAAAAAABAAAAAAAAA","user":2,"name":"APP",
      |  "spare1":[0,0],"single":0}],
      |"sys-obj":[
      |  {"row-id":"AAAAAAAABAAAAAAAAB","owner":2,"obj":100,"data-obj":100,
      |   "name":"ORDERS","type":2,"flags":[0,0],"single":0},
      |  {"row-id":"AAAAAAAABAAAAAAAAC","owner":2,"obj":300,"data-obj":0,
      |   "name":"DOCS","type":2,"flags":[0,0],"single":0},
      |  {"row-id":"AAAAAAAABAAAAAAAAD","owner":2,"obj":101,"data-obj":101,
      |   "name":"V_ORDERS","type":4,"flags":[0,0],"single":0}],
      |"sys-tab":[
      |  {"row-id":"AAAAAAAABAAAAAAAAE","obj":100,"data-obj":100,"ts":4,
      |   "clu-cols":0,"flags":[0,0],"property":[0,0]},
      |  {"row-id":"AAAAAAAABAAAAAAAAF","obj":300,"data-obj":0,"ts":4,
      |   "clu-cols":0,"flags":[0,0],"property":[32,0]}],
      |"sys-col":[
      |  {"row-id":"AAAAAAAABAAAAAAAAG","obj":100,"col":1,"seg-col":1,
      |   "int-col":1,"name":"ID","type":2,"length":22,"precision":10,
      |   "scale":0,"charset-form":0,"charset-id":0,"null":1,"property":[0,0]},
      |  {"row-id":"AAAAAAAABAAAAAAAAH","obj":100,"col":2,"seg-col":2,
      |   "int-col":2,"name":"VAL","type":1,"length":50,"precision":-1,
      |   "scale":-1,"charset-form":1,"charset-id":873,"null":0,"property":[0,0]},
      |  {"row-id":"AAAAAAAABAAAAAAAAI","obj":100,"col":3,"seg-col":3,
      |   "int-col":3,"name":"HID","type":1,"length":30,"precision":-1,
      |   "scale":-1,"charset-form":0,"charset-id":0,"null":0,
      |   "property":[32,64]},
      |  {"row-id":"AAAAAAAABAAAAAAAAJ","obj":100,"col":0,"seg-col":0,
      |   "int-col":4,"name":"VIRT","type":1,"length":0,"precision":-1,
      |   "scale":-1,"charset-form":0,"charset-id":0,"null":0,"property":[0,0]},
      |  {"row-id":"AAAAAAAABAAAAAAAAK","obj":100,"col":4,"seg-col":4,
      |   "int-col":5,"name":"SYS_NC_G","type":23,"length":16,
      |   "precision":-1,"scale":-1,"charset-form":0,"charset-id":0,
      |   "null":0,"property":[549755813888,0]},
      |  {"row-id":"AAAAAAAABAAAAAAAAL","obj":300,"col":1,"seg-col":1,
      |   "int-col":1,"name":"ID","type":2,"length":22,"precision":10,
      |   "scale":0,"charset-form":0,"charset-id":0,"null":1,"property":[0,0]},
      |  {"row-id":"AAAAAAAABAAAAAAAAM","obj":300,"col":2,"seg-col":2,
      |   "int-col":2,"name":"BODY","type":112,"length":4000,
      |   "precision":-1,"scale":-1,"charset-form":1,"charset-id":873,
      |   "null":0,"property":[0,0]}],
      |"sys-ccol":[
      |  {"row-id":"AAAAAAAABAAAAAAAAN","con":7,"int-col":1,"obj":100,
      |   "spare1":[0,0]},
      |  {"row-id":"AAAAAAAABAAAAAAABD","con":8,"int-col":1,"obj":300,
      |   "spare1":[0,0]}],
      |"sys-cdef":[
      |  {"row-id":"AAAAAAAABAAAAAAAAO","con":7,"obj":100,"type":2},
      |  {"row-id":"AAAAAAAABAAAAAAABE","con":8,"obj":300,"type":2}],
      |"sys-deferredstg":[{"row-id":"AAAAAAAABAAAAAAAAP","obj":100,
      |  "flags-stg":[0,0]}],
      |"sys-ecol":[{"row-id":"AAAAAAAABAAAAAAAAQ","tab-obj":100,
      |  "col-num":2,"guard-id":1}],
      |"sys-lob":[{"row-id":"AAAAAAAABAAAAAAAAR","obj":300,"col":2,
      |  "int-col":2,"l-obj":500,"ts":4}],
      |"sys-lob-comp-part":[{"row-id":"AAAAAAAABAAAAAAAAS","part-obj":501,
      |  "l-obj":500}],
      |"sys-lob-frag":[
      |  {"row-id":"AAAAAAAABAAAAAAAAT","frag-obj":502,"parent-obj":501,
      |   "ts":4},
      |  {"row-id":"AAAAAAAABAAAAAAAAU","frag-obj":503,"parent-obj":500,
      |   "ts":4}],
      |"sys-tabpart":[{"row-id":"AAAAAAAABAAAAAAAAV","obj":310,
      |  "data-obj":1310,"bo":300}],
      |"sys-tabcompart":[{"row-id":"AAAAAAAABAAAAAAAAW","obj":311,
      |  "data-obj":0,"bo":300}],
      |"sys-tabsubpart":[{"row-id":"AAAAAAAABAAAAAAAAX","obj":312,
      |  "data-obj":1312,"p-obj":311}],
      |"sys-ts":[{"row-id":"AAAAAAAABAAAAAAAAY","ts":4,"name":"USERS",
      |  "block-size":8192}],
      |"xdb-ttset":[{"row-id":"AAAAAAAABAAAAAAAAZ","guid":"ABC",
      |  "toksuf":"1AB","flags":0,"obj":600}],
      |"xdb-xnm1AB":[{"row-id":"AAAAAAAABAAAAAAABA","nmspcuri":"http://x",
      |  "id":"01"}],
      |"xdb-xpt1AB":[{"row-id":"AAAAAAAABAAAAAAABB","path":"/a","id":"02"}],
      |"xdb-xqn1AB":[{"row-id":"AAAAAAAABAAAAAAABC","nmspcid":"01",
      |  "localname":"a","flags":"00","id":"03"}]
      |}""".stripMargin
}
