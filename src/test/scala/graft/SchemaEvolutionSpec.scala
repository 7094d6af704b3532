package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** §1.2 evolution-fold invariants (driver-side, no Spark session):
  * checkpoint serde fidelity, replay idempotency, and as-of lookup
  * correctness against a sequential model — the properties
  * Pipeline.streamWithEvolution's restart guarantee rests on. */
class SchemaEvolutionSpec extends AnyFunSuite {

  private def msg(obj: Long, op: String, scn: Long,
      before: Map[String, String], after: Map[String, String]): ChangeMessage =
    ChangeMessage(scn, 0L, scn, 1L, "9.0.9", op, obj, "",
      before, after, null, null)

  private def rename(target: Long, to: String, scn: Long): ChangeMessage =
    msg(SchemaEvolution.ObjTab, MsgOp.Update, scn,
      Map("OBJ#" -> target.toString),
      Map("OBJ#" -> target.toString, "NAME" -> to))

  private val base = Dictionary(Seq(
    DbTable(100L, 100L, "APP", "T0",
      Seq(DbColumn("ID", 2, numPk = 1), DbColumn("VAL", 1)))))

  test("checkpoint serde keeps version windows AND per-column flags " +
      "(guardSeg/xmlType/charsetId survive a restart)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val cols = (0 until 1 + rnd.nextInt(6)).map { i =>
        DbColumn(s"C$i", Seq(1, 2, 12, 96, 112, 113)(rnd.nextInt(6)),
          length = rnd.nextInt(100), precision = rnd.nextInt(38) - 1,
          scale = rnd.nextInt(10) - 1, numPk = rnd.nextInt(2),
          nullable = rnd.nextBoolean(), hidden = rnd.nextBoolean(),
          guard = rnd.nextBoolean(), nested = rnd.nextBoolean(),
          unused = rnd.nextBoolean(), guardSeg = rnd.nextInt(10) - 1,
          xmlType = rnd.nextBoolean(), charsetId = Seq(0, 31, 832, 871)(rnd.nextInt(4)))
      }
      val t0 = DbTable(100L + rnd.nextInt(5), 200L, "APP",
        s"T${rnd.nextInt(100)}", cols, tagType = "pk")
      // evolve a few versions so the windows are non-trivial
      val dict = (1 to rnd.nextInt(4)).foldLeft(Dictionary(Seq(t0))) {
        (d, k) =>
          d.lookupLatest(t0.obj)
            .map(t => d.evolve(t.copy(name = s"${t0.name}_V$k"), k * 1000L))
            .getOrElse(d)
      }
      val back = Dictionary.fromJson(Dictionary.toJson(dict))
      assert(back.tables.sortBy(t => (t.obj, t.validFromScn)) ==
        dict.tables.sortBy(t => (t.obj, t.validFromScn)))
    }
  }

  test("pre-r10 checkpoints (without the new column fields) still load") {
    val legacy = Dictionary.toJson(base)
      .replaceAll(""","guardSeg":-?\d+,"xmlType":(true|false),"charsetId":\d+""", "")
    assert(!legacy.contains("guardSeg"))
    val back = Dictionary.fromJson(legacy)
    assert(back.tables.head.columns.map(_.name) == Seq("ID", "VAL"))
    assert(back.tables.head.columns.forall(c =>
      c.guardSeg == -1 && !c.xmlType && c.charsetId == 0))
  }

  test("replay idempotency: folding the same committed messages twice " +
      "leaves the dictionary unchanged (restart-safe)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val ms = (1 to 1 + rnd.nextInt(8)).map { k =>
        val scn = k * 100L
        rnd.nextInt(4) match {
          case 0 => rename(100L, s"N$k", scn)
          case 1 => msg(SchemaEvolution.ColTab, MsgOp.Insert, scn,
            null, Map("OBJ#" -> "100", "NAME" -> s"C$k", "TYPE#" -> "1"))
          case 2 => msg(SchemaEvolution.ColTab, MsgOp.Delete, scn,
            Map("OBJ#" -> "100", "NAME" -> "VAL"), null)
          case _ => msg(SchemaEvolution.ColTab, MsgOp.Update, scn,
            Map("OBJ#" -> "100", "NAME" -> "ID"),
            Map("OBJ#" -> "100", "NAME" -> "ID", "TYPE#" -> "2"))
        }
      }
      val once = SchemaEvolution.applyMessages(base, ms)
      val twice = SchemaEvolution.applyMessages(once, ms)
      assert(twice.tables.sortBy(_.validFromScn) ==
        once.tables.sortBy(_.validFromScn),
        s"replay changed the dictionary for ${ms.map(_.op)}")
    }
  }

  test("as-of lookups match the sequential model after a rename chain") {
    val scns = Seq(1000L, 2000L, 3000L)
    val dict = SchemaEvolution.applyMessages(base,
      scns.map(s => rename(100L, s"T_$s", s)))
    assert(dict.lookup(100L, 500L).map(_.name).contains("T0"))
    assert(dict.lookup(100L, 1000L).map(_.name).contains("T_1000"))
    assert(dict.lookup(100L, 1500L).map(_.name).contains("T_1000"))
    assert(dict.lookup(100L, 2999L).map(_.name).contains("T_2000"))
    assert(dict.lookup(100L, 99999L).map(_.name).contains("T_3000"))
  }

  test("pruneBefore drops only versions no future event can resolve; " +
      "as-of lookups at or above the mark are unchanged") {
    val scns = Seq(1000L, 2000L, 3000L)
    val dict = SchemaEvolution.applyMessages(base,
      scns.map(s => rename(100L, s"T_$s", s)))
    assert(dict.tables.size == 4)
    val pruned = dict.pruneBefore(2000L)
    // [0,1000) and [1000,2000) closed at/below the mark → gone
    assert(pruned.tables.size == 2)
    assert(pruned.lookup(100L, 1500L).isEmpty) // history pruned (by design)
    for (scn <- Seq(2000L, 2999L, 3000L, 99999L))
      assert(pruned.lookup(100L, scn) == dict.lookup(100L, scn),
        s"lookup at $scn changed")
    // pruning below everything is a no-op returning the same instance
    assert(dict.pruneBefore(0L) eq dict)
    // the open latest version always survives, whatever the mark
    assert(dict.pruneBefore(Long.MaxValue - 1)
      .lookupLatest(100L).map(_.name).contains("T_3000"))
  }

  test("a 10k-DDL history with periodic low-water pruning stays bounded " +
      "(the years-of-DDL broadcast-size scale case)") {
    var dict = base
    var maxSize = 0
    for (k <- 1 to 10000) {
      dict = SchemaEvolution.applyMessage(dict, rename(100L, s"T_$k", k * 10L))
      if (k % 100 == 0) {
        // low-water 500 scns behind the head (the open-txn span bound)
        dict = dict.pruneBefore(k * 10L - 500L)
        maxSize = math.max(maxSize, dict.tables.size)
      }
    }
    // without pruning this would be 10001 versions; with it the live
    // dictionary holds only the retention window (~50 versions) + slack
    assert(maxSize <= 120, s"dictionary grew to $maxSize versions")
    assert(dict.lookupLatest(100L).map(_.name).contains("T_10000"))
    assert(dict.lookup(100L, 99995L).map(_.name).contains("T_9999"))
  }

  test("OBJ$ delete closes the live window; later events see no table") {
    val dict = SchemaEvolution.applyMessages(base, Seq(
      msg(SchemaEvolution.ObjTab, MsgOp.Delete, 5000L,
        Map("OBJ#" -> "100", "NAME" -> "T0"), null)))
    assert(dict.lookup(100L, 4999L).isDefined)
    assert(dict.lookup(100L, 5000L).isEmpty)
    // replaying the delete is a no-op
    val again = SchemaEvolution.applyMessages(dict, Seq(
      msg(SchemaEvolution.ObjTab, MsgOp.Delete, 5000L,
        Map("OBJ#" -> "100", "NAME" -> "T0"), null)))
    assert(again.tables == dict.tables)
  }

  test("storage-catalog DML maintains the partition map mid-stream " +
      "(SystemTransaction TABPART$/TABCOMPART$/TABSUBPART$ paths)") {
    import SchemaEvolution._
    // ALTER TABLE ADD PARTITION ≙ TABPART$ insert
    val d1 = applyMessages(base, Seq(
      msg(TabPartTab, MsgOp.Insert, 10L, null,
        Map("OBJ#" -> "111", "DATAOBJ#" -> "1111", "BO#" -> "100"))))
    assert(d1.partitionOf == Map(111L -> 100L))
    assert(d1.lookup(111L, 20L).map(_.name).contains("T0"))
    // composite partition + subpartition chained through its parent
    val d2 = applyMessages(d1, Seq(
      msg(TabCompPartTab, MsgOp.Insert, 11L, null,
        Map("OBJ#" -> "113", "BO#" -> "100")),
      msg(TabSubPartTab, MsgOp.Insert, 12L, null,
        Map("OBJ#" -> "114", "POBJ#" -> "113"))))
    assert(d2.baseObj(114L) == 100L)
    assert(d2.lookup(114L, 20L).map(_.name).contains("T0"))
    // ORDER-INDEPENDENCE: a subpartition folded BEFORE its composite
    // parent still heals once the parent registers (raw link + transitive
    // baseObj), and the broadcast-join alias rows resolve it too
    val ooo = applyMessages(base, Seq(
      msg(TabSubPartTab, MsgOp.Insert, 10L, null,
        Map("OBJ#" -> "214", "POBJ#" -> "213")),
      msg(TabCompPartTab, MsgOp.Insert, 11L, null,
        Map("OBJ#" -> "213", "BO#" -> "100"))))
    assert(ooo.baseObj(214L) == 100L)
    assert(ooo.lookup(214L, 20L).map(_.name).contains("T0"))
    // DROP PARTITION ≙ TABPART$ delete (before image carries the row)
    val d3 = applyMessages(d2, Seq(
      msg(TabPartTab, MsgOp.Delete, 13L,
        Map("OBJ#" -> "111", "BO#" -> "100"), null)))
    assert(!d3.partitionOf.contains(111L))
    assert(d3.partitionOf(113L) == 100L) // others untouched
    // replaying the whole history in order converges to the same maps
    val replay = applyMessages(d3, Seq(
      msg(TabPartTab, MsgOp.Insert, 10L, null,
        Map("OBJ#" -> "111", "BO#" -> "100")),
      msg(TabPartTab, MsgOp.Delete, 13L,
        Map("OBJ#" -> "111", "BO#" -> "100"), null)))
    assert(replay.partitionOf == d3.partitionOf)
  }

  test("storage-catalog DML maintains the LOB maps mid-stream " +
      "(SystemTransaction LOB$/LOBCOMPPART$/LOBFRAG$ paths)") {
    import SchemaEvolution._
    val d1 = applyMessages(base, Seq(
      // LOB column registration: VAL is ordinal 2 → colName resolves
      msg(LobTab, MsgOp.Insert, 10L, null,
        Map("OBJ#" -> "100", "INTCOL#" -> "2", "LOBJ#" -> "500",
          "TS#" -> "4")),
      // comp-part segment aliases the root's owner; fragment chains
      msg(LobCompPartTab, MsgOp.Insert, 11L, null,
        Map("PARTOBJ#" -> "501", "LOBJ#" -> "500")),
      msg(LobFragTab, MsgOp.Insert, 12L, null,
        Map("FRAGOBJ#" -> "502", "PARENTOBJ#" -> "501"))))
    Seq(500L, 501L, 502L).foreach { lj =>
      assert(d1.lobOwner(lj).contains((100L, "VAL")), s"lobj $lj")
    }
    // segment drop: only the dropped alias disappears
    val d2 = applyMessages(d1, Seq(
      msg(LobFragTab, MsgOp.Delete, 13L,
        Map("FRAGOBJ#" -> "502", "PARENTOBJ#" -> "501"), null)))
    assert(d2.lobOwner(502L).isEmpty && d2.lobOwner(501L).isDefined)
    // an insert referencing an unknown parent is a no-op, not a crash
    val d3 = applyMessages(d2, Seq(
      msg(LobFragTab, MsgOp.Insert, 14L, null,
        Map("FRAGOBJ#" -> "509", "PARENTOBJ#" -> "999"))))
    assert(d3.lobOwner(509L).isEmpty)
  }
}
