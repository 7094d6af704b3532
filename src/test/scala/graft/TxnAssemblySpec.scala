package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer
import graft.cdc._
import graft.cdc.TxnAssembly.{Config, TxnState}

/** Pure state-machine semantics of transaction assembly (FIXTURES.md §C
  * scenarios f01-f14, no Spark session needed). */
class TxnAssemblySpec extends AnyFunSuite {

  private def run(events: Seq[ChangeEvent], cfg: Config = Config()): Seq[ChangeMessage] = {
    val st = TxnState.empty
    val out = ArrayBuffer.empty[ChangeMessage]
    events.sorted(TxnAssembly.ordering)
      .foreach(e => out ++= TxnAssembly.onEvent(e.xid, e, st, cfg))
    out.toSeq
  }

  private def ev(scn: Long, op: String, xid: String = "1.0.1"): ChangeEvent =
    ChangeEvent(scn, xid, op)

  test("f01: begin-insert-commit emits one insert with commit position") {
    val out = run(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins).copy(obj = 100L, bdba = 5L, slot = 3,
        after = Map("c1" -> "v1")),
      ev(3, Op.Commit)))
    assert(out.size == 1)
    val m = out.head
    assert(m.op == MsgOp.Insert)
    assert(m.cScn == 3L && m.cIdx == 0L && m.scn == 2L)
    assert(m.after == Map("c1" -> "v1") && m.before == null)
    assert(m.rid == graft.core.OracleCodecs.rowIdEncode(100L, 5L, 3))
  }

  test("f05: rollback drops the whole transaction") {
    val out = run(Seq(ev(1, Op.Begin), ev(2, Op.Ins), ev(3, Op.Rollback)))
    assert(out.isEmpty)
  }

  test("uncommitted ops are never emitted") {
    val out = run(Seq(ev(1, Op.Begin), ev(2, Op.Ins)))
    assert(out.isEmpty)
  }

  test("f06: partial rollback cancels the last MATCHING op") {
    val out = run(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins).copy(obj = 1L, bdba = 10L, slot = 1, after = Map("k" -> "a")),
      ev(3, Op.Ins).copy(obj = 1L, bdba = 20L, slot = 2, after = Map("k" -> "b")),
      ev(4, Op.PartialRollback).copy(obj = 1L, bdba = 10L, slot = 1),
      ev(5, Op.Commit)))
    assert(out.size == 1)
    assert(out.head.after == Map("k" -> "b")) // the non-matching op survived
  }

  test("partial rollback without identity cancels most recent DML (stack)") {
    // [A, B, pr, pr, commit] → both cancelled
    assert(run(Seq(ev(1, Op.Ins), ev(2, Op.Ins),
      ev(3, Op.PartialRollback), ev(4, Op.PartialRollback),
      ev(5, Op.Commit))).isEmpty)
    // [A, pr, pr, B, commit] → only B survives
    val out = run(Seq(
      ev(1, Op.Ins).copy(after = Map("k" -> "a")),
      ev(2, Op.PartialRollback), ev(3, Op.PartialRollback),
      ev(4, Op.Ins).copy(after = Map("k" -> "b")),
      ev(5, Op.Commit)))
    assert(out.map(_.after) == Seq(Map("k" -> "b")))
  }

  test("f08: multi-row insert expands to one message per row, in order") {
    val out = run(Seq(
      ev(1, Op.InsMulti).copy(after = Map(
        "1:c" -> "r1", "0:c" -> "r0", "2:c" -> "r2")),
      ev(2, Op.Commit)))
    assert(out.map(_.after("c")) == Seq("r0", "r1", "r2"))
    assert(out.map(_.cIdx) == Seq(0L, 1L, 2L))
    assert(out.forall(_.op == MsgOp.Insert))
  }

  test("f04: delete takes before-image from supplemental log when missing") {
    val out = run(Seq(
      ev(1, Op.Del).copy(suppBefore = Map("pk" -> "7")),
      ev(2, Op.Commit)))
    assert(out.head.before == Map("pk" -> "7"))
  }

  test("update merges supplemental images under explicit ones") {
    val out = run(Seq(
      ev(1, Op.Upd).copy(
        before = Map("c1" -> "old"), suppBefore = Map("pk" -> "7", "c1" -> "supp"),
        after = Map("c1" -> "new"), suppAfter = Map("pk" -> "7")),
      ev(2, Op.Commit)))
    assert(out.head.before == Map("pk" -> "7", "c1" -> "old")) // explicit wins
    assert(out.head.after == Map("pk" -> "7", "c1" -> "new"))
  }

  test("session attributes attach to all ops of the transaction") {
    val out = run(Seq(
      ev(1, Op.SessionAttr).copy(attrs = Map("client info" -> "x")),
      ev(2, Op.Ins), ev(3, Op.Ins), ev(4, Op.Commit)))
    assert(out.size == 2 && out.forall(_.attrs == Map("client info" -> "x")))
  }

  test("T5: oversized transaction dropped whole, later commits stay dropped") {
    val events = (1L to 5L).map(i => ev(i, Op.Ins)) :+ ev(6, Op.Commit)
    assert(run(events, Config(maxOpsPerTxn = 3)).isEmpty)
    assert(run(events, Config(maxOpsPerTxn = 5)).size == 5)
  }

  test("T5 byte form (transaction-max-mb, Parser.cpp:611-620): the " +
      "accumulated-size rule drops + skips exactly like the op-count rule") {
    val events = (1L to 5L).map(i => ev(i, Op.Ins)) :+ ev(6, Op.Commit)
    val opSize = ev(1, Op.Ins).approxSize.toLong
    // cap below 5 ops' bytes → dropped whole; at/above → all 5 emit
    assert(run(events, Config(maxBytesPerTxn = 3 * opSize)).isEmpty)
    assert(run(events, Config(maxBytesPerTxn = 5 * opSize + 1)).size == 5)
    // partial rollback returns its op's bytes: 5 INS + 1 cancel fits a
    // 5-op budget again (the freed op's size is reclaimed)
    val withPr = (1L to 5L).map(i => ev(i, Op.Ins)) ++
      Seq(ev(6, Op.PartialRollback), ev(7, Op.Ins), ev(8, Op.Commit))
    assert(run(withPr, Config(maxBytesPerTxn = 5 * opSize + 1)).size == 5)
    // a commit resets the budget: two small txns pass under a cap one
    // combined txn would blow
    val twoTxns = Seq(ev(1, Op.Ins), ev(2, Op.Ins), ev(3, Op.Commit),
      ev(4, Op.Ins), ev(5, Op.Ins), ev(6, Op.Commit))
    assert(run(twoTxns, Config(maxBytesPerTxn = 2 * opSize + 1)).size == 4)
    // thaw recomputes bytes from ops (checkpoint round-trip keeps the rule)
    val st = TxnState.empty
    Seq(ev(1, Op.Ins), ev(2, Op.Ins)).foreach(e =>
      TxnAssembly.onEvent(e.xid, e, st, Config()))
    assert(TxnAssembly.TxnStateData.freeze(st).thaw.bytes == st.bytes &&
      st.bytes == 2 * opSize)
  }

  test("T8: skip-listed xid emits nothing") {
    val out = run(Seq(ev(1, Op.Ins), ev(2, Op.Commit)),
      Config(skipXids = Set("1.0.1")))
    assert(out.isEmpty)
  }

  test("f17: DDL emitted with op ddl and text") {
    val out = run(Seq(
      ev(1, Op.Ddl).copy(ddlText = "ALTER TABLE t ADD c INT"),
      ev(2, Op.Commit)))
    assert(out.head.op == MsgOp.Ddl && out.head.ddlText.startsWith("ALTER"))
  }

  test("emitBeginCommit brackets the payload") {
    val out = run(Seq(ev(1, Op.Begin), ev(2, Op.Ins), ev(3, Op.Commit)),
      Config(emitBeginCommit = true))
    assert(out.map(_.op) == Seq(MsgOp.Begin, MsgOp.Insert, MsgOp.Commit))
  }

  test("events arriving out of scn order are sorted before assembly") {
    val out = run(Seq(
      ev(3, Op.Commit),
      ev(2, Op.Ins).copy(after = Map("k" -> "2")),
      ev(1, Op.Ins).copy(after = Map("k" -> "1"))))
    assert(out.map(_.after("k")) == Seq("1", "2"))
  }

  test("T4: multi-piece row (fb F..L) merges into one logical DML") {
    val out = run(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins).copy(obj = 1L, bdba = 10L, slot = 1, fb = "F",
        after = Map("c1" -> "a", "c2" -> "b")),
      ev(3, Op.Ins).copy(obj = 1L, bdba = 11L, slot = 0, fb = "N",
        after = Map("c3" -> "c")),
      ev(4, Op.Ins).copy(obj = 1L, bdba = 12L, slot = 0, fb = "L",
        after = Map("c4" -> "d")),
      ev(5, Op.Commit)))
    assert(out.size == 1)
    val m = out.head
    assert(m.after == Map("c1" -> "a", "c2" -> "b", "c3" -> "c", "c4" -> "d"))
    // merged op keeps the FIRST piece's position/rowid
    assert(m.scn == 2L)
    assert(m.rid == graft.core.OracleCodecs.rowIdEncode(1L, 10L, 1))
  }

  test("T4: single-piece rows with FL or empty fb pass through unmerged") {
    val out = run(Seq(
      ev(1, Op.Ins).copy(fb = "FL", after = Map("k" -> "1")),
      ev(2, Op.Ins).copy(fb = "", after = Map("k" -> "2")),
      ev(3, Op.Commit)))
    assert(out.map(_.after("k")) == Seq("1", "2"))
  }

  test("T4: unterminated chain still flushes (no data loss)") {
    val out = run(Seq(
      ev(1, Op.Ins).copy(fb = "F", after = Map("c1" -> "a")),
      ev(2, Op.Upd).copy(fb = "", before = Map("x" -> "1"),
        after = Map("x" -> "2")), // different op: breaks the chain
      ev(3, Op.Commit)))
    assert(out.size == 2)
  }

  test("T4: a second F piece while a chain is open flushes the earlier piece") {
    // redo-log inconsistency (Transaction.cpp:483-486 warns): the buffered
    // piece must surface, not silently vanish
    val out = run(Seq(
      ev(1, Op.Ins).copy(fb = "F", after = Map("c1" -> "a")),
      ev(2, Op.Ins).copy(fb = "F", after = Map("c1" -> "b")),
      ev(3, Op.Ins).copy(fb = "L", after = Map("c2" -> "c")),
      ev(4, Op.Commit)))
    assert(out.size == 2)
    assert(out.head.after == Map("c1" -> "a")) // earlier piece kept
    assert(out(1).after == Map("c1" -> "b", "c2" -> "c")) // new chain merges
  }

  test("two transactions on the same xid in sequence") {
    val out = run(Seq(
      ev(1, Op.Ins).copy(after = Map("k" -> "t1")),
      ev(2, Op.Commit),
      ev(3, Op.Ins).copy(after = Map("k" -> "t2")),
      ev(4, Op.Commit)))
    assert(out.map(m => (m.cScn, m.after("k"))) == Seq((2L, "t1"), (4L, "t2")))
  }

  test("T8 dump-XID: trace lines render the Transaction::log fields") {
    // Transaction.h:84-109 line shape on the pre-decoded feed's fields;
    // tag per Parser.cpp call sites (B/C brackets, rlb, add)
    val e = ev(7, Op.Ins).copy(obj = 100L, bdba = 5L, slot = 3, fb = "FL")
    assert(TxnAssembly.traceLine(e) ==
      "add  xid: 1.0.1 OP: INS scn: 7 obj: 100 bdba: 5 slot: 3 fb: FL" +
        " offset: 7")
    assert(TxnAssembly.traceMsg(Op.Begin) == "B   ")
    assert(TxnAssembly.traceMsg(Op.Commit) == "C   ")
    assert(TxnAssembly.traceMsg(Op.Rollback) == "C   ")
    assert(TxnAssembly.traceMsg(Op.PartialRollback) == "rlb ")
    assert(TxnAssembly.traceMsg(Op.Ddl) == "add ")
  }

  test("ADD_SEQUENCES num: payload ordinal 0..n-1 per txn, reset at begin") {
    // BuilderJson.h:89-92 + the ++num sites: num restarts per transaction
    // and counts emitted payloads (DML and DDL); brackets keep 0
    val t1 = run(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins).copy(after = Map("k" -> "a")),
      ev(3, Op.Ddl).copy(ddlText = "TRUNCATE T"),
      ev(4, Op.Ins).copy(after = Map("k" -> "b")),
      ev(5, Op.Commit)), Config(emitBeginCommit = true))
    assert(t1.map(m => (m.op, m.num)) == Seq(
      (MsgOp.Begin, 0L), (MsgOp.Insert, 0L), (MsgOp.Ddl, 1L),
      (MsgOp.Insert, 2L), (MsgOp.Commit, 0L)))
    // second transaction through the same state: counter restarts
    val st = TxnState.empty
    val out = ArrayBuffer.empty[ChangeMessage]
    Seq(ev(1, Op.Begin), ev(2, Op.Ins).copy(after = Map("k" -> "a")),
        ev(3, Op.Commit),
        ev(4, Op.Begin), ev(5, Op.Ins).copy(after = Map("k" -> "b")),
        ev(6, Op.Commit))
      .foreach(e => out ++= TxnAssembly.onEvent(e.xid, e, st, Config()))
    assert(out.map(_.num) == Seq(0L, 0L))
  }

  test("T8 dump-XID: dump list never changes emitted messages") {
    val events = Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins).copy(after = Map("k" -> "v")),
      ev(3, Op.PartialRollback),
      ev(4, Op.Ins).copy(after = Map("k" -> "w")),
      ev(5, Op.Commit))
    val plain = run(events)
    val dumped = run(events, Config(dumpXids = Set("1.0.1")))
    assert(plain == dumped) // diagnostic side effect only
    assert(plain.size == 1 && plain.head.after == Map("k" -> "w"))
  }
}
