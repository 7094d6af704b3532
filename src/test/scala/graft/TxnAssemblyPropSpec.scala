package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.{ArrayBuffer, Map => MMap}
import graft.cdc._
import graft.cdc.TxnAssembly.{Config, TxnState}

/** Model-based randomized check of the assembler state machine: seeded
  * random interleavings of begin / DML / partial-rollback / rollback /
  * commit / abandoned transactions across three xids, compared against an
  * independent straight-line model of SURVEY §2.3's rules (including the
  * T5 oversize drop and the unbegun-transaction bScn=0 convention).
  * Scope matches the pre-decoded feed contract minus fb piece chains and
  * multirow ops — those have dedicated fixed-scenario specs. */
class TxnAssemblyPropSpec extends AnyFunSuite {

  private case class Emitted(cScn: Long, cIdx: Long, scn: Long, xid: String,
      op: String, before: Map[String, String], after: Map[String, String],
      num: Long, bScn: Long)

  /** independent reference model (deliberately naive straight-line code) */
  private def model(events: Seq[ChangeEvent], cfg: Config): Seq[Emitted] = {
    class St {
      var beginScn: Long = -1L
      val ops = ArrayBuffer.empty[ChangeEvent]
      var oversized = false
    }
    val sts = MMap.empty[String, St]
    val out = ArrayBuffer.empty[Emitted]
    events.foreach { e =>
      val st = sts.getOrElseUpdate(e.xid, new St)
      e.op match {
        case Op.Begin => st.beginScn = e.scn
        case Op.Rollback => sts(e.xid) = new St
        case Op.PartialRollback =>
          val i =
            if (e.obj != 0L || e.bdba != 0L || e.slot != 0)
              st.ops.lastIndexWhere(o =>
                o.obj == e.obj && o.bdba == e.bdba && o.slot == e.slot)
            else st.ops.lastIndexWhere(o => Op.dml.contains(o.op))
          if (i >= 0) st.ops.remove(i)
        case Op.Commit =>
          if (!st.oversized && st.ops.nonEmpty) {
            val bScn = st.beginScn.max(0L)
            st.ops.zipWithIndex.foreach { case (o, i) =>
              val (mop, b, a) = o.op match {
                case Op.Ins => (MsgOp.Insert, null, o.after)
                case Op.Del => (MsgOp.Delete, o.before, null)
                case Op.Upd => (MsgOp.Update, o.before, o.after)
              }
              out += Emitted(e.scn, i.toLong, o.scn, e.xid, mop,
                b, a, i.toLong, bScn)
            }
          }
          sts(e.xid) = new St
        case op if Op.dml.contains(op) =>
          if (!st.oversized) {
            st.ops += e
            if (st.ops.length > cfg.maxOpsPerTxn) {
              st.ops.clear(); st.oversized = true
            }
          }
        case _ =>
      }
    }
    out.toSeq
  }

  private def gen(rnd: scala.util.Random, steps: Int): Seq[ChangeEvent] = {
    val xids = Seq("1.0.1", "2.0.2", "3.0.3")
    val events = ArrayBuffer.empty[ChangeEvent]
    var scn = 0L
    def ev(xid: String, op: String): ChangeEvent = {
      scn += 1; ChangeEvent(scn, xid, op)
    }
    for (_ <- 1 to steps) {
      val xid = xids(rnd.nextInt(xids.length))
      rnd.nextInt(100) match {
        case r if r < 10 => events += ev(xid, Op.Begin)
        case r if r < 65 =>
          val op = Seq(Op.Ins, Op.Upd, Op.Del)(rnd.nextInt(3))
          val img = Map("k" -> s"v$scn", "c" -> s"${rnd.nextInt(3)}")
          val e = ev(xid, op).copy(
            obj = 1L + rnd.nextInt(3), bdba = 1L + rnd.nextInt(3),
            slot = rnd.nextInt(3),
            before = if (op == Op.Ins) null else img,
            after = if (op == Op.Del) null else Map("k" -> s"w$scn"))
          events += e
        case r if r < 75 =>
          // partial rollback: half targeted at a random identity
          val e =
            if (rnd.nextBoolean())
              ev(xid, Op.PartialRollback).copy(
                obj = 1L + rnd.nextInt(3), bdba = 1L + rnd.nextInt(3),
                slot = rnd.nextInt(3))
            else ev(xid, Op.PartialRollback)
          events += e
        case r if r < 90 => events += ev(xid, Op.Commit)
        case _ => events += ev(xid, Op.Rollback)
      }
    }
    // close some txns at the end; leave the rest abandoned
    xids.filter(_ => rnd.nextBoolean()).foreach(x => events += ev(x, Op.Commit))
    events.toSeq
  }

  test("prop: assembler equals the model on 150 random interleavings") {
    val rnd = new scala.util.Random(42L) // seeded → deterministic
    for (iter <- 1 to 150) {
      val cfg = Config(maxOpsPerTxn = if (iter % 3 == 0) 6 else 10000000)
      val events = gen(rnd, 60)
      val sts = MMap.empty[String, TxnState]
      val got = events.flatMap(e =>
        TxnAssembly.onEvent(e.xid, e,
          sts.getOrElseUpdate(e.xid, TxnState.empty), cfg))
        .map(m => Emitted(m.cScn, m.cIdx, m.scn, m.xid, m.op,
          Option(m.before).filter(_.nonEmpty).orNull,
          Option(m.after).filter(_.nonEmpty).orNull, m.num, m.bScn))
      val want = model(events, cfg)
        .map(e => e.copy(
          before = Option(e.before).filter(_.nonEmpty).orNull,
          after = Option(e.after).filter(_.nonEmpty).orNull))
      assert(got == want, s"iter $iter diverged\n events=$events")
    }
  }
}
