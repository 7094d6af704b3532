package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks.ConfirmTracker

/** Writer confirm protocol: contiguous watermark over out-of-order acks
  * (Writer.cpp:106-165 semantics). */
class ConfirmTrackerSpec extends AnyFunSuite {

  test("watermark advances only over a contiguous confirmed prefix") {
    val t = new ConfirmTracker
    t.sent(10, 0); t.sent(10, 1); t.sent(11, 0)
    assert(t.confirmed.isEmpty)

    t.confirm(11, 0) // out of order: highest acked first
    assert(t.confirmed.isEmpty) // nothing contiguous confirmed yet

    t.confirm(10, 0)
    // (10,0) confirmed, (10,1) still pending → watermark is exactly (10,0):
    // the highest SENT id below the lowest pending, never a synthesized one
    assert(t.confirmed.contains((10L, 0L)))

    t.confirm(10, 1) // all acked → watermark = last sent
    assert(t.confirmed.contains((11L, 0L)))
    assert(t.inflight == 0)
  }

  test("in-order acks track exactly") {
    val t = new ConfirmTracker
    (0L to 4L).foreach(i => t.sent(100L, i))
    (0L to 3L).foreach { i =>
      t.confirm(100L, i)
      assert(t.confirmed.contains((100L, i)))
    }
    t.confirm(100L, 4L)
    assert(t.confirmed.contains((100L, 4L)))
  }

  test("gap-filling ack advances past already-confirmed higher ids") {
    // sent 1..4; ack 2 then 1: the contiguous prefix is {1,2}, so the
    // watermark must be (2,0) — the Writer.cpp:106-165 min-heap behavior
    val t = new ConfirmTracker
    (1L to 4L).foreach(s => t.sent(s, 0))
    t.confirm(2, 0)
    assert(t.confirmed.isEmpty) // 1 still pending
    t.confirm(1, 0)
    assert(t.confirmed.contains((2L, 0L)))
    t.confirm(4, 0)
    assert(t.confirmed.contains((2L, 0L))) // 3 still pending
    t.confirm(3, 0)
    assert(t.confirmed.contains((4L, 0L)))
  }

  test("sends must be ordered") {
    val t = new ConfirmTracker
    t.sent(5, 0)
    assertThrows[IllegalArgumentException](t.sent(4, 0))
  }
}
