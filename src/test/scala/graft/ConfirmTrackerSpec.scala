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
    // nothing contiguous below (10,0) yet
    assert(t.confirmed.exists(w => Ordering[(Long, Long)].lt(w, (10L, 0L))))

    t.confirm(10, 0)
    // (10,0) confirmed, (10,1) still pending → watermark < (10,1)
    val w = t.confirmed.get
    assert(Ordering[(Long, Long)].gteq(w, (10L, 0L)))
    assert(Ordering[(Long, Long)].lt(w, (10L, 1L)))

    t.confirm(10, 1) // all acked → watermark = last sent
    assert(t.confirmed.contains((11L, 0L)))
    assert(t.inflight == 0)
  }

  test("in-order acks track exactly") {
    val t = new ConfirmTracker
    (0L to 4L).foreach(i => t.sent(100L, i))
    (0L to 3L).foreach { i =>
      t.confirm(100L, i)
      val w = t.confirmed.get
      assert(Ordering[(Long, Long)].gteq(w, (100L, i)))
      assert(Ordering[(Long, Long)].lt(w, (100L, i + 1)))
    }
    t.confirm(100L, 4L)
    assert(t.confirmed.contains((100L, 4L)))
  }

  test("sends must be ordered") {
    val t = new ConfirmTracker
    t.sent(5, 0)
    assertThrows[IllegalArgumentException](t.sent(4, 0))
  }
}
