package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.ProtoEnvelope
import graft.cdc.ProtoEnvelope.Resp
import graft.sinks.{PullClient, PullServer}
import graft.sinks.PullClient._

/** The reusable pull-protocol client (the reference's StreamClient
  * utility, StreamClient.cpp) driven end-to-end against [[PullServer]]:
  * grammar parse, READY→START and REPLICATE→CONTINUE session flow,
  * confirm cadence, and the time-based-start FAILED_START arm.
  */
class PullClientSpec extends AnyFunSuite {

  private def outbox: IndexedSeq[(Long, Long, Array[Byte])] =
    (1 to 5).map { i =>
      (100L + i, 0L, ProtoEnvelope.encodeResponse(
        100L + i, 0L, 100L + i, s"x$i", "c", "APP", "T", 1L, null,
        null, Map("v" -> i.toString), null, null))
    }

  test("start-spec grammar parses StreamClient.cpp:84-100 forms") {
    assert(StartSpec.parse("now") == StartNow(None))
    assert(StartSpec.parse("now,7") == StartNow(Some(7L)))
    assert(StartSpec.parse("scn:123") == StartScn(123L, None))
    assert(StartSpec.parse("scn:123,4") == StartScn(123L, Some(4L)))
    assert(StartSpec.parse("time:2026-01-01 00:00:00") ==
      StartTime("2026-01-01 00:00:00", None))
    assert(StartSpec.parse("time_rel:3600") == StartTimeRel(3600L, None))
    assert(StartSpec.parse("c:500,2") == Continue(500L, 2L))
    assert(StartSpec.parse("next") == Next)
    intercept[IllegalArgumentException](StartSpec.parse("bogus"))
    intercept[IllegalArgumentException](StartSpec.parse("c:500"))
  }

  test("fresh server: START now streams all, confirms land, reconnect " +
    "CONTINUEs from the watermark") {
    val srv = new PullServer("DB1", outbox)
    try {
      val c1 = new PullClient("127.0.0.1", srv.port, "DB1")
      val i1 = c1.info()
      assert(i1.code == Resp.Ready)
      assert(c1.begin(i1, StartSpec.parse("now")).code == Resp.Replicate)
      var got = Vector.empty[Long]
      c1.consume({ bytes =>
        got :+= ProtoEnvelope.decodeControlResponse(bytes).cScn.get
        got.size < 5 // stop at the 5th; confirms land at the cadence only
      }, confirmEvery = 2)
      assert(got == (1 to 5).map(100L + _).toVector)
      c1.close()
      // cadence confirms (102) then (104) → watermark (104, 0); the
      // unconfirmed suffix 105 stays replayable (and GC-pinned)
      val deadline = System.nanoTime() + 5000000000L
      while (srv.confirmed != Some((104L, 0L)) &&
        System.nanoTime() < deadline) Thread.sleep(10)
      assert(srv.confirmed == Some((104L, 0L)))

      // late producer appends; a reconnecting client resumes with `next`
      srv.append(106L, 0L, ProtoEnvelope.encodeResponse(
        106L, 0L, 106L, "x6", "c", "APP", "T", 1L, null,
        null, Map("v" -> "6"), null, null))
      val c2 = new PullClient("127.0.0.1", srv.port, "DB1")
      val i2 = c2.info()
      assert(i2.code == Resp.Replicate && i2.cScn == Some(104L))
      assert(c2.begin(i2, StartSpec.parse("next")).code == Resp.Replicate)
      var seen = Vector.empty[Long]
      c2.consume({ b =>
        seen :+= ProtoEnvelope.decodeControlResponse(b).cScn.get
        seen.size < 2
      })
      assert(seen == Vector(105L, 106L)) // only past the watermark
      c2.close()

      // explicit position resume replays from the given (c_scn, c_idx)
      val c3 = new PullClient("127.0.0.1", srv.port, "DB1")
      val i3 = c3.info()
      assert(c3.begin(i3, StartSpec.parse("c:105,0")).code == Resp.Replicate)
      var seen3 = Vector.empty[Long]
      c3.consume({ b =>
        seen3 :+= ProtoEnvelope.decodeControlResponse(b).cScn.get
        false
      })
      assert(seen3 == Vector(106L))
      c3.close()
    } finally srv.close()
  }

  test("json format: confirm positions parse from the envelope document " +
    "(StreamClient.cpp:263-270)") {
    val jsonMsgs = (1 to 4).map { i =>
      (100L + i, 0L,
        s"""{"c_scn":${100 + i},"c_idx":0,"scn":${100 + i},"payload":[{"op":"c"}]}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val srv = new PullServer("DB1", jsonMsgs.toIndexedSeq)
    try {
      val c = new PullClient("127.0.0.1", srv.port, "DB1", "json")
      val i = c.info()
      c.begin(i, StartSpec.parse("now"))
      var n = 0
      c.consume({ _ => n += 1; n < 4 }, confirmEvery = 2)
      val deadline = System.nanoTime() + 5000000000L
      while (srv.confirmed != Some((104L, 0L)) &&
        System.nanoTime() < deadline) Thread.sleep(10)
      assert(srv.confirmed == Some((104L, 0L)))
      c.close()
      intercept[IllegalArgumentException](
        new PullClient("127.0.0.1", srv.port, "DB1", "avro"))
    } finally srv.close()
  }

  test("writer emit points feed messages/bytes sent and confirmed") {
    val prom = new graft.streaming.Prometheus()
    val srv = new PullServer("DB1", outbox, Some(prom))
    try {
      val c = new PullClient("127.0.0.1", srv.port, "DB1")
      val i = c.info()
      c.begin(i, StartSpec.parse("now"))
      var n = 0
      c.consume({ _ => n += 1; n < 5 }, confirmEvery = 2)
      val deadline = System.nanoTime() + 5000000000L
      while (srv.confirmed != Some((104L, 0L)) &&
        System.nanoTime() < deadline) Thread.sleep(10)
      def v(name: String): Long = prom.render().linesIterator
        .find(_.startsWith(name + " ")).get.stripPrefix(name + " ").toLong
      assert(v("messages_sent") == 5 && v("bytes_sent") > 0)
      // cumulative confirm (104, 0) popped 101-104 from the queue
      assert(v("messages_confirmed") == 4 && v("bytes_confirmed") > 0)
      c.close()
    } finally srv.close()

    // the file writer sends and confirms in one step
    val dir = java.nio.file.Files.createTempDirectory("graft_prom").toString
    val fprom = new graft.streaming.Prometheus()
    val w = new graft.sinks.Sinks.RotatingFileWriter(s"$dir/out.json",
      prom = Some(fprom))
    w.write("{\"a\":1}"); w.write("{\"b\":2}")
    val r = fprom.render()
    assert(r.contains("messages_sent 2") && r.contains("messages_confirmed 2"))
  }

  test("time-based START fails cleanly (no DB clock to resolve time→scn)") {
    val srv = new PullServer("DB2", outbox)
    try {
      val c = new PullClient("127.0.0.1", srv.port, "DB2")
      val i = c.info()
      assert(i.code == Resp.Ready)
      val e = intercept[IllegalStateException] {
        c.begin(i, StartSpec.parse("time_rel:3600"))
      }
      assert(e.getMessage.contains(Resp.FailedStart.toString))
      c.close()
    } finally srv.close()
  }
}
