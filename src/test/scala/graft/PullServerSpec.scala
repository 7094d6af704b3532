package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import graft.cdc.ProtoEnvelope
import graft.cdc.ProtoEnvelope.{ControlResponse, RedoRequest, Req, Resp}
import graft.sinks.PullServer

/** W3 pull-protocol round trip on a loopback socket: INFO → START →
  * payload stream → CONFIRM watermark → reconnect → CONTINUE resumes
  * strictly after the confirmed position (WriterStream.cpp:52-290
  * semantics; wire bytes already byte-golden via q48). */
class PullServerSpec extends AnyFunSuite {

  private def outbox: IndexedSeq[(Long, Long, Array[Byte])] =
    (1 to 5).map { i =>
      (100L + i, 0L, ProtoEnvelope.encodeResponse(
        100L + i, 0L, 100L + i, s"x$i", "c", "APP", "T", 1L, null,
        null, Map("v" -> i.toString), null, null))
    }

  private class Client(port: Int) {
    val sock = new Socket("127.0.0.1", port)
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    def send(r: RedoRequest): Unit = {
      out.write(ProtoEnvelope.frame(ProtoEnvelope.encodeRequest(r)))
      out.flush()
    }
    def recv(): ControlResponse = {
      val len = Array.ofDim[Byte](4)
      in.readFully(len)
      val n = (len(0) & 0xff) | ((len(1) & 0xff) << 8) |
        ((len(2) & 0xff) << 16) | ((len(3) & 0xff) << 24)
      val body = Array.ofDim[Byte](n)
      in.readFully(body)
      ProtoEnvelope.decodeControlResponse(body)
    }
    def close(): Unit = sock.close()
  }

  private def awaitConfirmed(srv: PullServer, want: Option[(Long, Long)]): Unit = {
    val deadline = System.nanoTime() + 5_000_000_000L
    while (srv.confirmed != want && System.nanoTime() < deadline)
      Thread.sleep(10)
    assert(srv.confirmed == want)
  }

  test("INFO/START/CONFIRM/reconnect/CONTINUE round trip") {
    val srv = new PullServer("DB1", outbox)
    try {
      val c1 = new Client(srv.port)
      // wrong database rejected (processInfo:57-61)
      c1.send(RedoRequest(Req.Info, "NOPE"))
      assert(c1.recv().code == Resp.InvalidDatabase)
      // not yet started → READY
      c1.send(RedoRequest(Req.Info, "DB1"))
      assert(c1.recv().code == Resp.Ready)
      // START from NOW (scn absent) → REPLICATE then the full stream
      c1.send(RedoRequest(Req.Start, "DB1"))
      assert(c1.recv().code == Resp.Replicate)
      val got1 = (1 to 5).map(_ => c1.recv())
      assert(got1.forall(_.code == Resp.Payload))
      assert(got1.flatMap(_.cScn) == Seq(101L, 102L, 103L, 104L, 105L))
      // ack 101, then 103: the protocol confirm is CUMULATIVE — every
      // message at or below the position confirms (WriterStream.cpp:
      // 215-217 pops the whole queue prefix; StreamClient acks only each
      // 1000th message and relies on this), so 103 covers 102 too
      c1.send(RedoRequest(Req.Confirm, "DB1", cScn = Some(101L), cIdx = Some(0L)))
      awaitConfirmed(srv, Some((101L, 0L)))
      c1.send(RedoRequest(Req.Confirm, "DB1", cScn = Some(103L), cIdx = Some(0L)))
      awaitConfirmed(srv, Some((103L, 0L)))
      c1.close()

      // reconnect: INFO reports the confirmed watermark; CONTINUE without
      // a position resumes strictly after it — no duplicates of 101-103
      val c2 = new Client(srv.port)
      c2.send(RedoRequest(Req.Info, "DB1"))
      val info = c2.recv()
      assert(info.code == Resp.Replicate && info.cScn == Some(103L))
      c2.send(RedoRequest(Req.Continue, "DB1"))
      assert(c2.recv().code == Resp.Replicate)
      assert((1 to 2).map(_ => c2.recv()).flatMap(_.cScn) == Seq(104L, 105L))
      c2.close()

      // third session: client-chosen position overrides the watermark
      // (processContinue:186-196 — c_scn != 0 wins)
      val c3 = new Client(srv.port)
      c3.send(RedoRequest(Req.Continue, "DB1", cScn = Some(103L), cIdx = Some(0L)))
      assert(c3.recv().code == Resp.Replicate)
      assert((1 to 2).map(_ => c3.recv()).flatMap(_.cScn) == Seq(104L, 105L))
      c3.close()
    } finally srv.close()
  }

  test("START twice reports ALREADY_STARTED with positions") {
    val srv = new PullServer("DB1", outbox)
    try {
      val c = new Client(srv.port)
      c.send(RedoRequest(Req.Start, "DB1"))
      c.recv()
      (1 to 5).foreach(_ => c.recv())
      c.send(RedoRequest(Req.Start, "DB1"))
      val r = c.recv()
      assert(r.code == Resp.AlreadyStarted && r.scn == Some(101L))
      c.close()
    } finally srv.close()
  }

  test("START from a given scn streams that scn onward") {
    val srv = new PullServer("DB1", outbox)
    try {
      val c = new Client(srv.port)
      c.send(RedoRequest(Req.Start, "DB1", scn = Some(104L)))
      assert(c.recv().code == Resp.Replicate)
      assert((1 to 2).map(_ => c.recv()).flatMap(_.cScn) == Seq(104L, 105L))
      c.close()
    } finally srv.close()
  }

  test("two interleaved clients: per-client confirms, min-bounded GC") {
    val srv = new PullServer("DB1", outbox)
    try {
      // client A starts and drains the stream
      val a = new Client(srv.port)
      a.send(RedoRequest(Req.Start, "DB1"))
      assert(a.recv().code == Resp.Replicate)
      assert((1 to 5).map(_ => a.recv()).flatMap(_.cScn) ==
        Seq(101L, 102L, 103L, 104L, 105L))

      // client B connects CONCURRENTLY (A stays up) and replays from 102
      val b = new Client(srv.port)
      b.send(RedoRequest(Req.Continue, "DB1", cScn = Some(102L), cIdx = Some(0L)))
      assert(b.recv().code == Resp.Replicate)
      assert((1 to 3).map(_ => b.recv()).flatMap(_.cScn) ==
        Seq(103L, 104L, 105L))
      assert(srv.clientCount == 2)

      // A confirms everything; B has confirmed nothing → B pins the
      // queue: nothing may be dropped
      (1 to 5).foreach(i => a.send(
        RedoRequest(Req.Confirm, "DB1", cScn = Some(100L + i), cIdx = Some(0L))))
      awaitConfirmed(srv, Some((105L, 0L)))
      assert(srv.outboxSize == 5)

      // B confirms through 103 → the queue truncates at min(B=103, A=105)
      (1 to 3).foreach(i => b.send(
        RedoRequest(Req.Confirm, "DB1", cScn = Some(100L + i), cIdx = Some(0L))))
      val deadline = System.nanoTime() + 5_000_000_000L
      while (srv.outboxSize != 2 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(srv.outboxSize == 2) // 104, 105 remain

      // B catches up → fully-confirmed queue drains to empty
      (4 to 5).foreach(i => b.send(
        RedoRequest(Req.Confirm, "DB1", cScn = Some(100L + i), cIdx = Some(0L))))
      while (srv.outboxSize != 0 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(srv.outboxSize == 0)
      a.close(); b.close()
    } finally srv.close()
  }

  test("append grows the queue; a departed laggard stops pinning it") {
    val srv = new PullServer("DB1", outbox.take(2))
    try {
      val a = new Client(srv.port)
      a.send(RedoRequest(Req.Start, "DB1"))
      assert(a.recv().code == Resp.Replicate)
      (1 to 2).foreach(_ => a.recv())
      // producer appends two more; CONTINUE picks them up
      outbox.slice(2, 4).foreach { case (s, i, m) => srv.append(s, i, m) }
      assert(srv.outboxSize == 4)
      a.send(RedoRequest(Req.Confirm, "DB1", cScn = Some(101L), cIdx = Some(0L)))
      a.send(RedoRequest(Req.Confirm, "DB1", cScn = Some(102L), cIdx = Some(0L)))
      a.send(RedoRequest(Req.Continue, "DB1"))
      assert(a.recv().code == Resp.Replicate)
      assert((1 to 2).map(_ => a.recv()).flatMap(_.cScn) == Seq(103L, 104L))

      // a second client that never confirms pins the queue (103, 104
      // remain after A's earlier acks) even once A acks everything...
      val b = new Client(srv.port)
      b.send(RedoRequest(Req.Info, "DB1"))
      assert(b.recv().code == Resp.Replicate)
      a.send(RedoRequest(Req.Confirm, "DB1", cScn = Some(103L), cIdx = Some(0L)))
      a.send(RedoRequest(Req.Confirm, "DB1", cScn = Some(104L), cIdx = Some(0L)))
      awaitConfirmed(srv, Some((104L, 0L)))
      assert(srv.outboxSize == 2)
      // ...until it disconnects: the laggard's pin lifts and GC drains
      b.close()
      val deadline = System.nanoTime() + 5_000_000_000L
      while (srv.outboxSize != 0 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(srv.outboxSize == 0)
      a.close()
    } finally srv.close()
  }

  test("request codec round-trips presence") {
    val r = RedoRequest(Req.Continue, "DB1", scn = None, seq = Some(9L),
      cScn = Some(0L), cIdx = Some(7L))
    val back = ProtoEnvelope.decodeRequest(ProtoEnvelope.encodeRequest(r))
    assert(back == r) // c_scn=0 WITH presence survives (means "from last")
  }
}
