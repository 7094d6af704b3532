package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import graft.sinks.{PullClient, PullServer, ZmtpFraming}
import graft.cdc.ProtoEnvelope

/** ZMTP 3.0 framing (rfc.zeromq.org 23/ZMTP) — the r7 verdict's "implement
  * or reject" ask for the `"zeromq"` writer type: previously ConfigLoader
  * silently served plain-socket framing to a ZeroMQ config. Now the
  * writer speaks real ZMTP (NULL mechanism, PAIR socket), validated here
  * against spec-derived golden bytes and an end-to-end pull session. */
class ZmtpFramingSpec extends AnyFunSuite {

  private def din(bytes: Array[Byte]) =
    new DataInputStream(new ByteArrayInputStream(bytes))

  test("greeting is the 64-octet spec layout") {
    val g = ZmtpFraming.greeting(asServer = true)
    assert(g.length === 64)
    assert((g(0) & 0xff) === 0xff, "signature head")
    assert(g.slice(1, 9).forall(_ == 0), "signature padding")
    assert(g(9) === 0x7f, "signature tail")
    assert(g(10) === 3 && g(11) === 0, "version 3.0")
    assert(new String(g.slice(12, 16), "US-ASCII") === "NULL")
    assert(g.slice(16, 32).forall(_ == 0), "mechanism zero-padding")
    assert(g(32) === 0, "as-server SHALL be zero under NULL")
    assert(g.slice(33, 64).forall(_ == 0), "filler")
    // round-trips through the validator
    ZmtpFraming.readGreeting(din(g))
  }

  test("READY command body carries the Socket-Type property") {
    val body = ZmtpFraming.readyBody("PAIR")
    // name: 1-octet size + "READY"
    assert(body(0) === 5)
    assert(new String(body.slice(1, 6), "US-ASCII") === "READY")
    // property: 1-octet name size + name + 4-octet BE value size + value
    assert(body(6) === 11)
    assert(new String(body.slice(7, 18), "US-ASCII") === "Socket-Type")
    assert(body.slice(18, 22).toSeq === Seq[Byte](0, 0, 0, 4))
    assert(new String(body.slice(22, 26), "US-ASCII") === "PAIR")
    val (name, props) = ZmtpFraming.parseCommand(body)
    assert(name === "READY" && props === Map("Socket-Type" -> "PAIR"))
  }

  test("short and long frames round-trip; long uses 8-octet BE size") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val short = Array.tabulate(255)(_.toByte)
    val long = Array.tabulate(70000)(i => (i % 251).toByte)
    ZmtpFraming.writeFrame(out, 0, short)
    ZmtpFraming.writeFrame(out, 0, long)
    val bytes = bos.toByteArray
    // short: flags 0x00, 1-octet size
    assert(bytes(0) === 0x00 && (bytes(1) & 0xff) === 255)
    // long: flags LONG (0x02), 8-octet big-endian size = 70000
    val off = 2 + 255
    assert(bytes(off) === ZmtpFraming.FlagLong.toByte)
    val sz = bytes.slice(off + 1, off + 9)
    assert(sz.toSeq === Seq[Byte](0, 0, 0, 0, 0, 1, 0x11, 0x70))
    val in = din(bytes)
    assert(ZmtpFraming.readFrame(in)._2.toSeq === short.toSeq)
    assert(ZmtpFraming.readFrame(in)._2.toSeq === long.toSeq)
  }

  test("multipart message (MORE flag) concatenates on receive") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    ZmtpFraming.writeFrame(out, ZmtpFraming.FlagMore, "hel".getBytes)
    ZmtpFraming.writeFrame(out, 0, "lo".getBytes)
    val f = new ZmtpFraming("PAIR")
    assert(new String(f.recv(din(bos.toByteArray))) === "hello")
  }

  test("handshake rejects an incompatible socket type with ERROR") {
    // build the peer side: greeting + READY(REQ) — REQ cannot peer with
    // PAIR per the 23/ZMTP compatibility table
    val peer = new ByteArrayOutputStream()
    val pout = new DataOutputStream(peer)
    pout.write(ZmtpFraming.greeting(asServer = false))
    ZmtpFraming.writeFrame(pout, ZmtpFraming.FlagCommand,
      ZmtpFraming.readyBody("REQ"))
    val ours = new ByteArrayOutputStream()
    val e = intercept[IllegalStateException] {
      new ZmtpFraming("PAIR").clientHandshake(
        din(peer.toByteArray), new DataOutputStream(ours))
    }
    assert(e.getMessage.contains("REQ"))
    // and we told the peer why, as an ERROR command
    val sent = ours.toByteArray
    val in = din(sent)
    ZmtpFraming.readGreeting(in) // our greeting
    val (flags1, ready) = ZmtpFraming.readFrame(in)
    assert((flags1 & ZmtpFraming.FlagCommand) !== 0)
    assert(ZmtpFraming.parseCommand(ready)._1 === "READY")
    val (flags2, err) = ZmtpFraming.readFrame(in)
    assert((flags2 & ZmtpFraming.FlagCommand) !== 0)
    assert(ZmtpFraming.parseCommand(err)._1 === "ERROR")
    assert(ZmtpFraming.errorReason(err).contains("invalid socket type"))
  }

  test("hostile length prefixes refuse before allocation (both framings)") {
    import java.io.{ByteArrayInputStream, DataInputStream}
    // plain framing: negative and 2 GB little-endian prefixes
    def plain(bytes: Array[Byte]) = intercept[IllegalStateException] {
      graft.sinks.PlainFraming.recv(
        new DataInputStream(new ByteArrayInputStream(bytes)))
    }
    plain(Array[Byte](-1, -1, -1, -1)) // 0xFFFFFFFF → negative
    plain(Array[Byte](-1, -1, -1, 0x7f)) // Int.MaxValue
    // ZMTP long-frame: 2^62 length must throw, not allocate
    val zb = new ByteArrayOutputStream()
    zb.write(0x02) // FlagLong
    zb.write(Array[Byte](0x40, 0, 0, 0, 0, 0, 0, 0), 0, 8) // 2^62 BE
    intercept[IllegalArgumentException] {
      new ZmtpFraming("PAIR").recv(din(zb.toByteArray))
    }
  }

  test("command-body fuzz: random bytes parse or throw the handled " +
      "IllegalStateException, never an index/array error") {
    // guards the r9 bounds-check work (and the r10 overflow-safe slice):
    // PullServer's handler catches ISE/IAE — anything else would kill
    // the connection thread, the exact failure the advisor flagged
    val rnd = new scala.util.Random(0x23)
    for (trial <- 0 until 500) {
      val body = Array.fill(rnd.nextInt(80))(rnd.nextInt.toByte)
      try { ZmtpFraming.parseCommand(body); () } catch {
        case _: IllegalStateException =>
        case e: Throwable =>
          fail(s"trial $trial: unhandled ${e.getClass.getName}")
      }
    }
    // the adversarial shape from the r10 advisor finding: a READY body
    // whose 4-byte property length is near Int.MaxValue (off+len would
    // wrap negative under the naive guard)
    val b = new ByteArrayOutputStream()
    b.write(5); b.write("READY".getBytes("US-ASCII"))
    b.write(3); b.write("key".getBytes("US-ASCII"))
    b.write(Array[Byte](0x7f, -1, -1, -1), 0, 4) // vl = Int.MaxValue
    intercept[IllegalStateException] {
      ZmtpFraming.parseCommand(b.toByteArray)
    }
  }

  test("non-ZMTP bytes are rejected at the signature") {
    val e = intercept[IllegalArgumentException] {
      ZmtpFraming.readGreeting(din(Array.fill[Byte](64)(0x20)))
    }
    assert(e.getMessage.contains("signature"))
  }

  test("e2e: full pull session (INFO/START/payload/CONFIRM) over ZMTP") {
    val outbox = (1 to 5).map(i =>
      (100L + i, 0L, ProtoEnvelope.encodeControlResponse(
        ProtoEnvelope.Resp.Replicate,
        cScn = Some(100L + i), cIdx = Some(0L))))
    val srv = new PullServer("DB1", outbox, framing = new ZmtpFraming("PAIR"))
    try {
      val c = new PullClient("127.0.0.1", srv.port, "DB1", "protobuf",
        new ZmtpFraming("PAIR"))
      try {
        val info = c.info()
        assert(info.code === ProtoEnvelope.Resp.Ready)
        c.begin(info, PullClient.StartSpec.parse("now"))
        var got = List.empty[Long]
        c.consume({ bytes =>
          val r = ProtoEnvelope.decodeControlResponse(bytes)
          got ::= r.cScn.get
          got.size < 5
        }, confirmEvery = 2)
        assert(got.reverse === (1 to 5).map(100L + _).toList)
        // the every-2nd CONFIRM reached the server and is cumulative
        val deadline = System.nanoTime() + 2e9.toLong
        while (srv.confirmed.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(srv.confirmed.exists(_._1 >= 102L))
      } finally c.close()
    } finally srv.close()
  }

  test("ConfigLoader maps writer type zeromq to ZMTP framing, network to plain") {
    import graft.streaming.ConfigLoader.NetworkWriterSpec
    assert(NetworkWriterSpec("tcp://h:9", "zeromq").newFraming()
      .isInstanceOf[ZmtpFraming])
    assert(NetworkWriterSpec("h:9", "network").newFraming() ===
      graft.sinks.PlainFraming)
  }
}
