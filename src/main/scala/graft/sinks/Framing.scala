package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII

/** Wire framing for the W3 pull protocol's two transports. The reference
  * serves the SAME WriterStream state machine over either a plain TCP
  * stream with explicit length prefixes (StreamNetwork.cpp) or a ZeroMQ
  * PAIR socket (StreamZeroMQ.cpp, selected by writer type "zeromq" at
  * OpenLogReplicator.cpp:1191-1196) — the framing is the ONLY difference,
  * so it is factored to one seam here and [[PullServer]]/[[PullClient]]
  * are transport-generic.
  */
trait Framing {
  /** Connection-open handshake, server side (no-op for plain TCP). */
  def serverHandshake(in: DataInputStream, out: DataOutputStream): Unit = ()
  /** Connection-open handshake, client side (no-op for plain TCP). */
  def clientHandshake(in: DataInputStream, out: DataOutputStream): Unit = ()
  def send(out: DataOutputStream, msg: Array[Byte]): Unit
  def recv(in: DataInputStream): Array[Byte]
}

object Framing {
  /** Frames above this are refused BEFORE allocation on every framing
    * implementation — a corrupt or hostile length prefix must not drive
    * a multi-GB (or negative) `new Array`. Far above any real message:
    * the reference's builder caps messages via max-message-mb (default
    * well below this). */
  val MaxFrameBytes: Int = 256 * 1024 * 1024
}

/** StreamNetwork.cpp framing: 4-byte little-endian length + body. */
object PlainFraming extends Framing {
  override def send(out: DataOutputStream, msg: Array[Byte]): Unit = {
    out.write(graft.cdc.ProtoEnvelope.frame(msg))
    out.flush()
  }
  override def recv(in: DataInputStream): Array[Byte] = {
    val len = Array.ofDim[Byte](4)
    in.readFully(len)
    val n = (len(0) & 0xff) | ((len(1) & 0xff) << 8) |
      ((len(2) & 0xff) << 16) | ((len(3) & 0xff) << 24)
    if (n < 0 || n > Framing.MaxFrameBytes)
      throw new IllegalStateException(s"network: bad frame length $n")
    val body = Array.ofDim[Byte](n)
    in.readFully(body)
    body
  }
}

/** ZMTP 3.0 framing (the public ZeroMQ wire spec, rfc.zeromq.org 23/ZMTP),
  * NULL security mechanism, PAIR socket semantics — what libzmq puts on
  * the wire for the reference's `zmq_socket(ZMQ_PAIR)` + blocking
  * send/recv (StreamZeroMQ.cpp:43,65-98). Implemented from the spec, not
  * from libzmq:
  *
  *   greeting (64 octets) = signature %xFF 8*%x00 %x7F
  *                        + version %x03 %x00
  *                        + mechanism "NULL" zero-padded to 20
  *                        + as-server %x00 + 31*%x00 filler
  *   handshake            = READY command both ways carrying the
  *                          Socket-Type metadata property; PAIR peers
  *                          only with PAIR (23/ZMTP compatibility table)
  *   traffic frame        = flags octet (%x01 MORE, %x02 LONG, %x04
  *                          COMMAND) + 1-octet (short) or 8-octet
  *                          big-endian (long) size + body
  *
  * One pull-protocol message = one ZMQ message, as the reference's
  * one-zmq_send-per-message loop produces; multipart (MORE) input is
  * concatenated on receive. An ERROR command from the peer (e.g. a
  * socket-type rejection) surfaces as an exception carrying its reason.
  */
final class ZmtpFraming(socketType: String = "PAIR") extends Framing {
  import ZmtpFraming._

  override def serverHandshake(in: DataInputStream,
      out: DataOutputStream): Unit = handshake(in, out, asServer = true)
  override def clientHandshake(in: DataInputStream,
      out: DataOutputStream): Unit = handshake(in, out, asServer = false)

  /** Greeting and READY may be sent eagerly (23/ZMTP: "a peer SHALL send
    * its greeting immediately"), so both sides write-then-read without
    * deadlock on blocking sockets. */
  private def handshake(in: DataInputStream, out: DataOutputStream,
      asServer: Boolean): Unit = {
    out.write(greeting(asServer)); out.flush()
    readGreeting(in)
    writeFrame(out, FlagCommand, readyBody(socketType))
    val (flags, body) = readFrame(in)
    require((flags & FlagCommand) != 0, "ZMTP: expected a command frame")
    val (name, props) = parseCommand(body)
    name match {
      case "READY" =>
        val peerType = props.getOrElse("Socket-Type", "")
        if (!compatible(socketType, peerType)) {
          writeFrame(out, FlagCommand,
            errorBody(s"invalid socket type: $peerType"))
          throw new IllegalStateException(
            s"ZMTP: peer socket type $peerType incompatible with $socketType")
        }
      case "ERROR" =>
        throw new IllegalStateException(
          "ZMTP: peer rejected handshake: " + errorReason(body))
      case other =>
        throw new IllegalStateException(s"ZMTP: unexpected command $other")
    }
  }

  override def send(out: DataOutputStream, msg: Array[Byte]): Unit =
    writeFrame(out, 0, msg)

  override def recv(in: DataInputStream): Array[Byte] = {
    var acc = Array.empty[Byte]
    var more = true
    while (more) {
      val (flags, body) = readFrame(in)
      if ((flags & FlagCommand) != 0) {
        val (name, _) = parseCommand(body)
        if (name == "ERROR") throw new IllegalStateException(
          "ZMTP: peer error: " + errorReason(body))
        // 3.0/NULL defines no other mid-stream command; 3.1 PING would
        // land here if a peer negotiated up — reject loudly, never
        // silently deliver a command body as payload
        throw new IllegalStateException(s"ZMTP: unexpected command $name")
      }
      acc = if (acc.isEmpty) body else acc ++ body
      more = (flags & FlagMore) != 0
    }
    acc
  }
}

object ZmtpFraming {
  val FlagMore = 0x01
  val FlagLong = 0x02
  val FlagCommand = 0x04

  /** The 64-octet greeting. Under the NULL mechanism as-server SHALL be
    * zero on both sides (23/ZMTP), so the byte is constant; it is also
    * ignored on read. */
  private[graft] def greeting(asServer: Boolean): Array[Byte] = {
    val g = Array.ofDim[Byte](64)
    g(0) = 0xff.toByte
    g(9) = 0x7f
    g(10) = 3 // version-major
    g(11) = 0 // version-minor
    val m = "NULL".getBytes(US_ASCII)
    System.arraycopy(m, 0, g, 12, m.length)
    g(32) = 0 // as-server: zero under NULL regardless of role
    g
  }

  private[graft] def readGreeting(in: DataInputStream): Unit = {
    val g = Array.ofDim[Byte](64)
    in.readFully(g)
    require(g(0) == 0xff.toByte && g(9) == 0x7f.toByte,
      "ZMTP: bad signature (not a ZMTP peer)")
    require(g(10) >= 3, s"ZMTP: unsupported version-major ${g(10)}")
    val mech = new String(g, 12, 20, US_ASCII).takeWhile(_ != '\u0000')
    require(mech == "NULL", s"ZMTP: unsupported mechanism $mech")
  }

  /** READY command body: name + Socket-Type metadata property. */
  private[graft] def readyBody(socketType: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val name = "READY".getBytes(US_ASCII)
    bos.write(name.length); bos.write(name)
    val pn = "Socket-Type".getBytes(US_ASCII)
    val pv = socketType.getBytes(US_ASCII)
    bos.write(pn.length); bos.write(pn)
    bos.write((pv.length >>> 24) & 0xff); bos.write((pv.length >>> 16) & 0xff)
    bos.write((pv.length >>> 8) & 0xff); bos.write(pv.length & 0xff)
    bos.write(pv)
    bos.toByteArray
  }

  private[graft] def errorBody(reason: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val name = "ERROR".getBytes(US_ASCII)
    bos.write(name.length); bos.write(name)
    val r = reason.getBytes(US_ASCII).take(255)
    bos.write(r.length); bos.write(r)
    bos.toByteArray
  }

  // Untrusted network bytes: every offset/length is validated before
  // indexing so a truncated or malformed command surfaces as the
  // IllegalStateException PullServer already logs-and-rejects, not an
  // uncaught ArrayIndexOutOfBoundsException killing the thread.
  private def slice(body: Array[Byte], off: Int, len: Int): String = {
    // overflow-safe: `off + len` can wrap negative for an
    // attacker-controlled 4-byte length near Int.MaxValue, letting the
    // naive `off + len > length` guard pass; rearranged subtraction
    // cannot overflow (off >= 0 is checked first, so length - off is
    // exact; an off beyond the array makes it negative and any len >= 0
    // trips the guard).
    if (off < 0 || len < 0 || len > body.length - off)
      throw new IllegalStateException("ZMTP: malformed command")
    new String(body, off, len, US_ASCII)
  }

  private[graft] def errorReason(body: Array[Byte]): String = {
    if (body.length < 1)
      throw new IllegalStateException("ZMTP: malformed command")
    val nameLen = body(0) & 0xff
    if (2 + nameLen > body.length)
      throw new IllegalStateException("ZMTP: malformed command")
    val rLen = body(1 + nameLen) & 0xff
    slice(body, 2 + nameLen, rLen)
  }

  /** command body → (name, metadata properties). */
  private[graft] def parseCommand(
      body: Array[Byte]): (String, Map[String, String]) = {
    if (body.length < 1)
      throw new IllegalStateException("ZMTP: malformed command")
    val nameLen = body(0) & 0xff
    val name = slice(body, 1, nameLen)
    if (name != "READY") return (name, Map.empty)
    var i = 1 + nameLen
    val props = Map.newBuilder[String, String]
    while (i < body.length) {
      val nl = body(i) & 0xff
      val pn = slice(body, i + 1, nl)
      i += 1 + nl
      if (i + 4 > body.length)
        throw new IllegalStateException("ZMTP: malformed command")
      val vl = ((body(i) & 0xff) << 24) | ((body(i + 1) & 0xff) << 16) |
        ((body(i + 2) & 0xff) << 8) | (body(i + 3) & 0xff)
      val pv = slice(body, i + 4, vl)
      i += 4 + vl
      props += pn -> pv
    }
    (name, props.result())
  }

  /** 23/ZMTP socket-type compatibility — the rows this engine speaks. */
  private[graft] def compatible(mine: String, peer: String): Boolean =
    (mine, peer) match {
      case ("PAIR", "PAIR") => true
      case ("PUSH", "PULL") | ("PULL", "PUSH") => true
      case ("REQ", "REP") | ("REP", "REQ") => true
      case _ => false
    }

  private[graft] def writeFrame(out: DataOutputStream, flags: Int,
      body: Array[Byte]): Unit = out.synchronized {
    if (body.length <= 255 ) {
      out.writeByte(flags)
      out.writeByte(body.length)
    } else {
      out.writeByte(flags | FlagLong)
      out.writeLong(body.length.toLong) // DataOutputStream is big-endian
    }
    out.write(body)
    out.flush()
  }

  private[graft] def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val flags = in.readUnsignedByte()
    val len =
      if ((flags & FlagLong) != 0) {
        val l = in.readLong()
        // refuse before allocation: an 8-byte length near 2^63 (or the
        // plain 2 GB Int.MaxValue) must not reach `Array.ofDim`
        require(l >= 0 && l <= Framing.MaxFrameBytes,
          s"ZMTP: frame too large: $l")
        l.toInt
      } else in.readUnsignedByte()
    val body = Array.ofDim[Byte](len)
    in.readFully(body)
    (flags, body)
  }
}
