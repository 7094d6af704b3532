package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import graft.cdc.ProtoEnvelope
import graft.cdc.ProtoEnvelope.{ControlResponse, RedoRequest, Req, Resp}

/** Client side of the W3 pull protocol — the reference's StreamClient
  * utility (src/StreamClient.cpp) as a reusable component: INFO to learn
  * the server state, START (fresh server) or CONTINUE (running server)
  * per StreamClient.cpp:150-196, then a consume loop acking with CONFIRM
  * every `confirmEvery` messages (StreamClient.cpp:199-228 confirms each
  * 1000th). The start-position grammar is StreamClient.cpp:84-100's,
  * parsed by [[PullClient.StartSpec.parse]].
  *
  * Blocking loopback TCP like [[PullServer]] — the protocol state machine
  * and wire bytes are the deliverable (byte-golden via q48 +
  * ProtoWireParitySpec); transports are deployment plumbing. */
object PullClient {

  /** StreamClient.cpp:84-100: `now{,seq}` / `scn:<scn>{,seq}` /
    * `time:<tms>{,seq}` / `time_rel:<s>{,seq}` / `c:<scn>,<idx>` /
    * `next`. */
  sealed trait StartSpec
  case class StartNow(seq: Option[Long]) extends StartSpec
  case class StartScn(scn: Long, seq: Option[Long]) extends StartSpec
  case class StartTime(tms: String, seq: Option[Long]) extends StartSpec
  case class StartTimeRel(sec: Long, seq: Option[Long]) extends StartSpec
  case class Continue(cScn: Long, cIdx: Long) extends StartSpec
  case object Next extends StartSpec

  object StartSpec {
    def parse(s: String): StartSpec = {
      def split(rest: String): (String, Option[Long]) = {
        val i = rest.indexOf(',')
        if (i < 0) (rest, None)
        else (rest.substring(0, i), Some(rest.substring(i + 1).toLong))
      }
      if (s == "next") Next
      else if (s == "now") StartNow(None)
      else if (s.startsWith("now,"))
        StartNow(Some(s.stripPrefix("now,").toLong))
      else if (s.startsWith("scn:")) {
        val (v, seq) = split(s.stripPrefix("scn:")); StartScn(v.toLong, seq)
      }
      else if (s.startsWith("time_rel:")) {
        val (v, seq) = split(s.stripPrefix("time_rel:"))
        StartTimeRel(v.toLong, seq)
      }
      else if (s.startsWith("time:")) {
        val (v, seq) = split(s.stripPrefix("time:")); StartTime(v, seq)
      }
      else if (s.startsWith("c:")) {
        val parts = s.stripPrefix("c:").split(",", 2)
        require(parts.length == 2, s"expected c:<scn>,<idx>, got $s")
        Continue(parts(0).toLong, parts(1).toLong)
      }
      else throw new IllegalArgumentException(
        "expected [now{,<seq>}|scn:<scn>{,<seq>}|time_rel:<time>{,<seq>}|" +
          s"time:<time>{,<seq>}|c:<scn>,<idx>|next], got: $s")
    }
  }

  /** The CLI shape of the reference utility:
    * `PullClient <host:port> <database> <protobuf|json> <startSpec>` —
    * connects, drives the session, prints one line per payload,
    * confirms every 1000th. */
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "use: PullClient <host:port> <database> <protobuf|json> " +
        "[now{,<seq>}|scn:<scn>{,<seq>}|c:<scn>,<idx>|next]")
    val Array(host, port) = args(0).split(":", 2)
    val c = new PullClient(host, port.toInt, args(1), args(2))
    try {
      val info = c.info()
      println(s"- code: ${info.code}, scn: ${info.scn.getOrElse(0L)}, " +
        s"confirmed: ${info.cScn.getOrElse(0L)},${info.cIdx.getOrElse(0L)}")
      c.begin(info, StartSpec.parse(args(3)))
      var n = 0L
      c.consume { bytes =>
        n += 1
        if (n % 1000 == 0) println(s"messages: $n (last ${bytes.length}B)")
        true
      }
    } finally c.close()
  }
}

final class PullClient(host: String, port: Int, database: String,
    format: String = "protobuf",
    framing: Framing = PlainFraming) extends AutoCloseable {
  require(format == "protobuf" || format == "json",
    s"incorrect format, expected: [protobuf|json], got $format")
  import PullClient._

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)
  framing.clientHandshake(in, out)

  private def send(r: RedoRequest): Unit =
    framing.send(out, ProtoEnvelope.encodeRequest(r))

  private def readFrame(): Array[Byte] = framing.recv(in)

  /** INFO: server state + confirmed watermark (processInfo). */
  def info(): ControlResponse = {
    send(RedoRequest(Req.Info, database))
    ProtoEnvelope.decodeControlResponse(readFrame())
  }

  /** Drive the session opening per the server's INFO answer
    * (StreamClient.cpp:150-196): READY → START with the position spec;
    * REPLICATE → CONTINUE with `c:`/`next`. Throws on a spec/state
    * mismatch, like the reference client. */
  def begin(info: ControlResponse, spec: StartSpec): ControlResponse = {
    val req = (info.code, spec) match {
      case (Resp.Ready, StartNow(seq)) =>
        RedoRequest(Req.Start, database, seq = seq)
      case (Resp.Ready, StartScn(scn, seq)) =>
        RedoRequest(Req.Start, database, scn = Some(scn), seq = seq)
      case (Resp.Ready, StartTime(tms, seq)) =>
        RedoRequest(Req.Start, database, tms = Some(tms), seq = seq)
      case (Resp.Ready, StartTimeRel(s, seq)) =>
        RedoRequest(Req.Start, database, tmRel = Some(s), seq = seq)
      case (Resp.Ready, other) =>
        throw new IllegalStateException(
          s"server is waiting for a start position, got $other")
      case (Resp.Replicate, Continue(cs, ci)) =>
        RedoRequest(Req.Continue, database,
          cScn = Some(cs), cIdx = Some(ci))
      case (Resp.Replicate, Next) =>
        // c_scn 0 with presence = "from the confirmed watermark"
        RedoRequest(Req.Continue, database, cScn = Some(0L), cIdx = Some(0L))
      case (Resp.Replicate, other) =>
        throw new IllegalStateException(
          s"server already started, expected c:<scn>,<idx> or next, got $other")
      case (code, _) =>
        throw new IllegalStateException(s"server returned code $code")
    }
    send(req)
    val resp = ProtoEnvelope.decodeControlResponse(readFrame())
    if (resp.code != Resp.Replicate)
      throw new IllegalStateException(
        s"server returned code ${resp.code} for request code ${req.code}")
    resp
  }

  /** A payload's confirm position, per wire format (StreamClient.cpp:
    * 256-270: protobuf reads RedoResponse.c_scn/c_idx, json parses the
    * envelope document's "c_scn"/"c_idx" fields). */
  private[sinks] def position(bytes: Array[Byte]): Option[(Long, Long)] =
    if (format == "protobuf") {
      val r = ProtoEnvelope.decodeControlResponse(bytes)
      r.cScn.map(cs => (cs, r.cIdx.getOrElse(0L)))
    } else {
      import org.json4s._
      val doc = org.json4s.jackson.JsonMethods.parse(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      (doc \ "c_scn", doc \ "c_idx") match {
        case (JInt(s), JInt(i)) => Some((s.toLong, i.toLong))
        case (JInt(s), _) => Some((s.toLong, 0L))
        case _ => None
      }
    }

  /** Payload loop: hand each framed message to `f`; a false return stops
    * consuming. Confirms every `confirmEvery`-th message with that
    * message's (c_scn, c_idx) — the reference's each-1000th cadence, and
    * ONLY that cadence (StreamClient.cpp:213-222: an exiting client
    * leaves its unconfirmed suffix replayable). */
  def consume(f: Array[Byte] => Boolean, confirmEvery: Int = 1000): Unit = {
    var n = 0L
    var go = true
    while (go) {
      val bytes = readFrame()
      n += 1
      go = f(bytes)
      if (n % confirmEvery == 0)
        position(bytes).foreach { case (cs, ci) => confirm(cs, ci) }
    }
  }

  /** CONFIRM (c_scn, c_idx): no response (processConfirm). */
  def confirm(cScn: Long, cIdx: Long): Unit =
    send(RedoRequest(Req.Confirm, database,
      cScn = Some(cScn), cIdx = Some(cIdx)))

  def close(): Unit = sock.close()
}
