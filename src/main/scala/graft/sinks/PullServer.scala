package graft.sinks

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException, SocketTimeoutException}
import graft.cdc.ProtoEnvelope
import graft.cdc.ProtoEnvelope.{Req, Resp}

/** W3 network pull server — the writer-side endpoint clients resume
  * through (WriterStream.cpp:52-290 over StreamNetwork framing). A client
  * drives INFO → START/CONTINUE → payload stream, acking with CONFIRM
  * (c_scn, c_idx); on reconnect, INFO reports the confirmed watermark and
  * CONTINUE replays everything after it — at-least-once delivery with an
  * idempotent (c_scn, c_idx) key, exactly the reference's contract.
  *
  * Scope: loopback TCP, one client at a time, blocking I/O — the
  * PROTOCOL is the deliverable (the wire bytes are already byte-golden
  * via q48); a production deployment would put the same state machine
  * behind ZeroMQ or keep Kafka as the scale sink (Sinks.kafkaWriter).
  * The message source is the writer's in-order outbox: (c_scn, c_idx,
  * encoded RedoResponse bytes), e.g. ProtoEnvelope.toMessages output.
  */
final class PullServer(database: String,
    outbox: IndexedSeq[(Long, Long, Array[Byte])]) {

  private val tracker = new Sinks.ConfirmTracker
  private val server = new ServerSocket(0, 1,
    java.net.InetAddress.getLoopbackAddress)
  server.setSoTimeout(200)
  @volatile private var running = true
  private var started = false // metadata STATUS::REPLICATING analogue
  private var sentMax: Option[(Long, Long)] = None // tracker-fed prefix

  def port: Int = server.getLocalPort
  def confirmed: Option[(Long, Long)] = tracker.confirmed

  private val thread = new Thread(() => serveLoop(), "graft-pull-server")
  thread.setDaemon(true)
  thread.start()

  private def serveLoop(): Unit =
    while (running) {
      try {
        val sock = server.accept()
        try serveClient(sock)
        finally sock.close()
      } catch {
        case _: SocketTimeoutException => // poll the running flag
        case _: SocketException if !running =>
        case _: EOFException => // client went away mid-frame: await next
      }
    }

  private def serveClient(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    var streaming = false
    try while (running) {
      val req = ProtoEnvelope.decodeRequest(readFrame(in))
      req.code match {
        case Req.Info =>
          // processInfo: wrong db rejected; otherwise status + positions.
          // When streaming, INFO also pauses the stream (pollQueue:240).
          streaming = false
          send(out, if (req.db != database)
            ProtoEnvelope.encodeControlResponse(Resp.InvalidDatabase)
          else if (!started)
            ProtoEnvelope.encodeControlResponse(Resp.Ready)
          else ProtoEnvelope.encodeControlResponse(Resp.Replicate,
            scn = outbox.headOption.map(_._1),
            cScn = Some(tracker.confirmed.map(_._1).getOrElse(0L)),
            cIdx = Some(tracker.confirmed.map(_._2).getOrElse(0L))))

        case Req.Start =>
          if (req.db != database)
            send(out, ProtoEnvelope.encodeControlResponse(Resp.InvalidDatabase))
          else if (started)
            // processStart: a second START reports ALREADY_STARTED with
            // the data scn + confirmed position (the client then CONTINUEs)
            send(out, ProtoEnvelope.encodeControlResponse(Resp.AlreadyStarted,
              scn = outbox.headOption.map(_._1),
              cScn = Some(tracker.confirmed.map(_._1).getOrElse(0L)),
              cIdx = Some(tracker.confirmed.map(_._2).getOrElse(0L))))
          else {
            started = true
            send(out, ProtoEnvelope.encodeControlResponse(Resp.Replicate,
              scn = outbox.headOption.map(_._1),
              cScn = Some(0L), cIdx = Some(0L)))
            streaming = true
            // start position: scn none/0 = NOW per the reference; a given
            // scn streams everything from that scn on
            stream(out, req.scn.filter(_ > 0L).map(s => (s - 1, Long.MaxValue)))
          }

        case Req.Continue =>
          if (req.db != database)
            send(out, ProtoEnvelope.encodeControlResponse(Resp.InvalidDatabase))
          else {
            // processContinue: resume from the client's position when it
            // sends one (c_scn != 0), else from the confirmed watermark
            val from = req.cScn.filter(_ != 0L)
              .map(s => (s, req.cIdx.getOrElse(0L)))
              .orElse(tracker.confirmed)
            started = true
            send(out, ProtoEnvelope.encodeControlResponse(Resp.Replicate))
            streaming = true
            stream(out, from)
          }

        case Req.Confirm =>
          // processConfirm: no response; watermark advances contiguously
          for (cs <- req.cScn; ci = req.cIdx.getOrElse(0L))
            tracker.confirm(cs, ci)

        case _ =>
          send(out, ProtoEnvelope.encodeControlResponse(Resp.InvalidCommand))
      }
    } catch {
      case _: EOFException => // client disconnected: serve the next one
      case _: SocketException if !running =>
    }
  }

  /** Send every outbox message strictly after `after` as a payload frame,
    * feeding the confirm tracker the first time an id is sent (replays of
    * an unconfirmed suffix after reconnect are not re-counted). */
  private def stream(out: DataOutputStream, after: Option[(Long, Long)]): Unit = {
    val ord = Ordering[(Long, Long)]
    outbox.iterator
      .filter { case (s, i, _) => after.forall(a => ord.gt((s, i), a)) }
      .foreach { case (s, i, bytes) =>
        if (sentMax.forall(m => ord.gt((s, i), m))) {
          tracker.sent(s, i)
          sentMax = Some((s, i))
        }
        send(out, bytes)
      }
  }

  private def send(out: DataOutputStream, msg: Array[Byte]): Unit = {
    out.write(ProtoEnvelope.frame(msg))
    out.flush()
  }

  private def readFrame(in: DataInputStream): Array[Byte] = {
    val len = Array.ofDim[Byte](4)
    in.readFully(len)
    val n = (len(0) & 0xff) | ((len(1) & 0xff) << 8) |
      ((len(2) & 0xff) << 16) | ((len(3) & 0xff) << 24)
    val body = Array.ofDim[Byte](n)
    in.readFully(body)
    body
  }

  def close(): Unit = {
    running = false
    server.close()
  }
}
