package graft.sinks

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException, SocketTimeoutException}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import graft.cdc.ProtoEnvelope
import graft.cdc.ProtoEnvelope.{Req, Resp}

/** W3 network pull server — the writer-side endpoint clients resume
  * through (WriterStream.cpp:52-290 over StreamNetwork framing). A client
  * drives INFO → START/CONTINUE → payload stream, acking with CONFIRM
  * (c_scn, c_idx); on reconnect, INFO reports the confirmed watermark and
  * CONTINUE replays everything after it — at-least-once delivery with an
  * idempotent (c_scn, c_idx) key, exactly the reference's contract.
  *
  * Round 6: serves N concurrent clients (thread per connection) over ONE
  * outbox, and the outbox is a QUEUE, not an archive — `append` grows it
  * and confirms truncate it, the reference Writer's confirmed-message GC
  * (Writer.cpp:106-165: confirmed queue entries pop and their builder
  * buffers release) generalized to many readers: an entry is dropped once
  * every LIVE client has confirmed past it AND the global contiguous
  * watermark covers it (so a reconnect resuming from the watermark can
  * always be served from what remains). A connected client that has not
  * confirmed anything pins the queue, like the reference's unconfirmed
  * queue head. With no clients connected nothing is dropped.
  *
  * Scope: loopback TCP, blocking I/O — the PROTOCOL is the deliverable
  * (the wire bytes are already byte-golden via q48); a production
  * deployment would put the same state machine behind ZeroMQ or keep
  * Kafka as the scale sink (Sinks.kafkaWriter). */
final class PullServer(database: String,
    initial: IndexedSeq[(Long, Long, Array[Byte])],
    prom: Option[graft.streaming.Prometheus] = None,
    framing: Framing = PlainFraming) {

  private val tracker = new Sinks.ConfirmTracker
  private val server = new ServerSocket(0, 8,
    java.net.InetAddress.getLoopbackAddress)
  server.setSoTimeout(200)
  @volatile private var running = true
  @volatile private var started = false // metadata STATUS::REPLICATING analogue
  private var sentMax: Option[(Long, Long)] = None // tracker-fed prefix

  /** Writer queue: grows at the tail, truncated at the head by [[gc]]. */
  private val outbox =
    scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
  outbox ++= initial
  private val obLock = new Object
  /** conn id → that client's highest confirmed position; NoConfirm until
    * its first CONFIRM. Entry removed on disconnect. */
  private val clientConfirms = new ConcurrentHashMap[Long, (Long, Long)]()
  private val connSeq = new AtomicLong(0L)
  private val NoConfirm = (Long.MinValue, Long.MinValue)

  def port: Int = server.getLocalPort
  def confirmed: Option[(Long, Long)] = tracker.confirmed
  def outboxSize: Int = obLock.synchronized(outbox.size)
  def clientCount: Int = clientConfirms.size

  /** Producer side: enqueue one encoded message (ids must ascend). */
  def append(cScn: Long, cIdx: Long, bytes: Array[Byte]): Unit =
    obLock.synchronized {
      require(outbox.lastOption.forall(e =>
        Ordering[(Long, Long)].lt((e._1, e._2), (cScn, cIdx))),
        "outbox appends must be ordered")
      outbox += ((cScn, cIdx, bytes))
    }

  private def outboxSnapshot: IndexedSeq[(Long, Long, Array[Byte])] =
    obLock.synchronized(outbox.toIndexedSeq)

  /** Drop the head entries every live client has confirmed past, bounded
    * by the global contiguous watermark (reconnect-from-watermark must
    * stay servable). No live clients → no truncation. */
  private def gc(): Unit = obLock.synchronized {
    import scala.jdk.CollectionConverters._
    val live = clientConfirms.values().asScala.toSeq
    val floor =
      if (live.isEmpty) None
      else tracker.confirmed.map(g => (g +: live).min)
    floor.foreach { m =>
      val keepFrom = outbox.indexWhere { case (s, i, _) =>
        Ordering[(Long, Long)].gt((s, i), m)
      }
      val dropped =
        if (keepFrom < 0) outbox.toSeq else outbox.take(keepFrom).toSeq
      if (keepFrom < 0) outbox.clear()
      else if (keepFrom > 0) outbox.remove(0, keepFrom)
      // the reference's confirmMessage emit (Writer.cpp:107-110): one
      // per queue entry popped by the cumulative confirm
      prom.foreach { p =>
        dropped.foreach { case (_, _, b) =>
          p.emitMessagesConfirmed(1); p.emitBytesConfirmed(b.length.toLong)
        }
      }
    }
  }

  private val thread = new Thread(() => serveLoop(), "graft-pull-server")
  thread.setDaemon(true)
  thread.start()

  private def serveLoop(): Unit =
    while (running) {
      try {
        val sock = server.accept()
        val connId = connSeq.incrementAndGet()
        val t = new Thread(() => {
          clientConfirms.put(connId, NoConfirm)
          try serveClient(sock, connId)
          catch {
            case _: EOFException => // client went away mid-frame
            case _: SocketException =>
            case e @ (_: IllegalStateException | _: IllegalArgumentException) =>
              // framing handshake rejection (e.g. ZMTP socket-type or
              // signature mismatch): that connection dies, server lives
              System.err.println(s"[pull-server] conn $connId: ${e.getMessage}")
          } finally {
            clientConfirms.remove(connId)
            gc() // a departed client no longer pins the queue
            try sock.close() catch { case _: Throwable => }
          }
        }, s"graft-pull-client-$connId")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketTimeoutException => // poll the running flag
        case _: SocketException if !running =>
      }
    }

  private def serveClient(sock: Socket, connId: Long): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    framing.serverHandshake(in, out)
    while (running) {
      val req = ProtoEnvelope.decodeRequest(framing.recv(in))
      req.code match {
        case Req.Info =>
          // processInfo: wrong db rejected; otherwise status + positions.
          send(out, if (req.db != database)
            ProtoEnvelope.encodeControlResponse(Resp.InvalidDatabase)
          else if (!started)
            ProtoEnvelope.encodeControlResponse(Resp.Ready)
          else ProtoEnvelope.encodeControlResponse(Resp.Replicate,
            scn = outboxSnapshot.headOption.map(_._1),
            cScn = Some(tracker.confirmed.map(_._1).getOrElse(0L)),
            cIdx = Some(tracker.confirmed.map(_._2).getOrElse(0L))))

        case Req.Start =>
          if (req.db != database)
            send(out, ProtoEnvelope.encodeControlResponse(Resp.InvalidDatabase))
          else if (started)
            // processStart: a second START reports ALREADY_STARTED with
            // the data scn + confirmed position (the client then CONTINUEs)
            send(out, ProtoEnvelope.encodeControlResponse(Resp.AlreadyStarted,
              scn = outboxSnapshot.headOption.map(_._1),
              cScn = Some(tracker.confirmed.map(_._1).getOrElse(0L)),
              cIdx = Some(tracker.confirmed.map(_._2).getOrElse(0L))))
          else if (req.tms.nonEmpty || req.tmRel.nonEmpty)
            // time-based start needs the replicator's DB clock to resolve
            // time→scn (ReplicatorOnline); this engine's feed is
            // scn-addressed, so the request fails cleanly instead of
            // guessing — the reference's FAILED_START arm
            send(out, ProtoEnvelope.encodeControlResponse(Resp.FailedStart))
          else {
            started = true
            send(out, ProtoEnvelope.encodeControlResponse(Resp.Replicate,
              scn = outboxSnapshot.headOption.map(_._1),
              cScn = Some(0L), cIdx = Some(0L)))
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
            stream(out, from)
          }

        case Req.Confirm =>
          // processConfirm: no response; the confirm is CUMULATIVE —
          // every queued message at or below (c_scn, c_idx) confirms
          // (WriterStream.cpp:215-217 pops the whole prefix; the client
          // acks only each 1000th message and relies on this). This
          // client's position advances monotonically and fully-covered
          // queue entries are dropped.
          for (cs <- req.cScn; ci = req.cIdx.getOrElse(0L)) {
            tracker.confirmUpTo(cs, ci)
            clientConfirms.computeIfPresent(connId, (_, old) =>
              if (Ordering[(Long, Long)].gt((cs, ci), old)) (cs, ci) else old)
            gc()
          }

        case _ =>
          send(out, ProtoEnvelope.encodeControlResponse(Resp.InvalidCommand))
      }
    }
  }

  /** Send every outbox message strictly after `after` as a payload frame,
    * feeding the confirm tracker the first time an id is sent (replays of
    * an unconfirmed suffix — by this or any other client — are not
    * re-counted). */
  private def stream(out: DataOutputStream, after: Option[(Long, Long)]): Unit = {
    val ord = Ordering[(Long, Long)]
    outboxSnapshot.iterator
      .filter { case (s, i, _) => after.forall(a => ord.gt((s, i), a)) }
      .foreach { case (s, i, bytes) =>
        synchronized {
          if (sentMax.forall(m => ord.gt((s, i), m))) {
            tracker.sent(s, i)
            sentMax = Some((s, i))
          }
        }
        send(out, bytes)
        // the reference's exact emit point (Writer.cpp:301-305: after
        // sendMessage). Replays to a resuming client count again, like
        // the reference's resend path — sent ≠ confirmed by design.
        prom.foreach { p =>
          p.emitMessagesSent(1); p.emitBytesSent(bytes.length.toLong)
        }
      }
  }

  private def send(out: DataOutputStream, msg: Array[Byte]): Unit =
    out.synchronized { framing.send(out, msg) }

  def close(): Unit = {
    running = false
    server.close()
  }
}
