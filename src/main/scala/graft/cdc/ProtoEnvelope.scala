package graft.cdc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Protobuf output envelope (SURVEY.md §1.4 / §2.8 W3): the reference's
  * second wire format (proto/OraProtoBuf.proto:27-158 — RedoResponse with
  * one Payload per DML, Value columns, map<string,string> attributes),
  * encoded from scratch against the public protobuf wire format (tag =
  * field<<3|wire, base-128 varints, length-delimited submessages). No
  * generated code, no runtime dependency — but full wire COMPATIBILITY
  * with the reference .proto: ProtoWireParitySpec parses these bytes with
  * a stock protobuf-java runtime against descriptors transcribed from
  * OraProtoBuf.proto (zero unknown fields, byte-identical re-encode), so
  * a generated reference client decodes our stream as-is.
  *
  * Canonical-encoding rules so bytes are deterministic and goldenable:
  * fields in ascending field-number order, proto3 defaults omitted
  * (zero ints, empty strings) except inside oneofs, map/column entries in
  * sorted key order (the reference emits columns in dictionary order; maps
  * here are unordered, so sorting is the deterministic analogue).
  *
  * At scale the encoder is a per-row pure function (no shuffle, no state);
  * it runs inside the sink projection exactly like `to_json` does for W1.
  */
object ProtoEnvelope {

  // proto/OraProtoBuf.proto:28-36 (enum Op)
  private val opCode = Map(
    MsgOp.Begin -> 0, MsgOp.Commit -> 1, MsgOp.Insert -> 2, MsgOp.Update -> 3,
    MsgOp.Delete -> 4, MsgOp.Ddl -> 5, MsgOp.Checkpoint -> 6)

  // ResponseCode.PAYLOAD (proto:70-79)
  private val ResponsePayload = 5

  /** Base-128 little-endian varint. */
  def varint(v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(10)
    var x = v
    while ((x & ~0x7fL) != 0L) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write((x & 0x7f).toInt)
    out.toByteArray
  }

  private def key(field: Int, wire: Int): Array[Byte] =
    varint((field.toLong << 3) | wire)

  /** varint field; proto3 canonical: zero omitted. */
  private def vint(field: Int, v: Long): Array[Byte] =
    if (v == 0L) Array.emptyByteArray else key(field, 0) ++ varint(v)

  /** varint field inside a oneof: present even when zero. */
  private def vintOneof(field: Int, v: Long): Array[Byte] =
    key(field, 0) ++ varint(v)

  private def lenDelim(field: Int, b: Array[Byte]): Array[Byte] =
    key(field, 2) ++ varint(b.length.toLong) ++ b

  /** string field; empty/null omitted (proto3 default). */
  private def str(field: Int, s: String): Array[Byte] =
    if (s == null || s.isEmpty) Array.emptyByteArray
    else lenDelim(field, s.getBytes(UTF_8))

  /** Value{name=1, value_string=5} (proto:82-91; the string arm — typed
    * arms slot into the same shape). value_string is in a oneof → kept
    * even when empty. */
  def encodeValue(name: String, value: String): Array[Byte] =
    str(1, name) ++ lenDelim(5,
      (if (value == null) "" else value).getBytes(UTF_8))

  /** Schema{owner=1, name=2, obj=3} (proto:100-109). */
  def encodeSchema(owner: String, table: String, obj: Long): Array[Byte] =
    str(1, owner) ++ str(2, table) ++ vint(3, obj)

  /** Payload{op=1, schema=2, rid=3, before=4, after=5, ddl=6, num=10}
    * (proto:111-122). `num` is the per-message sequence the reference
    * emits under its message-numbering flag (BuilderProtobuf.h:83) —
    * 0 omits it (proto3 default), so flagless output is unchanged. */
  def encodePayload(op: String, owner: String, table: String, obj: Long,
      rid: String, before: Map[String, String], after: Map[String, String],
      ddl: String, num: Long = 0L): Array[Byte] = {
    def values(field: Int, m: Map[String, String]): Array[Byte] =
      if (m == null) Array.emptyByteArray
      else m.toSeq.sortBy(_._1)
        .map { case (k, v) => lenDelim(field, encodeValue(k, v)) }
        .foldLeft(Array.emptyByteArray)(_ ++ _)
    vint(1, opCode.getOrElse(op, 0).toLong) ++
      (if (owner != null)
        lenDelim(2, encodeSchema(owner, table, obj))
      else Array.emptyByteArray) ++
      str(3, rid) ++
      values(4, before) ++
      values(5, after) ++
      str(6, ddl) ++
      vint(10, num)
  }

  /** RedoResponse{code=1, scn=2(oneof), tm=4(oneof), xid=6(oneof), db=8,
    * payload=9, c_scn=10, c_idx=11, attributes=12} (proto:143-158). One
    * Payload per message — the streaming writer's per-DML shape. `tm`
    * (commit timestamp, BuilderProtobuf.h:113-125) and `db`
    * (BuilderProtobuf.h:190) are flag-gated in the reference; 0/null
    * omits them here the same way. */
  def encodeResponse(cScn: Long, cIdx: Long, scn: Long, xid: String,
      op: String, owner: String, table: String, obj: Long, rid: String,
      before: Map[String, String], after: Map[String, String], ddl: String,
      attrs: Map[String, String], tm: Long = 0L, db: String = null,
      num: Long = 0L): Array[Byte] = {
    def mapEntries(field: Int, m: Map[String, String]): Array[Byte] =
      if (m == null) Array.emptyByteArray
      else m.toSeq.sortBy(_._1)
        .map { case (k, v) => lenDelim(field, str(1, k) ++ str(2, v)) }
        .foldLeft(Array.emptyByteArray)(_ ++ _)
    vint(1, ResponsePayload.toLong) ++
      vintOneof(2, scn) ++
      (if (tm != 0L) vintOneof(4, tm) else Array.emptyByteArray) ++
      (if (xid == null || xid.isEmpty) Array.emptyByteArray
      else lenDelim(6, xid.getBytes(UTF_8))) ++
      str(8, db) ++
      lenDelim(9,
        encodePayload(op, owner, table, obj, rid, before, after, ddl, num)) ++
      vint(10, cScn) ++
      vint(11, cIdx) ++
      mapEntries(12, attrs)
  }

  // ----- W3 pull-protocol request/control messages ----------------------

  /** RequestCode (proto:62-67). */
  object Req { val Info = 0; val Start = 1; val Continue = 2; val Confirm = 3 }

  /** ResponseCode (proto:69-78). */
  object Resp {
    val Ready = 0; val FailedStart = 1; val Starting = 2
    val AlreadyStarted = 3; val Replicate = 4; val Payload = 5
    val InvalidDatabase = 6; val InvalidCommand = 7
  }

  /** RedoRequest (proto:129-141) — the client→server control message.
    * Option = proto3 field presence (c_scn 0 with presence is legal and
    * means "continue from last", WriterStream.cpp:186-196). */
  case class RedoRequest(code: Int, db: String, scn: Option[Long] = None,
      seq: Option[Long] = None, cScn: Option[Long] = None,
      cIdx: Option[Long] = None, tms: Option[String] = None,
      tmRel: Option[Long] = None)

  def encodeRequest(r: RedoRequest): Array[Byte] =
    vint(1, r.code.toLong) ++ str(2, r.db) ++
      r.scn.map(vintOneof(3, _)).getOrElse(Array.emptyByteArray) ++
      r.tms.map(s => lenDelim(4, s.getBytes(UTF_8)))
        .getOrElse(Array.emptyByteArray) ++
      r.tmRel.map(vintOneof(5, _)).getOrElse(Array.emptyByteArray) ++
      r.seq.map(vintOneof(6, _)).getOrElse(Array.emptyByteArray) ++
      r.cScn.map(vintOneof(8, _)).getOrElse(Array.emptyByteArray) ++
      r.cIdx.map(vintOneof(9, _)).getOrElse(Array.emptyByteArray)

  /** Generic top-level field walk of the scratch wire format (varint and
    * length-delimited wires only — all the pull protocol uses). */
  private def walkFields(b: Array[Byte]): Seq[(Int, Either[Long, Array[Byte]])] = {
    var i = 0
    def rdVarint(): Long = {
      var x = 0L; var shift = 0
      while ({ val c = b(i) & 0xff; i += 1
        x |= (c & 0x7fL) << shift; shift += 7; (c & 0x80) != 0 }) ()
      x
    }
    val out = Seq.newBuilder[(Int, Either[Long, Array[Byte]])]
    while (i < b.length) {
      val k = rdVarint()
      val field = (k >> 3).toInt
      (k & 7) match {
        case 0 => out += field -> Left(rdVarint())
        case 2 =>
          val n = rdVarint().toInt
          out += field -> Right(java.util.Arrays.copyOfRange(b, i, i + n))
          i += n
        case w => throw new IllegalArgumentException(s"wire type $w")
      }
    }
    out.result()
  }

  def decodeRequest(b: Array[Byte]): RedoRequest = {
    var r = RedoRequest(Req.Info, "")
    walkFields(b).foreach {
      case (1, Left(v)) => r = r.copy(code = v.toInt)
      case (2, Right(s)) => r = r.copy(db = new String(s, UTF_8))
      case (3, Left(v)) => r = r.copy(scn = Some(v))
      case (4, Right(s)) => r = r.copy(tms = Some(new String(s, UTF_8)))
      case (5, Left(v)) => r = r.copy(tmRel = Some(v))
      case (6, Left(v)) => r = r.copy(seq = Some(v))
      case (8, Left(v)) => r = r.copy(cScn = Some(v))
      case (9, Left(v)) => r = r.copy(cIdx = Some(v))
      case _ => // schema requests (7) and unknown fields: skipped
    }
    r
  }

  /** Non-payload RedoResponse (code + optional positions) — the control
    * arm of WriterStream::processInfo/Start/Continue. */
  def encodeControlResponse(code: Int, scn: Option[Long] = None,
      cScn: Option[Long] = None, cIdx: Option[Long] = None): Array[Byte] =
    vint(1, code.toLong) ++
      scn.map(vintOneof(2, _)).getOrElse(Array.emptyByteArray) ++
      cScn.map(v => key(10, 0) ++ varint(v)).getOrElse(Array.emptyByteArray) ++
      cIdx.map(v => key(11, 0) ++ varint(v)).getOrElse(Array.emptyByteArray)

  /** Decoded control view of a RedoResponse (ignores payload bytes). */
  case class ControlResponse(code: Int, scn: Option[Long],
      cScn: Option[Long], cIdx: Option[Long])

  def decodeControlResponse(b: Array[Byte]): ControlResponse = {
    var r = ControlResponse(Resp.Ready, None, None, None)
    walkFields(b).foreach {
      case (1, Left(v)) => r = r.copy(code = v.toInt)
      case (2, Left(v)) => r = r.copy(scn = Some(v))
      case (10, Left(v)) => r = r.copy(cScn = Some(v))
      case (11, Left(v)) => r = r.copy(cIdx = Some(v))
      case _ =>
    }
    r
  }

  /** W3 framing: 32-bit little-endian length prefix
    * (StreamNetwork.cpp:122-146; the 64-bit escape for >4 GiB messages is
    * out of scope — maxMessageMb caps far below it). */
  def frame(msg: Array[Byte]): Array[Byte] = {
    val n = msg.length
    Array[Byte](
      (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte) ++ msg
  }

  /** enriched rows (Materialize output) → (key, value_bin) frame; the
    * binary twin of [[Envelope.toMessages]]. The flag-gated reference
    * fields follow the same knobs as the JSON envelope: `timestampCommit`
    * → RedoResponse.tm (commit clock nanos, BuilderProtobuf.h:113-125),
    * `dbName` → RedoResponse.db (:190), `addSequences` → Payload.num
    * (:83); defaults leave them off the wire, exactly like the reference
    * without those format bits. */
  def toMessages(enriched: DataFrame,
      fmt: Envelope.Format = Envelope.Format()): DataFrame = {
    // scalars packed into arrays: Scala UDFs take ≤10 args
    val enc = udf((nums: Seq[Long], strs: Seq[String],
        before: Map[String, String], after: Map[String, String],
        attrs: Map[String, String]) =>
      encodeResponse(nums(0), nums(1), nums(2), strs(0), strs(1), strs(2),
        strs(3), nums(3), strs(4), before, after, strs(5), attrs,
        tm = nums(4), db = strs(6), num = nums(5)))
    val tmCol =
      if (fmt.timestampCommit) col("tm").cast("long") else lit(0L)
    val numCol =
      if (fmt.addSequences) coalesce(col("num"), lit(0L)) else lit(0L)
    val dbCol =
      if (fmt.dbName.nonEmpty) lit(fmt.dbName) else lit(null).cast("string")
    enriched.withColumn("value_bin",
        enc(array(col("cScn"), col("cIdx"), col("scn"), col("obj"),
            tmCol, numCol),
          array(col("xid"), col("op"), col("owner"), col("table_name"),
            col("rid"), col("ddlText"), dbCol),
          col("before"), col("after"), col("attrs")))
      .withColumn("key", col("tag"))
  }
}
