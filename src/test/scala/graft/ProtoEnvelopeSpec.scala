package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.cdc._

/** Scratch protobuf wire encoder: varint/golden-bytes checks plus a
  * decode-and-compare roundtrip through the real Materialize pipeline
  * (proto/OraProtoBuf.proto:82-158 field numbers). */
class ProtoEnvelopeSpec extends AnyFunSuite {

  // --- minimal wire-format reader (test-side only) ---
  private def readVarint(b: Array[Byte], p0: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = p0
    while ({ val x = b(p) & 0xff; v |= (x & 0x7fL) << shift; shift += 7; p += 1
      (x & 0x80) != 0 }) ()
    (v, p)
  }

  /** field → values in order (Long for varint, Array[Byte] for len-delim). */
  private def decode(b: Array[Byte]): Seq[(Int, Any)] = {
    var p = 0
    val out = Seq.newBuilder[(Int, Any)]
    while (p < b.length) {
      val (k, p1) = readVarint(b, p)
      val field = (k >> 3).toInt
      (k & 7) match {
        case 0 => val (v, p2) = readVarint(b, p1); out += field -> v; p = p2
        case 2 =>
          val (n, p2) = readVarint(b, p1)
          out += field -> b.slice(p2, p2 + n.toInt); p = p2 + n.toInt
        case w => fail(s"unexpected wire type $w")
      }
    }
    out.result()
  }

  private def hexOf(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  test("varint encoding") {
    assert(ProtoEnvelope.varint(0L).toSeq == Seq[Byte](0))
    assert(ProtoEnvelope.varint(127L).toSeq == Seq[Byte](127))
    assert(ProtoEnvelope.varint(128L).toSeq == Seq(0x80.toByte, 0x01.toByte))
    assert(ProtoEnvelope.varint(300L).toSeq == Seq(0xAC.toByte, 0x02.toByte))
    assert(ProtoEnvelope.varint(-1L).length == 10) // uint64 two's complement
  }

  test("varint roundtrips across the full uint64 range (fuzz)") {
    val rnd = new scala.util.Random(7)
    val interesting = Seq(0L, 1L, 127L, 128L, 16383L, 16384L,
      Int.MaxValue.toLong, Long.MaxValue, Long.MinValue, -1L)
    (interesting ++ Seq.fill(500)(rnd.nextLong())).foreach { v =>
      val b = ProtoEnvelope.varint(v)
      val (back, used) = readVarint(b, 0)
      assert(back == v && used == b.length, s"varint roundtrip failed for $v")
    }
  }

  test("golden bytes: minimal response") {
    // code=PAYLOAD, scn=2 (oneof: kept), payload{op=INSERT}, c_scn=3,
    // c_idx=0 omitted (proto3 default)
    val b = ProtoEnvelope.encodeResponse(3L, 0L, 2L, null, MsgOp.Insert,
      null, null, 0L, null, null, null, null, null)
    assert(hexOf(b) == "080510024A0208025003")
  }

  test("frame: 32-bit LE length prefix (StreamNetwork.cpp:122-146)") {
    val f = ProtoEnvelope.frame(Array[Byte](1, 2, 3))
    assert(f.take(4).toSeq == Seq[Byte](3, 0, 0, 0))
    assert(f.drop(4).toSeq == Seq[Byte](1, 2, 3))
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Pipeline wireFormat=proto: batch replay emits decodable RedoResponse bytes") {
    implicit val s: SparkSession = spark
    val dir = java.nio.file.Files.createTempDirectory("proto_pipe").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "feed_001.jsonl"))
    w.println("""{"scn":1,"xid":"1.0.1","op":"BEGIN"}""")
    w.println("""{"scn":2,"xid":"1.0.1","op":"INS","obj":100,"after":{"ID":"7"}}""")
    w.println("""{"scn":3,"xid":"1.0.1","op":"COMMIT"}""")
    w.close()
    val dict = Dictionary(Seq(DbTable(100L, 100L, "OWNER1", "T1",
      Seq(DbColumn("ID", 2, numPk = 1)), tagType = "pk")))
    val out = graft.streaming.Pipeline.batch(spark,
      graft.streaming.Pipeline.Config(
        graft.streaming.Pipeline.SourceConfig(dir.getAbsolutePath),
        dict, wireFormat = "proto")).collect()
    assert(out.length == 1)
    val top = decode(out.head.getAs[Array[Byte]]("value")).toMap
    assert(top(2) == 2L) // scn
    assert(top(10) == 3L) // c_scn = commit scn
    assert(out.head.getAs[Long]("c_scn") == 3L)
  }

  test("roundtrip through Materialize: fields decode to the source values") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val dict = Dictionary(Seq(DbTable(100L, 100L, "OWNER1", "T1",
      Seq(DbColumn("ID", 2, numPk = 1), DbColumn("VAL", 1)), tagType = "pk")))
    val messages = TxnAssembly.assembleBatch(Seq(
      ChangeEvent(2L, "9.0.1", Op.Ins).copy(obj = 100L,
        after = Map("ID" -> "7", "VAL" -> "x"), attrs = Map.empty,
        before = Map.empty),
      ChangeEvent(3L, "9.0.1", Op.Commit)).toDS())
    val bin = ProtoEnvelope.toMessages(Materialize(messages, dict))
      .select("value_bin").collect().head.getAs[Array[Byte]](0)

    val top = decode(bin).toMap
    assert(top(1) == 5L) // ResponseCode.PAYLOAD
    assert(top(2) == 2L) // scn
    assert(new String(top(6).asInstanceOf[Array[Byte]]) == "9.0.1") // xid
    assert(top(10) == 3L) // c_scn

    val payload = decode(top(9).asInstanceOf[Array[Byte]])
    assert(payload.toMap.apply(1) == 2L) // Op.INSERT
    val schema = decode(payload.toMap.apply(2).asInstanceOf[Array[Byte]]).toMap
    assert(new String(schema(1).asInstanceOf[Array[Byte]]) == "OWNER1")
    assert(new String(schema(2).asInstanceOf[Array[Byte]]) == "T1")
    assert(schema(3) == 100L)
    // after values (field 5), sorted by column name: ID then VAL
    val afters = payload.filter(_._1 == 5).map(e =>
      decode(e._2.asInstanceOf[Array[Byte]]).toMap)
    assert(afters.map(v => new String(v(1).asInstanceOf[Array[Byte]])) ==
      Seq("ID", "VAL"))
    assert(afters.map(v => new String(v(5).asInstanceOf[Array[Byte]])) ==
      Seq("7", "x"))
  }

  test("flag-gated tm/db/num follow the JSON envelope knobs on the wire") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val dict = Dictionary(Seq(DbTable(100L, 100L, "OWNER1", "T1",
      Seq(DbColumn("ID", 2, numPk = 1)), tagType = "pk")))
    val messages = TxnAssembly.assembleBatch(Seq(
      ChangeEvent(2L, "9.0.1", Op.Ins).copy(obj = 100L,
        after = Map("ID" -> "7"), tm = 1700000000L),
      ChangeEvent(3L, "9.0.1", Op.Ins).copy(obj = 100L,
        after = Map("ID" -> "8"), tm = 1700000001L),
      ChangeEvent(4L, "9.0.1", Op.Commit).copy(tm = 1700000009L)).toDS())
    val enriched = Materialize(messages, dict)
    // flags ON: tm (field 4), db (8), Payload.num (10) appear; num=0 on
    // the txn's first message is the proto3 default → correctly absent
    // from the wire (a generated client still reads 0)
    val on = ProtoEnvelope.toMessages(enriched, Envelope.Format(
        dbName = "ORCL", timestampCommit = true, addSequences = true))
      .select("value_bin").orderBy("cScn", "cIdx").collect()
      .map(_.getAs[Array[Byte]](0))
    val tops = on.map(b => decode(b).toMap)
    tops.foreach { top =>
      assert(top.contains(4) && top(4).asInstanceOf[Long] > 0L) // commit tm
      assert(new String(top(8).asInstanceOf[Array[Byte]]) == "ORCL")
    }
    val nums = tops.map(t =>
      decode(t(9).asInstanceOf[Array[Byte]]).toMap.getOrElse(10, 0L))
    assert(nums.toSeq == Seq(0L, 1L), s"per-txn ordinals: ${nums.toSeq}")
    // flags OFF (default): none of the three fields reach the wire
    val off = ProtoEnvelope.toMessages(enriched)
      .select("value_bin").collect().head.getAs[Array[Byte]](0)
    val topOff = decode(off).toMap
    assert(!topOff.contains(4) && !topOff.contains(8))
    assert(!decode(topOff(9).asInstanceOf[Array[Byte]]).toMap.contains(10))
  }
}
