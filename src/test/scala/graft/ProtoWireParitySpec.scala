package graft

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.orc.protobuf.DescriptorProtos._
import org.apache.orc.protobuf.DescriptorProtos.FieldDescriptorProto.{Label, Type => FT}
import org.apache.orc.protobuf.Descriptors.{Descriptor, FileDescriptor}
import org.apache.orc.protobuf.DynamicMessage
import graft.cdc.{MsgOp, ProtoEnvelope}

/** Wire parity with the reference's proto contract: a STOCK protobuf
  * runtime (the protobuf-java implementation shaded into orc-core as
  * org.apache.orc.protobuf — a fully independent decoder of the standard
  * wire format) parses ProtoEnvelope's hand-encoded bytes against message
  * descriptors transcribed from /root/reference/proto/OraProtoBuf.proto
  * (Value :80, Column :91, Schema :100, Payload :111, SchemaRequest :124,
  * RedoRequest :129, RedoResponse :143; enums Op :27, ColumnType :37,
  * RequestCode :62, ResponseCode :69). Every assertion reads fields the
  * way a generated OraProtoBuf consumer would; zero unknown fields proves
  * every byte we emit lands in a declared field of the reference schema.
  */
class ProtoWireParitySpec extends AnyFunSuite {

  // ---- descriptor transcription of OraProtoBuf.proto -------------------

  private def field(name: String, num: Int, t: FT,
      typeName: String = null, label: Label = Label.LABEL_OPTIONAL,
      oneof: Int = -1): FieldDescriptorProto = {
    val b = FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(num).setType(t).setLabel(label)
    if (typeName != null) b.setTypeName(typeName)
    if (oneof >= 0) b.setOneofIndex(oneof)
    b.build()
  }

  private def enumProto(name: String, values: (String, Int)*): EnumDescriptorProto = {
    val b = EnumDescriptorProto.newBuilder().setName(name)
    values.foreach { case (n, v) =>
      b.addValue(EnumValueDescriptorProto.newBuilder().setName(n).setNumber(v))
    }
    b.build()
  }

  private lazy val fileDescriptor: FileDescriptor = {
    val value = DescriptorProto.newBuilder().setName("Value")
      .addField(field("name", 1, FT.TYPE_STRING))
      .addField(field("value_int", 2, FT.TYPE_INT64, oneof = 0))
      .addField(field("value_float", 3, FT.TYPE_FLOAT, oneof = 0))
      .addField(field("value_double", 4, FT.TYPE_DOUBLE, oneof = 0))
      .addField(field("value_string", 5, FT.TYPE_STRING, oneof = 0))
      .addField(field("value_bytes", 6, FT.TYPE_BYTES, oneof = 0))
      .addOneofDecl(OneofDescriptorProto.newBuilder().setName("datum"))
      .build()
    val column = DescriptorProto.newBuilder().setName("Column")
      .addField(field("name", 1, FT.TYPE_STRING))
      .addField(field("type", 2, FT.TYPE_ENUM, ".pb.ColumnType"))
      .addField(field("length", 3, FT.TYPE_INT32))
      .addField(field("precision", 4, FT.TYPE_INT32))
      .addField(field("scale", 5, FT.TYPE_INT32))
      .addField(field("nullable", 6, FT.TYPE_BOOL))
      .build()
    val schema = DescriptorProto.newBuilder().setName("Schema")
      .addField(field("owner", 1, FT.TYPE_STRING))
      .addField(field("name", 2, FT.TYPE_STRING))
      .addField(field("obj", 3, FT.TYPE_UINT32))
      .addField(field("tm", 4, FT.TYPE_UINT64, oneof = 0))
      .addField(field("tms", 5, FT.TYPE_STRING, oneof = 0))
      .addField(field("column", 6, FT.TYPE_MESSAGE, ".pb.Column",
        Label.LABEL_REPEATED))
      .addOneofDecl(OneofDescriptorProto.newBuilder().setName("tm_val"))
      .build()
    val payload = DescriptorProto.newBuilder().setName("Payload")
      .addField(field("op", 1, FT.TYPE_ENUM, ".pb.Op"))
      .addField(field("schema", 2, FT.TYPE_MESSAGE, ".pb.Schema"))
      .addField(field("rid", 3, FT.TYPE_STRING))
      .addField(field("before", 4, FT.TYPE_MESSAGE, ".pb.Value",
        Label.LABEL_REPEATED))
      .addField(field("after", 5, FT.TYPE_MESSAGE, ".pb.Value",
        Label.LABEL_REPEATED))
      .addField(field("ddl", 6, FT.TYPE_STRING))
      .addField(field("seq", 7, FT.TYPE_UINT32))
      .addField(field("offset", 8, FT.TYPE_UINT64))
      .addField(field("redo", 9, FT.TYPE_BOOL))
      .addField(field("num", 10, FT.TYPE_UINT64))
      .build()
    val schemaRequest = DescriptorProto.newBuilder().setName("SchemaRequest")
      .addField(field("mask", 1, FT.TYPE_STRING))
      .addField(field("filter", 2, FT.TYPE_STRING))
      .build()
    val redoRequest = DescriptorProto.newBuilder().setName("RedoRequest")
      .addField(field("code", 1, FT.TYPE_ENUM, ".pb.RequestCode"))
      .addField(field("database_name", 2, FT.TYPE_STRING))
      .addField(field("scn", 3, FT.TYPE_UINT64, oneof = 0))
      .addField(field("tms", 4, FT.TYPE_STRING, oneof = 0))
      .addField(field("tm_rel", 5, FT.TYPE_INT64, oneof = 0))
      .addField(field("seq", 6, FT.TYPE_UINT64))
      .addField(field("schema", 7, FT.TYPE_MESSAGE, ".pb.SchemaRequest",
        Label.LABEL_REPEATED))
      .addField(field("c_scn", 8, FT.TYPE_UINT64))
      .addField(field("c_idx", 9, FT.TYPE_UINT64))
      .addOneofDecl(OneofDescriptorProto.newBuilder().setName("tm_val"))
      .build()
    val attributesEntry = DescriptorProto.newBuilder()
      .setName("AttributesEntry")
      .addField(field("key", 1, FT.TYPE_STRING))
      .addField(field("value", 2, FT.TYPE_STRING))
      .setOptions(MessageOptions.newBuilder().setMapEntry(true))
      .build()
    val redoResponse = DescriptorProto.newBuilder().setName("RedoResponse")
      .addField(field("code", 1, FT.TYPE_ENUM, ".pb.ResponseCode"))
      .addField(field("scn", 2, FT.TYPE_UINT64, oneof = 0))
      .addField(field("scns", 3, FT.TYPE_STRING, oneof = 0))
      .addField(field("tm", 4, FT.TYPE_UINT64, oneof = 1))
      .addField(field("tms", 5, FT.TYPE_STRING, oneof = 1))
      .addField(field("xid", 6, FT.TYPE_STRING, oneof = 2))
      .addField(field("xidn", 7, FT.TYPE_UINT64, oneof = 2))
      .addField(field("db", 8, FT.TYPE_STRING))
      .addField(field("payload", 9, FT.TYPE_MESSAGE, ".pb.Payload",
        Label.LABEL_REPEATED))
      .addField(field("c_scn", 10, FT.TYPE_UINT64))
      .addField(field("c_idx", 11, FT.TYPE_UINT64))
      .addField(field("attributes", 12, FT.TYPE_MESSAGE,
        ".pb.RedoResponse.AttributesEntry", Label.LABEL_REPEATED))
      .addNestedType(attributesEntry)
      .addOneofDecl(OneofDescriptorProto.newBuilder().setName("scn_val"))
      .addOneofDecl(OneofDescriptorProto.newBuilder().setName("tm_val"))
      .addOneofDecl(OneofDescriptorProto.newBuilder().setName("xid_val"))
      .build()
    val file = FileDescriptorProto.newBuilder()
      .setName("OraProtoBuf.proto").setPackage("pb").setSyntax("proto3")
      .addEnumType(enumProto("Op", "BEGIN" -> 0, "COMMIT" -> 1,
        "INSERT" -> 2, "UPDATE" -> 3, "DELETE" -> 4, "DDL" -> 5,
        "CHKPT" -> 6))
      .addEnumType(enumProto("ColumnType", "UNKNOWN" -> 0, "VARCHAR2" -> 1,
        "NUMBER" -> 2, "LONG" -> 3, "DATE" -> 4, "RAW" -> 5,
        "LONG_RAW" -> 6, "CHAR" -> 7, "BINARY_FLOAT" -> 8,
        "BINARY_DOUBLE" -> 9, "CLOB" -> 10, "BLOB" -> 11,
        "TIMESTAMP" -> 12, "TIMESTAMP_WITH_TZ" -> 13,
        "INTERVAL_YEAR_TO_MONTH" -> 14, "INTERVAL_DAY_TO_SECOND" -> 15,
        "UROWID" -> 16, "TIMESTAMP_WITH_LOCAL_TZ" -> 17))
      .addEnumType(enumProto("RequestCode", "INFO" -> 0, "START" -> 1,
        "CONTINUE" -> 2, "CONFIRM" -> 3))
      .addEnumType(enumProto("ResponseCode", "READY" -> 0,
        "FAILED_START" -> 1, "STARTING" -> 2, "ALREADY_STARTED" -> 3,
        "REPLICATE" -> 4, "PAYLOAD" -> 5, "INVALID_DATABASE" -> 6,
        "INVALID_COMMAND" -> 7))
      .addMessageType(value).addMessageType(column).addMessageType(schema)
      .addMessageType(payload).addMessageType(schemaRequest)
      .addMessageType(redoRequest).addMessageType(redoResponse)
      .build()
    FileDescriptor.buildFrom(file, Array.empty[FileDescriptor])
  }

  private def desc(name: String): Descriptor =
    fileDescriptor.findMessageTypeByName(name)

  private def parse(name: String, bytes: Array[Byte]): DynamicMessage =
    DynamicMessage.parseFrom(desc(name), bytes)

  private def f(m: DynamicMessage, name: String): AnyRef =
    m.getField(m.getDescriptorForType.findFieldByName(name))

  // ---- tests ------------------------------------------------------------

  test("stock decoder reads a full RedoResponse DML message") {
    val bytes = ProtoEnvelope.encodeResponse(
      cScn = 1000L, cIdx = 7L, scn = 999L, xid = "0x0001.002.00000003",
      op = MsgOp.Insert, owner = "APP", table = "ORDERS", obj = 4242L,
      rid = "AAABBBCCC", before = Map("K" -> "1"),
      after = Map("K" -> "1", "V" -> "two"), ddl = null,
      attrs = Map("OS_USERNAME" -> "app1", "CLIENT_ID" -> ""),
      tm = 1700000000000L, db = "ORCL", num = 12L)
    val m = parse("RedoResponse", bytes)
    assert(m.getUnknownFields.asMap().isEmpty, "bytes outside the schema")
    assert(f(m, "code").toString == "PAYLOAD")
    assert(f(m, "scn") == java.lang.Long.valueOf(999L))
    assert(m.hasField(m.getDescriptorForType.findFieldByName("scn")))
    assert(f(m, "tm") == java.lang.Long.valueOf(1700000000000L))
    assert(f(m, "xid") == "0x0001.002.00000003")
    assert(f(m, "db") == "ORCL")
    assert(f(m, "c_scn") == java.lang.Long.valueOf(1000L))
    assert(f(m, "c_idx") == java.lang.Long.valueOf(7L))
    // attributes map entries (sorted key order in our canonical encoding)
    val attrs = f(m, "attributes").asInstanceOf[java.util.List[_]].asScala
      .map(_.asInstanceOf[DynamicMessage])
      .map(e => f(e, "key").toString -> f(e, "value").toString).toMap
    assert(attrs == Map("OS_USERNAME" -> "app1", "CLIENT_ID" -> ""))
    // the single Payload
    val ps = f(m, "payload").asInstanceOf[java.util.List[_]].asScala
      .map(_.asInstanceOf[DynamicMessage])
    assert(ps.size == 1)
    val p = ps.head
    assert(f(p, "op").toString == "INSERT")
    assert(f(p, "rid") == "AAABBBCCC")
    assert(f(p, "num") == java.lang.Long.valueOf(12L))
    val sch = f(p, "schema").asInstanceOf[DynamicMessage]
    assert(f(sch, "owner") == "APP")
    assert(f(sch, "name") == "ORDERS")
    assert(f(sch, "obj") == java.lang.Integer.valueOf(4242))
    def vals(fieldName: String): Map[String, String] =
      f(p, fieldName).asInstanceOf[java.util.List[_]].asScala
        .map(_.asInstanceOf[DynamicMessage])
        .map(v => f(v, "name").toString -> f(v, "value_string").toString)
        .toMap
    assert(vals("before") == Map("K" -> "1"))
    assert(vals("after") == Map("K" -> "1", "V" -> "two"))
    // oneof presence: value_string arm is set on every Value
    val v0 = f(p, "after").asInstanceOf[java.util.List[_]].asScala.head
      .asInstanceOf[DynamicMessage]
    val datum = v0.getDescriptorForType.getOneofs.asScala
      .find(_.getName == "datum").get
    assert(v0.getOneofFieldDescriptor(datum).getName == "value_string")
  }

  test("ops map to the reference enum; flagless fields are absent") {
    for ((op, expect) <- Seq(MsgOp.Begin -> "BEGIN", MsgOp.Commit -> "COMMIT",
        MsgOp.Insert -> "INSERT", MsgOp.Update -> "UPDATE",
        MsgOp.Delete -> "DELETE", MsgOp.Ddl -> "DDL",
        MsgOp.Checkpoint -> "CHKPT")) {
      val bytes = ProtoEnvelope.encodeResponse(1L, 0L, 1L, "9.0.9", op,
        "O", "T", 1L, null, null, null, null, null)
      val m = parse("RedoResponse", bytes)
      val p = f(m, "payload").asInstanceOf[java.util.List[_]].asScala.head
        .asInstanceOf[DynamicMessage]
      assert(f(p, "op").toString == expect, op)
      assert(m.getUnknownFields.asMap().isEmpty)
      // tm/db omitted when not requested, like the reference without flags
      assert(!m.hasField(m.getDescriptorForType.findFieldByName("tm")))
      assert(f(m, "db") == "")
    }
  }

  test("stock decoder reads RedoRequest control messages") {
    val bytes = ProtoEnvelope.encodeRequest(ProtoEnvelope.RedoRequest(
      code = ProtoEnvelope.Req.Confirm, db = "ORCL",
      scn = Some(500L), seq = Some(3L), cScn = Some(499L), cIdx = Some(2L)))
    val m = parse("RedoRequest", bytes)
    assert(m.getUnknownFields.asMap().isEmpty)
    assert(f(m, "code").toString == "CONFIRM")
    assert(f(m, "database_name") == "ORCL")
    assert(f(m, "scn") == java.lang.Long.valueOf(500L))
    assert(f(m, "seq") == java.lang.Long.valueOf(3L))
    assert(f(m, "c_scn") == java.lang.Long.valueOf(499L))
    assert(f(m, "c_idx") == java.lang.Long.valueOf(2L))
  }

  test("stock decoder reads control RedoResponses (READY/STARTING)") {
    val bytes = ProtoEnvelope.encodeControlResponse(
      ProtoEnvelope.Resp.Starting, scn = Some(123L),
      cScn = Some(120L), cIdx = Some(4L))
    val m = parse("RedoResponse", bytes)
    assert(m.getUnknownFields.asMap().isEmpty)
    assert(f(m, "code").toString == "STARTING")
    assert(f(m, "scn") == java.lang.Long.valueOf(123L))
    assert(f(m, "c_scn") == java.lang.Long.valueOf(120L))
    assert(f(m, "c_idx") == java.lang.Long.valueOf(4L))
  }

  test("stock re-encode of the parsed message is byte-identical (canonical)") {
    val bytes = ProtoEnvelope.encodeResponse(77L, 1L, 76L, "1.2.3",
      MsgOp.Update, "S", "T2", 9L, "RID", Map("A" -> "x"),
      Map("A" -> "y"), null, Map("M" -> "n"))
    val m = parse("RedoResponse", bytes)
    // protobuf-java serializes in ascending field order with map entries
    // in insertion order — our canonical encoding matches it exactly
    assert(java.util.Arrays.equals(m.toByteArray, bytes))
  }
}
