package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Dictionary, DbTable, DbColumn, XmlCtx, XmlDecode, XdbTtSet, XdbXNm, XdbXQn}

/** Golden-bytes gate for the binary-XML token decoder — each fixture is a
  * hand-assembled token stream and the exact XML text Builder::parseXml
  * (Builder.cpp:1844-2390) would emit for it, including the reference's
  * literal quirks (` encoding="UTF=8"`). */
class XmlDecodeSpec extends AnyFunSuite {

  private val ctx = XmlCtx(
    Seq(XdbTtSet("8A99F9A3C6B54F21A0E6D0112A3C0001", "01", 0L, 100L)),
    Seq(XdbXNm("10", "http://example.com/ns")),
    Seq(
      XdbXQn("01", "doc", "10", "0"),
      XdbXQn("02", "id", "00", "1"), // attribute (flags last digit bit 0)
      XdbXQn("03", "item", "00", "0"),
      XdbXQn("010003", "deep", "00", "0"),
      XdbXQn("04", "note", "00", "1")))

  private def bytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  test("full stream: decl, ns set/add, attr, 16/32-bit codes, repeat tag") {
    val h = "9E00000A" + // decl, version 1.0
      "B2 02 0000 0010 0020 " + hexOf("ns") + // ns set, prefix "ns"
      "C8 0001" + // <ns:doc (open)
      "DD 0020" + // xmlns:ns="uri"
      "C0 01 0002 " + hexOf("42") + // id="42" (size byte = len-1)
      "C8 0003" + // <item
      "02 " + hexOf("abc") + // text "abc" (size byte = len-1)
      "D9" + // </item>
      "D4" + // <item (repeat last tag)
      "01 " + hexOf("xy") + // text "xy"
      "D9" +
      "C9 00010003" + // <deep (32-bit code)
      "00 " + hexOf("7") +
      "D9 D9 A0"
    assert(XmlDecode.parse(bytes(h), ctx).contains(
      "<?xml version=\"1.0\"?><ns:doc xmlns:ns=\"http://example.com/ns\"" +
        " id=\"42\"><item>abc</item><item>xy</item><deep>7</deep></ns:doc>"))
  }

  test("header variants: 1.1, standalone yes/no, the UTF=8 encoding quirk") {
    // flags2 = XMLDECL|VERSION|VERSION_1_1|STANDALONE|STANDALONE_YES|ENCODING
    val yes11 = "9E0000" + f"${0x02 | 0x08 | 0x80 | 0x01 | 0x10 | 0x04}%02X" + "A0"
    assert(XmlDecode.parse(bytes(yes11), ctx).contains(
      "<?xml version=\"1.1\" standalone=\"yes\" encoding=\"UTF=8\"?>"))
    val no10 = "9E0000" + f"${0x02 | 0x08 | 0x01}%02X" + "A0"
    assert(XmlDecode.parse(bytes(no10), ctx).contains(
      "<?xml version=\"1.0\" standalone=\"no\"?>"))
    // no XMLDECL bit -> nothing rendered
    assert(XmlDecode.parse(bytes("9E000008A0"), ctx).contains(""))
  }

  test("prolog skips docid/pathid sections; wrong version bails") {
    // version 1, flags DOCID|PATHID, 2-byte docid, 1+2-byte pathids
    val h = "9F01" + f"${0x08 | 0x10}%02X" + "02 AAAA" + "01 BB" + "02 CCCC" +
      "C8 0003" + "00 " + hexOf("z") + "D9 A0"
    assert(XmlDecode.parse(bytes(h), ctx).contains("<item>z</item>"))
    assert(XmlDecode.parse(bytes("9F0200A0"), ctx).isEmpty) // version 2
  }

  test("non-single attribute stays open until 0xD9") {
    // C8-coded attribute: opens `note="`, text appends, D9 closes the
    // quote and re-opens the tag bracket for the next child
    val h = "C8 0001" + // <ns:doc (no ns-set -> no prefix)
      "C8 0004" + // note=" (attribute, not single)
      "01 " + hexOf("vv") +
      "D9" + // closing quote, tagOpen=true
      "00 " + hexOf("t") + // text -> ">" then t
      "D9 A0"
    assert(XmlDecode.parse(bytes(h), ctx).contains(
      "<doc note=\"vv\">t</doc>"))
  }

  test("empty inline sizes: 0x8F sentinel and C1/C2/C3 forms") {
    // C0 with 0x8F -> empty attribute value (text child closes the
    // bracket; a bare 0xD9 would not — parseXml's end tag never emits
    // '>', faithful to Builder.cpp:2342-2361)
    val a = "C8 0001" + "C0 8F 0002" + "00 " + hexOf("t") + "D9 A0"
    assert(XmlDecode.parse(bytes(a), ctx).contains("<doc id=\"\">t</doc>"))
    // C1: 16-bit size + 16-bit code, element -> <item>xy</item>
    val b = "C1 0002 0003" + hexOf("xy") + "A0"
    assert(XmlDecode.parse(bytes(b), ctx).contains("<item>xy</item>"))
    // C3: 16-bit size + 32-bit code
    val c = "C3 0001 00010003" + hexOf("q") + "A0"
    assert(XmlDecode.parse(bytes(c), ctx).contains("<deep>q</deep>"))
    // C2: byte size + 32-bit code
    val d = "C2 00 00010003" + hexOf("w") + "A0"
    assert(XmlDecode.parse(bytes(d), ctx).contains("<deep>w</deep>"))
  }

  test("malformed streams return None") {
    assert(XmlDecode.parse(bytes("C8"), ctx).isEmpty) // truncated code
    assert(XmlDecode.parse(bytes("C8 0099 A0"), ctx).isEmpty) // unknown code
    assert(XmlDecode.parse(bytes("D9 A0"), ctx).isEmpty) // unbalanced end
    assert(XmlDecode.parse(bytes("FF"), ctx).isEmpty) // unknown token
    // duplicate dict registration
    val dup = "B2 00 0000 0010 0020" + "B2 00 0000 0011 0020" + "A0"
    assert(XmlDecode.parse(bytes(dup), ctx).isEmpty)
  }

  test("token tables round-trip through the dictionary JSON serde") {
    val dict = new Dictionary(
      Seq(DbTable(100L, 100L, "APP", "T",
        Seq(DbColumn("x", 113, xmlType = true)))),
      Nil, Some(ctx))
    val back = Dictionary.fromJson(Dictionary.toJson(dict))
    assert(back.xmlCtx.contains(ctx))
    // and a ctx-less dictionary stays ctx-less (no empty sections)
    val plain = Dictionary(dict.tables)
    assert(Dictionary.fromJson(Dictionary.toJson(plain)).xmlCtx.isEmpty)
    assert(!Dictionary.toJson(plain).contains("xdbXQn"))
  }

  test("evolve preserves the token tables") {
    val dict = new Dictionary(
      Seq(DbTable(100L, 100L, "APP", "T",
        Seq(DbColumn("x", 113, xmlType = true)))),
      Nil, Some(ctx))
    val evolved = dict.evolve(
      DbTable(100L, 100L, "APP", "T",
        Seq(DbColumn("x", 113, xmlType = true), DbColumn("y", 1))), 500L)
    assert(evolved.xmlCtx.contains(ctx))
  }
}
