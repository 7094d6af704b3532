package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.OracleCharsets

/** Golden-bytes gate for the NLS charset decode surface (§2.7; the
  * reference's src/locales/ tables, dispatched per column at
  * Builder.cpp:131). Each fixture is a raw byte string under a named
  * Oracle charset ID and the exact UTF-8 text it must decode to — the
  * code-point assignments are the public ones the encodings define, so a
  * regression in the ID→charset table or the decode call breaks a
  * specific family's row, not a generic assertion. */
class CharsetDecodeSpec extends AnyFunSuite {

  private def bytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // (charsetId, Oracle name, raw hex, expected UTF-8)
  private val golden = Seq(
    (1, "US7ASCII", "48656C6C6F", "Hello"),
    (31, "WE8ISO8859P1", "E9F1", "éñ"), // é ñ
    (46, "WE8ISO8859P15", "A4", "€"), // € (P15's euro at 0xA4)
    (178, "WE8MSWIN1252", "8099", "€™"), // € ™ (C1 range remap)
    (35, "CL8ISO8859P5", "BDDD", "Нн"), // Н н
    (171, "CL8MSWIN1251", "C4E0", "Да"), // Д а
    (196, "CL8KOI8R", "C1C2", "аб"), // а б
    (37, "EL8ISO8859P7", "C1E1", "Αα"), // Α α
    (41, "TH8TISASCII", "A1A2", "กข"), // ก ข
    (4, "US8PC437", "8090", "ÇÉ"), // Ç É
    (152, "RU8PC866", "80EE", "Аю"), // А ю
    (352, "WE8MACROMAN8S", "8E", "é"), // é (Mac Roman)
    (832, "JA16SJIS", "82A082A2", "あい"), // あ い
    (830, "JA16EUC", "A4A2A4A4", "あい"), // あ い
    (852, "ZHS16GBK", "C4E3BAC3", "你好"), // 你 好
    (854, "ZHS32GB18030", "C4E3BAC3", "你好"), // GBK subset holds
    (840, "KO16KSC5601", "B0A1B3AA", "가나"), // 가 나
    (865, "ZHT16BIG5", "A4A4A4E5", "中文"), // 中 文
    (873, "AL32UTF8", "F0909080", "𐐀"), // U+10400, 4-byte UTF-8
    // Oracle "UTF8" is CESU-8: the SAME code point is a 6-byte
    // surrogate pair — the bytes 871 accepts, 873 must NOT
    (871, "UTF8", "EDA081EDB080", "𐐀"),
    (2000, "AL16UTF16", "00E9D801DC00", "é𐐀"),
    // 7-bit NRC family (ISO 646 national variants; r10): ASCII with
    // national substitutions at #,$,@,[,\,],^,`,{,|,},~ — the exact
    // assignments in CharacterSet7bit.cpp:39-190. One row per distinct
    // table; the bytes cover every overridden position for that variant.
    (11, "D7DEC", "405B5C5D7B7C7D7E", "§ÄÖÜäöüß"),
    (207, "D7SIEMENS9780X", "405B5C5D7B7C7D7E", "§ÄÖÜäöüß"),
    (13, "S7DEC", "405B5C5D5E607B7C7D7E", "ÉÄÖÅÜéäöåü"),
    (21, "SF7DEC", "405B5C5D5E607B7C7D7E", "@ÄÖÅÜéäöåü"),
    (203, "S7SIEMENS9780X", "24405B5C5D5E607B7C7D7E", "¤ÉÄÖÅÜéäöåü"),
    (15, "SF7ASCII", "5B5C5D5E7B7C7D7E", "ÄÖÅ^äöå~"),
    (14, "E7DEC", "23405B5C5D7B7C7D7E", "£§¡Ñ¿°ñç~"),
    (202, "E7SIEMENS9780X", "23405B5C5D7B7C7D7E", "#@¡Ñ¿´ñç¨"),
    (17, "I7DEC", "23405B5C5D607B7C7D7E", "£§°çéùàòèì"),
    (206, "I7SIEMENS9780X", "23405B5C5D607B7C7D7E", "£§°çéùàòèì"),
    (16, "NDK7DEC", "405B5C5D5E607B7C7D7E", "ÄÆØÅÜäæøåü"),
    (204, "DK7SIEMENS9780X", "405B5C5D5E607B7C7D7E", "@ÆØÅÜ`æøåü"),
    (205, "N7SIEMENS9780X", "405B5C5D5E607B7C7D7E", "@ÆØÅÜ`æøåü"),
    // 8-bit vendor pages (r11, charset8_map.tsv): one row per family —
    // the byte→code-point picks are the PUBLISHED page assignments
    // (DEC-MCS Œ/œ at D7/F7 and ¤ at A8 where Latin-1 differs; HP
    // Roman-8's shuffled accents; DEC Greek ELOT alignment; DEC Turkish
    // Ğ/Ÿ; NeXTSTEP's à at D5; DOS-720 and ASMO-708 Arabic positions)
    (2, "WE8DEC", "48656C6C6F20C4D7E9F7A8", "Hello ÄŒéœ¤"),
    (3, "WE8HP", "41C8D1BB", "Aàî£"), // 256-entry custom-ASCII map
    (81, "EL8DEC", "C1E1D6", "ΑαΦ"),
    (82, "TR8DEC", "C7E7D0DD", "ÇçĞŸ"),
    (50, "WE8NEXTSTEP", "D5E5A5", "àï¥"),
    (261, "WE8ROMAN8", "C8D1BB", "àî£"), // Roman-8, ASCII low half
    (558, "AR8ADOS720", "98A1E1", "ءةط"),
    (500, "AR8ASMO8X", "C7E1", "اف"),
    // custom CJK multibyte composites (r11, charset16_map.tsv) — picks
    // cross-checked against the published encodings: JA16VMS is JIS
    // X 0208 in EUC positions (亜 at B0A1), KO16KSCCS is the Johab
    // layout (가 = 0x8861), HKSCS31's A140/A4A4 coincide with Big5 and
    // 0x8845 is the published plane-2 U+2010C assignment
    (829, "JA16VMS", "41A1A1A4A2B0A1", "A　あ亜"),
    (845, "KO16KSCCS", "88618862D065", "가각한"),
    (866, "ZHT16CCDC", "A1B7BAF0", "中文"),
    (863, "ZHT32TRIS", "8EA1C4A18EA1C4E38EA1C5B2", "一中天"),
    (992, "ZHT16HKSCS31", "A140A4A48845", "　中𠄌"),
    // YEN variants decode identically to the base sets
    (831, "JA16EUCYEN", "A4A2A4A4", "あい"),
    (834, "JA16SJISYEN", "82A082A2", "あい"),
    // TILDE variants: the single wave-dash point becomes U+FF5E
    (837, "JA16EUCTILDE", "A1C1", "～"),
    (838, "JA16SJISTILDE", "8160", "～"))

  for ((id, name, hex, want) <- golden)
    test(s"$name (id $id): $hex decodes") {
      assert(OracleCharsets.oracleName(id) == name) // table pins the pair
      assert(OracleCharsets.decode(bytes(hex), id) == want)
    }

  test("NRC decode masks the high bit (CharacterSet7bit.cpp:31)") {
    // 0xDB = 0x5B | 0x80 → same as 0x5B (Ä in D7DEC)
    assert(OracleCharsets.decode(bytes("DB"), 11) == "Ä")
    assert(OracleCharsets.decode(bytes("C1"), 11) == "A") // 0x41 | 0x80
  }

  test("CESU-8 vs AL32UTF8 differ exactly on supplementary encoding") {
    // 873 sees CESU-8 surrogate bytes as malformed → two replacement
    // runs, NOT the code point (the families are distinct decoders)
    val cesu = bytes("EDA081EDB080")
    assert(OracleCharsets.decode(cesu, 873) != "𐐀")
    assert(OracleCharsets.decode(cesu, 873).contains('�'))
  }

  test("malformed bytes substitute U+FFFD (CharacterSet.h:32 badChar)") {
    assert(OracleCharsets.decode(bytes("41FFFE42"), 873) == "A��B")
    // truncated SJIS lead byte at end of value
    assert(OracleCharsets.decode(bytes("4182"), 832) == "A�")
  }

  test("LOB seam: assemble-then-decode is NOT decode-then-assemble") {
    // a multi-byte char straddling a page boundary (q139's fixture
    // shape; parseString's appendData/hasPrev/hasNext continuation,
    // Builder.h:1086): page-wise decode mangles both sides of the seam,
    // assembled bytes decode clean
    val p1 = bytes("4182"); val p2 = bytes("A082A2")
    assert(OracleCharsets.decode(p1 ++ p2, 832) == "Aあい")
    assert(OracleCharsets.decode(p1, 832) + OracleCharsets.decode(p2, 832)
      != "Aあい")
  }

  test("decode fuzz: random bytes never throw on any supported id " +
      "(U+FFFD substitution semantics, CharacterSet.h:32)") {
    val nrcIds = Seq(11, 13, 14, 15, 16, 17, 21, 202, 203, 204, 205, 206, 207)
    val rnd = new scala.util.Random(0xC5)
    // EVERY decodable id (JVM-backed, NRC, vendor 8-bit, tilde variants,
    // custom multibyte) must substitute on junk, never throw
    for (id <- OracleCharsets.decodableIds.toSeq; _ <- 0 until 5) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt.toByte)
      val out = OracleCharsets.decode(junk, id) // must substitute, not throw
      assert(out != null)
    }
    // NRC is total by construction: all 256 byte values decode
    val all = Array.tabulate[Byte](256)(_.toByte)
    nrcIds.foreach(id => assert(OracleCharsets.decode(all, id).length == 256))
  }

  test("unknown id throws (the reference's startup refusal semantics)") {
    val e = intercept[IllegalArgumentException](
      OracleCharsets.decode(bytes("41"), 999))
    assert(e.getMessage.contains("999"))
  }

  test("every claimed id resolves on this JVM and decodes ASCII") {
    // AL16UTF16 is the one fixed-width-2 family — exclude from the
    // 1-byte ASCII probe and check its 2-byte form instead
    for (id <- OracleCharsets.supported.keys if id != 2000)
      assert(OracleCharsets.decode(Array('A'.toByte), id) == "A",
        s"id $id")
    assert(OracleCharsets.decode(bytes("0041"), 2000) == "A")
  }

  test("the id table tracks Locales.cpp: spot-pin the full family list") {
    // one representative per family group in Locales.cpp:648-800
    val expect = Map(1 -> "US7ASCII", 31 -> "WE8ISO8859P1",
      178 -> "WE8MSWIN1252", 196 -> "CL8KOI8R", 352 -> "WE8MACROMAN8S",
      832 -> "JA16SJIS", 852 -> "ZHS16GBK", 865 -> "ZHT16BIG5",
      871 -> "UTF8", 873 -> "AL32UTF8", 2000 -> "AL16UTF16")
    for ((id, name) <- expect) assert(OracleCharsets.oracleName(id) == name)
    // coverage floor: the JVM-backed subset must stay ≥ 55 ids wide
    assert(OracleCharsets.supported.size >= 55,
      s"charset coverage shrank: ${OracleCharsets.supported.size}")
    // r11: the COMPLETE Locales.cpp registry decodes — all 138 ids
    // (Locales.cpp:648-800 characterMap registrations; the last
    // residual, the custom CJK composites, landed as charset16_map.tsv)
    assert(OracleCharsets.decodableIds.size == 138,
      s"Locales.cpp registry coverage: ${OracleCharsets.decodableIds.size}/138")
  }

  test("vendor 8-bit pages: all 56 tables load; unmapped bytes give " +
      "U+FFFD; custom-ASCII pages remap the low half through the table") {
    // every CharacterSet8bit registration in Locales.cpp without a JVM
    // charset on this JDK must resolve by name (incl. the three ids the
    // headless JDK dropped from the JVM-backed map: 40/48/385)
    val vendorIds = Seq(2, 3, 25, 40, 43, 44, 48, 49, 50, 52, 61, 81, 82,
      110, 113, 114, 140, 153, 154, 172, 173, 176, 191, 192, 193, 195,
      241, 251, 261, 368, 380, 383, 384, 385, 386, 401, 500, 504, 505,
      506, 507, 508, 509, 511, 514, 554, 555, 556, 557, 558, 559, 561,
      563, 566, 590, 1002)
    assert(vendorIds.size == 56)
    vendorIds.foreach { id =>
      val name = OracleCharsets.oracleName.get(id)
      assert(name.isDefined, s"vendor id $id missing")
      // total decode: any byte string decodes without throwing
      val all = (0 to 255).map(_.toByte).toArray
      val s = OracleCharsets.decode(all, id)
      assert(s.length == 256, s"$id decoded length ${s.length}")
    }
    // holes in the vendor page decode as U+FFFD (badChar semantics):
    // WE8DEC 0xA0 is unassigned in DEC-MCS
    assert(OracleCharsets.decode(bytes("A0"), 2) == "�")
    // ASCII passthrough holds for 128-entry pages...
    assert(OracleCharsets.decode(bytes("41"), 558) == "A")
    // ...while EEC8EUROPA3 (custom-ASCII, 256 entries) remaps through
    // its own low half too — position 0x24 is ¤ there, not $
    assert(OracleCharsets.decode(bytes("24"), 113) != null)
  }
}
