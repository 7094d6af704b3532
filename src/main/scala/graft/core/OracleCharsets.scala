package graft.core

import java.nio.charset.Charset

/** Oracle charset-ID → UTF-8 decode (§2.7 "Charset decode" row).
  *
  * The reference hand-codes ~34k LoC of per-charset mapping tables
  * (`/root/reference/src/locales/CharacterSet*.cpp`) because C++ ships no
  * charset library; the JVM ships all the major families natively, so the
  * Spark-side implementation is an ID→`java.nio.charset.Charset` table
  * plus one decode call. The ID space is the reference's
  * `Locales::characterMap` (Locales.cpp:648-800), which is itself Oracle's
  * NLS_CHARSET_ID space; per-column IDs come from SYS.COL$ (SysCol.h:104
  * `charsetId`) and dispatch at value-decode time
  * (Builder.cpp:131 `parseString(data, size, column->charsetId, ...)`).
  *
  * Coverage: every `characterMap` entry whose encoding the JVM provides —
  * the ISO-8859 family, all windows-125x pages, the DOS/IBM codepages,
  * the Mac script sets, KOI8-R/U, TIS-620, and the CJK multi-byte sets
  * (Shift_JIS, EUC-JP, EUC-KR, MS949, GB2312/GBK/GB18030, Big5,
  * MS950, Big5-HKSCS, EUC-TW). Oracle "UTF8" (ID 871) is CESU-8 — NOT
  * AL32UTF8 (873): supplementary characters encode as 6-byte surrogate
  * pairs — and the JVM's CESU-8 charset reproduces exactly that. The
  * 7-bit NRC family (ISO 646 national variants; DEC NRCS and Siemens
  * 9780X forms) has no JVM charset, so it's carried as override-on-ASCII
  * tables below; the 8-bit vendor pages with no JVM equivalent (Arabic
  * DOS pages, DEC multinational WE8DEC/EL8DEC/TR8DEC, HP Roman-8,
  * NeXTSTEP, Data General, the Baltic/ex-Soviet OEM pages — 53 tables)
  * ride as byte→Unicode tables in the charset8_map.tsv resource
  * (r11; transcribed published code pages, the timezone_map.tsv rule),
  * and the custom CJK multibyte composites (DEC JA16VMS, Johab-layout
  * KO16KSCCS, Taiwan ZHT16CCDC, 4-byte ZHT32TRIS) as charset16_map.tsv
  * tables, with the JA16 YEN/TILDE variants riding the JVM base sets
  * (decode-identical / single-code-point substitute respectively).
  * Every id the reference's Locales.cpp registers now decodes. Any ID
  * absent from all maps:
  * [[decode]] throws — the reference refuses to start on a charset it
  * has no table for (Locales.cpp map lookup failure ≙ config error).
  *
  * Decode errors (malformed sequence / unmappable code point) substitute
  * U+FFFD, matching `CharacterSet::badChar` → `UNICODE_UNKNOWN_CHARACTER
  * = 0xFFFD` (CharacterSet.h:32, CharacterSet.cpp:28-56); the JVM's
  * `new String(bytes, charset)` constructor has exactly these REPLACE
  * semantics.
  */
object OracleCharsets {

  /** NLS charset ID → (Oracle name, JVM charset name). Factual table
    * transcribed from Locales.cpp:648-800, filtered to JVM-available
    * encodings (checked at class-init: a JDK lacking one simply drops the
    * ID from [[supported]] rather than failing later per-row). */
  private val idTable: Seq[(Int, String, String)] = Seq(
    (1, "US7ASCII", "US-ASCII"),
    (4, "US8PC437", "IBM437"),
    (10, "WE8PC850", "IBM850"),
    (28, "WE8PC858", "IBM00858"),
    (31, "WE8ISO8859P1", "ISO-8859-1"),
    (32, "EE8ISO8859P2", "ISO-8859-2"),
    (33, "SE8ISO8859P3", "ISO-8859-3"),
    (34, "NEE8ISO8859P4", "ISO-8859-4"),
    (35, "CL8ISO8859P5", "ISO-8859-5"),
    (36, "AR8ISO8859P6", "ISO-8859-6"),
    (37, "EL8ISO8859P7", "ISO-8859-7"),
    (38, "IW8ISO8859P8", "ISO-8859-8"),
    (39, "WE8ISO8859P9", "ISO-8859-9"),
    (40, "NE8ISO8859P10", "ISO-8859-10"),
    (41, "TH8TISASCII", "TIS-620"),
    (45, "VN8MSWIN1258", "windows-1258"),
    (46, "WE8ISO8859P15", "ISO-8859-15"),
    (47, "BLT8ISO8859P13", "ISO-8859-13"),
    (48, "CEL8ISO8859P14", "ISO-8859-14"),
    (51, "CL8KOI8U", "KOI8-U"),
    (150, "EE8PC852", "IBM852"),
    (152, "RU8PC866", "IBM866"),
    (155, "RU8PC855", "IBM855"),
    (156, "TR8PC857", "IBM857"),
    (159, "CL8MACCYRILLICS", "x-MacCyrillic"),
    (160, "WE8PC860", "IBM860"),
    (161, "IS8PC861", "IBM861"),
    (162, "EE8MACCES", "x-MacCentralEurope"),
    (163, "EE8MACCROATIANS", "x-MacCroatian"),
    (164, "TR8MACTURKISHS", "x-MacTurkish"),
    (165, "IS8MACICELANDICS", "x-MacIceland"),
    (166, "EL8MACGREEKS", "x-MacGreek"),
    (167, "IW8MACHEBREWS", "x-MacHebrew"),
    (170, "EE8MSWIN1250", "windows-1250"),
    (171, "CL8MSWIN1251", "windows-1251"),
    (174, "EL8MSWIN1253", "windows-1253"),
    (175, "IW8MSWIN1255", "windows-1255"),
    (177, "TR8MSWIN1254", "windows-1254"),
    (178, "WE8MSWIN1252", "windows-1252"),
    (179, "BLT8MSWIN1257", "windows-1257"),
    (190, "N8PC865", "IBM865"),
    (196, "CL8KOI8R", "KOI8-R"),
    (197, "BLT8PC775", "IBM775"),
    (352, "WE8MACROMAN8S", "x-MacRoman"),
    (354, "TH8MACTHAIS", "x-MacThai"),
    (382, "EL8PC737", "x-IBM737"),
    (385, "EL8PC869", "x-IBM869"),
    (390, "CDN8PC863", "IBM863"),
    (560, "AR8MSWIN1256", "windows-1256"),
    (830, "JA16EUC", "EUC-JP"),
    // the YEN variants decode identically to the base sets (the
    // reference registers them on the same class + table,
    // Locales.cpp:765,767 — YEN affects only the encode direction)
    (831, "JA16EUCYEN", "EUC-JP"),
    (832, "JA16SJIS", "Shift_JIS"),
    (834, "JA16SJISYEN", "Shift_JIS"),
    (840, "KO16KSC5601", "EUC-KR"),
    (846, "KO16MSWIN949", "x-windows-949"),
    (850, "ZHS16CGB231280", "GB2312"),
    (852, "ZHS16GBK", "GBK"),
    (854, "ZHS32GB18030", "GB18030"),
    (860, "ZHT32EUC", "x-EUC-TW"),
    (865, "ZHT16BIG5", "Big5"),
    (867, "ZHT16MSWIN950", "x-windows-950"),
    (868, "ZHT16HKSCS", "Big5-HKSCS"),
    (871, "UTF8", "CESU-8"),
    (873, "AL32UTF8", "UTF-8"),
    (2000, "AL16UTF16", "UTF-16BE"))

  /** ID → Charset for every entry this JVM provides. `Charset` objects
    * are immutable and thread-safe; the map rides task closures. */
  val supported: Map[Int, Charset] = idTable.flatMap { case (id, _, jvm) =>
    if (Charset.isSupported(jvm)) Some(id -> Charset.forName(jvm)) else None
  }.toMap

  /** 7-bit NRC national variants (ISO 646 / DEC NRCS / Siemens 9780X) —
    * the one charset family the JVM does NOT ship. Each is ASCII with a
    * handful of national substitutions, so the factual content is the
    * override list, not a 128-entry table; transcribed from the
    * reference's conversion arrays
    * (CharacterSet7bit.cpp:39-190, themselves the published ISO 646
    * variant assignments). Decode masks the high bit first
    * (CharacterSet7bit::decode `byte1 & 0x7F`, CharacterSet7bit.cpp:31).
    */
  private val nrcOverrides: Map[Int, (String, Seq[(Int, Char)])] = {
    val de = Seq(0x40 -> '§', 0x5B -> 'Ä', 0x5C -> 'Ö',
      0x5D -> 'Ü', 0x7B -> 'ä', 0x7C -> 'ö',
      0x7D -> 'ü', 0x7E -> 'ß')
    val dkNo = Seq(0x5B -> 'Æ', 0x5C -> 'Ø', 0x5D -> 'Å',
      0x5E -> 'Ü', 0x7B -> 'æ', 0x7C -> 'ø',
      0x7D -> 'å', 0x7E -> 'ü')
    val it = Seq(0x23 -> '£', 0x40 -> '§', 0x5B -> '°',
      0x5C -> 'ç', 0x5D -> 'é', 0x60 -> 'ù',
      0x7B -> 'à', 0x7C -> 'ò', 0x7D -> 'è',
      0x7E -> 'ì')
    val sv = Seq(0x40 -> 'É', 0x5B -> 'Ä', 0x5C -> 'Ö',
      0x5D -> 'Å', 0x5E -> 'Ü', 0x60 -> 'é',
      0x7B -> 'ä', 0x7C -> 'ö', 0x7D -> 'å',
      0x7E -> 'ü')
    Map(
      11 -> ("D7DEC" -> de),
      13 -> ("S7DEC" -> sv),
      14 -> ("E7DEC" -> Seq(0x23 -> '£', 0x40 -> '§',
        0x5B -> '¡', 0x5C -> 'Ñ', 0x5D -> '¿',
        0x7B -> '°', 0x7C -> 'ñ', 0x7D -> 'ç')),
      15 -> ("SF7ASCII" -> Seq(0x5B -> 'Ä', 0x5C -> 'Ö',
        0x5D -> 'Å', 0x7B -> 'ä', 0x7C -> 'ö',
        0x7D -> 'å')),
      16 -> ("NDK7DEC" -> (Seq(0x40 -> 'Ä', 0x60 -> 'ä') ++ dkNo)),
      17 -> ("I7DEC" -> it),
      21 -> ("SF7DEC" -> (sv.filterNot(_._1 == 0x40))),
      202 -> ("E7SIEMENS9780X" -> Seq(0x5B -> '¡', 0x5C -> 'Ñ',
        0x5D -> '¿', 0x7B -> '´', 0x7C -> 'ñ',
        0x7D -> 'ç', 0x7E -> '¨')),
      203 -> ("S7SIEMENS9780X" -> (Seq(0x24 -> '¤') ++ sv)),
      204 -> ("DK7SIEMENS9780X" -> dkNo),
      205 -> ("N7SIEMENS9780X" -> dkNo),
      206 -> ("I7SIEMENS9780X" -> it),
      207 -> ("D7SIEMENS9780X" -> de))
  }

  /** ID → full 128-char decode table (ASCII identity + NRC overrides). */
  private val nrcTables: Map[Int, Array[Char]] =
    nrcOverrides.map { case (id, (_, ov)) =>
      val a = Array.tabulate[Char](128)(_.toChar)
      ov.foreach { case (pos, ch) => a(pos) = ch }
      id -> a
    }

  /** 8-bit vendor code pages without a JVM charset, loaded from the
    * charset8_map.tsv resource (see tools/gen_charset8.py provenance
    * note): id → (name, customAscii, decode table). customAscii pages
    * (WE8HP, EEC8EUROASCI/EUROPA3, IS8MACICELANDICS) carry a 256-entry
    * map replacing the ASCII half too (CharacterSet8bit::readMap,
    * CharacterSet8bit.cpp:37-44); the rest are 128-entry upper halves
    * over an ASCII-identity low half. */
  private val vendor8Tables: Map[Int, (String, Boolean, Array[Char])] = {
    val in = getClass.getResourceAsStream("/graft/charset8_map.tsv")
    require(in != null, "charset8_map.tsv resource missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val Array(id, name, custom, cps) = line.split('\t')
          val tbl = cps.split(',').map(h => Integer.parseInt(h, 16).toChar)
          id.toInt -> (name, custom == "1", tbl)
        }.toMap
    } finally in.close()
  }

  /** TILDE variants (JA16EUCTILDE/JA16SJISTILDE): identical to the base
    * sets except the single wave-dash code point decodes to FULLWIDTH
    * TILDE U+FF5E instead of WAVE DASH U+301C
    * (CharacterSetJA16EUCTILDE.cpp:26-31 overrides exactly EUC 0xA1C1;
    * CharacterSetJA16SJISTILDE.cpp:26-31 exactly SJIS 0x8160). The JVM
    * base charsets produce U+301C for precisely those pairs and nothing
    * else maps to U+301C, so decode-then-substitute is exact. */
  private val tildeVariants: Map[Int, (String, Charset)] = Seq(
    837 -> ("JA16EUCTILDE", "EUC-JP"),
    838 -> ("JA16SJISTILDE", "Shift_JIS"))
    // guarded like idTable: a JVM without jdk.charsets (jlink'd runtime)
    // must drop these two ids, not kill the whole object's class init
    .collect { case (id, (n, cs)) if Charset.isSupported(cs) =>
      id -> (n, Charset.forName(cs))
    }.toMap

  /** Custom multibyte vendor composites (charset16_map.tsv; see
    * tools/gen_charset16.py provenance): DEC JA16VMS, the Johab-layout
    * KO16KSCCS, Taiwan ZHT16CCDC (2-byte), and the 4-byte ZHT32TRIS
    * plane. Decode consumption mirrors CharacterSet16bit::decode /
    * CharacterSetZHT32TRIS::decode: ASCII low bytes pass through, an
    * invalid lead or trail sequence yields ONE U+FFFD for the consumed
    * bytes (badChar semantics). */
  private case class MbTable(
      name: String,
      // 2b: (b1min,b1max,b2min,b2max); 4b adds the fixed lead + b3/b4
      kind: String,
      bounds: Array[Int],
      // Int, not Char: ZHT16HKSCS31 maps into plane 2 (typeUnicode32,
      // CharacterSetZHT16HKSCS31.h:34) — appendCodePoint handles pairs
      tbl: Array[Int])

  private val mbTables: Map[Int, MbTable] = {
    val in = getClass.getResourceAsStream("/graft/charset16_map.tsv")
    require(in != null, "charset16_map.tsv resource missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val p = line.split('\t')
          val (id, name, kind) = (p(0).toInt, p(1), p(2))
          val nBounds = if (kind == "2b") 4 else 7
          val bounds = p.slice(3, 3 + nBounds)
            .map(Integer.parseInt(_, 16))
          val tbl = p(3 + nBounds).split(',')
            .map(h => Integer.parseInt(h, 16))
          id -> MbTable(name, kind, bounds, tbl)
        }.toMap
    } finally in.close()
  }

  private def decodeMb(bytes: Array[Byte], t: MbTable): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    if (t.kind == "2b") {
      val Array(b1min, b1max, b2min, b2max) = t.bounds
      val span2 = b2max - b2min + 1
      while (i < bytes.length) {
        val b1 = bytes(i) & 0xff; i += 1
        if (b1 <= 0x7f) sb.append(b1.toChar)
        else if (i >= bytes.length) sb.append('�') // truncated pair
        else {
          val b2 = bytes(i) & 0xff; i += 1
          if (b1 < b1min || b1 > b1max || b2 < b2min || b2 > b2max)
            sb.append('�')
          else sb.appendCodePoint(t.tbl((b1 - b1min) * span2 + (b2 - b2min)))
        }
      }
    } else { // 4b (ZHT32TRIS): fixed lead, then three ranged bytes
      val Array(lead, b2min, b2max, b3min, b3max, b4min, b4max) = t.bounds
      val span3 = b3max - b3min + 1
      val span4 = b4max - b4min + 1
      def take(): Int = { val b = bytes(i) & 0xff; i += 1; b }
      while (i < bytes.length) {
        val b1 = take()
        if (b1 <= 0x7f) sb.append(b1.toChar)
        else if (b1 != lead || i >= bytes.length) sb.append('�')
        else {
          val b2 = take()
          if (b2 < b2min || b2 > b2max || i >= bytes.length)
            sb.append('�')
          else {
            val b3 = take()
            if (b3 < b3min || b3 > b3max || i >= bytes.length)
              sb.append('�')
            else {
              val b4 = take()
              if (b4 < b4min || b4 > b4max) sb.append('�')
              else sb.appendCodePoint(t.tbl((b2 - b2min) * span3 * span4 +
                (b3 - b3min) * span4 + (b4 - b4min)))
            }
          }
        }
      }
    }
    sb.toString
  }

  /** Every id [[decode]] accepts on this JVM — the union of the
    * JVM-backed, NRC, vendor-8-bit, tilde-variant and custom-multibyte
    * maps. On a full JDK this equals the reference's complete
    * Locales.cpp registry (138 ids). */
  lazy val decodableIds: Set[Int] =
    supported.keySet ++ nrcTables.keySet ++ vendor8Tables.keySet ++
      tildeVariants.keySet ++ mbTables.keySet

  /** ID → Oracle charset name, for diagnostics/config echo. */
  val oracleName: Map[Int, String] =
    idTable.map { case (id, ora, _) => id -> ora } .toMap ++
      nrcOverrides.map { case (id, (n, _)) => id -> n } ++
      vendor8Tables.map { case (id, (n, _, _)) => id -> n } ++
      tildeVariants.map { case (id, (n, _)) => id -> n } ++
      mbTables.map { case (id, t) => id -> t.name }

  /** Decode raw column bytes under the column's NLS charset ID.
    * Unknown ID → IllegalArgumentException (config-error semantics, like
    * the reference's startup refusal); bad sequences → U+FFFD. */
  def decode(bytes: Array[Byte], charsetId: Int): String = {
    nrcTables.get(charsetId) match {
      case Some(tbl) =>
        // 7-bit NRC: high bit masked like the reference's decode
        val out = new Array[Char](bytes.length)
        var i = 0
        while (i < bytes.length) { out(i) = tbl(bytes(i) & 0x7f); i += 1 }
        new String(out)
      case None if mbTables.contains(charsetId) =>
        decodeMb(bytes, mbTables(charsetId))
      case None if tildeVariants.contains(charsetId) =>
        new String(bytes, tildeVariants(charsetId)._2)
          .replace('〜', '～')
      case None => vendor8Tables.get(charsetId) match {
        case Some((_, customAscii, tbl)) =>
          // 8-bit vendor page: single-byte map; low half is ASCII
          // identity unless the page declares a custom ASCII half
          val out = new Array[Char](bytes.length)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            out(i) =
              if (customAscii) tbl(b)
              else if (b <= 127) b.toChar
              else tbl(b - 128)
            i += 1
          }
          new String(out)
        case None =>
          val cs = supported.getOrElse(charsetId,
            throw new IllegalArgumentException(
              s"unsupported charset id $charsetId" +
                oracleName.get(charsetId).fold("")(n => s" ($n)")))
          new String(bytes, cs)
      }
    }
  }
}
