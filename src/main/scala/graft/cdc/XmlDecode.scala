package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.udf

/** XDB token dictionaries backing XMLTYPE decode (SURVEY.md §1.3).
  *
  * The reference resolves binary-XML token codes through three XDB catalog
  * tables it replicates like any other dictionary table
  * (`/root/reference/src/common/table/XdbXQn.h`, `XdbXNm.h`, `XdbTtSet.h`);
  * here they are plain dimension rows: tiny (a few thousand tokens per
  * XMLTYPE-bearing schema), versioned with the dictionary, broadcast to
  * the decode site — never shuffled against the feed.
  *
  *  - [[XdbXQn]]: qualified-name token — uppercase-hex `id` (the wire code
  *    rendered with Data::map16U, XdbXQn.h:82-95) → local name, namespace
  *    id, flags (last digit carries FLAG_ISATTRIBUTE, XdbXQn.h:35).
  *  - [[XdbXNm]]: namespace token — `id` → namespace URI.
  *  - [[XdbTtSet]]: token-table set registration (guid → token-table
  *    suffix + owning obj#) — the reference uses it to locate which
  *    XDB.X$xx%% tables serve a given XMLTYPE column; carried for
  *    checkpoint-serde parity.
  */
case class XdbXQn(id: String, localName: String, nmSpcId: String, flags: String)
case class XdbXNm(id: String, nmSpcUri: String)
case class XdbTtSet(guid: String, tokSuf: String, flags: Long, obj: Long)

/** Immutable token context, the `XmlCtx` the reference hands to parseXml. */
case class XmlCtx(ttSet: Seq[XdbTtSet], xnm: Seq[XdbXNm], xqn: Seq[XdbXQn]) {
  lazy val qnById: Map[String, XdbXQn] = xqn.map(q => q.id -> q).toMap
  lazy val nmById: Map[String, XdbXNm] = xnm.map(n => n.id -> n).toMap
}

/** Binary-XML (CSX) token-stream decoder — semantics pinned against
  * `Builder::parseXml` (`/root/reference/src/builder/Builder.cpp:1844-2390`)
  * token by token:
  *
  *   0x9E       header: 3 flag bytes; flags2 drives the `<?xml ...?>` decl
  *              (XMLDECL 0x02, VERSION 0x08 / 1.1 0x80, STANDALONE 0x01 /
  *              yes 0x10, ENCODING 0x04 — rendered ` encoding="UTF=8"`,
  *              reproducing the reference's literal, Builder.cpp:1895)
  *   0x9F       prolog: version byte (must be 1) + flags; DOCID 0x08 and
  *              PATHID 0x10 sections are skipped
  *   0xC8/0xC9  open tag, 16/32-bit code, content follows until 0xD9
  *   0xC0..0xC3 self-contained tag/attribute: inline size (byte or 16-bit;
  *              byte 0x8F means empty) + 16/32-bit code + inline value
  *   0xB2       namespace set: optional prefix + (nmSpc, dict) token pair
  *   0xDD       namespace add: ` xmlns[:prefix]="uri"` via XdbXNm
  *   < 0x80     text chunk, size = byte + 1
  *   0x8B       64-bit-size text chunk
  *   0xD9       end: close attribute (`"`) or pop tag (`</tag>`)
  *   0xD4/0xD5  repeat last tag
  *   0xD6..0xD8 ignored
  *   0xA0       EOF
  *
  * Tag codes resolve through XdbXQn (uppercase-hex, minimal 2/4/6/8-char
  * width); non-attribute tags get the B2-registered namespace prefix.
  * Malformed input (truncated section, unknown token/code, unbalanced
  * 0xD9) returns None — the reference's warning-and-bail contract. */
object XmlDecode {

  private val HdrStandalone = 0x01
  private val HdrXmlDecl = 0x02
  private val HdrEncoding = 0x04
  private val HdrVersion = 0x08
  private val HdrStandaloneYes = 0x10
  private val HdrVersion11 = 0x80
  private val PrologDocId = 0x08
  private val PrologPathId = 0x10
  private val FlagIsAttribute = 1

  /** Minimal-width uppercase-hex code string (Builder.cpp:2060-2090). */
  private[cdc] def codeStr(code: Long): String = {
    val w = if (code < 0x100) 2 else if (code < 0x10000) 4
      else if (code < 0x1000000) 6 else 8
    val s = java.lang.Long.toHexString(code).toUpperCase
    "0" * (w - s.length) + s
  }

  def parse(data: Array[Byte], ctx: XmlCtx): Option[String] = {
    val out = new StringBuilder
    var pos = 0
    val size = data.length
    var tags = List.empty[String]
    val dictNmSpc = scala.collection.mutable.Map.empty[String, String]
    val nmSpcPrefix = scala.collection.mutable.Map.empty[String, String]
    var tagOpen = false
    var attributeOpen = false
    var lastTag = ""
    def u8(i: Int): Int = data(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = ((u16(i).toLong) << 16) | u16(i + 2)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def str(i: Int, n: Int): String =
      new String(data, i, n, java.nio.charset.StandardCharsets.UTF_8)

    while (pos < size) {
      val b = u8(pos)
      b match {
        case 0x9e => // header
          pos += 1
          if (pos + 2 >= size) return None
          pos += 2 // flags0, flags1 unused (Builder.cpp:1879-1880)
          val flags2 = u8(pos); pos += 1
          if ((flags2 & HdrXmlDecl) != 0) {
            out.append("<?xml")
            if ((flags2 & HdrVersion) != 0)
              out.append(" version=").append(
                if ((flags2 & HdrVersion11) != 0) "\"1.1\"" else "\"1.0\"")
            if ((flags2 & HdrStandalone) != 0)
              out.append(if ((flags2 & HdrStandaloneYes) != 0)
                " standalone=\"yes\"" else " standalone=\"no\"")
            // the reference emits this exact (sic) string, Builder.cpp:1895
            if ((flags2 & HdrEncoding) != 0) out.append(" encoding=\"UTF=8\"")
            out.append("?>")
          }

        case 0x9f => // prolog
          pos += 1
          if (pos + 1 >= size) return None
          val ver = u8(pos); pos += 1
          if (ver != 1) return None
          val flags0 = u8(pos); pos += 1
          if ((flags0 & PrologDocId) != 0) {
            if (pos >= size) return None
            val n = u8(pos); pos += 1
            if (pos + n - 1 >= size) return None
            pos += n
          }
          if ((flags0 & PrologPathId) != 0) {
            var k = 0
            while (k < 2) {
              if (pos >= size) return None
              val n = u8(pos); pos += 1
              if (pos + n - 1 >= size) return None
              pos += n
              k += 1
            }
          }

        case 0xc8 | 0xc9 | 0xc0 | 0xc1 | 0xc2 | 0xc3 => // tag/attribute
          var tagSize = 0L
          var code = 0L
          var isSingle = false
          b match {
            case 0xc8 =>
              pos += 1
              if (pos + 1 >= size) return None
              code = u16(pos); pos += 2
            case 0xc9 =>
              pos += 1
              if (pos + 3 >= size) return None
              code = u32(pos); pos += 4
            case 0xc0 =>
              pos += 1
              if (pos + 2 >= size) return None
              tagSize = u8(pos); pos += 1
              tagSize = if (tagSize == 0x8f) 0 else tagSize + 1
              code = u16(pos); pos += 2
              isSingle = true
            case 0xc1 =>
              pos += 1
              if (pos + 3 >= size) return None
              tagSize = u16(pos); pos += 2
              code = u16(pos); pos += 2
              isSingle = true
            case 0xc2 =>
              pos += 1
              if (pos + 4 >= size) return None
              tagSize = u8(pos); pos += 1
              tagSize = if (tagSize == 0x8f) 0 else tagSize + 1
              code = u32(pos); pos += 4
              isSingle = true
            case _ => // 0xc3
              pos += 1
              if (pos + 5 >= size) return None
              tagSize = u16(pos); pos += 2
              code = u32(pos); pos += 4
              isSingle = true
          }
          val qn = ctx.qnById.get(codeStr(code)).getOrElse(return None)
          var tag = qn.localName
          val isAttribute = qn.flags.nonEmpty &&
            ((qn.flags.last - '0') & FlagIsAttribute) != 0
          if (isAttribute) out.append(' ').append(tag).append("=\"")
          else {
            if (attributeOpen) { out.append("\">"); attributeOpen = false }
            else if (tagOpen) { out.append('>'); tagOpen = false }
            nmSpcPrefix.get(qn.nmSpcId).foreach(p => tag = p + ":" + tag)
            if (tagSize == 0 && !isSingle) { out.append('<').append(tag); tagOpen = true }
            else out.append('<').append(tag).append('>')
          }
          if (tagSize > 0) {
            if (pos + tagSize >= size) return None
            out.append(str(pos, tagSize.toInt))
            pos += tagSize.toInt
          }
          if (isAttribute) {
            if (isSingle) out.append('"') else attributeOpen = true
          } else {
            if (isSingle) out.append("</").append(tag).append('>')
            else tags = tag :: tags
          }

        case 0xb2 => // namespace set
          pos += 1
          if (pos + 7 >= size) return None
          val tagSize = u8(pos); pos += 1
          pos += 2 // 16-bit field unused (Builder.cpp:2177)
          val nmSpc = u16(pos); pos += 2
          val dict = u16(pos); pos += 2
          val nmSpcId = codeStr(nmSpc)
          val dictId = codeStr(dict)
          if (dictNmSpc.contains(dictId)) return None
          dictNmSpc(dictId) = nmSpcId
          if (tagSize > 0) {
            val prefix = str(pos, tagSize); pos += tagSize
            if (nmSpcPrefix.contains(nmSpcId)) return None
            nmSpcPrefix(nmSpcId) = prefix
          }

        case 0xdd => // namespace add: xmlns declaration
          pos += 1
          if (pos + 2 >= size) return None
          val dict = u16(pos); pos += 2
          val nmSpcId = dictNmSpc.get(codeStr(dict)).getOrElse(return None)
          val nm = ctx.nmById.get(nmSpcId).getOrElse(return None)
          out.append(" xmlns")
          nmSpcPrefix.get(nmSpcId).foreach(p => out.append(':').append(p))
          out.append("=\"").append(nm.nmSpcUri).append('"')

        case 0x8b => // 64-bit-size text chunk
          if (tagOpen && !attributeOpen) { out.append('>'); tagOpen = false }
          pos += 1
          if (pos + 8 >= size) return None
          val n = u64(pos); pos += 8
          if (pos + n >= size) return None
          out.append(str(pos, n.toInt)); pos += n.toInt

        case t if t < 0x80 => // text chunk
          if (tagOpen && !attributeOpen) { out.append('>'); tagOpen = false }
          val n = t + 1
          pos += 1
          if (pos + n >= size) return None
          out.append(str(pos, n)); pos += n

        case 0xd9 => // end tag / end attribute
          if (attributeOpen) { out.append('"'); attributeOpen = false; tagOpen = true }
          else tags match {
            case h :: rest =>
              lastTag = h; tags = rest; out.append("</").append(h).append('>')
            case Nil => return None
          }
          pos += 1

        case 0xd4 | 0xd5 => // repeat last tag
          tags = lastTag :: tags
          out.append('<').append(lastTag)
          tagOpen = true
          pos += 1

        case t if t >= 0xd6 && t <= 0xd8 => // ignored
          pos += 1

        case 0xa0 => // EOF
          return Some(out.toString)

        case _ => return None
      }
    }
    Some(out.toString)
  }

  /** Column form: decode `bin` through a driver-captured token context
    * (dimension-sized, rides the closure — the per-executor cost is one
    * deserialized map, never a shuffle). Malformed input → null, the
    * column analogue of the reference's warning-and-keep-going. */
  def decodeCol(bin: Column, ctx: XmlCtx): Column = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) null else parse(bytes, ctx).orNull)
    f(bin)
  }

  /** The token tables as dimension DataFrames (versioned/broadcast like
    * every other dictionary side — Dictionary.toDF's asymmetry). */
  def toDF(spark: SparkSession, ctx: XmlCtx): DataFrame = {
    import spark.implicits._
    ctx.xqn.map(q => ("qn", q.id, q.localName, q.nmSpcId, q.flags))
      .toDF("kind", "id", "local_name", "nmspc_id", "flags")
      .unionByName(ctx.xnm.map(n => ("nm", n.id, n.nmSpcUri))
        .toDF("kind", "id", "local_name"), allowMissingColumns = true)
  }
}
