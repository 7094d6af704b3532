package graft.cdc

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** Importer for the reference's OWN schema-checkpoint files — the
  * migration path for a running OLR deployment: point this at its
  * `<database>-chkpt-<scn>.json` and get a live [[Dictionary]] without
  * re-bootstrapping against the source database.
  *
  * Field layout transcribed from the reference serializer
  * (/root/reference/src/metadata/SerializerJson.cpp:52-537 serialize,
  * :539-760 deserialize — the sys-* arrays carry raw SYS.%$ rows with
  * kebab-case field names; 128-bit NUMBER words ride as bare decimal
  * integers). Table assembly mirrors Schema::buildMaps
  * (/root/reference/src/metadata/Schema.cpp:640-800): columns come from
  * sys-col rows with seg-col > 0 ordered by seg-col, PK designation
  * walks sys-ccol → sys-cdef type 2, guard segments from sys-ecol keyed
  * on (tab-obj, int-col), partition objs from sys-tabpart /
  * sys-tabcompart / sys-tabsubpart, LOB segments from sys-lob +
  * sys-lob-comp-part + sys-lob-frag, XDB token tables from xdb-ttset +
  * the per-suffix xdb-xnm/xdb-xqn arrays. */
object OlrCheckpoint {

  /** Positioning metadata carried alongside the schema (deserialize's
    * loadMetadata half): where the OLR deployment stopped. */
  case class Meta(
      scn: Long,
      seq: Long,
      offset: Long,
      database: String,
      resetlogs: Long,
      activation: Long,
      bigEndian: Boolean,
      conId: Int,
      conName: String,
      nlsCharacterSet: String,
      nlsNcharCharacterSet: String,
      schemaScn: Long)

  /** Parse a reference checkpoint file: (positioning meta, dictionary).
    * Malformed input fails loudly (the reference's deserialize throws
    * DataException on parse errors and missing tags,
    * SerializerJson.cpp:544-594 checkJsonFields) — a checkpoint that
    * parsed to an EMPTY schema would silently drop every event
    * downstream, the worst failure mode for a migration tool. */
  def importJson(json: String): (Meta, Dictionary) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(json)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"not a checkpoint file - JSON parse error: ${e.getMessage}") }
    require(root != null && root.isObject,
      "not a checkpoint file - no JSON object")
    // the schema sections the serializer always writes (documentChildNames)
    val needed = Seq("scn", "sys-user", "sys-obj", "sys-col")
    val missing = needed.filterNot(root.has)
    require(missing.isEmpty,
      s"checkpoint missing required fields: ${missing.mkString(", ")} - " +
        "is this a reference schema checkpoint (SerializerJson layout)?")

    def arr(name: String): Seq[JsonNode] =
      Option(root.get(name)).map(_.elements().asScala.toSeq).getOrElse(Nil)
    def l(n: JsonNode, f: String): Long =
      Option(n.get(f)).map(_.asLong).getOrElse(0L)
    def i(n: JsonNode, f: String): Int =
      Option(n.get(f)).map(_.asInt).getOrElse(0)
    def s(n: JsonNode, f: String): String =
      Option(n.get(f)).map(_.asText).getOrElse("")
    /** 128-bit NUMBER words (property/flags/spare1/flags-stg): the
      * serializer writes them as 2-element arrays `[low64, high64]`
      * (IntX::toString, /root/reference/src/common/types/IntX.h:154;
      * deserialize pins exactly that shape, SerializerJson.cpp:884-888
      * "property should be an array with 2 elements"; data[0] is the
      * LOW word — isSet64 masks it directly). A bare integer is also
      * accepted for hand-authored fixtures. */
    def big(n: JsonNode, f: String): BigInt =
      Option(n.get(f)).map { v =>
        if (v.isArray)
          v.elements().asScala.zipWithIndex
            .map { case (w, i) => BigInt(w.asText) << (64 * i) }
            .foldLeft(BigInt(0))(_ + _)
        else BigInt(v.asText)
      }.getOrElse(BigInt(0))

    // checkpoint position: pre-min-tran files carry seq/offset at the
    // top level; newer ones nest them (SerializerJson.cpp:601-617)
    val minTran = Option(root.get("min-tran"))
    val meta = Meta(
      scn = l(root, "scn"),
      seq = minTran.map(m => l(m, "seq")).getOrElse(l(root, "seq")),
      offset = minTran.map(m => l(m, "offset")).getOrElse(l(root, "offset")),
      database = s(root, "database"),
      resetlogs = l(root, "resetlogs"),
      activation = l(root, "activation"),
      bigEndian = l(root, "big-endian") == 1L,
      conId = i(root, "con-id"),
      conName = s(root, "con-name"),
      nlsCharacterSet = s(root, "nls-character-set"),
      nlsNcharCharacterSet = s(root, "nls-nchar-character-set"),
      schemaScn = l(root, "schema-scn"))

    // ---- raw sys-* rows ---------------------------------------------
    val users: Map[Long, String] =
      arr("sys-user").map(u => l(u, "user") -> s(u, "name")).toMap
    val objs = arr("sys-obj")
    val tabObjs: Set[Long] = arr("sys-tab").map(t => l(t, "obj")).toSet
    val colsByObj: Map[Long, Seq[JsonNode]] =
      arr("sys-col").groupBy(c => l(c, "obj"))
    // PK walk: ccol (obj, int-col) -> con -> cdef type 2
    val pkCons: Set[Long] = arr("sys-cdef")
      .filter(d => i(d, "type") == 2).map(d => l(d, "con")).toSet
    val pkIntCols: Map[Long, Set[Long]] = arr("sys-ccol")
      .filter(c => pkCons(l(c, "con")))
      .groupBy(c => l(c, "obj"))
      .map { case (o, cs) => o -> cs.map(c => l(c, "int-col")).toSet }
    // guard segments: ecol keyed on (tab-obj, int-col) — Schema.cpp:661
    // matches SysEColKey(obj, sysCol->intCol) against colNum
    val guardSegs: Map[(Long, Long), Int] = arr("sys-ecol")
      .map(e => (l(e, "tab-obj"), l(e, "col-num")) -> i(e, "guard-id"))
      .toMap

    val hiddenBit = BigInt(1) << 5
    val nestedBit = BigInt(1) << 10 // NESTED_TABLES_SETID (SysCol.h:43)
    val unusedBit = BigInt(1) << 15
    val guardBit = BigInt(1) << 39

    val tables = objs
      // tables are OBJ$ TYPE# 2 rows with a TAB$ entry (Schema::buildMaps
      // iterates sysTab; a checkpoint without sys-tab rows — not emitted
      // by the reference — falls back to the type gate alone)
      .filter(o => i(o, "type") == 2 &&
        (tabObjs.isEmpty || tabObjs(l(o, "obj"))))
      .map { o =>
        val obj = l(o, "obj")
        val keys = pkIntCols.getOrElse(obj, Set.empty)
        var pkOrd = 0
        val columns = colsByObj.getOrElse(obj, Nil)
          .filter(c => i(c, "seg-col") > 0) // Schema.cpp:654 skips segCol 0
          .sortBy(c => i(c, "seg-col"))
          .map { c =>
            val prop = big(c, "property")
            val intCol = l(c, "int-col")
            val isPk = keys(intCol)
            if (isPk) pkOrd += 1
            // charset-form 1/2 resolve to the DATABASE charset (the feed
            // contract's pre-decoded UTF-8 path, id 0 here); form 0
            // keeps the column's own id (Schema.cpp:666-675)
            val csForm = i(c, "charset-form")
            DbColumn(
              name = s(c, "name"),
              typeCode = i(c, "type"),
              length = i(c, "length"),
              precision = i(c, "precision"),
              scale = i(c, "scale"),
              numPk = if (isPk) pkOrd else 0,
              nullable = l(c, "null") == 0L,
              hidden = (prop & hiddenBit) != 0,
              guard = (prop & guardBit) != 0,
              nested = (prop & nestedBit) != 0,
              unused = (prop & unusedBit) != 0,
              guardSeg = guardSegs.getOrElse((obj, intCol), -1),
              charsetId = if (csForm == 0) i(c, "charset-id") else 0)
          }
        DbTable(obj, l(o, "data-obj"),
          users.getOrElse(l(o, "owner"), s"USER_${l(o, "owner")}"),
          s(o, "name"), columns,
          tagType = if (keys.nonEmpty) "pk" else "")
      }

    // ---- storage maps (the shared Dictionary.storageChains fold) -----
    val colName: Map[(Long, Long), String] = colsByObj.flatMap {
      case (o, cs) => cs.map(c => (o, l(c, "int-col")) -> s(c, "name"))
    }
    val lobRoots = arr("sys-lob").map { lb =>
      val o = l(lb, "obj"); val ic = l(lb, "int-col")
      LobSegment(l(lb, "l-obj"), o, ic.toInt,
        colName.getOrElse((o, ic), ""), l(lb, "ts"))
    }
    val (partMap, lobSegs) = Dictionary.storageChains(
      arr("sys-tabpart").map(p => l(p, "obj") -> l(p, "bo")),
      arr("sys-tabcompart").map(p => l(p, "obj") -> l(p, "bo")),
      arr("sys-tabsubpart").map(p => l(p, "obj") -> l(p, "p-obj")),
      lobRoots,
      arr("sys-lob-comp-part").map(p => l(p, "part-obj") -> l(p, "l-obj")),
      arr("sys-lob-frag").map(f => l(f, "frag-obj") -> l(f, "parent-obj")))

    // ---- XDB token tables (per-suffix arrays) -------------------------
    val ttSet = arr("xdb-ttset").map(t => XdbTtSet(s(t, "guid"),
      s(t, "toksuf"), l(t, "flags"), l(t, "obj")))
    val xnm = ttSet.flatMap(t => arr(s"xdb-xnm${t.tokSuf}")
      .map(n => XdbXNm(s(n, "id"), s(n, "nmspcuri"))))
    val xqn = ttSet.flatMap(t => arr(s"xdb-xqn${t.tokSuf}")
      .map(q => XdbXQn(s(q, "id"), s(q, "localname"), s(q, "nmspcid"),
        s(q, "flags"))))
    val xmlCtx =
      if (ttSet.isEmpty) None else Some(XmlCtx(ttSet, xnm, xqn))

    (meta, new Dictionary(tables, Nil, xmlCtx, partMap, lobSegs))
  }

  /** Export a [[Dictionary]] AS a reference-format schema checkpoint —
    * the reverse migration path: an engine running on this library can
    * keep OLR-compatible checkpoints, so switching BACK (or pointing
    * other OLR tooling at the schema) needs no re-bootstrap either.
    * Field set and encodings mirror SerializerJson::serialize
    * (SerializerJson.cpp:52-537): kebab-case keys, [low64, high64]
    * 128-bit words, synthesized 18-char row-ids (the reference only
    * uses them as map keys), one sys-obj/sys-tab/sys-col/... row per
    * LATEST table version (the OLR schema is current-state; our full
    * version history stays in [[Dictionary.toJson]] snapshots).
    * `importJson(exportJson(m, d))` round-trips the schema (spec-gated:
    * tables, keys, flags, partition map, LOB segments, XDB tables). */
  def exportJson(meta: Meta, dict: Dictionary): String = {
    val sb = new java.lang.StringBuilder(1 << 16)
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    var rowIdN = 0
    def rowId(): String = { // 18-char synthetic id, base-26 counter tail
      rowIdN += 1
      val tail = java.lang.Long.toString(rowIdN.toLong, 26).toUpperCase
      ("A" * (18 - tail.length)) + tail
    }
    def w2(v: BigInt): String = { // [low64, high64]
      val m = BigInt(1) << 64
      s"[${v % m},${v / m}]"
    }
    // current-state schema: the latest live version per obj
    val live = dict.tables.groupBy(_.obj).values
      .map(_.maxBy(_.validFromScn)).toSeq.sortBy(_.obj)
    val owners = live.map(_.owner).distinct.sorted
    val userId = owners.zipWithIndex.map { case (o, i) => o -> (i + 2L) }
      .toMap

    sb.append(s"""{"database":"${esc(meta.database)}"""")
      .append(s""","scn":${meta.scn},"resetlogs":${meta.resetlogs}""")
      .append(s""","activation":${meta.activation},"time":0""")
      .append(s""","seq":${meta.seq},"offset":${meta.offset}""")
      .append(s""","min-tran":{"seq":${meta.seq},"offset":${meta.offset},"xid":"0x0000.000.00000000"}""")
      .append(s""","big-endian":${if (meta.bigEndian) 1 else 0}""")
      .append(s""","context":"","con-id":${meta.conId}""")
      .append(s""","con-name":"${esc(meta.conName)}"""")
      .append(s""","db-timezone":"+00:00","db-recovery-file-dest":""""")
      .append(s""","db-block-checksum":"TYPICAL","log-archive-dest":""""")
      .append(s""","log-archive-format":"o1_mf_%t_%s_%h_.arc"""")
      .append(s""","nls-character-set":"${esc(meta.nlsCharacterSet)}"""")
      .append(s""","nls-nchar-character-set":"${esc(meta.nlsNcharCharacterSet)}"""")
      .append(s""","supp-log-db-primary":1,"supp-log-db-all":0""")
      .append(s""","online-redo":[],"incarnations":[]""")
      .append(owners.map(o => s""""${esc(o)}"""")
        .mkString(""","users":[""", ",", "]"))
      .append(s""","schema-scn":${meta.schemaScn}""")

    // SYS.USER$ / SYS.OBJ$ / SYS.TAB$
    sb.append(owners.map(o =>
        s"""{"row-id":"${rowId()}","user":${userId(o)},"name":"${esc(o)}","spare1":[0,0],"single":0}""")
      .mkString(""","sys-user":[""", ",", "]"))
    sb.append(live.map(t =>
        s"""{"row-id":"${rowId()}","owner":${userId(t.owner)},"obj":${t.obj},"data-obj":${t.dataObj},"name":"${esc(t.name)}","type":2,"flags":[0,0],"single":0}""")
      .mkString(""","sys-obj":[""", ",", "]"))
    sb.append(live.map(t =>
        s"""{"row-id":"${rowId()}","obj":${t.obj},"data-obj":${t.dataObj},"ts":0,"clu-cols":0,"flags":[0,0],"property":[0,0]}""")
      .mkString(""","sys-tab":[""", ",", "]"))

    // SYS.COL$ (property bits: hidden 2^5, nested 2^10, unused 2^15,
    // guard 2^39 — SysCol.h PROPERTY)
    val colRows = live.flatMap { t =>
      t.columns.zipWithIndex.map { case (c, i) =>
        val ord = i + 1
        val prop = (if (c.hidden) BigInt(1) << 5 else BigInt(0)) |
          (if (c.nested) BigInt(1) << 10 else BigInt(0)) |
          (if (c.unused) BigInt(1) << 15 else BigInt(0)) |
          (if (c.guard) BigInt(1) << 39 else BigInt(0))
        s"""{"row-id":"${rowId()}","obj":${t.obj},"col":$ord,"seg-col":$ord,"int-col":$ord,"name":"${esc(c.name)}","type":${c.typeCode},"length":${c.length},"precision":${c.precision},"scale":${c.scale},"charset-form":0,"charset-id":${c.charsetId},"null":${if (c.nullable) 0 else 1},"property":${w2(prop)}}"""
      }
    }
    sb.append(colRows.mkString(""","sys-col":[""", ",", "]"))

    // PK constraints: one CDEF per keyed table, CCOL per key column
    var con = 6L
    val (cdefRows, ccolRows) = live.filter(_.keyColumns.nonEmpty)
      .map { t =>
        con += 1
        val d =
          s"""{"row-id":"${rowId()}","con":$con,"obj":${t.obj},"type":2}"""
        val cs = t.keyColumns.map { kc =>
          val ic = t.columns.indexWhere(_.name == kc.name) + 1
          s"""{"row-id":"${rowId()}","con":$con,"int-col":$ic,"obj":${t.obj},"spare1":[0,0]}"""
        }
        (d, cs)
      }.unzip
    sb.append(ccolRows.flatten.mkString(""","sys-ccol":[""", ",", "]"))
    sb.append(cdefRows.mkString(""","sys-cdef":[""", ",", "]"))
    sb.append(live.map(t =>
        s"""{"row-id":"${rowId()}","obj":${t.obj},"flags-stg":[0,0]}""")
      .mkString(""","sys-deferredstg":[""", ",", "]"))

    // guard segments (ECOL$): columns carrying guardSeg
    val ecolRows = live.flatMap { t =>
      t.columns.zipWithIndex.collect { case (c, i) if c.guardSeg >= 0 =>
        s"""{"row-id":"${rowId()}","tab-obj":${t.obj},"col-num":${i + 1},"guard-id":${c.guardSeg}}"""
      }
    }
    sb.append(ecolRows.mkString(""","sys-ecol":[""", ",", "]"))

    // LOB segments: export EVERY lobj (roots and flattened aliases) as
    // sys-lob rows — import registers each as a root with the same
    // owner, which resolves identically (the root/comppart/frag split
    // is not recoverable from the flattened model and not needed)
    sb.append(dict.lobSegments.map(l =>
        s"""{"row-id":"${rowId()}","obj":${l.obj},"col":${l.intCol},"int-col":${l.intCol},"l-obj":${l.lobj},"ts":${l.ts}}""")
      .mkString(""","sys-lob":[""", ",", "]"))
    sb.append(""","sys-lob-comp-part":[],"sys-lob-frag":[]""")

    // partition map: raw links as sys-tabpart rows (import reproduces
    // the exact map; transitive baseObj resolves chains either way)
    sb.append(dict.partitionOf.toSeq.sorted.map { case (o, b) =>
        s"""{"row-id":"${rowId()}","obj":$o,"data-obj":0,"bo":$b}"""
      }.mkString(""","sys-tabpart":[""", ",", "]"))
    sb.append(""","sys-tabcompart":[],"sys-tabsubpart":[]""")
    sb.append(""","sys-ts":[]""")

    // XDB token tables: pooled xnm/xqn emit under the first suffix (the
    // import pools them right back; XmlCtx lookup is suffix-agnostic)
    dict.xmlCtx match {
      case Some(x) if x.ttSet.nonEmpty =>
        sb.append(x.ttSet.map(t =>
            s"""{"row-id":"${rowId()}","guid":"${esc(t.guid)}","toksuf":"${esc(t.tokSuf)}","flags":${t.flags},"obj":${t.obj}}""")
          .mkString(""","xdb-ttset":[""", ",", "]"))
        val suf = x.ttSet.head.tokSuf
        sb.append(x.xnm.map(n =>
            s"""{"row-id":"${rowId()}","nmspcuri":"${esc(n.nmSpcUri)}","id":"${esc(n.id)}"}""")
          .mkString(s""","xdb-xnm$suf":[""", ",", "]"))
        sb.append(s""","xdb-xpt$suf":[]""")
        sb.append(x.xqn.map(q =>
            s"""{"row-id":"${rowId()}","nmspcid":"${esc(q.nmSpcId)}","localname":"${esc(q.localName)}","flags":"${esc(q.flags)}","id":"${esc(q.id)}"}""")
          .mkString(s""","xdb-xqn$suf":[""", ",", "]"))
      case _ => sb.append(""","xdb-ttset":[]""")
    }
    sb.append("}")
    sb.toString
  }
}
