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
}
