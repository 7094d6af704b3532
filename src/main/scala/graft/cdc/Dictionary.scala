package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema registry — the engine's replicated dictionary (SURVEY.md §1.2).
  *
  * Mirrors the reference's in-memory SYS.OBJ$/TAB$/COL$ model at the level
  * our feed needs: obj# → (owner, table, columns, keys, tags, condition),
  * with scn validity ranges for mid-stream schema evolution. Semantics
  * pinned against `src/metadata/Schema.cpp:502-760` (selection/keys/tags)
  * and `src/metadata/SerializerJson.cpp` (checkpoint (de)serialization).
  */
case class DbColumn(
    name: String,
    typeCode: Int, // SysCol.h:69-91 Oracle type codes
    length: Int = 0,
    precision: Int = -1,
    scale: Int = -1,
    numPk: Int = 0,
    nullable: Boolean = true,
    hidden: Boolean = false,
    guard: Boolean = false,
    nested: Boolean = false,
    unused: Boolean = false,
    /** bit index into the table's guard column bitmap (SysCol guard_seg);
      * -1 = not guarded (Builder.cpp:1325 `guardSeg != -1` test) */
    guardSeg: Int = -1,
    /** BLOB column backing an XMLTYPE (SysCol xmlType, Builder.cpp:143) */
    xmlType: Boolean = false,
    /** NLS charset ID (SysCol.h:104 charsetId; Builder.cpp:131 passes it
      * to parseString per value). 0 = unset → the feed's pre-decoded
      * UTF-8 contract applies; a non-UTF-8 id means the feed carries the
      * column's RAW bytes hex-encoded and materialization decodes them
      * via [[graft.core.OracleCharsets]]. */
    charsetId: Int = 0)

object DbTable {
  /** The typeCodes Builder.cpp:254-612's value switch decodes; anything
    * else falls to the UNKNOWN_TYPE default branch. */
  val supportedTypeCodes: Set[Int] = Set(1, 2, 8, 12, 23, 24, 58, 96, 100,
    101, 112, 113, 119, 180, 181, 182, 183, 208, 231, 252)
}

case class DbTable(
    obj: Long,
    dataObj: Long,
    owner: String,
    name: String,
    columns: Seq[DbColumn],
    /** explicit key override (F6: user `key` list beats PK constraints) */
    keyList: Seq[String] = Nil,
    /** tag spec: "pk" | "all" | explicit column list (F7) */
    tagType: String = "",
    tagCols: Seq[String] = Nil,
    conditionExpr: String = "",
    options: Set[String] = Set.empty,
    validFromScn: Long = 0L,
    validToScn: Long = Long.MaxValue) {

  def fullName: String = s"$owner.$name"

  /** Key columns: explicit list wins, else numPk-designated columns. */
  def keyColumns: Seq[DbColumn] =
    if (keyList.nonEmpty) columns.filter(c => keyList.contains(c.name))
    else columns.filter(_.numPk > 0)

  /** Columns visible in output (F4 visibility flags). */
  def visibleColumns(showHidden: Boolean = false, showNested: Boolean = false,
      showUnused: Boolean = false): Seq[DbColumn] =
    columns.filter(c =>
      (!c.hidden || showHidden || c.numPk > 0) &&
        (!c.nested || showNested) && (!c.unused || showUnused))

  /** UNKNOWN_TYPE columns (Format.h:182-185): typeCodes outside the
    * builder's value dispatch (Builder.cpp:254-612 switch) — HIDE drops
    * them from the images, SHOW renders the columnUnknown form. */
  def unknownTypeCols: Seq[String] =
    columns.filterNot(c => DbTable.supportedTypeCodes(c.typeCode)).map(_.name)

  /** The table's guard column (the hidden SYS_NC...$ bitmap column whose
    * redo value marks explicitly-NULL guarded columns), if declared. */
  def guardColName: Option[String] = columns.find(_.guard).map(_.name)

  /** (name, guardSeg) of the columns a guard bitmap can resurrect. */
  def guardedCols: Seq[(String, Int)] =
    columns.filter(_.guardSeg >= 0).map(c => (c.name, c.guardSeg))

  /** JSON (type 119) columns — experimental-flag handling (Builder.cpp:154). */
  def jsonCols: Seq[String] = columns.filter(_.typeCode == 119).map(_.name)

  /** XMLTYPE-backed BLOB columns (Builder.cpp:143). */
  def xmlCols: Seq[String] = columns.filter(_.xmlType).map(_.name)

  /** (name, charsetId) of string columns whose feed value is raw hex in
    * a non-UTF-8 charset (parseString dispatch, Builder.cpp:131). 873 =
    * AL32UTF8 is the pass-through contract; 0 = unset behaves the same. */
  def charsetCols: Seq[(String, Int)] =
    columns.filter(c => c.charsetId != 0 && c.charsetId != 873)
      .map(c => (c.name, c.charsetId))

  /** Tag columns for the message key (F7). */
  def resolvedTagCols: Seq[String] = tagType match {
    case "pk" => keyColumns.map(_.name)
    case "all" => columns.map(_.name)
    case _ => tagCols
  }

  /** SCHEMA_FORMAT::FULL column descriptors (BuilderJson.h:411-530):
    * Oracle type name + the per-type size fields (length for the char/
    * raw/timestamp families, precision+scale for number, neither for the
    * sizeless types), always nullable. None fields are omitted from the
    * rendered JSON (to_json drops nulls), reproducing the reference's
    * per-type field shapes. */
  def schemaColumns(showHidden: Boolean = false, showNested: Boolean = false,
      showUnused: Boolean = false): Seq[(String, String, Option[Int], Option[Int], Option[Int], Boolean)] =
    visibleColumns(showHidden, showNested, showUnused).map { c =>
      val (tn, len, prec, scale) = c.typeCode match {
        case 1 => ("varchar2", Some(c.length), None, None)
        case 2 => ("number", None, Some(c.precision), Some(c.scale))
        case 8 => ("long", None, None, None)
        case 12 => ("date", None, None, None)
        case 23 => ("raw", Some(c.length), None, None)
        case 24 => ("long raw", None, None, None)
        case 96 => ("char", Some(c.length), None, None)
        case 100 => ("binary_float", None, None, None)
        case 101 => ("binary_double", None, None, None)
        case 112 => ("clob", None, None, None)
        case 113 => ("blob", None, None, None)
        case 180 => ("timestamp", Some(c.length), None, None)
        case 181 => ("timestamp with time zone", Some(c.length), None, None)
        case 182 => ("interval year to month", Some(c.length), None, None)
        case 183 => ("interval day to second", Some(c.length), None, None)
        case 208 => ("urowid", Some(c.length), None, None)
        case 231 => ("timestamp with local time zone", Some(c.length), None, None)
        case _ => ("unknown", None, None, None)
      }
      (c.name, tn, len, prec, scale, c.nullable)
    }

  /** Oracle type code → Spark type (SURVEY.md §1.3 mapping). */
  def toStructType: StructType = StructType(visibleColumns().map { c =>
    val dt: DataType = c.typeCode match {
      case 1 | 96 => StringType // VARCHAR2 / CHAR
      case 2 =>
        if (c.scale >= 0 && c.precision > 0 && c.precision <= 38)
          DecimalType(c.precision, c.scale)
        else StringType // NUMBER beyond Decimal(38) stays canonical string
      case 12 | 180 | 231 => TimestampType
      case 181 => StringType // TS WITH TZ rendered with offset
      case 23 | 113 => BinaryType // RAW / BLOB
      case 112 | 119 | 58 => StringType // CLOB / JSON / XMLTYPE
      case 100 => FloatType
      case 101 => DoubleType
      case 252 => BooleanType
      case _ => StringType
    }
    StructField(c.name, dt, c.nullable)
  })
}

/** Table-selection rule: anchored regex on owner and name (F1,
  * Schema.cpp:502-530 builds std::regex from the config patterns). */
case class TableSelector(ownerPattern: String, namePattern: String) {
  private val ownerRe = ("^" + ownerPattern + "$").r
  private val nameRe = ("^" + namePattern + "$").r
  def matches(owner: String, name: String): Boolean =
    ownerRe.findFirstIn(owner).isDefined && nameRe.findFirstIn(name).isDefined
}

/** One LOB segment registration (the reference's LobCtx/Schema lob maps,
  * SysLob.h + Schema.cpp addLob): `lobj` is the LOB segment object the
  * redo addresses; it resolves to the owning table (`obj`) and column
  * (`intCol`/`colName`). LOBFRAG$/LOBCOMPPART$ rows register EXTRA lobj
  * aliases for the same owning column (partitioned LOBs write under the
  * fragment/partition obj). */
case class LobSegment(
    lobj: Long,
    obj: Long,
    intCol: Int,
    colName: String = "",
    ts: Long = 0L)

/** Immutable dictionary snapshot + scn-versioned lookup. `xmlCtx` carries
  * the XDB token tables when the schema has XMLTYPE columns (the reference
  * replicates XDB.X$xx%% like any other dictionary table and serializes
  * them in the checkpoint schema — SerializerJson.cpp xdbTtSet/XNm/XQn
  * sections); None when the schema has none.
  *
  * `partitionOf` maps a partition/composite-partition/subpartition obj#
  * (TABPART$/TABCOMPART$/TABSUBPART$ rows, resolved through BO#/POBJ# to
  * the base table) to the base table's obj# — the reference registers
  * every partition obj in its schema map so redo addressed to a
  * partition resolves to the owning table's columns
  * (Schema.cpp addTablePartition). `lobSegments` is the LobCtx
  * equivalent for LOB segment objs. */
class Dictionary(val tables: Seq[DbTable], val selectors: Seq[TableSelector],
    val xmlCtx: Option[XmlCtx] = None,
    val partitionOf: Map[Long, Long] = Map.empty,
    val lobSegments: Seq[LobSegment] = Nil) {

  /** Tables passing the selection rules (union of rules). */
  lazy val selected: Seq[DbTable] =
    if (selectors.isEmpty) tables
    else tables.filter(t => selectors.exists(_.matches(t.owner, t.name)))

  private lazy val byObj: Map[Long, Seq[DbTable]] =
    selected.groupBy(_.obj)

  /** Resolve a feed obj# through the partition map: redo addressed to a
    * TABPART$/TABSUBPART$ obj carries the partition's obj#, but the
    * schema (columns, keys, name) lives on the base table. TRANSITIVE
    * (hop-capped): the map may hold raw child→parent links — e.g. a
    * TABSUBPART$ insert folded before its TABCOMPART$ parent stores
    * sub→comp; once comp→base registers, resolution walks the chain, so
    * registration order can never wedge a mapping. */
  def baseObj(obj: Long): Long = {
    var o = obj
    var hops = 0
    while (hops < 4) {
      partitionOf.get(o) match {
        case Some(p) if p != o => o = p; hops += 1
        case _ => return o
      }
    }
    o
  }

  /** obj# → table version valid at `scn` (J2 as-of semantics);
    * partition objs resolve to their base table first. */
  def lookup(obj: Long, scn: Long): Option[DbTable] =
    byObj.getOrElse(baseObj(obj), Nil)
      .find(t => scn >= t.validFromScn && scn < t.validToScn)

  def lookupLatest(obj: Long): Option[DbTable] =
    byObj.getOrElse(baseObj(obj), Nil).sortBy(_.validFromScn).lastOption

  /** LOB segment obj# → owning (table obj#, column name), through any
    * fragment/partition alias (LobCtx resolution). */
  def lobOwner(lobj: Long): Option[(Long, String)] =
    lobSegments.find(_.lobj == lobj).map(s => (s.obj, s.colName))

  /** Dictionary as a DataFrame for broadcast joins against the event
    * stream (owner, name, keys/tags resolved — the join is on obj + scn
    * range; broadcast because the dictionary is always ≪ the feed). */
  def toDF(spark: SparkSession, showHidden: Boolean = false,
      showNested: Boolean = false, showUnused: Boolean = false): DataFrame = {
    import spark.implicits._
    // partition objs join the event stream under THEIR obj# but resolve
    // to the base table's schema: emit one alias row per partition obj
    // per base-table version (dimension-sized: #partitions × #versions,
    // still ≪ the feed — the broadcast asymmetry is unchanged)
    val aliasRows = partitionOf.keys.toSeq.flatMap { pobj =>
      // resolve transitively: the map value may be a composite-partition
      // obj, not the base table, when links were registered raw
      selected.filter(_.obj == baseObj(pobj)).map(t => t.copy(obj = pobj))
    }
    (selected ++ aliasRows).map { t =>
      val visible = t.visibleColumns(showHidden, showNested, showUnused)
        .map(_.name).toSet
      (t.obj, t.dataObj, t.owner, t.name,
        t.keyColumns.map(_.name), t.resolvedTagCols,
        // suppression list, not allow-list: feed columns unknown to the
        // dictionary pass through (schemaless-adjacent leniency)
        t.columns.map(_.name).filterNot(visible),
        t.unknownTypeCols,
        t.validFromScn, t.validToScn,
        t.schemaColumns(showHidden, showNested, showUnused),
        t.guardColName.orNull,
        t.guardedCols,
        t.jsonCols,
        t.xmlCols,
        t.charsetCols.toMap)
    }.toDF("obj", "dataObj", "owner", "table_name", "key_cols", "tag_cols",
      "invisible_cols", "unknown_cols", "valid_from_scn", "valid_to_scn",
      "schema_cols", "guard_col", "guarded_cols", "json_cols", "xml_cols",
      "charset_cols")
      // SCHEMA_FORMAT::FULL descriptor field names (rendered via to_json)
      .withColumn("schema_cols",
        org.apache.spark.sql.functions.expr("transform(schema_cols, c -> " +
        "named_struct('name', c._1, 'type', c._2, 'length', c._3, " +
        "'precision', c._4, 'scale', c._5, 'nullable', c._6))"))
      .withColumn("guarded_cols",
        org.apache.spark.sql.functions.expr("transform(guarded_cols, g -> " +
        "named_struct('name', g._1, 'seg', g._2))"))
  }

  /** Apply one dictionary-DML change (SystemTransaction semantics §1.2:
    * DDL observed as system-table DML): returns a new snapshot where the
    * replaced version is closed at `scn` and the new one opens there. */
  /** ADAPTIVE_SCHEMA refinement (§1.2): the reference registers a `.*`/`.*`
    * wildcard table element (OpenLogReplicator.cpp:617-618) so unknown
    * obj#s are accepted, and synthesizes dictionary entries for them
    * (Metadata::loadAdaptiveSchema, Metadata.cpp:626) that afterwards
    * version exactly like catalog-born ones. Here: an unseen obj# gets an
    * `UNKNOWN.OBJ_<obj#>` entry whose columns are the observed feed
    * columns (varchar-typed — the feed is pre-rendered text), valid from
    * the first scn it was seen at. A known obj# is a no-op. [[evolve]]
    * then applies to the synthesized entry like any other. */
  def withAdaptive(obj: Long, colNames: Seq[String],
      firstScn: Long = 0L): Dictionary =
    if (tables.exists(_.obj == obj) || partitionOf.contains(obj)) this
    else new Dictionary(
      tables :+ DbTable(obj, obj, "UNKNOWN", s"OBJ_$obj",
        colNames.map(n => DbColumn(n, 1)), validFromScn = firstScn),
      selectors, xmlCtx, partitionOf, lobSegments)

  /** Retention: drop table versions no event can resolve against any
    * more — those whose validity window closed at or before `scn` (the
    * stream's low-water mark: nothing older than the oldest open
    * transaction's first scn can still be emitted). Keeps the broadcast
    * dictionary bounded by the ACTIVE schema instead of growing with
    * years of DDL history; the full history stays in the snapshot
    * checkpoints, exactly like the reference keeps it in its checkpoint
    * JSONs while the in-memory schema holds current versions. */
  def pruneBefore(scn: Long): Dictionary = {
    val pruned = tables.filter(_.validToScn > scn)
    if (pruned.length == tables.length) this
    else new Dictionary(pruned, selectors, xmlCtx, partitionOf, lobSegments)
  }

  def evolve(newVersion: DbTable, scn: Long): Dictionary = {
    val updated = tables.map { t =>
      if (t.obj == newVersion.obj && scn >= t.validFromScn && scn < t.validToScn)
        t.copy(validToScn = scn)
      else t
    }
    new Dictionary(updated :+ newVersion.copy(validFromScn = scn), selectors,
      xmlCtx, partitionOf, lobSegments)
  }

  /** Storage registration (partition + LOB maps) — the post-bootstrap
    * step the reference performs from its TABPART$/TABSUBPART$/
    * TABCOMPART$/LOB$/LOBCOMPPART$/LOBFRAG$ reads. */
  def withStorage(partitions: Map[Long, Long],
      lobs: Seq[LobSegment]): Dictionary = {
    // idempotent on replay: re-adding present pairs/segments is a no-op
    val newLobs = lobs.filterNot(lobSegments.contains)
    if (partitions.forall(p => partitionOf.get(p._1).contains(p._2)) &&
        newLobs.isEmpty) this
    else new Dictionary(tables, selectors, xmlCtx, partitionOf ++ partitions,
      lobSegments ++ newLobs)
  }

  /** Storage de-registration (partition/LOB segment DROP — the
    * SystemTransaction delete path for the storage catalogs). */
  def withoutPartitions(objs: Set[Long]): Dictionary =
    if (!objs.exists(partitionOf.contains)) this
    else new Dictionary(tables, selectors, xmlCtx, partitionOf -- objs,
      lobSegments)

  def withoutLobSegments(lobjs: Set[Long]): Dictionary =
    if (!lobSegments.exists(s => lobjs(s.lobj))) this
    else new Dictionary(tables, selectors, xmlCtx, partitionOf,
      lobSegments.filterNot(s => lobjs(s.lobj)))
}

object Dictionary {
  def apply(tables: Seq[DbTable], selectors: Seq[TableSelector] = Nil): Dictionary =
    new Dictionary(tables, selectors)

  /** S2 online bootstrap: build the dictionary from catalog-table
    * DataFrames — the shape the reference's ~40 flashback `AS OF SCN`
    * queries produce (ReplicatorOnline.h:34-560: SYS.OBJ$/USER$/COL$ +
    * CCOL$ constraint columns). Sources can be JDBC reads or parquet
    * snapshots; the dictionary is small by design (≪ driver memory), so
    * it collects — the same asymmetry that makes its join side
    * broadcastable.
    *
    * Expected schemas (column names, extra columns ignored):
    *   objs:  obj, data_obj, owner_id, name
    *   users: user_id, name
    *   cols:  obj, col_no, name, type_code, length, precision, scale,
    *          nullable (bool), hidden (bool)
    *   pkCols (optional): obj, name   — constraint key columns (CCOL$)
    */
  def fromCatalog(objs: DataFrame, users: DataFrame, cols: DataFrame,
      pkCols: Option[DataFrame] = None,
      selectors: Seq[TableSelector] = Nil,
      /** TABPART$ rows: obj, bo (partition obj → base table obj) */
      tabParts: Option[DataFrame] = None,
      /** TABCOMPART$ rows: obj, bo (composite partition → base table) */
      tabCompParts: Option[DataFrame] = None,
      /** TABSUBPART$ rows: obj, pobj (subpartition → parent comp-part) */
      tabSubParts: Option[DataFrame] = None,
      /** LOB$ rows: obj, intcol, lobj, ts (+ optional col_name) */
      lobs: Option[DataFrame] = None,
      /** LOBCOMPPART$ rows: partobj, lobj */
      lobCompParts: Option[DataFrame] = None,
      /** LOBFRAG$ rows: fragobj, parentobj */
      lobFrags: Option[DataFrame] = None): Dictionary = {
    import org.apache.spark.sql.functions.col
    val userNames = users.select(col("user_id").cast("long"), col("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pk: Map[Long, Set[String]] = pkCols match {
      case Some(df) => df.select(col("obj").cast("long"), col("name"))
        .collect().groupBy(_.getLong(0))
        .map { case (o, rs) => o -> rs.map(_.getString(1)).toSet }
      case None => Map.empty
    }
    // In the real SYS.COL$/OBJ$ shape, precision/scale are NULL for
    // non-NUMBER columns and data_obj is NULL for views / partitioned
    // objects — substitute the DbColumn defaults instead of NPE-ing.
    def longOr(r: org.apache.spark.sql.Row, i: Int, d: Long): Long =
      if (r.isNullAt(i)) d else r.getLong(i)
    def intOr(r: org.apache.spark.sql.Row, i: Int, d: Int): Int =
      if (r.isNullAt(i)) d else r.getInt(i)
    def boolOr(r: org.apache.spark.sql.Row, i: Int, d: Boolean): Boolean =
      if (r.isNullAt(i)) d else r.getBoolean(i)
    val colsByObj = cols.select(col("obj").cast("long"),
        col("col_no").cast("int"), col("name"), col("type_code").cast("int"),
        col("length").cast("int"), col("precision").cast("int"),
        col("scale").cast("int"), col("nullable").cast("boolean"),
        col("hidden").cast("boolean"))
      .collect().groupBy(_.getLong(0))
    val tables = objs.select(col("obj").cast("long"),
        col("data_obj").cast("long"), col("owner_id").cast("long"), col("name"))
      .collect().map { r =>
        val obj = r.getLong(0)
        val keys = pk.getOrElse(obj, Set.empty)
        val columns = colsByObj.getOrElse(obj, Array.empty).sortBy(_.getInt(1))
          .zipWithIndex.map { case (c, i) =>
            DbColumn(c.getString(2), intOr(c, 3, 0), intOr(c, 4, 0),
              intOr(c, 5, -1), intOr(c, 6, -1),
              numPk = if (keys.contains(c.getString(2))) i + 1 else 0,
              nullable = boolOr(c, 7, true), hidden = boolOr(c, 8, false))
          }.toSeq
        DbTable(obj, longOr(r, 1, 0L),
          userNames.getOrElse(r.getLong(2), s"USER_${r.getLong(2)}"),
          r.getString(3), columns,
          tagType = if (keys.nonEmpty) "pk" else "")
      }.toSeq
    // ---- storage maps (all dimension-sized: partition & LOB catalogs
    // are schema metadata, ≪ driver memory, same asymmetry as above) ----
    def lpairs(df: Option[DataFrame], a: String, b: String): Seq[(Long, Long)] =
      df.map(_.select(col(a).cast("long"), col(b).cast("long")).collect()
        .toSeq.map(r => (r.getLong(0), r.getLong(1)))).getOrElse(Nil)
    // LOB roots: lobj → owning (obj, intcol); column name resolved from
    // an explicit col_name column when present, else positionally via
    // the cols frame (intcol ≙ col_no for non-nested tables) — that
    // fallback re-reads cols ONLY when a name-less LOB frame needs it
    lazy val nameByObjCol: Map[(Long, Int), String] = cols
      .select(col("obj").cast("long"), col("col_no").cast("int"), col("name"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val lobRoots: Seq[LobSegment] = lobs.map { df =>
      val hasName = df.columns.map(_.toLowerCase).contains("col_name")
      val base = df.select(col("obj").cast("long"), col("intcol").cast("int"),
        col("lobj").cast("long"), col("ts").cast("long"),
        (if (hasName) col("col_name")
         else org.apache.spark.sql.functions.lit(null
           ).cast("string")).as("col_name"))
      base.collect().toSeq.map { r =>
        val o = r.getLong(0); val ic = r.getInt(1)
        LobSegment(r.getLong(2), o, ic,
          Option(r.getString(4))
            .orElse(nameByObjCol.get((o, ic))).getOrElse(""),
          if (r.isNullAt(3)) 0L else r.getLong(3))
      }
    }.getOrElse(Nil)
    val (partMap, lobSegs) = storageChains(
      lpairs(tabParts, "obj", "bo"), lpairs(tabCompParts, "obj", "bo"),
      lpairs(tabSubParts, "obj", "pobj"), lobRoots,
      lpairs(lobCompParts, "partobj", "lobj"),
      lpairs(lobFrags, "fragobj", "parentobj"))
    new Dictionary(tables, selectors, None, partMap, lobSegs)
  }

  /** Shared storage-chain assembly (bootstrap + OLR checkpoint import):
    * flatten partition links through composite parents and resolve LOB
    * aliases (comp-part segments take the root's owner; fragments chain
    * through root OR comp-part parents). All inputs are full catalog
    * snapshots, so the fold is order-insensitive. */
  private[cdc] def storageChains(
      tabParts: Seq[(Long, Long)], // (obj, bo)
      tabCompParts: Seq[(Long, Long)], // (obj, bo)
      tabSubParts: Seq[(Long, Long)], // (obj, pobj)
      lobRoots: Seq[LobSegment],
      lobCompParts: Seq[(Long, Long)], // (partObj, lobj)
      lobFrags: Seq[(Long, Long)] // (fragObj, parentObj)
  ): (Map[Long, Long], Seq[LobSegment]) = {
    val tcpMap = tabCompParts.toMap
    val tsp = tabSubParts.map { case (o, p) => (o, tcpMap.getOrElse(p, p)) }
    val partMap = (tabParts ++ tabCompParts ++ tsp).toMap
    val byLobj = lobRoots.map(s => s.lobj -> s).toMap
    val lcpSegs = lobCompParts
      .flatMap { case (po, lj) => byLobj.get(lj).map(_.copy(lobj = po)) }
    val parentMap = (lobRoots ++ lcpSegs).map(s => s.lobj -> s).toMap
    val fragSegs = lobFrags
      .flatMap { case (fo, po) => parentMap.get(po).map(_.copy(lobj = fo)) }
    (partMap, lobRoots ++ lcpSegs ++ fragSegs)
  }

  /** The reference's COMPLETE online-bootstrap catalog SQL, verbatim in
    * shape (ReplicatorOnline.h:193-591, the `_USER` flashback variants):
    * `AS OF SCN` placed directly after every SYS.%$ table reference,
    * per-owner filtering through the OBJ$ join, the name-regex gates on
    * USER$/OBJ$, and the MOD-2^64 decomposition that splits Oracle
    * NUMBER-typed 128-bit flag words (SPARE1, FLAGS, PROPERTY, FLAGS_STG)
    * into two unsigned-64 halves a client can hold.
    *
    * PROVENANCE: these strings are transcriptions of the reference's
    * catalog interface (the SQL an output-compatible bootstrap must issue
    * against a real Oracle), parametrized by scn/owner/name-regex — the
    * timezone_map.tsv rule: factual interface content, annotated. The
    * reference selects ROWID first in every query (its checkpoint-delta
    * bookkeeping); kept for exactness, readers may ignore the column.
    *
    * [[fromJdbc]] consumes the relational core (users/objs/cols/cdef/
    * ccol → tables, columns, keys). The partition/LOB/XDB entries are the
    * rest of the reference's bootstrap surface (TABPART/TABCOMPART/
    * TABSUBPART obj→partition resolution, LOB locator maps, ECOL guard
    * columns — pre-resolved upstream in our pre-decoded feed contract,
    * SURVEY §7.5; XDB$TTSET registers the XmlDecode token tables), pinned
    * here by OracleDialectSpec so a live-Oracle run is a config change,
    * not a code change. */
  def oracleCatalogSql(asOfScn: Long, ownerId: Long,
      nameRegex: String = ".*"): Map[String, String] = {
    // the reference passes the pattern as bind :j; inlining a literal
    // requires quote-doubling or a pattern like O'BRIEN.* breaks the
    // statement (ORA-00907) — or worse, splices into it
    val nameRegexLit = nameRegex.replace("'", "''")
    val m = "18446744073709551616"
    def mod2(col: String, a1: String, a2: String) =
      s"MOD($col, $m) AS $a1, MOD(TRUNC($col / $m), $m) AS $a2"
    val scn = asOfScn
    Map(
      // ReplicatorOnline.h:573 SQL_GET_SYS_USER
      "users" -> (s"SELECT U.ROWID, U.USER#, U.NAME," +
        s" ${mod2("U.SPARE1", "SPARE11", "SPARE12")}" +
        s" FROM SYS.USER$$ AS OF SCN $scn U" +
        s" WHERE REGEXP_LIKE(U.NAME, '$nameRegexLit')"),
      // ReplicatorOnline.h:447 SQL_GET_SYS_OBJ_USER
      "objs" -> (s"SELECT O.ROWID, O.OWNER#, O.OBJ#, O.DATAOBJ#, O.NAME," +
        s" O.TYPE#, ${mod2("O.FLAGS", "FLAGS1", "FLAGS2")}" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:458 SQL_GET_SYS_OBJ_NAME (regex-gated variant)
      "obj_name" -> (s"SELECT O.ROWID, O.OWNER#, O.OBJ#, O.DATAOBJ#," +
        s" O.NAME, O.TYPE#, ${mod2("O.FLAGS", "FLAGS1", "FLAGS2")}" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" WHERE O.OWNER# = $ownerId AND REGEXP_LIKE(O.NAME, '$nameRegexLit')"),
      // ReplicatorOnline.h:241 SQL_GET_SYS_COL_USER
      "cols" -> (s"SELECT C.ROWID, C.OBJ#, C.COL#, C.SEGCOL#, C.INTCOL#," +
        s" C.NAME, C.TYPE#, C.LENGTH, C.PRECISION#, C.SCALE," +
        s" C.CHARSETFORM, C.CHARSETID, C.NULL$$," +
        s" ${mod2("C.PROPERTY", "PROPERTY1", "PROPERTY2")}" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.COL$$ AS OF SCN $scn C ON O.OBJ# = C.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:218 SQL_GET_SYS_CDEF_USER
      "cdef" -> (s"SELECT D.ROWID, D.CON#, D.OBJ#, D.TYPE#" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.CDEF$$ AS OF SCN $scn D ON O.OBJ# = D.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:193 SQL_GET_SYS_CCOL_USER
      "ccol" -> (s"SELECT L.ROWID, L.CON#, L.INTCOL#, L.OBJ#," +
        s" ${mod2("L.SPARE1", "SPARE11", "SPARE12")}" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.CCOL$$ AS OF SCN $scn L ON O.OBJ# = L.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:469 SQL_GET_SYS_TAB_USER
      "tabs" -> (s"SELECT T.ROWID, T.OBJ#, T.DATAOBJ#, T.TS#, T.CLUCOLS," +
        s" ${mod2("T.FLAGS", "FLAGS1", "FLAGS2")}," +
        s" ${mod2("T.PROPERTY", "PROPERTY1", "PROPERTY2")}" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.TAB$$ AS OF SCN $scn T ON O.OBJ# = T.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:266 SQL_GET_SYS_DEFERRED_STG_USER
      "deferred_stg" -> (s"SELECT DS.ROWID, DS.OBJ#," +
        s" ${mod2("DS.FLAGS_STG", "FLAGS_STG1", "FLAGS_STG2")}" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.DEFERRED_STG$$ AS OF SCN $scn DS ON O.OBJ# = DS.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:291 SQL_GET_SYS_ECOL_USER (12c+ guard columns)
      "ecol" -> (s"SELECT E.ROWID, E.TABOBJ#, E.COLNUM, E.GUARD_ID" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.ECOL$$ AS OF SCN $scn E ON O.OBJ# = E.TABOBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:314 SQL_GET_SYS_ECOL11_USER (11g: no GUARD_ID)
      "ecol11" -> (s"SELECT E.ROWID, E.TABOBJ#, E.COLNUM, -1 AS GUARD_ID" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.ECOL$$ AS OF SCN $scn E ON O.OBJ# = E.TABOBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:337 SQL_GET_SYS_LOB_USER
      "lobs" -> (s"SELECT L.ROWID, L.OBJ#, L.COL#, L.INTCOL#, L.LOBJ#," +
        s" L.TS# FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.LOB$$ AS OF SCN $scn L ON O.OBJ# = L.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:360 SQL_GET_SYS_LOB_COMP_PART_USER
      "lob_comp_part" -> (s"SELECT LCP.ROWID, LCP.PARTOBJ#, LCP.LOBJ#" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.LOB$$ AS OF SCN $scn L ON O.OBJ# = L.OBJ#" +
        s" JOIN SYS.LOBCOMPPART$$ AS OF SCN $scn LCP ON LCP.LOBJ# = L.LOBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:389 SQL_GET_SYS_LOB_FRAG_USER (part + non-part
      // locator fragments, UNION ALL exactly as the reference)
      "lob_frag" -> (s"SELECT LF.ROWID, LF.FRAGOBJ#, LF.PARENTOBJ#, LF.TS#" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.LOB$$ AS OF SCN $scn L ON O.OBJ# = L.OBJ#" +
        s" JOIN SYS.LOBCOMPPART$$ AS OF SCN $scn LCP ON LCP.LOBJ# = L.LOBJ#" +
        s" JOIN SYS.LOBFRAG$$ AS OF SCN $scn LF ON LCP.PARTOBJ# = LF.PARENTOBJ#" +
        s" WHERE O.OWNER# = $ownerId" +
        s" UNION ALL" +
        s" SELECT LF.ROWID, LF.FRAGOBJ#, LF.PARENTOBJ#, LF.TS#" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.LOB$$ AS OF SCN $scn L ON O.OBJ# = L.OBJ#" +
        s" JOIN SYS.LOBFRAG$$ AS OF SCN $scn LF ON L.LOBJ# = LF.PARENTOBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:496 SQL_GET_SYS_TABCOMPART_USER
      "tabcompart" -> (s"SELECT TCP.ROWID, TCP.OBJ#, TCP.DATAOBJ#, TCP.BO#" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.TABCOMPART$$ AS OF SCN $scn TCP ON O.OBJ# = TCP.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:519 SQL_GET_SYS_TABPART_USER
      "tabpart" -> (s"SELECT TP.ROWID, TP.OBJ#, TP.DATAOBJ#, TP.BO#" +
        s" FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.TABPART$$ AS OF SCN $scn TP ON O.OBJ# = TP.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:542 SQL_GET_SYS_TABSUBPART_USER
      "tabsubpart" -> (s"SELECT TSP.ROWID, TSP.OBJ#, TSP.DATAOBJ#," +
        s" TSP.POBJ# FROM SYS.OBJ$$ AS OF SCN $scn O" +
        s" JOIN SYS.TABSUBPART$$ AS OF SCN $scn TSP ON O.OBJ# = TSP.OBJ#" +
        s" WHERE O.OWNER# = $ownerId"),
      // ReplicatorOnline.h:565 SQL_GET_SYS_TS
      "ts" -> (s"SELECT T.ROWID, T.TS#, T.NAME, T.BLOCKSIZE" +
        s" FROM SYS.TS$$ AS OF SCN $scn T"),
      // ReplicatorOnline.h:584 SQL_GET_XDB_TTSET (XmlDecode token tables)
      "xdb_ttset" -> (s"SELECT T.ROWID, T.GUID, T.TOKSUF, T.FLAGS, T.OBJ#" +
        s" FROM XDB.XDB$$TTSET AS OF SCN $scn T"))
  }

  /** The `_OBJ` delta variants of the bootstrap catalog SQL
    * (ReplicatorOnline.h:207-565): after the initial per-owner sweep, a
    * mid-stream DDL refreshes ONE object's rows — the same SELECT lists,
    * gated on the object id instead of the OBJ$ owner join
    * (readSystemDictionariesDetails, ReplicatorOnline.cpp). Same
    * provenance rule as [[oracleCatalogSql]]: transcriptions of the
    * reference's catalog interface, parametrized. Note the reference's
    * own key choices: ECOL$ gates on TABOBJ#, TABSUBPART$ on POBJ# (the
    * parent partition), everything else on the table's OBJ#. */
  def oracleCatalogSqlObj(asOfScn: Long, obj: Long): Map[String, String] = {
    val m = "18446744073709551616"
    def mod2(col: String, a1: String, a2: String) =
      s"MOD($col, $m) AS $a1, MOD(TRUNC($col / $m), $m) AS $a2"
    val scn = asOfScn
    Map(
      // ReplicatorOnline.h:207 SQL_GET_SYS_CCOL_OBJ
      "ccol_obj" -> (s"SELECT L.ROWID, L.CON#, L.INTCOL#, L.OBJ#," +
        s" ${mod2("L.SPARE1", "SPARE11", "SPARE12")}" +
        s" FROM SYS.CCOL$$ AS OF SCN $scn L WHERE L.OBJ# = $obj"),
      // ReplicatorOnline.h:231 SQL_GET_SYS_CDEF_OBJ
      "cdef_obj" -> (s"SELECT D.ROWID, D.CON#, D.OBJ#, D.TYPE#" +
        s" FROM SYS.CDEF$$ AS OF SCN $scn D WHERE D.OBJ# = $obj"),
      // ReplicatorOnline.h:255 SQL_GET_SYS_COL_OBJ
      "cols_obj" -> (s"SELECT C.ROWID, C.OBJ#, C.COL#, C.SEGCOL#," +
        s" C.INTCOL#, C.NAME, C.TYPE#, C.LENGTH, C.PRECISION#, C.SCALE," +
        s" C.CHARSETFORM, C.CHARSETID, C.NULL$$," +
        s" ${mod2("C.PROPERTY", "PROPERTY1", "PROPERTY2")}" +
        s" FROM SYS.COL$$ AS OF SCN $scn C WHERE C.OBJ# = $obj"),
      // ReplicatorOnline.h:280 SQL_GET_SYS_DEFERRED_STG_OBJ
      "deferred_stg_obj" -> (s"SELECT DS.ROWID, DS.OBJ#," +
        s" ${mod2("DS.FLAGS_STG", "FLAGS_STG1", "FLAGS_STG2")}" +
        s" FROM SYS.DEFERRED_STG$$ AS OF SCN $scn DS WHERE DS.OBJ# = $obj"),
      // ReplicatorOnline.h:304 SQL_GET_SYS_ECOL_OBJ
      "ecol_obj" -> (s"SELECT E.ROWID, E.TABOBJ#, E.COLNUM, E.GUARD_ID" +
        s" FROM SYS.ECOL$$ AS OF SCN $scn E WHERE E.TABOBJ# = $obj"),
      // ReplicatorOnline.h:327 SQL_GET_SYS_ECOL11_OBJ
      "ecol11_obj" -> (s"SELECT E.ROWID, E.TABOBJ#, E.COLNUM, -1 AS GUARD_ID" +
        s" FROM SYS.ECOL$$ AS OF SCN $scn E WHERE E.TABOBJ# = $obj"),
      // ReplicatorOnline.h:350 SQL_GET_SYS_LOB_OBJ
      "lobs_obj" -> (s"SELECT L.ROWID, L.OBJ#, L.COL#, L.INTCOL#, L.LOBJ#," +
        s" L.TS# FROM SYS.LOB$$ AS OF SCN $scn L WHERE L.OBJ# = $obj"),
      // ReplicatorOnline.h:376 SQL_GET_SYS_LOB_COMP_PART_OBJ
      "lob_comp_part_obj" -> (s"SELECT LCP.ROWID, LCP.PARTOBJ#, LCP.LOBJ#" +
        s" FROM SYS.LOB$$ AS OF SCN $scn L" +
        s" JOIN SYS.LOBCOMPPART$$ AS OF SCN $scn LCP ON LCP.LOBJ# = L.LOBJ#" +
        s" WHERE L.OBJ# = $obj"),
      // ReplicatorOnline.h:421 SQL_GET_SYS_LOB_FRAG_OBJ
      "lob_frag_obj" -> (s"SELECT LF.ROWID, LF.FRAGOBJ#, LF.PARENTOBJ#," +
        s" LF.TS# FROM SYS.LOB$$ AS OF SCN $scn L" +
        s" JOIN SYS.LOBCOMPPART$$ AS OF SCN $scn LCP ON LCP.LOBJ# = L.LOBJ#" +
        s" JOIN SYS.LOBFRAG$$ AS OF SCN $scn LF ON LCP.PARTOBJ# = LF.PARENTOBJ#" +
        s" WHERE L.OBJ# = $obj" +
        s" UNION ALL" +
        s" SELECT LF.ROWID, LF.FRAGOBJ#, LF.PARENTOBJ#, LF.TS#" +
        s" FROM SYS.LOB$$ AS OF SCN $scn L" +
        s" JOIN SYS.LOBFRAG$$ AS OF SCN $scn LF ON L.LOBJ# = LF.PARENTOBJ#" +
        s" WHERE L.OBJ# = $obj"),
      // ReplicatorOnline.h:484 SQL_GET_SYS_TAB_OBJ
      "tabs_obj" -> (s"SELECT T.ROWID, T.OBJ#, T.DATAOBJ#, T.TS#, T.CLUCOLS," +
        s" ${mod2("T.FLAGS", "FLAGS1", "FLAGS2")}," +
        s" ${mod2("T.PROPERTY", "PROPERTY1", "PROPERTY2")}" +
        s" FROM SYS.TAB$$ AS OF SCN $scn T WHERE T.OBJ# = $obj"),
      // ReplicatorOnline.h:509 SQL_GET_SYS_TABCOMPART_OBJ
      "tabcompart_obj" -> (s"SELECT TCP.ROWID, TCP.OBJ#, TCP.DATAOBJ#," +
        s" TCP.BO# FROM SYS.TABCOMPART$$ AS OF SCN $scn TCP" +
        s" WHERE TCP.OBJ# = $obj"),
      // ReplicatorOnline.h:532 SQL_GET_SYS_TABPART_OBJ
      "tabpart_obj" -> (s"SELECT TP.ROWID, TP.OBJ#, TP.DATAOBJ#, TP.BO#" +
        s" FROM SYS.TABPART$$ AS OF SCN $scn TP WHERE TP.OBJ# = $obj"),
      // ReplicatorOnline.h:555 SQL_GET_SYS_TABSUBPART_OBJ (parent gate)
      "tabsubpart_obj" -> (s"SELECT TSP.ROWID, TSP.OBJ#, TSP.DATAOBJ#," +
        s" TSP.POBJ# FROM SYS.TABSUBPART$$ AS OF SCN $scn TSP" +
        s" WHERE TSP.POBJ# = $obj"))
  }

  /** The database/instance metadata SQL the reference issues around the
    * catalog sweep (ReplicatorOnline.h:34-183, 592): archive-log
    * discovery, supplemental-logging + endianness checks, incarnation
    * chain, SCN/sequence positioning, parameter/property probes and the
    * connection liveness ping. Bind markers (:i, :j) are kept exactly as
    * the reference declares them — callers bind, not splice. (The
    * SCN_FROM_TIME text reproduces the reference verbatim, including its
    * unbalanced TO_DATE paren — this skeleton map pins the interface the
    * reference ships, not a repaired one.) */
  val oracleDatabaseSql: Map[String, String] = Map(
    // ReplicatorOnline.h:34 SQL_GET_ARCHIVE_LOG_LIST
    "archive_log_list" -> ("SELECT NAME, SEQUENCE#, FIRST_CHANGE#," +
      " NEXT_CHANGE# FROM SYS.V_$ARCHIVED_LOG WHERE SEQUENCE# >= :i" +
      " AND RESETLOGS_ID = :j AND NAME IS NOT NULL" +
      " ORDER BY SEQUENCE#, DEST_ID, IS_RECOVERY_DEST_FILE DESC"),
    // ReplicatorOnline.h:53 SQL_GET_DATABASE_INFORMATION
    "database_information" -> ("SELECT" +
      " DECODE(D.LOG_MODE, 'ARCHIVELOG', 1, 0)," +
      " DECODE(D.SUPPLEMENTAL_LOG_DATA_MIN, 'NO', 0, 1)," +
      " DECODE(D.SUPPLEMENTAL_LOG_DATA_PK, 'YES', 1, 0)," +
      " DECODE(D.SUPPLEMENTAL_LOG_DATA_ALL, 'YES', 1, 0)," +
      " DECODE(TP.ENDIAN_FORMAT, 'Big', 1, 0), VER.BANNER," +
      " SYS_CONTEXT('USERENV','DB_NAME'), CURRENT_SCN, DBTIMEZONE" +
      " FROM SYS.V_$DATABASE D" +
      " JOIN SYS.V_$TRANSPORTABLE_PLATFORM TP ON" +
      " TP.PLATFORM_NAME = D.PLATFORM_NAME" +
      " JOIN SYS.V_$VERSION VER ON VER.BANNER LIKE '%Oracle%Database%'"),
    // ReplicatorOnline.h:75 SQL_GET_DATABASE_INCARNATION
    "database_incarnation" -> ("SELECT INCARNATION#, RESETLOGS_CHANGE#," +
      " PRIOR_RESETLOGS_CHANGE#, STATUS, RESETLOGS_ID, PRIOR_INCARNATION#" +
      " FROM SYS.V_$DATABASE_INCARNATION"),
    // ReplicatorOnline.h:88 SQL_GET_DATABASE_ROLE
    "database_role" -> "SELECT DATABASE_ROLE FROM SYS.V_$DATABASE",
    // ReplicatorOnline.h:96 SQL_GET_DATABASE_SCN
    "database_scn" -> "SELECT D.CURRENT_SCN FROM SYS.V_$DATABASE D",
    // ReplicatorOnline.h:104 SQL_GET_CON_INFO
    "con_info" -> ("SELECT SYS_CONTEXT('USERENV','CON_ID')," +
      " SYS_CONTEXT('USERENV','CON_NAME')," +
      " NVL(SYS_CONTEXT('USERENV','CDB_NAME')," +
      " SYS_CONTEXT('USERENV','DB_NAME')) FROM DUAL"),
    // ReplicatorOnline.h:114 SQL_GET_SCN_FROM_TIME (verbatim, see note)
    "scn_from_time" ->
      "SELECT TIMESTAMP_TO_SCN(TO_DATE('YYYY-MM-DD HH24:MI:SS', :i) FROM DUAL",
    // ReplicatorOnline.h:117 SQL_GET_SCN_FROM_TIME_RELATIVE
    "scn_from_time_relative" ->
      "SELECT TIMESTAMP_TO_SCN(SYSDATE - (:i/24/3600)) FROM DUAL",
    // ReplicatorOnline.h:120 SQL_GET_SEQUENCE_FROM_SCN
    "sequence_from_scn" -> ("SELECT MAX(SEQUENCE#) FROM (" +
      " SELECT SEQUENCE# FROM SYS.V_$LOG WHERE FIRST_CHANGE# - 1 <= :i" +
      " UNION SELECT SEQUENCE# FROM SYS.V_$ARCHIVED_LOG" +
      " WHERE FIRST_CHANGE# - 1 <= :i AND RESETLOGS_ID = :j)"),
    // ReplicatorOnline.h:139 SQL_GET_SEQUENCE_FROM_SCN_STANDBY
    "sequence_from_scn_standby" -> ("SELECT MAX(SEQUENCE#) FROM (" +
      " SELECT SEQUENCE# FROM SYS.V_$STANDBY_LOG" +
      " WHERE FIRST_CHANGE# - 1 <= :i" +
      " UNION SELECT SEQUENCE# FROM SYS.V_$ARCHIVED_LOG" +
      " WHERE FIRST_CHANGE# - 1 <= :i AND RESETLOGS_ID = :j)"),
    // ReplicatorOnline.h:158 SQL_GET_LOGFILE_LIST
    "logfile_list" -> ("SELECT LF.GROUP#, LF.MEMBER FROM SYS.V_$LOGFILE LF" +
      " WHERE TYPE = :i ORDER BY LF.GROUP# ASC," +
      " LF.IS_RECOVERY_DEST_FILE DESC, LF.MEMBER ASC"),
    // ReplicatorOnline.h:173 SQL_GET_PARAMETER
    "parameter" -> "SELECT VALUE FROM SYS.V_$PARAMETER WHERE NAME = :i",
    // ReplicatorOnline.h:183 SQL_GET_PROPERTY
    "property" -> ("SELECT PROPERTY_VALUE FROM DATABASE_PROPERTIES" +
      " WHERE PROPERTY_NAME = :i"),
    // ReplicatorOnline.h:592 SQL_CHECK_CONNECTION
    "check_connection" -> "SELECT 1 FROM DUAL")

  /** The per-token-set XDB reads (built inline in ReplicatorOnline.cpp
    * readSystemDictionariesMetadata — the X$NM/X$PT/X$QN table names are
    * synthesized from each XDB$TTSET row's TOKSUF). One map per tokSuf,
    * flashback-pinned like the catalog sweep; the results load
    * [[XmlCtx]] (xdbXNm/xdbXPt/xdbXQn packs). */
  def oracleXdbSql(asOfScn: Long, tokSuf: String): Map[String, String] = Map(
    "xdb_xnm" -> (s"SELECT T.ROWID, T.NMSPCURI, T.ID" +
      s" FROM XDB.X$$NM$tokSuf AS OF SCN $asOfScn T"),
    "xdb_xpt" -> (s"SELECT T.ROWID, T.PATH, T.ID" +
      s" FROM XDB.X$$PT$tokSuf AS OF SCN $asOfScn T"),
    "xdb_xqn" -> (s"SELECT T.ROWID, T.NMSPCID, T.LOCALNAME, T.FLAGS, T.ID" +
      s" FROM XDB.X$$QN$tokSuf AS OF SCN $asOfScn T"))

  /** S2 online bootstrap over a live connection: issue the reference's
    * ~flashback catalog queries via `spark.read.jdbc` and feed
    * [[fromCatalog]]. Two dialects share one assembly:
    *
    *  - `oracleDialect = true` (production): unquoted SYS.%$ names,
    *    `AS OF SCN` when `asOfScn` is set, and the MOD-2^64 PROPERTY
    *    decomposition — the [[oracleCatalogSql]] shapes.
    *  - `oracleDialect = false` (any ANSI JDBC source, e.g. the Derby
    *    spec): quoted identifiers, no flashback clause, PROPERTY1/2 read
    *    as plain columns.
    *
    * Decoding follows the reference: tables are OBJ$ TYPE# = 2 rows;
    * nullable is NULL$ = 0; hidden is COL$ PROPERTY bit 5
    * (SysCol.h:38); the PK designation walks CDEF$ TYPE# = 2 (PK
    * constraints, SysCDef.h:32) through CCOL$ INTCOL# back to the column
    * names. All five reads are dimension-sized (single-partition JDBC
    * scans) — the same asymmetry that lets the dictionary broadcast. */
  def fromJdbc(spark: SparkSession, url: String,
      props: java.util.Properties, asOfScn: Option[Long] = None,
      catalogSchema: String = "SYS", oracleDialect: Boolean = true,
      selectors: Seq[TableSelector] = Nil): Dictionary = {
    import org.apache.spark.sql.functions.col
    def q(id: String) = if (oracleDialect) id else "\"" + id + "\""
    def tbl(name: String) =
      (if (oracleDialect) s"$catalogSchema.$name"
       else s"$catalogSchema.${q(name)}") +
        asOfScn.filter(_ => oracleDialect).map(s => s" AS OF SCN $s")
          .getOrElse("")
    def read(sql: String) = spark.read.jdbc(url, s"($sql) CAT", props)
    val users = read(s"SELECT U.${q("USER#")} AS USER_ID, U.NAME" +
        s" FROM ${tbl("USER$")} U")
      .select(col("USER_ID").as("user_id"), col("NAME").as("name"))
    val objs = read(s"SELECT O.${q("OWNER#")} AS OWNER_ID," +
        s" O.${q("OBJ#")} AS OBJ, O.${q("DATAOBJ#")} AS DATA_OBJ, O.NAME" +
        s" FROM ${tbl("OBJ$")} O WHERE O.${q("TYPE#")} = 2")
      .select(col("OBJ").as("obj"), col("DATA_OBJ").as("data_obj"),
        col("OWNER_ID").as("owner_id"), col("NAME").as("name"))
    val propertySel =
      if (oracleDialect)
        "MOD(C.PROPERTY, 18446744073709551616) AS PROPERTY1"
      else s"C.PROPERTY1"
    val colsRaw = read(s"SELECT C.${q("OBJ#")} AS OBJ," +
        s" C.${q("COL#")} AS COL_NO, C.${q("INTCOL#")} AS INTCOL," +
        s" C.NAME, C.${q("TYPE#")} AS TYPE_CODE, C.LENGTH," +
        s" C.${q("PRECISION#")} AS PREC, C.SCALE," +
        s" C.${q("NULL$")} AS NULLS, $propertySel" +
        s" FROM ${tbl("COL$")} C")
    val cols = colsRaw.select(col("OBJ").as("obj"),
      col("COL_NO").as("col_no"), col("NAME").as("name"),
      col("TYPE_CODE").as("type_code"), col("LENGTH").as("length"),
      col("PREC").as("precision"), col("SCALE").as("scale"),
      (col("NULLS").cast("long") === 0L).as("nullable"),
      (col("PROPERTY1").cast("long").bitwiseAND(1L << 5) =!= 0L)
        .as("hidden"))
    val cdef = read(s"SELECT D.${q("CON#")} AS CON, D.${q("OBJ#")} AS OBJ" +
      s" FROM ${tbl("CDEF$")} D WHERE D.${q("TYPE#")} = 2")
    val ccol = read(s"SELECT L.${q("CON#")} AS CON," +
      s" L.${q("INTCOL#")} AS INTCOL, L.${q("OBJ#")} AS OBJ" +
      s" FROM ${tbl("CCOL$")} L")
    val pkCols = ccol.join(cdef, Seq("CON", "OBJ"))
      .join(colsRaw.select(col("OBJ"), col("INTCOL"), col("NAME")),
        Seq("OBJ", "INTCOL"))
      .select(col("OBJ").as("obj"), col("NAME").as("name"))
    // storage catalog (partitions + LOB segments) — the rest of the
    // reference's bootstrap sweep; all dimension-sized reads
    val tabParts = read(s"SELECT TP.${q("OBJ#")} AS OBJ," +
        s" TP.${q("BO#")} AS BO FROM ${tbl("TABPART$")} TP")
      .select(col("OBJ").as("obj"), col("BO").as("bo"))
    val tabCompParts = read(s"SELECT TCP.${q("OBJ#")} AS OBJ," +
        s" TCP.${q("BO#")} AS BO FROM ${tbl("TABCOMPART$")} TCP")
      .select(col("OBJ").as("obj"), col("BO").as("bo"))
    val tabSubParts = read(s"SELECT TSP.${q("OBJ#")} AS OBJ," +
        s" TSP.${q("POBJ#")} AS POBJ FROM ${tbl("TABSUBPART$")} TSP")
      .select(col("OBJ").as("obj"), col("POBJ").as("pobj"))
    // LOB column names resolve through COL$ INTCOL# (SysLob → SysCol),
    // not positionally — nested/hidden columns shift col# vs intcol#
    val lobSegs = read(s"SELECT L.${q("OBJ#")} AS OBJ," +
        s" L.${q("INTCOL#")} AS INTCOL, L.${q("LOBJ#")} AS LOBJ," +
        s" L.${q("TS#")} AS TS FROM ${tbl("LOB$")} L")
      .join(colsRaw.select(col("OBJ"), col("INTCOL"), col("NAME")),
        Seq("OBJ", "INTCOL"), "left")
      .select(col("OBJ").as("obj"), col("INTCOL").as("intcol"),
        col("LOBJ").as("lobj"), col("TS").as("ts"),
        col("NAME").as("col_name"))
    val lobCompParts = read(s"SELECT LCP.${q("PARTOBJ#")} AS PARTOBJ," +
        s" LCP.${q("LOBJ#")} AS LOBJ FROM ${tbl("LOBCOMPPART$")} LCP")
      .select(col("PARTOBJ").as("partobj"), col("LOBJ").as("lobj"))
    val lobFrags = read(s"SELECT LF.${q("FRAGOBJ#")} AS FRAGOBJ," +
        s" LF.${q("PARENTOBJ#")} AS PARENTOBJ FROM ${tbl("LOBFRAG$")} LF")
      .select(col("FRAGOBJ").as("fragobj"), col("PARENTOBJ").as("parentobj"))
    fromCatalog(objs, users, cols, Some(pkCols), selectors,
      Some(tabParts), Some(tabCompParts), Some(tabSubParts),
      Some(lobSegs), Some(lobCompParts), Some(lobFrags))
  }

  /** Checkpoint-schema JSON (de)serialization, shape-compatible with what
    * our pipeline persists between runs (FIXTURES.md §B). */
  def toJson(dict: Dictionary): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val ts = dict.tables.map { t =>
      val cols = t.columns.map { c =>
        s"""{"name":"${esc(c.name)}","type":${c.typeCode},"length":${c.length},""" +
          s""""precision":${c.precision},"scale":${c.scale},"numPk":${c.numPk},""" +
          s""""nullable":${c.nullable},"hidden":${c.hidden},"guard":${c.guard},""" +
          s""""nested":${c.nested},"unused":${c.unused},""" +
          // restart-correctness: without these three a checkpointed
          // schema silently loses guard bitmaps, XMLTYPE routing, and
          // per-column charset decode after recovery
          s""""guardSeg":${c.guardSeg},"xmlType":${c.xmlType},""" +
          s""""charsetId":${c.charsetId}}"""
      }.mkString("[", ",", "]")
      s"""{"obj":${t.obj},"dataObj":${t.dataObj},"owner":"${esc(t.owner)}",""" +
        s""""name":"${esc(t.name)}","columns":$cols,""" +
        s""""keyList":${t.keyList.map(k => "\"" + esc(k) + "\"").mkString("[", ",", "]")},""" +
        s""""tagType":"${esc(t.tagType)}","tagCols":${t.tagCols.map(k => "\"" + esc(k) + "\"").mkString("[", ",", "]")},""" +
        s""""condition":"${esc(t.conditionExpr)}","options":${t.options.map(o => "\"" + esc(o) + "\"").mkString("[", ",", "]")},""" +
        s""""validFromScn":${t.validFromScn},"validToScn":${t.validToScn}}"""
    }.mkString("[", ",", "]")
    val sels = dict.selectors.map(s =>
        s"""{"owner":"${esc(s.ownerPattern)}","table":"${esc(s.namePattern)}"}""")
      .mkString("[", ",", "]")
    // XDB token tables, present only when the schema carries them — the
    // SerializerJson xdb* checkpoint sections (§1.3 XMLTYPE decode)
    val xml = dict.xmlCtx.map { c =>
      val tt = c.ttSet.map(t =>
        s"""{"guid":"${esc(t.guid)}","tokSuf":"${esc(t.tokSuf)}",""" +
          s""""flags":${t.flags},"obj":${t.obj}}""").mkString("[", ",", "]")
      val nm = c.xnm.map(n =>
        s"""{"id":"${esc(n.id)}","nmSpcUri":"${esc(n.nmSpcUri)}"}""")
        .mkString("[", ",", "]")
      val qn = c.xqn.map(q =>
        s"""{"id":"${esc(q.id)}","localName":"${esc(q.localName)}",""" +
          s""""nmSpcId":"${esc(q.nmSpcId)}","flags":"${esc(q.flags)}"}""")
        .mkString("[", ",", "]")
      s""","xdbTtSet":$tt,"xdbXNm":$nm,"xdbXQn":$qn"""
    }.getOrElse("")
    // storage maps, present only when registered (partitioned / LOB
    // schemas) — the SerializerJson sysTabPart/sysLob checkpoint sections
    val storage = {
      val parts =
        if (dict.partitionOf.isEmpty) ""
        else dict.partitionOf.toSeq.sorted.map { case (p, b) =>
          s"""{"obj":$p,"bo":$b}""" }
          .mkString(""","partitions":[""", ",", "]")
      val lobs =
        if (dict.lobSegments.isEmpty) ""
        else dict.lobSegments.map(l =>
          s"""{"lobj":${l.lobj},"obj":${l.obj},"intCol":${l.intCol},""" +
            s""""col":"${esc(l.colName)}","ts":${l.ts}}""")
          .mkString(""","lobs":[""", ",", "]")
      parts + lobs
    }
    s"""{"tables":$ts,"selectors":$sels$xml$storage}"""
  }

  /** Inverse of [[toJson]] — restart path: checkpoint schema JSON → live
    * dictionary (≙ SerializerJson deserialize, the reference's only way to
    * run without a DB connection). */
  def fromJson(json: String): Dictionary = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
      n.elements().asScala.map(_.asText).toSeq
    val tables = root.get("tables").elements().asScala.map { t =>
      val cols = t.get("columns").elements().asScala.map { c =>
        DbColumn(c.get("name").asText, c.get("type").asInt,
          c.get("length").asInt, c.get("precision").asInt,
          c.get("scale").asInt, c.get("numPk").asInt,
          c.get("nullable").asBoolean, c.get("hidden").asBoolean,
          c.get("guard").asBoolean, c.get("nested").asBoolean,
          c.get("unused").asBoolean,
          // absent in pre-r10 checkpoints → the constructor defaults
          guardSeg = Option(c.get("guardSeg")).map(_.asInt).getOrElse(-1),
          xmlType = Option(c.get("xmlType")).exists(_.asBoolean),
          charsetId = Option(c.get("charsetId")).map(_.asInt).getOrElse(0))
      }.toSeq
      DbTable(t.get("obj").asLong, t.get("dataObj").asLong,
        t.get("owner").asText, t.get("name").asText, cols,
        strs(t.get("keyList")), t.get("tagType").asText,
        strs(t.get("tagCols")), t.get("condition").asText,
        strs(t.get("options")).toSet,
        t.get("validFromScn").asLong, t.get("validToScn").asLong)
    }.toSeq
    val sels = root.get("selectors").elements().asScala.map(s =>
      TableSelector(s.get("owner").asText, s.get("table").asText)).toSeq
    val xmlCtx =
      if (root.has("xdbXQn") || root.has("xdbXNm") || root.has("xdbTtSet")) {
        def arr(name: String) = Option(root.get(name))
          .map(_.elements().asScala.toSeq).getOrElse(Nil)
        Some(XmlCtx(
          arr("xdbTtSet").map(t => XdbTtSet(t.get("guid").asText,
            t.get("tokSuf").asText, t.get("flags").asLong, t.get("obj").asLong)),
          arr("xdbXNm").map(n => XdbXNm(n.get("id").asText,
            n.get("nmSpcUri").asText)),
          arr("xdbXQn").map(q => XdbXQn(q.get("id").asText,
            q.get("localName").asText, q.get("nmSpcId").asText,
            q.get("flags").asText))))
      } else None
    // absent in pre-r11 checkpoints → empty defaults
    val parts = Option(root.get("partitions"))
      .map(_.elements().asScala.map(p =>
        p.get("obj").asLong -> p.get("bo").asLong).toMap)
      .getOrElse(Map.empty[Long, Long])
    val lobs = Option(root.get("lobs"))
      .map(_.elements().asScala.map(l =>
        LobSegment(l.get("lobj").asLong, l.get("obj").asLong,
          l.get("intCol").asInt, l.get("col").asText,
          l.get("ts").asLong)).toSeq)
      .getOrElse(Nil)
    new Dictionary(tables, sels, xmlCtx, parts, lobs)
  }
}
