package graft.cdc

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** §1.2 streaming schema-evolution control path: DDL observed as
  * system-table DML INSIDE the replicated stream, applied to the
  * in-memory dictionary at the system transaction's commit — the
  * SystemTransaction semantics
  * (/root/reference/src/builder/SystemTransaction.cpp:427 processInsert,
  * :525 processUpdate, :640 processDelete, :729 commit).
  *
  * Spark-first mapping (SURVEY §1.2): the system rows ride the SAME
  * stream as user DML through TxnAssembly (so only COMMITTED system
  * transactions take effect, like processCommit), and the per-micro-batch
  * `foreachBatch` seam is where they fold into the driver-held
  * [[Dictionary]]. Each change CLOSES the previous table version at its
  * scn ([[Dictionary.evolve]]), so Materialize.enrich's as-of broadcast
  * join keeps resolving in-flight lower-scn events against the old
  * version — per-event-scn correctness, not per-batch.
  *
  * System transactions are schema-sized by design (a DDL touches a
  * handful of catalog rows), so collecting them driver-side is the same
  * bounded asymmetry that makes the dictionary broadcastable.
  */
object SchemaEvolution {

  /** Oracle's fixed object numbers for the catalog tables whose DML the
    * reference intercepts (SystemTransaction.cpp dispatches on table
    * name; OBJ$/COL$ are objects 18/21 in every Oracle database). */
  val ObjTab = 18L
  val ColTab = 21L
  /** Storage-catalog ids (r11): the reference intercepts
    * TABPART$/TABCOMPART$/TABSUBPART$ and the LOB$ family too
    * (SystemTransaction.cpp:484,592,695 dispatch) — it resolves them by
    * NAME from the bootstrapped schema; our pre-decoded feed addresses
    * catalog tables by fixed ids like OBJ$/COL$, so these numbers are
    * feed-contract constants (documented, not Oracle-universal). */
  val TabPartTab = 582L
  val TabCompPartTab = 583L
  val TabSubPartTab = 584L
  val LobTab = 585L
  val LobCompPartTab = 586L
  val LobFragTab = 587L
  val SystemObjs: Set[Long] = Set(ObjTab, ColTab, TabPartTab,
    TabCompPartTab, TabSubPartTab, LobTab, LobCompPartTab, LobFragTab)

  /** Catalog-row field names inside the system DML's after/before image
    * (the column names of OBJ$/COL$ as the redo feed renders them). */
  private val FObj = "OBJ#"
  private val FName = "NAME"
  private val FType = "TYPE#"
  private val FLength = "LENGTH"
  private val FBo = "BO#"
  private val FPObj = "POBJ#"
  private val FIntCol = "INTCOL#"
  private val FLObj = "LOBJ#"
  private val FTs = "TS#"
  private val FPartObj = "PARTOBJ#"
  private val FFragObj = "FRAGOBJ#"
  private val FParentObj = "PARENTOBJ#"

  def isSystem(obj: Long): Boolean = SystemObjs.contains(obj)

  /** Fold one committed system-DML message into the dictionary.
    * Semantics per SystemTransaction.cpp:
    *   - OBJ$ update  (:525): rename of object OBJ# to NAME;
    *   - OBJ$ delete  (:640): drop the object (version closed at scn);
    *   - COL$ insert  (:427): add column NAME (TYPE#, LENGTH) to OBJ#;
    *   - COL$ delete  (:640): drop column NAME from OBJ#;
    *   - COL$ update  (:525): rename/retype column NAME on OBJ#.
    * OBJ$ INSERT (CREATE TABLE) is deliberately not handled here: a
    * created table only becomes materializable once its COL$ rows exist,
    * and this engine's route for newly-appearing objects is the
    * ADAPTIVE_SCHEMA path ([[Dictionary.withAdaptive]], q103) — the
    * wildcard element learns the new obj#'s columns from the feed and
    * the synthesized entry then versions through THESE cases like any
    * catalog-born table.
    * A change targeting an obj# the dictionary doesn't know is a no-op
    * (the reference tracks only schema-matched objects). Replay safety
    * is two-layered: a HIGH-WATER GUARD skips any change strictly older
    * than the object's latest version (a replayed historical change must
    * never re-apply against later state — property-tested against full-
    * history replay in SchemaEvolutionSpec), and the per-case CONTENT
    * checks make the boundary scn idempotent too, so one system
    * transaction may still carry several changes at the same scn.
    */
  def applyMessage(dict: Dictionary, m: ChangeMessage): Dictionary = {
    val img = if (m.op == MsgOp.Delete) m.before else m.after
    if (img == null) return dict
    def lv(f: String): Option[Long] = img.get(f).flatMap(_.toLongOption)
    // ---- storage catalogs (r11): TABPART$/TABCOMPART$/TABSUBPART$ and
    // the LOB$ family maintain the dictionary's partition/LOB maps, the
    // same packs SystemTransaction updates (SystemTransaction.cpp:484,
    // 592,695). These maps are CURRENT-STATE (no as-of history —
    // partition identity carries no schema of its own; the base-table
    // resolution it points at is what versions). Inserts and deletes
    // are idempotent on replay: re-adding an existing pair or removing
    // an absent one is a no-op, and full-history replay in commit order
    // converges to the same maps.
    m.obj match {
      case TabPartTab | TabCompPartTab =>
        return (m.op match {
          case MsgOp.Insert => for (o <- lv(FObj); b <- lv(FBo))
            yield dict.withStorage(Map(o -> b), Nil)
          case MsgOp.Delete =>
            lv(FObj).map(o => dict.withoutPartitions(Set(o)))
          case _ => None
        }).getOrElse(dict)
      case TabSubPartTab =>
        return (m.op match {
          case MsgOp.Insert => for (o <- lv(FObj); p <- lv(FPObj))
            // store the RAW parent link: Dictionary.baseObj resolves the
            // chain transitively at lookup, so a subpartition folded
            // before its composite parent still heals once the parent
            // registers (order-independence the bootstrap's full-set
            // flatten gets for free)
            yield dict.withStorage(Map(o -> p), Nil)
          case MsgOp.Delete =>
            lv(FObj).map(o => dict.withoutPartitions(Set(o)))
          case _ => None
        }).getOrElse(dict)
      case LobTab =>
        return (m.op match {
          case MsgOp.Insert => for (o <- lv(FObj); lj <- lv(FLObj)) yield {
            val ic = lv(FIntCol).getOrElse(0L).toInt
            // positional column resolve (intcol ≙ ordinal for the
            // non-nested tables this path serves)
            val cn = dict.lookupLatest(o)
              .flatMap(t => t.columns.lift(ic - 1)).map(_.name)
              .getOrElse("")
            dict.withStorage(Map.empty,
              Seq(LobSegment(lj, o, ic, cn, lv(FTs).getOrElse(0L))))
          }
          case MsgOp.Delete =>
            lv(FLObj).map(lj => dict.withoutLobSegments(Set(lj)))
          case _ => None
        }).getOrElse(dict)
      case LobCompPartTab =>
        // LOB alias inserts resolve against the CURRENT segments: DDL
        // emits LOB$ before its comp-part/fragment rows in the same
        // transaction, and applyMessages folds in (cScn, cIdx) order, so
        // the parent is always registered first in a well-formed feed;
        // an unknown parent (malformed feed) is a documented no-op.
        return (m.op match {
          case MsgOp.Insert => for (po <- lv(FPartObj); lj <- lv(FLObj);
              root <- dict.lobSegments.find(_.lobj == lj))
            yield dict.withStorage(Map.empty, Seq(root.copy(lobj = po)))
          case MsgOp.Delete =>
            lv(FPartObj).map(po => dict.withoutLobSegments(Set(po)))
          case _ => None
        }).getOrElse(dict)
      case LobFragTab =>
        return (m.op match {
          case MsgOp.Insert => for (fo <- lv(FFragObj); po <- lv(FParentObj);
              parent <- dict.lobSegments.find(_.lobj == po))
            yield dict.withStorage(Map.empty, Seq(parent.copy(lobj = fo)))
          case MsgOp.Delete =>
            lv(FFragObj).map(fo => dict.withoutLobSegments(Set(fo)))
          case _ => None
        }).getOrElse(dict)
      case _ => () // OBJ$/COL$ versioned flow below
    }
    val target = img.get(FObj).flatMap(s => s.toLongOption).getOrElse(-1L)
    dict.lookupLatest(target) match {
      case None => dict
      case Some(t) if m.scn < t.validFromScn => dict // replayed history
      case Some(t) =>
        (m.obj, m.op) match {
          case (ObjTab, MsgOp.Update) =>
            img.get(FName).filter(_ != t.name)
              .map(n => dict.evolve(t.copy(name = n), m.scn))
              .getOrElse(dict)
          case (ObjTab, MsgOp.Delete) =>
            // close the live version at scn without opening a successor
            if (t.validToScn <= m.scn) dict // already dropped (replay)
            else dict.evolve(t.copy(validToScn = m.scn), m.scn)
          case (ColTab, MsgOp.Insert) =>
            img.get(FName) match {
              case Some(cn) if !t.columns.exists(_.name == cn) =>
                val c = DbColumn(cn,
                  img.get(FType).flatMap(_.toIntOption).getOrElse(1),
                  img.get(FLength).flatMap(_.toIntOption).getOrElse(0))
                dict.evolve(t.copy(columns = t.columns :+ c), m.scn)
              case _ => dict
            }
          case (ColTab, MsgOp.Delete) =>
            img.get(FName) match {
              case Some(cn) if t.columns.exists(_.name == cn) =>
                dict.evolve(
                  t.copy(columns = t.columns.filterNot(_.name == cn)), m.scn)
              case _ => dict
            }
          case (ColTab, MsgOp.Update) =>
            val old = m.before
            val oldName = Option(old).flatMap(_.get(FName))
              .orElse(img.get(FName))
            oldName.flatMap(on => t.columns.find(_.name == on)).map { c =>
              val c2 = c.copy(
                name = img.getOrElse(FName, c.name),
                typeCode = img.get(FType).flatMap(_.toIntOption)
                  .getOrElse(c.typeCode))
              if (c2 == c) dict // effect already present (replay)
              else dict.evolve(t.copy(columns =
                t.columns.map(x => if (x.name == c.name) c2 else x)), m.scn)
            }.getOrElse(dict)
          case _ => dict
        }
    }
  }

  /** Fold a micro-batch's committed system messages in commit order —
    * the deterministic replay order TxnAssembly already established. */
  def applyMessages(dict: Dictionary, ms: Seq[ChangeMessage]): Dictionary =
    ms.sortBy(m => (m.cScn, m.cIdx)).foldLeft(dict)(applyMessage)

  // ---- dictionary checkpointing (restart without stale schema) ---------

  /** Persist the evolved dictionary BEFORE the batch's output is emitted,
    * named by batch id; atomic rename so a crash never leaves a torn
    * file. On restart [[restoreLatest]] returns the newest snapshot —
    * together with idempotent [[applyMessage]] replay this guarantees no
    * stale-schema emission after recovery (the reference persists the
    * same evolution in its checkpoint JSONs,
    * /root/reference/src/metadata/SerializerJson.cpp:539-760). */
  def checkpoint(dir: String, batchId: Long, dict: Dictionary,
      keep: Int = 10): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val tmp = d.resolve(s".dict-$batchId.json.tmp")
    Files.writeString(tmp, Dictionary.toJson(dict))
    // REPLACE_EXISTING: batch 0 always re-snapshots on a post-crash
    // re-run, so the target can already exist; without the flag the NIO
    // spec permits FileAlreadyExistsException on non-POSIX filesystems.
    // Same-content overwrite is safe — snapshots are deterministic per
    // batchId.
    Files.move(tmp, d.resolve(f"dict-$batchId%020d.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // retention: a long-running stream must not accumulate one snapshot
    // per evolution forever (the reference similarly caps checkpoint
    // files, Metadata checkpoint retention). Newest `keep` survive.
    listSnapshots(d).dropRight(keep).foreach(p =>
      try Files.delete(p) catch { case _: java.io.IOException => })
  }

  def restoreLatest(dir: String): Option[Dictionary] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return None
    listSnapshots(d).lastOption
      .map(p => Dictionary.fromJson(Files.readString(p)))
  }

  private def listSnapshots(d: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val stream = Files.list(d) // must close: holds a directory handle
    try stream.iterator().asScala
      .filter(_.getFileName.toString.matches("dict-\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    finally stream.close()
  }
}
