package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.Dictionary

/** Dialect seam pin (round-7 item): the COMPLETE Oracle online-bootstrap
  * catalog surface — every flashback query shape the reference issues
  * (ReplicatorOnline.h:193-591, `_USER` variants) — must be reproducible
  * from [[Dictionary.oracleCatalogSql]] verbatim in structure, so that a
  * run against a real Oracle is a connection-config change, not a code
  * change. Asserts, per query: the exact SELECT list (reference column
  * order, ROWID first), `AS OF SCN` placed directly after EVERY catalog
  * table reference, the reference's join keys, per-owner gating, the
  * name-regex gates, and that every 128-bit NUMBER flag word is read
  * only through the MOD/TRUNC 2^64 decomposition. */
class OracleDialectSpec extends AnyFunSuite {

  private val scn = 777L
  private val owner = 2L
  private val sql = Dictionary.oracleCatalogSql(scn, owner, "MY.*")
  private val m = "18446744073709551616"

  test("the full reference bootstrap surface is present (18 queries)") {
    assert(sql.keySet == Set(
      "users", "objs", "obj_name", "cols", "cdef", "ccol", "tabs",
      "deferred_stg", "ecol", "ecol11", "lobs", "lob_comp_part",
      "lob_frag", "tabcompart", "tabpart", "tabsubpart", "ts",
      "xdb_ttset"))
  }

  test("AS OF SCN rides directly after every catalog table reference") {
    val tableRef = raw"(SYS\.[A-Z_]+\$$|XDB\.XDB\$$TTSET)(?: AS OF SCN (\d+))?".r
    sql.foreach { case (k, q) =>
      val refs = tableRef.findAllMatchIn(q).toSeq
      assert(refs.nonEmpty, s"$k: no catalog table reference found")
      refs.foreach { mm =>
        assert(mm.group(2) == scn.toString,
          s"$k: ${mm.group(1)} read without 'AS OF SCN $scn' directly after it")
      }
    }
  }

  test("flashback read counts match the reference query skeletons") {
    def nRefs(k: String) = raw"AS OF SCN".r.findAllIn(sql(k)).length
    assert(nRefs("users") == 1 && nRefs("ts") == 1 && nRefs("xdb_ttset") == 1)
    assert(nRefs("objs") == 1 && nRefs("obj_name") == 1)
    // one OBJ$ + the cataloged table
    Seq("cols", "cdef", "ccol", "tabs", "deferred_stg", "ecol", "ecol11",
      "tabcompart", "tabpart", "tabsubpart", "lobs")
      .foreach(k => assert(nRefs(k) == 2, s"$k"))
    assert(nRefs("lob_comp_part") == 3) // OBJ$ + LOB$ + LOBCOMPPART$
    assert(nRefs("lob_frag") == 7) // 3 + 3 across the UNION ALL + frag join
  }

  test("SELECT lists match the reference column order, ROWID first") {
    def selectList(q: String): String =
      q.substring("SELECT ".length, q.indexOf(" FROM "))
    assert(selectList(sql("users")) ==
      s"U.ROWID, U.USER#, U.NAME, MOD(U.SPARE1, $m) AS SPARE11," +
        s" MOD(TRUNC(U.SPARE1 / $m), $m) AS SPARE12")
    assert(selectList(sql("objs")) ==
      s"O.ROWID, O.OWNER#, O.OBJ#, O.DATAOBJ#, O.NAME, O.TYPE#," +
        s" MOD(O.FLAGS, $m) AS FLAGS1, MOD(TRUNC(O.FLAGS / $m), $m) AS FLAGS2")
    assert(selectList(sql("cols")) ==
      s"C.ROWID, C.OBJ#, C.COL#, C.SEGCOL#, C.INTCOL#, C.NAME, C.TYPE#," +
        s" C.LENGTH, C.PRECISION#, C.SCALE, C.CHARSETFORM, C.CHARSETID," +
        s" C.NULL$$, MOD(C.PROPERTY, $m) AS PROPERTY1," +
        s" MOD(TRUNC(C.PROPERTY / $m), $m) AS PROPERTY2")
    assert(selectList(sql("cdef")) == "D.ROWID, D.CON#, D.OBJ#, D.TYPE#")
    assert(selectList(sql("ccol")) ==
      s"L.ROWID, L.CON#, L.INTCOL#, L.OBJ#, MOD(L.SPARE1, $m) AS SPARE11," +
        s" MOD(TRUNC(L.SPARE1 / $m), $m) AS SPARE12")
    assert(selectList(sql("tabs")) ==
      s"T.ROWID, T.OBJ#, T.DATAOBJ#, T.TS#, T.CLUCOLS," +
        s" MOD(T.FLAGS, $m) AS FLAGS1, MOD(TRUNC(T.FLAGS / $m), $m) AS FLAGS2," +
        s" MOD(T.PROPERTY, $m) AS PROPERTY1," +
        s" MOD(TRUNC(T.PROPERTY / $m), $m) AS PROPERTY2")
    assert(selectList(sql("deferred_stg")) ==
      s"DS.ROWID, DS.OBJ#, MOD(DS.FLAGS_STG, $m) AS FLAGS_STG1," +
        s" MOD(TRUNC(DS.FLAGS_STG / $m), $m) AS FLAGS_STG2")
    assert(selectList(sql("ecol")) ==
      "E.ROWID, E.TABOBJ#, E.COLNUM, E.GUARD_ID")
    assert(selectList(sql("ecol11")) ==
      "E.ROWID, E.TABOBJ#, E.COLNUM, -1 AS GUARD_ID")
    assert(selectList(sql("lobs")) ==
      "L.ROWID, L.OBJ#, L.COL#, L.INTCOL#, L.LOBJ#, L.TS#")
    assert(selectList(sql("lob_comp_part")) ==
      "LCP.ROWID, LCP.PARTOBJ#, LCP.LOBJ#")
    assert(selectList(sql("lob_frag")) ==
      "LF.ROWID, LF.FRAGOBJ#, LF.PARENTOBJ#, LF.TS#")
    assert(selectList(sql("tabcompart")) ==
      "TCP.ROWID, TCP.OBJ#, TCP.DATAOBJ#, TCP.BO#")
    assert(selectList(sql("tabpart")) ==
      "TP.ROWID, TP.OBJ#, TP.DATAOBJ#, TP.BO#")
    assert(selectList(sql("tabsubpart")) ==
      "TSP.ROWID, TSP.OBJ#, TSP.DATAOBJ#, TSP.POBJ#")
    assert(selectList(sql("ts")) == "T.ROWID, T.TS#, T.NAME, T.BLOCKSIZE")
    assert(selectList(sql("xdb_ttset")) ==
      "T.ROWID, T.GUID, T.TOKSUF, T.FLAGS, T.OBJ#")
  }

  test("join keys and owner/name gates match the reference") {
    // per-owner gating rides the OBJ$ join in every _USER form
    Seq("objs", "obj_name", "cols", "cdef", "ccol", "tabs", "deferred_stg",
      "ecol", "ecol11", "lobs", "lob_comp_part", "tabcompart", "tabpart",
      "tabsubpart")
      .foreach(k => assert(sql(k).contains(s"O.OWNER# = $owner"), k))
    // name-regex gates (bind :j in the reference, inlined literal here)
    assert(sql("users").contains("REGEXP_LIKE(U.NAME, 'MY.*')"))
    assert(sql("obj_name").contains("REGEXP_LIKE(O.NAME, 'MY.*')"))
    // quote-doubling: a pattern with an apostrophe must stay one literal
    val quoted = Dictionary.oracleCatalogSql(scn, owner, "O'BRIEN.*")
    assert(quoted("users").contains("REGEXP_LIKE(U.NAME, 'O''BRIEN.*')"))
    // the reference's join keys, one per catalog family
    assert(sql("cols").contains("ON O.OBJ# = C.OBJ#"))
    assert(sql("cdef").contains("ON O.OBJ# = D.OBJ#"))
    assert(sql("ccol").contains("ON O.OBJ# = L.OBJ#"))
    assert(sql("tabs").contains("ON O.OBJ# = T.OBJ#"))
    assert(sql("deferred_stg").contains("ON O.OBJ# = DS.OBJ#"))
    assert(sql("ecol").contains("ON O.OBJ# = E.TABOBJ#"))
    assert(sql("ecol11").contains("ON O.OBJ# = E.TABOBJ#"))
    assert(sql("lobs").contains("ON O.OBJ# = L.OBJ#"))
    assert(sql("lob_comp_part").contains("ON LCP.LOBJ# = L.LOBJ#"))
    assert(sql("lob_frag").contains("ON LCP.PARTOBJ# = LF.PARENTOBJ#"))
    assert(sql("lob_frag").contains("ON L.LOBJ# = LF.PARENTOBJ#"))
    assert(sql("lob_frag").contains(" UNION ALL "))
    assert(sql("tabcompart").contains("ON O.OBJ# = TCP.OBJ#"))
    assert(sql("tabpart").contains("ON O.OBJ# = TP.OBJ#"))
    assert(sql("tabsubpart").contains("ON O.OBJ# = TSP.OBJ#"))
  }

  test("128-bit NUMBER words are read only via the MOD/TRUNC decomposition") {
    val words = Seq("SPARE1", "FLAGS_STG", "PROPERTY", "FLAGS")
    // XDB$TTSET.FLAGS is a plain NUMBER in the reference too
    // (SQL_GET_XDB_TTSET reads it bare) — the decomposition rule covers
    // the SYS.%$ 128-bit words only
    sql.removed("xdb_ttset").foreach { case (k, q) =>
      words.foreach { w =>
        // every bare use of the word must be inside MOD(...)/TRUNC(...)
        raw"(?<![A-Z_$$])[A-Z]+\.$w(?![A-Z_0-9#])".r.findAllMatchIn(q)
          .foreach { mm =>
            val before = q.substring((mm.start - 10).max(0), mm.start)
            assert(before.contains("MOD(") || before.contains("TRUNC("),
              s"$k: ${mm.matched} read without MOD-2^64 decomposition")
          }
      }
    }
  }

  // ---- the _OBJ delta variants (ReplicatorOnline.h:207-565) ------------

  private val objId = 4321L
  private val objSql = Dictionary.oracleCatalogSqlObj(scn, objId)

  test("every ReplicatorOnline.h SQL_* constant has a pinned skeleton " +
      "(45 = 18 sweep + 13 _OBJ + 14 database)") {
    assert(objSql.keySet == Set(
      "ccol_obj", "cdef_obj", "cols_obj", "deferred_stg_obj", "ecol_obj",
      "ecol11_obj", "lobs_obj", "lob_comp_part_obj", "lob_frag_obj",
      "tabs_obj", "tabcompart_obj", "tabpart_obj", "tabsubpart_obj"))
    assert(Dictionary.oracleDatabaseSql.keySet == Set(
      "archive_log_list", "database_information", "database_incarnation",
      "database_role", "database_scn", "con_info", "scn_from_time",
      "scn_from_time_relative", "sequence_from_scn",
      "sequence_from_scn_standby", "logfile_list", "parameter", "property",
      "check_connection"))
    assert(sql.size + objSql.size + Dictionary.oracleDatabaseSql.size == 45)
  }

  test("_OBJ variants: same SELECT lists as the sweep forms, gated on " +
      "the object id instead of the OBJ$ owner join") {
    def selectList(q: String): String =
      q.substring("SELECT ".length, q.indexOf(" FROM "))
    // the reference's _OBJ SELECT lists are byte-identical to the _USER
    // ones; pin the correspondence instead of re-transcribing
    val pairs = Seq("ccol" -> "ccol_obj", "cdef" -> "cdef_obj",
      "cols" -> "cols_obj", "deferred_stg" -> "deferred_stg_obj",
      "ecol" -> "ecol_obj", "ecol11" -> "ecol11_obj", "lobs" -> "lobs_obj",
      "lob_comp_part" -> "lob_comp_part_obj", "lob_frag" -> "lob_frag_obj",
      "tabs" -> "tabs_obj", "tabcompart" -> "tabcompart_obj",
      "tabpart" -> "tabpart_obj", "tabsubpart" -> "tabsubpart_obj")
    pairs.foreach { case (u, o) =>
      assert(selectList(sql(u)) == selectList(objSql(o)),
        s"$o SELECT list diverges from $u")
    }
    // no _OBJ variant joins OBJ$ (the delta refresh skips the owner walk)
    objSql.foreach { case (k, q) =>
      assert(!q.contains("SYS.OBJ$"), s"$k joins OBJ$$")
      assert(!q.contains("OWNER#"), s"$k gates on owner")
    }
    // the reference's gate keys: TABOBJ# for ECOL$, POBJ# for TABSUBPART$,
    // the LOB$ walk for the lob family, OBJ# for the rest
    assert(objSql("ecol_obj").contains(s"WHERE E.TABOBJ# = $objId"))
    assert(objSql("ecol11_obj").contains(s"WHERE E.TABOBJ# = $objId"))
    assert(objSql("tabsubpart_obj").contains(s"WHERE TSP.POBJ# = $objId"))
    assert(objSql("lobs_obj").contains(s"WHERE L.OBJ# = $objId"))
    assert(objSql("lob_comp_part_obj").contains(s"WHERE L.OBJ# = $objId"))
    assert(objSql("lob_frag_obj").contains(" UNION ALL "))
    assert(raw"WHERE L\.OBJ# = 4321".r
      .findAllIn(objSql("lob_frag_obj")).length == 2)
    Seq("ccol_obj" -> "L", "cdef_obj" -> "D", "cols_obj" -> "C",
      "deferred_stg_obj" -> "DS", "tabs_obj" -> "T",
      "tabcompart_obj" -> "TCP", "tabpart_obj" -> "TP")
      .foreach { case (k, a) =>
        assert(objSql(k).contains(s"WHERE $a.OBJ# = $objId"), k)
      }
    // flashback on every catalog read, directly after the table name
    val tableRef = raw"SYS\.[A-Z_]+\$$(?: AS OF SCN (\d+))?".r
    objSql.foreach { case (k, q) =>
      tableRef.findAllMatchIn(q).foreach { mm =>
        assert(mm.group(1) == scn.toString, s"$k: flashback missing")
      }
    }
  }

  test("database/instance SQL matches the reference, binds kept") {
    val db = Dictionary.oracleDatabaseSql
    assert(db("check_connection") == "SELECT 1 FROM DUAL")
    assert(db("database_scn") == "SELECT D.CURRENT_SCN FROM SYS.V_$DATABASE D")
    assert(db("database_role") == "SELECT DATABASE_ROLE FROM SYS.V_$DATABASE")
    assert(db("parameter") ==
      "SELECT VALUE FROM SYS.V_$PARAMETER WHERE NAME = :i")
    assert(db("property") ==
      "SELECT PROPERTY_VALUE FROM DATABASE_PROPERTIES WHERE PROPERTY_NAME = :i")
    // archive discovery: the sequence/resetlogs binds and the recovery-
    // dest-preferring order the reference relies on for S3 ordering
    assert(db("archive_log_list").contains("SEQUENCE# >= :i"))
    assert(db("archive_log_list").contains("RESETLOGS_ID = :j"))
    assert(db("archive_log_list").contains(
      "ORDER BY SEQUENCE#, DEST_ID, IS_RECOVERY_DEST_FILE DESC"))
    // supplemental-logging + endianness probes (DECODE shapes)
    assert(db("database_information").contains(
      "DECODE(D.SUPPLEMENTAL_LOG_DATA_MIN, 'NO', 0, 1)"))
    assert(db("database_information").contains(
      "DECODE(TP.ENDIAN_FORMAT, 'Big', 1, 0)"))
    assert(db("database_information").contains(
      "VER.BANNER LIKE '%Oracle%Database%'"))
    // positioning: both sequence probes carry the UNION over V_$LOG /
    // V_$STANDBY_LOG and V_$ARCHIVED_LOG with the same bind pair
    Seq("sequence_from_scn", "sequence_from_scn_standby").foreach { k =>
      assert(db(k).startsWith("SELECT MAX(SEQUENCE#) FROM ("), k)
      assert(db(k).contains("FIRST_CHANGE# - 1 <= :i"), k)
      assert(db(k).contains("RESETLOGS_ID = :j"), k)
    }
    assert(db("sequence_from_scn").contains("SYS.V_$LOG "))
    assert(db("sequence_from_scn_standby").contains("SYS.V_$STANDBY_LOG"))
    assert(db("logfile_list").contains("WHERE TYPE = :i"))
    assert(db("scn_from_time_relative").contains("SYSDATE - (:i/24/3600)"))
    // incarnation chain columns, reference order
    assert(db("database_incarnation").startsWith(
      "SELECT INCARNATION#, RESETLOGS_CHANGE#, PRIOR_RESETLOGS_CHANGE#," +
        " STATUS, RESETLOGS_ID, PRIOR_INCARNATION#"))
  }

  test("XDB per-token-set reads splice TOKSUF and flashback-pin") {
    val x = Dictionary.oracleXdbSql(scn, "A1B2")
    assert(x("xdb_xnm") ==
      s"SELECT T.ROWID, T.NMSPCURI, T.ID FROM XDB.X$$NMA1B2 AS OF SCN $scn T")
    assert(x("xdb_xpt") ==
      s"SELECT T.ROWID, T.PATH, T.ID FROM XDB.X$$PTA1B2 AS OF SCN $scn T")
    assert(x("xdb_xqn") ==
      s"SELECT T.ROWID, T.NMSPCID, T.LOCALNAME, T.FLAGS, T.ID" +
        s" FROM XDB.X$$QNA1B2 AS OF SCN $scn T")
  }
}
