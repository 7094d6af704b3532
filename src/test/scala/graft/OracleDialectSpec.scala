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
}
