package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.cdc.{Dictionary, TableSelector}

/** S2 online bootstrap over a REAL JDBC source: an in-memory Derby
  * database (derby jars ship with the Spark distribution) stands in for
  * the Oracle catalog — same logical SYS.%$ tables, quoted-identifier
  * dialect — and `Dictionary.fromJdbc` must assemble the same dictionary
  * `fromCatalog` would. The Oracle production dialect (flashback + MOD
  * decomposition) is additionally pinned as SQL text against the
  * reference's query shapes (ReplicatorOnline.h:193-560). */
class DictionaryJdbcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val url = "jdbc:derby:memory:graftcat2;create=true"

  private lazy val seeded: Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE SCHEMA ORACAT")
    st.execute("""CREATE TABLE ORACAT."USER$" ("USER#" BIGINT, NAME VARCHAR(128))""")
    st.execute("""CREATE TABLE ORACAT."OBJ$" ("OWNER#" BIGINT, "OBJ#" BIGINT,
      "DATAOBJ#" BIGINT, NAME VARCHAR(128), "TYPE#" INT)""")
    st.execute("""CREATE TABLE ORACAT."COL$" ("OBJ#" BIGINT, "COL#" INT,
      "INTCOL#" INT, NAME VARCHAR(128), "TYPE#" INT, LENGTH INT,
      "PRECISION#" INT, SCALE INT, "NULL$" INT,
      PROPERTY1 BIGINT, PROPERTY2 BIGINT)""")
    st.execute("""CREATE TABLE ORACAT."CDEF$" ("CON#" BIGINT, "OBJ#" BIGINT,
      "TYPE#" INT)""")
    st.execute("""CREATE TABLE ORACAT."CCOL$" ("CON#" BIGINT, "INTCOL#" INT,
      "OBJ#" BIGINT)""")
    st.execute("""INSERT INTO ORACAT."USER$" VALUES (0, 'SYS'), (2, 'APP')""")
    // obj 100: APP.ORDERS (table); obj 101: a view (TYPE# 4, excluded);
    // obj 102: SYS-owned table (selector-filtered later, still read)
    st.execute("""INSERT INTO ORACAT."OBJ$" VALUES
      (2, 100, 100, 'ORDERS', 2), (2, 101, NULL, 'V_ORDERS', 4),
      (0, 102, 102, 'AUD$', 2)""")
    // ORDERS: ID number(10) not null pk, VAL varchar2(50), HID hidden
    // (PROPERTY bit 5), SYS_NC guard-ish column left non-hidden here
    st.execute("""INSERT INTO ORACAT."COL$" VALUES
      (100, 1, 1, 'ID', 2, 22, 10, 0, 1, 0, 0),
      (100, 2, 2, 'VAL', 1, 50, -1, -1, 0, 0, 0),
      (100, 3, 3, 'HID', 1, 30, -1, -1, 0, 32, 0),
      (102, 1, 1, 'X', 2, 22, -1, -1, 0, 0, 0)""")
    st.execute("""INSERT INTO ORACAT."CDEF$" VALUES (7, 100, 2), (8, 100, 4)""")
    // con 7 is the PK (TYPE# 2) on INTCOL# 1 = ID; con 8 TYPE# 4 ignored
    st.execute("""INSERT INTO ORACAT."CCOL$" VALUES (7, 1, 100), (8, 2, 100)""")
    // ---- storage catalog: a partitioned + LOB table (obj 110 APP.DOCS,
    // DATAOBJ# NULL — partitioned objects carry no data segment) ----
    st.execute("""CREATE TABLE ORACAT."TABPART$" ("OBJ#" BIGINT,
      "DATAOBJ#" BIGINT, "BO#" BIGINT)""")
    st.execute("""CREATE TABLE ORACAT."TABCOMPART$" ("OBJ#" BIGINT,
      "DATAOBJ#" BIGINT, "BO#" BIGINT)""")
    st.execute("""CREATE TABLE ORACAT."TABSUBPART$" ("OBJ#" BIGINT,
      "DATAOBJ#" BIGINT, "POBJ#" BIGINT)""")
    st.execute("""CREATE TABLE ORACAT."LOB$" ("OBJ#" BIGINT, "COL#" INT,
      "INTCOL#" INT, "LOBJ#" BIGINT, "TS#" BIGINT)""")
    st.execute("""CREATE TABLE ORACAT."LOBCOMPPART$" ("PARTOBJ#" BIGINT,
      "LOBJ#" BIGINT)""")
    st.execute("""CREATE TABLE ORACAT."LOBFRAG$" ("FRAGOBJ#" BIGINT,
      "PARENTOBJ#" BIGINT, "TS#" BIGINT)""")
    st.execute("""INSERT INTO ORACAT."OBJ$" VALUES (2, 110, NULL, 'DOCS', 2)""")
    st.execute("""INSERT INTO ORACAT."COL$" VALUES
      (110, 1, 1, 'ID', 2, 22, 10, 0, 1, 0, 0),
      (110, 2, 2, 'BODY', 112, 4000, -1, -1, 0, 0, 0)""")
    st.execute("""INSERT INTO ORACAT."CDEF$" VALUES (9, 110, 2)""")
    st.execute("""INSERT INTO ORACAT."CCOL$" VALUES (9, 1, 110)""")
    // two range partitions + one composite partition with a subpartition
    st.execute("""INSERT INTO ORACAT."TABPART$" VALUES
      (111, 1111, 110), (112, 1112, 110)""")
    st.execute("""INSERT INTO ORACAT."TABCOMPART$" VALUES (113, NULL, 110)""")
    st.execute("""INSERT INTO ORACAT."TABSUBPART$" VALUES (114, 1114, 113)""")
    // the BODY CLOB: root segment 200, a composite-partition segment 201,
    // and fragments chained through both parents
    st.execute("""INSERT INTO ORACAT."LOB$" VALUES (110, 2, 2, 200, 5)""")
    st.execute("""INSERT INTO ORACAT."LOBCOMPPART$" VALUES (201, 200)""")
    st.execute("""INSERT INTO ORACAT."LOBFRAG$" VALUES
      (202, 201, 5), (203, 200, 5)""")
    c.close()
  }

  private def load(selectors: Seq[TableSelector] = Nil) = {
    seeded
    Dictionary.fromJdbc(spark, url, new java.util.Properties(),
      asOfScn = None, catalogSchema = "ORACAT", oracleDialect = false,
      selectors = selectors)
  }

  test("assembles tables, columns, keys, flags from a live JDBC catalog") {
    val d = load()
    assert(d.tables.map(_.fullName).toSet ==
      Set("APP.ORDERS", "APP.DOCS", "SYS.AUD$"))
    val t = d.tables.find(_.name == "ORDERS").get
    assert(t.obj == 100L && t.dataObj == 100L)
    assert(t.columns.map(_.name) == Seq("ID", "VAL", "HID"))
    val id = t.columns.find(_.name == "ID").get
    assert(id.typeCode == 2 && id.precision == 10 && id.scale == 0)
    assert(!id.nullable) // NULL$ = 1
    assert(id.numPk > 0) // CDEF$ TYPE#=2 -> CCOL$ INTCOL# 1
    assert(t.keyColumns.map(_.name) == Seq("ID"))
    val hid = t.columns.find(_.name == "HID").get
    assert(hid.hidden) // PROPERTY bit 5
    assert(!t.columns.find(_.name == "VAL").get.hidden)
    // the PK-less SYS table gets no key and no pk tag type
    assert(d.tables.find(_.name == "AUD$").get.keyColumns.isEmpty)
  }

  test("selectors filter the bootstrapped dictionary like any other") {
    val d = load(Seq(TableSelector("APP", ".*")))
    assert(d.selected.map(_.fullName).toSet == Set("APP.ORDERS", "APP.DOCS"))
    assert(d.lookup(100L, 1L).isDefined)
    assert(d.lookup(102L, 1L).isEmpty) // selector-suppressed
  }

  test("partitioned + LOB table bootstraps end-to-end: partition objs " +
      "resolve to the base table, LOB segments to the owning column") {
    val d = load()
    // TABPART$/TABCOMPART$ map directly; TABSUBPART$ chains through the
    // composite parent (POBJ# 113 → BO# 110)
    assert(d.partitionOf == Map(111L -> 110L, 112L -> 110L,
      113L -> 110L, 114L -> 110L))
    Seq(111L, 112L, 113L, 114L).foreach { p =>
      assert(d.lookup(p, 1L).map(_.fullName).contains("APP.DOCS"),
        s"partition obj $p did not resolve")
    }
    // LOB resolution: root lobj, comp-part segment, and both fragment
    // chains (frag→comppart→root and frag→root) land on (110, BODY)
    Seq(200L, 201L, 202L, 203L).foreach { lobj =>
      assert(d.lobOwner(lobj).contains((110L, "BODY")),
        s"lob segment $lobj did not resolve")
    }
    // the broadcast-join side carries the alias rows: an event addressed
    // to a partition obj materializes against the base table's schema
    val rows = d.toDF(spark)
      .select("obj", "table_name", "key_cols")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[String](2))).toMap
    Seq(110L, 111L, 112L, 113L, 114L).foreach { o =>
      assert(rows.get(o).contains(("DOCS", Seq("ID"))), s"obj $o")
    }
  }

  test("an OLR-checkpoint-imported dictionary materializes the J2 " +
      "broadcast join like a bootstrapped one (migration path)") {
    import org.apache.spark.sql.functions.{col, element_at}
    implicit val s: SparkSession = spark
    import spark.implicits._
    val (_, d) = graft.cdc.OlrCheckpoint.importJson(DictionarySpec.olrFixture)
    val messages = Seq(
      graft.cdc.ChangeMessage(10L, 0L, 10L, 1L, "1.0.1",
        graft.cdc.MsgOp.Insert, 100L, "", null, Map("ID" -> "1"), null, null),
      // partition obj from the checkpoint's sys-tabsubpart chain
      graft.cdc.ChangeMessage(11L, 0L, 11L, 1L, "1.0.1",
        graft.cdc.MsgOp.Insert, 312L, "", null, Map("ID" -> "2"), null, null))
      .toDS()
    val out = graft.cdc.Materialize.enrich(messages, d)
      .select(col("obj"), col("table_name"),
        element_at(col("key_cols"), 1).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSet == Set((100L, "ORDERS", "ID"), (312L, "DOCS", "ID")))
  }

  test("oracle dialect SQL matches the reference query shapes") {
    val sql = Dictionary.oracleCatalogSql(asOfScn = 777L, ownerId = 2L)
    // flashback on every table read (ReplicatorOnline.h AS OF SCN :i)
    assert(sql.values.forall(_.contains("AS OF SCN 777")))
    // per-owner filtering
    assert(sql("objs").contains("O.OWNER# = 2"))
    // the MOD-2^64 NUMBER decomposition, verbatim
    assert(sql("cols").contains(
      "MOD(C.PROPERTY, 18446744073709551616) AS PROPERTY1"))
    assert(sql("cols").contains(
      "MOD(TRUNC(C.PROPERTY / 18446744073709551616), 18446744073709551616)"))
    assert(sql("users").contains("MOD(U.SPARE1, 18446744073709551616)"))
    // catalog joins ride OBJ# like the reference's _USER forms
    assert(sql("cols").contains("JOIN SYS.COL$"))
    assert(sql("ccol").contains("ON O.OBJ# = L.OBJ#"))
  }
}
