package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.cdc.{Envelope, MsgOp}

/** Structural fuzz over the envelope knob matrix: for every sampled
  * `Envelope.Format` combination the rendered JSON must keep the builder's
  * field order (BuilderJson.h:232-360 appends headers then payload in a
  * fixed sequence) and omit absent sections. Seeded → deterministic. */
class EnvelopeFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // one txn: begin bracket, insert with everything, ddl, commit bracket
  private def enriched = spark.sql(
    """SELECT * FROM VALUES
      |  (20L, 0L, 10L, 1L, '7', 'begin', 0L, CAST(NULL AS STRING),
      |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
      |   map('login username', 'SCOTT', 'client info', 'ci'),
      |   CAST(NULL AS STRING), 10L, 777000L, 2, -1L, 0L,
      |   CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING)),
      |  (20L, 1L, 11L, 1L, '7', 'c', 5L, 'RID1',
      |   CAST(NULL AS MAP<STRING,STRING>), map('v', '1'),
      |   map('login username', 'SCOTT'), CAST(NULL AS STRING), 10L, 777000L,
      |   2, 4096L, 0L, 'APP', 'T', 'tag1'),
      |  (20L, 2L, 12L, 1L, '7', 'ddl', 5L, CAST(NULL AS STRING),
      |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
      |   map('login username', 'SCOTT'), 'TRUNCATE TABLE T', 10L, 777000L,
      |   2, 8192L, 1L, 'APP', 'T', CAST(NULL AS STRING)),
      |  (20L, 3L, 20L, 1L, '7', 'commit', 0L, CAST(NULL AS STRING),
      |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
      |   map('login username', 'SCOTT'), CAST(NULL AS STRING), 10L, 777000L,
      |   2, -1L, 0L,
      |   CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING))
      |AS t(cScn, cIdx, scn, seq, xid, op, obj, rid, before, after,
      |     attrs, ddlText, bScn, tm, thread, offset, num,
      |     owner, table_name, tag)""".stripMargin)

  /** top-level key sequence of a rendered JSON object (depth-1 only). */
  private def topKeys(json: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var i = 0; var inStr = false; var esc = false
    var lastStr = ""
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
        else lastStr += c
      } else c match {
        case '"' => inStr = true; lastStr = ""
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ':' => if (depth == 1) out += lastStr
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  test("fuzz: every knob combo keeps builder field order and null omission") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260812L) // seeded → deterministic
    val canonical = Seq("c_scn", "c_idx", "scn", "scns", "b_scn", "b_scns",
      "e_scn", "e_scns", "tm", "seq", "xid", "db", "usr", "rth",
      "attributes", "op", "offset", "schema", "num", "rid", "before",
      "after", "ddl")
    val order = canonical.zipWithIndex.toMap
    for (_ <- 1 to 40) {
      def b = rnd.nextBoolean()
      val fmt = Envelope.Format(
        dbName = if (b) "D" else "",
        scnTypeBegin = b, scnTypeCommit = b, scnFormatHex = b,
        timestampCommit = b,
        schemaFormatFull = false, // needs schema_cols column; separate gate
        attributesBegin = b, attributesDml = b, attributesCommit = b,
        ridSkip = b, schemaObj = b,
        userBegin = b, userDml = b, userCommit = b, userDdl = b,
        redoThread = b, addOffset = b, addSequences = b,
        dbAddDml = b, dbAddDdl = b)
      val vals = Envelope.toMessages(enriched, fmt)
        .orderBy("cIdx").select("value").collect().map(_.getString(0))
      assert(vals.length == 4)
      for ((v, idx) <- vals.zipWithIndex) {
        val ks = topKeys(v)
        // no duplicate keys, all known, strictly in builder order
        assert(ks.distinct == ks, s"dup keys in $v")
        assert(ks.forall(order.contains), s"unknown key in $v")
        assert(ks.map(order) == ks.map(order).sorted, s"order broke in $v")
        // exactly one scn-family spelling
        assert(ks.contains("scn") ^ ks.contains("scns"))
        assert(!(ks.contains("b_scn") && ks.contains("b_scns")))
        // brackets never carry payload sections
        if (idx == 0 || idx == 3) {
          assert(!ks.contains("schema") && !ks.contains("num") &&
            !ks.contains("offset") && !ks.contains("ddl"))
        }
        // num/offset are DML-payload-only (appendRowid semantics; offset
        // render sites are insert/update/delete only)
        if (idx == 2) assert(!ks.contains("num") && !ks.contains("offset"))
        if (fmt.ridSkip) assert(!ks.contains("rid"))
      }
      // knob presence checks on the DML message
      val dmlKs = topKeys(vals(1))
      assert(dmlKs.contains("num") == fmt.addSequences)
      assert(dmlKs.contains("offset") == fmt.addOffset)
      assert(dmlKs.contains("usr") == fmt.userDml)
      assert(dmlKs.contains("rth") == fmt.redoThread)
      assert(dmlKs.contains("db") ==
        (fmt.dbName.nonEmpty && fmt.dbAddDml))
      assert(dmlKs.contains("attributes") == fmt.attributesDml)
      val ddlKs = topKeys(vals(2))
      assert(ddlKs.contains("usr") == fmt.userDdl)
      assert(ddlKs.contains("db") == (fmt.dbName.nonEmpty && fmt.dbAddDdl))
      assert(ddlKs.contains("ddl"))
    }
  }
}
