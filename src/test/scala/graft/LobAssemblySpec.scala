package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.cdc._

/** T6/J3 LOB page assembly + marker resolution (SURVEY.md §2.3/§2.5;
  * semantics pinned against LobCtx page-chain stitching and orphan
  * parking, src/common/LobCtx.cpp:28-187, Parser.cpp:1214-1220). */
class LobAssemblySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("lob-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def page(scn: Long, lobId: String, page: Int, data: String): ChangeEvent =
    ChangeEvent(scn, "9.0.9", Op.LobData)
      .copy(after = Map("lobId" -> lobId, "page" -> page.toString, "data" -> data))

  private def msg(cIdx: Long, before: Map[String, String],
      after: Map[String, String]): ChangeMessage =
    ChangeMessage(100L, cIdx, 10L, 1L, "1.0.1", MsgOp.Insert, 7L, "rid",
      before, after, Map.empty, null)

  test("pages concatenate in page order regardless of arrival order") {
    import spark.implicits._
    val events = Seq(
      page(3, "L1", 2, "world"),
      page(1, "L1", 0, "hello "),
      page(2, "L1", 1, "big "),
      page(4, "L2", 0, "solo")).toDS()
    val lobs = LobAssembly.assemble(events.toDF())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(lobs("L1") == ((3L, "hello big world")))
    assert(lobs("L2") == ((1L, "solo")))
  }

  test("non-LOB events are ignored by assemble") {
    import spark.implicits._
    val events = Seq(
      ChangeEvent(1, "1.0.1", Op.Ins).copy(after = Map("lobId" -> "X")),
      page(2, "L1", 0, "data")).toDS()
    assert(LobAssembly.assemble(events.toDF()).count() == 1)
  }

  test("marker is the plain ASCII string lob: (external feeds write it literally)") {
    assert(LobAssembly.Marker == "lob:")
    assert(LobAssembly.Marker.forall(c => c >= ' ' && c < 127))
  }

  test("resolve replaces markers, leaves plain values, nulls missing chains") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val events = Seq(page(1, "L1", 0, "abc"), page(2, "L1", 1, "def")).toDS()
    val lobs = LobAssembly.assemble(events.toDF())
    val messages = Seq(
      msg(0L, null, Map("doc" -> (LobAssembly.Marker + "L1"), "id" -> "7")),
      msg(1L, Map("doc" -> (LobAssembly.Marker + "MISSING")), null),
      msg(2L, null, Map("id" -> "8"))).toDS()
    val out = LobAssembly.resolve(messages.toDF(), lobs)
      .orderBy("cIdx").collect()

    val m0 = out(0)
    assert(m0.getAs[Map[String, String]]("after") ==
      Map("doc" -> "abcdef", "id" -> "7"))
    // missing chain (orphaned owner): marker resolves to null value
    val m1before = out(1).getAs[Map[String, String]]("before")
    assert(m1before.keySet == Set("doc") && m1before("doc") == null)
    // no markers: image untouched
    assert(out(2).getAs[Map[String, String]]("after") == Map("id" -> "8"))
  }

  test("orphaned chains (no owning DML) simply never join") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val events = Seq(page(1, "ORPHAN", 0, "zzz")).toDS()
    val lobs = LobAssembly.assemble(events.toDF())
    val messages = Seq(msg(0L, null, Map("id" -> "1"))).toDS()
    val out = LobAssembly.resolve(messages.toDF(), lobs).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Map[String, String]]("after") == Map("id" -> "1"))
  }

  test("charset-seam fuzz: multibyte text split at random page " +
      "boundaries survives assemble-then-decode (r9 verdict ask #8)") {
    // The CLOB contract: pages carry RAW bytes (hex); only the ASSEMBLED
    // byte string is charset-decoded (q139's shape). This property pins
    // it: for random text in each multibyte family, encoded and split at
    // RANDOM byte offsets — including mid-character — the decoded
    // assembly equals the original text. A decode-per-page
    // implementation would corrupt every split that lands inside a
    // character (the CharsetDecodeSpec "LOB seam" case, generalized).
    import spark.implicits._
    val rnd = new scala.util.Random(0xC10B) // deterministic fuzz
    // (charsetId, JVM charset, alphabet to draw text from)
    val families = Seq(
      (832, "Shift_JIS", "あいうえおカキクケコ漢字テスト"),
      (830, "EUC-JP", "あいうえおカキクケコ漢字テスト"),
      (852, "GBK", "你好世界中文测试数据"),
      (854, "GB18030", "你好世界中文测试数据𐐀"), // incl. 4-byte
      (840, "EUC-KR", "가나다라마바사아자차"),
      (865, "Big5", "中文測試資料分頁"),
      (873, "UTF-8", "héllo wörld 漢字 𐐀 mixed"), // AL32UTF8
      (871, "CESU-8", "héllo wörld 漢字 𐐀 cesu")) // Oracle "UTF8"
    for ((id, jvmName, alphabet) <- families; trial <- 0 until 4) {
      // draw CODE POINTS, not chars: the supplementary 𐐀 is a surrogate
      // pair, and char-indexed sampling would emit lone surrogates that
      // can never round-trip through any charset
      val cps = alphabet.codePoints().toArray
      val sb = new java.lang.StringBuilder
      (0 until (5 + rnd.nextInt(40)))
        .foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      val text = sb.toString
      val bytes = text.getBytes(java.nio.charset.Charset.forName(jvmName))
      // random split points: 1..4 pages, boundaries anywhere in the
      // byte string (mid-character splits very likely for CJK)
      val nCuts = rnd.nextInt(4)
      val cuts = (Seq(0, bytes.length) ++
        Seq.fill(nCuts)(rnd.nextInt(bytes.length + 1))).distinct.sorted
      val pages = cuts.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
        page(i + 1L, s"F$id-$trial", i,
          bytes.slice(a, b).map("%02X".format(_)).mkString)
      }.toSeq
      val assembled = LobAssembly.assemble(
          spark.createDataset(pages).toDF())
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      val hex = assembled(s"F$id-$trial")
      val joined = hex.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      assert(java.util.Arrays.equals(joined, bytes),
        s"byte assembly diverged for id $id trial $trial")
      assert(graft.core.OracleCharsets.decode(joined, id) == text,
        s"charset $id ($jvmName) trial $trial: seam corrupted decode " +
          s"(cuts at ${cuts.mkString(",")})")
    }
  }
}
