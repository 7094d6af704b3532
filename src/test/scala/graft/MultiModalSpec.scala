package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.MultiModal

/** Multimodal binary-column plumbing: metadata extraction, batched stub
  * decode (mapPartitions shape), frame sampling. */
class MultiModalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("mm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("withMeta extracts typed header fields without decoding") {
    import spark.implicits._
    val df = Seq((1L, "ABC"), (2L, "0z")).toDF("id", "txt")
      .withColumn("payload", col("txt").cast("binary"))
    val out = MultiModal.withMeta(df, col("payload"))
      .select("id", "meta.n_bytes", "meta.format", "meta.width", "meta.height")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getInt(3), r.getInt(4)))).toMap
    // 'A' = 0x41 odd → bin; width/height = first two bytes + 1
    assert(out(1L) == ((3, "bin", 66, 67)))
    // '0' = 0x30 even → img
    assert(out(2L) == ((2, "img", 49, 123)))
  }

  test("decodeStub is a pure function of bytes") {
    assert(MultiModal.decodeStub("AB".getBytes) == (66, 67, 131L))
    assert(MultiModal.decodeStub(Array.emptyByteArray) == (0, 0, 0L))
    assert(MultiModal.decodeStub(null) == (0, 0, 0L))
    assert(MultiModal.decodeStub("A".getBytes) == (66, 1, 65L))
  }

  test("decodeFeatures runs the batch shape end-to-end") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val df = Seq((1L, "AB"), (2L, ""), (3L, "zzz")).toDF("id", "txt")
      .withColumn("payload", col("txt").cast("binary"))
    val out = MultiModal.decodeFeatures(df, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out(1L) == ((66, 67, 131L)))
    assert(out(2L) == ((0, 0, 0L)))
    assert(out(3L) == ((123, 123, 366L)))
  }

  test("decodeImage decodes a REAL PNG: true dims + pixel sum require " +
      "inflating the pixel data, not a header peek") {
    val png = MultiModal.encodePng(width = 5, height = 3, gray = 100)
    // a real compressed container: PNG magic + IHDR
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    assert(MultiModal.decodeImage(png).contains((5, 3, 5L * 3 * 3 * 100)))
    // junk bytes are not an image → None (decodeFeatures falls back)
    assert(MultiModal.decodeImage("not an image".getBytes).isEmpty)
    assert(MultiModal.decodeImage(null).isEmpty)
    // a truncated PNG (corrupt container) must not throw
    assert(MultiModal.decodeImage(png.take(20)).isEmpty)
  }

  test("decodeFeatures uses the real codec for images, the stub for " +
      "everything else — in one partition pass") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val png = MultiModal.encodePng(4, 2, 10)
    val df = Seq((1L, png), (2L, "AB".getBytes)).toDF("id", "payload")
    val out = MultiModal.decodeFeatures(df, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4, 2, 4L * 2 * 3 * 10))) // real decode
    assert(out(2L) == ((66, 67, 131L))) // stub fallback
  }

  test("withMeta parses the real PNG IHDR header in pure Columns") {
    import spark.implicits._
    val png = MultiModal.encodePng(300, 7, 1) // width > 255: multi-byte BE
    val df = Seq((1L, png)).toDF("id", "payload")
    val out = MultiModal.withMeta(df, col("payload"))
      .select("meta.format", "meta.width", "meta.height").head()
    assert(out.getString(0) == "png")
    assert(out.getInt(1) == 300 && out.getInt(2) == 7)
    // a truncated PNG (magic only) falls back to the sniff branch —
    // meta fields stay NON-NULL
    val trunc = Seq((1L, png.take(10))).toDF("id", "payload")
    val t = MultiModal.withMeta(trunc, col("payload"))
      .select("meta.format", "meta.width", "meta.height").head()
    assert(!t.isNullAt(1) && !t.isNullAt(2))
    assert(t.getString(0) != "png")
  }

  test("sampleFrames explodes strided indices, empty for zero frames") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 0), (3L, 1)).toDF("id", "n_frames")
    val out = MultiModal.sampleFrames(df, "id", col("n_frames"), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((1L, 0), (1L, 2), (1L, 4), (3L, 0)))
  }
}
