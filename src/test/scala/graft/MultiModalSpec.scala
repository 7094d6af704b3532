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

  test("sampleFrames explodes strided indices, empty for zero frames") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 0), (3L, 1)).toDF("id", "n_frames")
    val out = MultiModal.sampleFrames(df, "id", col("n_frames"), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((1L, 0), (1L, 2), (1L, 4), (3L, 0)))
  }
}
