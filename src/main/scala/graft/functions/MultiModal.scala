package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / frame-sample plumbing.
  *
  * The actual codec calls are STUBBED (`decodeStub`) — this container has no
  * image/audio libraries — but everything Spark-side is real and tested:
  * the schema contract, the `mapPartitions` batch shape (partition-at-a-time
  * iteration so a real decoder amortizes model/codec init per partition, the
  * same shape a Pandas-UDF batch would have in PySpark), partitioning, and
  * the pure-Column metadata/frame-sampling paths.
  *
  * At 100 TB: payload bytes never shuffle — metadata extraction projects
  * narrow columns before any exchange, and frame sampling explodes indices,
  * not frames.
  */
object MultiModal {

  /** Typed metadata extracted per payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Pure-Column metadata extraction over a binary payload: cheap header
    * fields only — no decode, codegen'd, pushdown-friendly. The "format"
    * sniff mirrors magic-byte dispatch; width/height here read the first
    * two payload bytes (a real container header parse slots in the same
    * expressions).
    */
  def withMeta(df: DataFrame, payload: Column): DataFrame = {
    val b = (i: Int) =>
      conv(hex(substring(payload, i, 1)), 16, 10).cast("int")
    df.withColumn("meta", struct(
      octet_length(payload).as("n_bytes"),
      when(b(1) % 2 === 0, "img").otherwise("bin").as("format"),
      (b(1) + lit(1)).as("width"),
      (b(2) + lit(1)).as("height")))
  }

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the payload bytes so tests and the DuckDB oracle can pin
    * it; a real decoder (JNI/libvips/ffmpeg) replaces ONLY this function.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    if (payload == null || payload.isEmpty) (0, 0, 0L)
    else {
      val w = (payload(0) & 0xff) + 1
      val h = (if (payload.length > 1) payload(1) & 0xff else 0) + 1
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      (w, h, sum)
    }
  }

  /** Batched decode / feature-extraction over (id, payload) rows.
    *
    * `mapPartitions` so per-partition setup (codec contexts, feature
    * models) happens once per task, not per row — the Scala analogue of
    * `mapInPandas` batch processing. Output schema is fixed and narrow;
    * payloads are consumed inside the partition and never carried forward.
    */
  /** Decoded-feature row: the narrow output of the batch decode stage. */
  case class Feature(id: Long, width: Int, height: Int, byte_sum: Long)

  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (once per task)
        it.map { case (id, payload) =>
          val (w, h, sum) = decodeStub(payload)
          Feature(id, w, h, sum)
        }
      }
      .toDF()
  }

  /** Frame sampling for video-like payloads: given a frame count and a
    * stride, emit (id, frame_no) rows — `sequence` + `explode`, so the
    * payload itself is read once per sampled frame downstream, never
    * duplicated per frame here.
    */
  def sampleFrames(df: DataFrame, idCol: String, nFramesCol: Column,
      stride: Int): DataFrame =
    df.select(col(idCol), explode(
        when(nFramesCol > 0,
          sequence(lit(0), nFramesCol - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))
      .as("frame_no"))
}
