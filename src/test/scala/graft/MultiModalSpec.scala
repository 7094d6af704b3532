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

  test("decodeAudio decodes a REAL WAV: rate/channels/frames + PCM byte " +
      "sum require reading the data chunk") {
    // samples chosen so the byte sum differs from any header arithmetic:
    // u = {0x0102, 0x8000, 0xFFFF} → bytes 2+1, 0+128, 255+255
    val samples = Array[Short](0x0102.toShort, 0x8000.toShort, 0xffff.toShort)
    val wav = MultiModal.encodeWav(11025, samples)
    // real RIFF/WAVE container
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val a = MultiModal.decodeAudio(wav).get
    assert(a.sampleRate == 11025 && a.channels == 1 && a.nFrames == 3L)
    assert(a.pcmSum == (2 + 1) + (0 + 128) + (255 + 255))
    // ImageIO must NOT claim it; non-audio bytes must not decode
    assert(MultiModal.decodeImage(wav).isEmpty)
    assert(MultiModal.decodeAudio("FORM but not an AIFF".getBytes).isEmpty)
    assert(MultiModal.decodeAudio(MultiModal.encodePng(2, 2, 7)).isEmpty)
  }

  test("decodeAudio reads AIFF and AU containers too (big-endian paths)") {
    // same PCM, three JDK-writable containers: WAVE is LE, AIFF/AU are BE
    // with different headers — frames and rate must agree across all three
    val samples = Array[Short](1000, -2000, 3000, -4000)
    val fmtBE = new javax.sound.sampled.AudioFormat(22050f, 16, 1, true, true)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = ((s >> 8) & 0xff).toByte
      data(2 * i + 1) = (s & 0xff).toByte
    }
    Seq(javax.sound.sampled.AudioFileFormat.Type.AIFF,
      javax.sound.sampled.AudioFileFormat.Type.AU).foreach { typ =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmtBE, samples.length.toLong),
        typ, bos)
      val a = MultiModal.decodeAudio(bos.toByteArray)
        .getOrElse(fail(s"$typ did not decode"))
      assert(a.sampleRate == 22050 && a.channels == 1 && a.nFrames == 4L,
        s"$typ header fields")
      // the decoded stream is the stored PCM — byte sum over the BE pairs
      assert(a.pcmSum == data.map(_ & 0xff).sum.toLong, s"$typ pcm sum")
    }
  }

  test("decodeFeatures routes audio payloads through the real decoder, " +
      "stub only for unknown payloads") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val wav = MultiModal.encodeWav(8000, Array[Short](100, 200))
    val junk = Array[Byte](9, 4, 77)
    val df = Seq((1L, wav), (2L, junk)).toDF("id", "payload")
    val out = MultiModal.decodeFeatures(df, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    // audio row: (channels, sample_rate, pcm byte sum)
    assert(out(1L) == ((1, 8000, (100 + 0) + (200 + 0))))
    // junk keeps the stub contract
    val (w, h, sum) = MultiModal.decodeStub(junk)
    assert(out(2L) == ((w, h, sum)))
  }

  test("decodeAudioFeatures keeps the full typed schema; unreadable rows " +
      "are all-zero") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val wav = MultiModal.encodeWav(16000, Array.tabulate(5)(i => i.toShort))
    val df = Seq((7L, wav), (8L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
    val out = MultiModal.decodeAudioFeatures(df, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(7L) == ((16000, 1, 5L, 0 + 1 + 2 + 3 + 4)))
    assert(out(8L) == ((0, 0, 0L, 0L)))
  }

  test("mp4Meta walks atoms wherever padding puts moov; malformed and " +
      "non-MP4 payloads degrade cleanly") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.functions.col
    val a = MultiModal.encodeMp4("isom", 600, 1234, 2, 0)    // no padding
    val b = MultiModal.encodeMp4("mp42", 90000, 7, 3, 31)    // moov shifted
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    // truncated: cut b mid-moov — brand still parses, children walk stops
    val trunc = b.take(16 + 8 + 31 + 8 + 20)
    // malformed: a valid ftyp then an atom with size 3 (< header) — the
    // walk must stop instead of looping or reading off the end
    val bad = a.take(16) ++ Array[Byte](0, 0, 0, 3, 'f', 'r', 'e', 'e')
    val out = Seq((1L, a), (2L, b), (3L, junk), (4L, trunc), (5L, bad))
      .toDF("id", "payload")
      .select(col("id"), MultiModal.mp4Meta(col("payload")).as("m"))
      .select(col("id"), col("m.brand"), col("m.timescale"),
        col("m.duration"), col("m.n_tracks"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("isom", 600L, 1234L, 2L)))
    assert(out(2L) == (("mp42", 90000L, 7L, 3L)))
    assert(out(3L) == (("", 0L, 0L, 0L)))
    assert(out(4L)._1 == "mp42")
    assert(out(5L) == (("isom", 0L, 0L, 0L)))
  }

  test("dHash: hand-computed tiny case, block-upscale invariance, and " +
    "near-dup locality") {
    import java.awt.image.BufferedImage
    // 9x8 two-tone: left half dark, right half bright -> within a row the
    // only rising comparison is the one crossing the boundary (x=3:
    // sample cols 3 vs 4), every other pair is flat (not strictly less)
    def twoTone(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w * 4 / 9) 0x202020 else 0xd0d0d0)
      img
    }
    assert(MultiModal.dHashHex(twoTone(9, 8)) == "08" * 8) // bit 3 per row
    // exact invariance under block-replicated upscales (nearest-neighbor
    // integer sampling hits the same source pixels)
    assert(MultiModal.dHashHex(twoTone(18, 16)) ==
      MultiModal.dHashHex(twoTone(9, 8)))
    assert(MultiModal.dHashHex(twoTone(36, 32)) ==
      MultiModal.dHashHex(twoTone(9, 8)))
    // near-dup locality: flipping one sampled pixel changes few bits
    val a = twoTone(9, 8)
    val b = twoTone(9, 8)
    b.setRGB(7, 3, 0x101010) // one bright pixel darkened
    val ha = MultiModal.dHash(a)
    val hb = MultiModal.dHash(b)
    val hamming = ha.zip(hb).map { case (x, y) =>
      Integer.bitCount(x ^ y) }.sum
    assert(hamming >= 1 && hamming <= 2, s"hamming $hamming")
  }

  test("dhashFeatures: real PNG round trip matches the in-memory hash; " +
    "non-image payloads yield null, not a crash") {
    implicit val s = spark
    import spark.implicits._
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      MultiModal.encodePngPattern(9, 8, 42L)))
    val expected = MultiModal.dHashHex(img)
    val rows = Seq(
      (42L, MultiModal.encodePngPattern(9, 8, 42L)),
      (7L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = MultiModal.dhashFeatures(rows, "id", "payload")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("dhash"))).toMap
    assert(out(42L).contains(expected))
    assert(out(7L).isEmpty)
  }

  test("audioFingerprint: hand-computed energies, rate-invariance, and " +
    "non-audio null") {
    // 8 samples -> 2 windows -> 1 bit: energies 4*(100^2) vs 4*(200^2),
    // rising -> bit 0 set -> fp "01"
    val rising = Array[Short](100, 100, 100, 100, 200, 200, 200, 200)
    val Some((n1, w1, fp1)) =
      MultiModal.audioFingerprint(MultiModal.encodeWav(8000, rising))
    assert(n1 == 8L && w1 == 2L && fp1 == "01")
    // falling -> bit clear
    val Some((_, _, fp2)) =
      MultiModal.audioFingerprint(MultiModal.encodeWav(8000, rising.reverse))
    assert(fp2 == "00")
    // the fingerprint hears CONTENT, not container settings: the same
    // samples at a different rate produce the identical fp
    val Some((_, _, fp3)) =
      MultiModal.audioFingerprint(MultiModal.encodeWav(44100, rising))
    assert(fp3 == fp1)
    // partial tail window is dropped: 11 samples -> 2 windows
    val Some((n4, w4, _)) = MultiModal.audioFingerprint(
      MultiModal.encodeWav(8000, Array.tabulate[Short](11)(i => i.toShort)))
    assert(n4 == 11L && w4 == 2L)
    assert(MultiModal.audioFingerprint("not audio at all".getBytes).isEmpty)
  }
}
