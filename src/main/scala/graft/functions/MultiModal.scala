package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / frame-sample plumbing.
  *
  * The image path is REAL (r11): `decodeFeatures` decodes PNG/JPEG/BMP/GIF
  * payloads through `javax.imageio` (ships in the JDK — no external
  * libraries) and emits true width/height plus a deterministic pixel sum.
  * The audio path is REAL too (r12): WAV/AIFF/AU parse through
  * `javax.sound.sampled.AudioSystem` (also JDK-shipped) — sample rate,
  * channels, frame count, decoded-PCM byte sum. Only payloads neither
  * stack reads fall back to the deterministic `decodeStub` (the video
  * codec stand-in — ffmpeg-class libs genuinely aren't in the JDK).
  * Everything Spark-side is likewise real: the schema contract, the
  * `mapPartitions` batch shape (partition-at-a-time iteration so codec
  * init amortizes per partition, the same shape a Pandas-UDF batch would
  * have in PySpark), partitioning, and the pure-Column metadata/frame-
  * sampling paths (incl. a real PNG IHDR header parse in codegen'd
  * Columns).
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
    * fields only — no decode, codegen'd, pushdown-friendly. PNG payloads
    * get a REAL container header parse: the 8-byte magic gates the
    * branch, then width/height read big-endian from the IHDR chunk
    * (bytes 17-20 / 21-24 — the PNG spec's fixed first-chunk layout).
    * Other payloads keep the first-two-bytes sniff (a JPEG SOF walk
    * needs sequential chunk scanning — that's [[decodeFeatures]]' job).
    */
  def withMeta(df: DataFrame, payload: Column): DataFrame = {
    val b = (i: Int) =>
      conv(hex(substring(payload, i, 1)), 16, 10).cast("int")
    // the IHDR parse needs 24 bytes (8 magic + 8 chunk header + w/h);
    // a truncated PNG falls back to the sniff branch instead of
    // introducing NULL width/height into an otherwise non-null struct
    val isPng = hex(substring(payload, 1, 8)) === "89504E470D0A1A0A" &&
      octet_length(payload) >= 24
    val be4 = (i: Int) => conv(hex(substring(payload, i, 4)), 16, 10)
      .cast("int")
    df.withColumn("meta", struct(
      octet_length(payload).as("n_bytes"),
      when(isPng, "png")
        .when(b(1) % 2 === 0, "img").otherwise("bin").as("format"),
      when(isPng, be4(17)).otherwise(b(1) + lit(1)).as("width"),
      when(isPng, be4(21)).otherwise(b(2) + lit(1)).as("height")))
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

  /** REAL image decode via the JDK's ImageIO: returns (width, height,
    * pixel sum over every band of every pixel) for any format the JVM
    * reads natively (PNG, JPEG, BMP, GIF, WBMP); None for payloads no
    * reader accepts. The pixel sum is the deterministic "feature" —
    * computing it requires actually inflating the pixel data, so a
    * hash-gated oracle over it proves the codec ran, not just a header
    * peek. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight,
          raster.getNumBands)
        var sum = 0L
        val row = new Array[Int](w * bands)
        var y = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, row)
          var i = 0
          while (i < row.length) { sum += row(i); i += 1 }
          y += 1
        }
        Some((w, h, sum))
      }
    } catch { case _: Exception => None } // corrupt container → fallback
  }

  /** Typed audio metadata + the decoded-stream feature. */
  case class AudioMeta(sampleRate: Int, channels: Int, nFrames: Long,
      pcmSum: Long)

  /** REAL audio decode via the JDK's sampled-sound stack: parses any
    * container `AudioSystem` ships readers for (WAV, AIFF, AU/SND) and
    * returns sample rate, channel count, frame count, and the unsigned
    * byte sum over the DECODED PCM stream — like [[decodeImage]]'s pixel
    * sum, computing it requires actually reading the data chunk, so a
    * hash-gated oracle over it proves the decoder ran, not a header peek.
    * None for payloads no reader accepts (they keep the stub contract). */
  def decodeAudio(payload: Array[Byte]): Option[AudioMeta] = {
    if (payload == null || payload.length < 12) return None
    // container-magic sniff before the parser: RIFF/WAVE, FORM/AIFF-AIFC,
    // or .snd (AU). Without it every non-audio payload pays an exception
    // unwind through AudioSystem — measured 4x on q37's text-bytes feed.
    val m0 = new String(payload, 0, 4, "US-ASCII")
    val m8 = new String(payload, 8, 4, "US-ASCII")
    val looksAudio = (m0 == "RIFF" && m8 == "WAVE") ||
      (m0 == "FORM" && (m8 == "AIFF" || m8 == "AIFC")) ||
      m0 == ".snd"
    if (!looksAudio) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        var sum = 0L
        var read = 0L
        val buf = new Array[Byte](8192)
        var r = ais.read(buf)
        while (r > 0) {
          var i = 0
          while (i < r) { sum += buf(i) & 0xff; i += 1 }
          read += r
          r = ais.read(buf)
        }
        val frames =
          if (ais.getFrameLength >= 0) ais.getFrameLength
          else if (fmt.getFrameSize > 0) read / fmt.getFrameSize
          else 0L
        Some(AudioMeta(fmt.getSampleRate.toInt, fmt.getChannels, frames, sum))
      } finally ais.close()
    } catch { case _: Exception => None } // not audio → fallback
  }

  /** Deterministic WAV fixture encoder (JDK AudioSystem writer): mono
    * signed 16-bit little-endian PCM at `sampleRate`. Each sample is
    * stored as its two's-complement LE byte pair, so the decoded-stream
    * byte sum of sample list u (unsigned 16-bit values) is
    * Σ (u%256 + u/256) — arithmetically restatable by an oracle. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic PNG fixture encoder (JDK ImageIO writer): a width ×
    * height truecolor image with every pixel at gray level `gray`. Used
    * by the gated decode query and specs to manufacture REAL compressed
    * PNG payloads whose decoded features are arithmetically predictable:
    * pixel sum = width · height · 3 · gray. */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-pixel-pattern PNG fixture encoder (the q200/q201 dHash gate
    * input): gray(y, x) = ((id+7)(y+3)(x+5) + id·31 + (id div 256)·
    * (y·11 + x·17 + 1)) mod 256 — every pixel a known pure function of
    * (id, y, x), losslessly round-tripped by PNG, so the perceptual hash
    * of the DECODED image is restatable arithmetically by a SQL oracle.
    * The multiplicative mix + the high-order (id div 256) term give the
    * corpus near-unique fingerprints (4943 distinct over 5000 ids) — a
    * purely linear ramp collapses to ≤256 classes (any pattern of
    * id mod 256 alone must) and made the near-dup join quadratic. */
  def encodePngPattern(width: Int, height: Int, id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = (((id + 7) * (y + 3) * (x + 5) + id * 31 +
          (id / 256) * (y * 11 + x * 17 + 1)) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference-hash (dHash) — the standard perceptual fingerprint for
    * image near-dup dedup: sample the image on a 9×8 grid, compare each
    * horizontally adjacent pair, pack the 64 booleans into 8 row bytes
    * (bit x of row y = lum(y,x) < lum(y,x+1)). Near-dup images differ in
    * a few bits → hamming-threshold pairing downstream is exactly the
    * q27/q59 SimHash band-join shape.
    *
    * Determinism over convenience, deliberately: sampling is integer
    * nearest-neighbor (sx = x·w div 9, sy = y·h div 8) and luminance is
    * the integer ITU weighting (299r + 587g + 114b) div 1000 — no
    * Graphics2D rescale, whose interpolation is JDK-version-dependent
    * and would make the fingerprint non-portable between executors on
    * mixed-JDK clusters (the engine-wide bit-determinism discipline).
    * Exactly scale-invariant for block-replicated upscales (spec-pinned).
    */
  def dHash(img: java.awt.image.BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    def lum(sx: Int, sy: Int): Int = {
      val rgb = img.getRGB(sx, sy)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    Array.tabulate(8) { y =>
      val sy = y * h / 8
      var byte = 0
      var x = 0
      while (x < 8) {
        if (lum(x * w / 9, sy) < lum((x + 1) * w / 9, sy)) byte |= 1 << x
        x += 1
      }
      byte
    }
  }

  /** dHash as a 16-hex-char string (row 0 first) — the join/display key. */
  def dHashHex(img: java.awt.image.BufferedImage): String =
    dHash(img).map(b => f"$b%02x").mkString

  /** Typed perceptual-hash row (the dedup twin of [[Feature]]). */
  case class DHashFeature(id: Long, width: Int, height: Int,
      dhash: String, n_bits: Long)

  /** Batched perceptual hashing over (id, payload) rows: decode +
    * 9×8 sample + pack, one mapPartitions pass (zero exchange, payload
    * bytes never shuffle); non-image payloads yield a null hash rather
    * than poisoning the batch. */
  def dhashFeatures(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
            catch { case _: java.io.IOException => None }
          img match {
            case Some(i) =>
              val rows = dHash(i)
              DHashFeature(id, i.getWidth, i.getHeight,
                rows.map(b => f"$b%02x").mkString,
                rows.map(Integer.bitCount(_).toLong).sum)
            case None => DHashFeature(id, 0, 0, null, 0L)
          }
        }
      }
      .toDF()
  }

  /** Deterministic MP4 container fixture encoder: a REAL ISO-BMFF atom
    * layout — `ftyp` (major brand), a variable-length `free` atom
    * (`padLen` filler bytes, so `moov`'s byte offset differs per
    * payload and a parser can only find it by WALKING atom sizes), and
    * a `moov` container holding a full 108-byte version-0 `mvhd`
    * (timescale, duration) plus `nTracks` empty `trak` atoms. Sizes and
    * fields are big-endian per the spec (ISO/IEC 14496-12 §4.2/§8.2.2).
    * No codec anywhere — the container METADATA is the deliverable, the
    * exact video analogue of the PNG-IHDR move. */
  def encodeMp4(brand: String, timescale: Int, duration: Int,
      nTracks: Int, padLen: Int): Array[Byte] = {
    val moovSz = 8 + 108 + nTracks * 8
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + padLen + moovSz)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"), 0, 4)
    // ftyp: header + major_brand + minor_version
    buf.putInt(16); fourcc("ftyp"); fourcc(brand); buf.putInt(0)
    // free: id-dependent filler, so moov's offset varies per payload
    buf.putInt(8 + padLen); fourcc("free")
    var i = 0
    while (i < padLen) { buf.put(((i * 31 + padLen) & 0xff).toByte); i += 1 }
    // moov [ mvhd v0 (108 B) + nTracks empty trak ]
    buf.putInt(moovSz); fourcc("moov")
    buf.putInt(108); fourcc("mvhd")
    buf.putInt(0)              // version 0 + flags
    buf.putInt(0); buf.putInt(0) // creation/modification time
    buf.putInt(timescale); buf.putInt(duration)
    buf.putInt(0x00010000)     // rate 1.0
    buf.putShort(0x0100.toShort) // volume 1.0
    buf.put(new Array[Byte](10)) // reserved
    // unity matrix
    buf.putInt(0x00010000); buf.putInt(0); buf.putInt(0)
    buf.putInt(0); buf.putInt(0x00010000); buf.putInt(0)
    buf.putInt(0); buf.putInt(0); buf.putInt(0x40000000)
    buf.put(new Array[Byte](24)) // pre_defined
    buf.putInt(nTracks + 1)    // next_track_ID
    var t = 0
    while (t < nTracks) { buf.putInt(8); fourcc("trak"); t += 1 }
    buf.array()
  }

  /** Pure-Column MP4/ISO-BMFF container-metadata parse: walks the
    * top-level atom chain (size-prefixed, big-endian) to find `ftyp`'s
    * major brand and the `moov` atom wherever padding atoms put it, then
    * walks `moov`'s children for the version-0 `mvhd` timescale/duration
    * and the `trak` count. Entirely codegen-friendly Column arithmetic
    * (bounded `aggregate` folds over substr/conv reads — the PNG-IHDR
    * discipline extended to a chained walk), no codec, payload bytes
    * never shuffle. Atom counts are bounded (`maxAtoms` top-level /
    * 2·maxAtoms children); malformed sizes (< 8) stop the walk with
    * whatever parsed so far; non-MP4 payloads yield ("", 0, 0, 0).
    * Returns struct(brand, timescale, duration, n_tracks). */
  def mp4Meta(payload: Column, maxAtoms: Int = 8): Column = {
    val len = octet_length(payload).cast("long")
    // a read past a truncated payload yields an empty substring → NULL
    // from conv; degrade to 0 so the walk (and the output struct's
    // non-null contract) survives malformed containers
    def be4(pos: Column): Column = coalesce(
      conv(hex(payload.substr(pos.cast("int"), lit(4))), 16, 10)
        .cast("long"), lit(0L))
    def fourcc(pos: Column): Column =
      payload.substr(pos.cast("int"), lit(4)).cast("string")
    // top-level walk (1-based offsets): find ftyp brand + moov extent
    val top = aggregate(sequence(lit(1), lit(maxAtoms)),
      struct(lit(1L).as("off"), lit("").as("brand"),
        lit(0L).as("m_off"), lit(0L).as("m_sz")),
      (st, _) => {
        val off = st.getField("off")
        val sz = be4(off)
        val typ = fourcc(off + 4)
        when(off + 8 > len + 1, st)       // past the end: done
          .when(sz < 8, st.withField("off", len + 1)) // malformed: stop
          .otherwise(struct(
            (off + sz).as("off"),
            when(typ === "ftyp", fourcc(off + 8))
              .otherwise(st.getField("brand")).as("brand"),
            when(typ === "moov", off)
              .otherwise(st.getField("m_off")).as("m_off"),
            when(typ === "moov", sz)
              .otherwise(st.getField("m_sz")).as("m_sz")))
      })
    // moov-children walk: mvhd v0 fields + trak count. mvhd v0 layout:
    // content = version/flags(4) ctime(4) mtime(4) timescale(4)
    // duration(4), so timescale sits at atom_off+20, duration +24.
    val mEnd = top.getField("m_off") + top.getField("m_sz")
    val kids = aggregate(sequence(lit(1), lit(2 * maxAtoms)),
      struct((top.getField("m_off") + 8).as("off"), lit(0L).as("ts"),
        lit(0L).as("dur"), lit(0L).as("trak")),
      (st, _) => {
        val off = st.getField("off")
        val sz = be4(off)
        val typ = fourcc(off + 4)
        when(top.getField("m_off") === 0L || off + 8 > mEnd ||
            off + 8 > len + 1, st)
          .when(sz < 8, st.withField("off", len + 1))
          .otherwise(struct(
            (off + sz).as("off"),
            when(typ === "mvhd", be4(off + 20))
              .otherwise(st.getField("ts")).as("ts"),
            when(typ === "mvhd", be4(off + 24))
              .otherwise(st.getField("dur")).as("dur"),
            (st.getField("trak") +
              when(typ === "trak", 1L).otherwise(0L)).as("trak")))
      })
    // only a payload that at least carries ftyp reports a brand; the
    // empty-brand fallback keeps non-MP4 payloads at ("", 0, 0, 0)
    when(len >= 16,
      struct(top.getField("brand").as("brand"),
        kids.getField("ts").as("timescale"),
        kids.getField("dur").as("duration"),
        kids.getField("trak").as("n_tracks")))
      .otherwise(struct(lit("").as("brand"), lit(0L).as("timescale"),
        lit(0L).as("duration"), lit(0L).as("n_tracks")))
  }

  /** Batched decode / feature-extraction over (id, payload) rows.
    *
    * `mapPartitions` so per-partition setup (codec contexts, feature
    * models) happens once per task, not per row — the Scala analogue of
    * `mapInPandas` batch processing. Output schema is fixed and narrow;
    * payloads are consumed inside the partition and never carried forward.
    *
    * Image payloads decode for REAL (ImageIO; width/height/pixel-sum) and
    * audio payloads too (AudioSystem — WAV/AIFF/AU; the generic Feature
    * slots carry channels/sample-rate/PCM-sum; [[decodeAudioFeatures]]
    * keeps the full typed audio schema incl. frame count); only payloads
    * NEITHER stack reads (video stand-ins, plain binaries) fall back to
    * [[decodeStub]]'s deterministic features.
    */
  /** Decoded-feature row: the narrow output of the batch decode stage. */
  case class Feature(id: Long, width: Int, height: Int, byte_sum: Long)

  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init (once per task): ImageIO's disk
        // cache would add tmp-file I/O per payload — keep it in memory
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some((w, h, pixelSum)) => Feature(id, w, h, pixelSum)
            case None => decodeAudio(payload) match {
              case Some(a) => Feature(id, a.channels, a.sampleRate, a.pcmSum)
              case None =>
                val (w, h, sum) = decodeStub(payload)
                Feature(id, w, h, sum)
            }
          }
        }
      }
      .toDF()
  }

  /** Energy-delta audio fingerprint — the audio twin of [[dHash]] for
    * near-dup dedup: decode to signed 16-bit PCM, split into windows of
    * 4 samples (partial tail dropped), window energy = Σ s² as exact
    * longs, bit w = (e_w < e_{w+1}), packed 8 bits/byte into a hex
    * string. Re-encoded/resampled-but-same-content clips keep most bits
    * (energy envelope is codec-robust); all arithmetic is integer so the
    * fingerprint is bit-deterministic across executors and restatable by
    * a SQL oracle. Returns (n_samples, n_windows, fp) or None for
    * non-audio payloads. */
  def audioFingerprint(payload: Array[Byte]): Option[(Long, Long, String)] = {
    if (payload == null || payload.length < 12) return None
    val m0 = new String(payload, 0, 4, "US-ASCII")
    val m8 = new String(payload, 8, 4, "US-ASCII")
    val looksAudio = (m0 == "RIFF" && m8 == "WAVE") ||
      (m0 == "FORM" && (m8 == "AIFF" || m8 == "AIFC")) || m0 == ".snd"
    if (!looksAudio) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
          return None
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var r = ais.read(buf)
        while (r > 0) { bos.write(buf, 0, r); r = ais.read(buf) }
        val bytes = bos.toByteArray
        val n = bytes.length / 2
        val bigEndian = fmt.isBigEndian
        def sample(k: Int): Int = {
          val (lo, hi) = if (bigEndian) (bytes(2 * k + 1), bytes(2 * k))
                         else (bytes(2 * k), bytes(2 * k + 1))
          ((hi << 8) | (lo & 0xff)).toShort.toInt
        }
        val nw = n / 4
        val energies = Array.tabulate(nw) { w =>
          var e = 0L
          var j = 0
          while (j < 4) {
            val s = sample(4 * w + j).toLong; e += s * s; j += 1
          }
          e
        }
        val nBits = math.max(nw - 1, 0)
        val bytesOut = new Array[Int]((nBits + 7) / 8)
        var w = 0
        while (w < nBits) {
          if (energies(w) < energies(w + 1)) bytesOut(w / 8) |= 1 << (w % 8)
          w += 1
        }
        Some((n.toLong, nw.toLong, bytesOut.map(b => f"$b%02x").mkString))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Typed audio-fingerprint row. */
  case class AudioPrint(id: Long, n_samples: Long, n_windows: Long,
      fp: String)

  /** Batched audio fingerprinting over (id, payload) rows — one
    * mapPartitions pass, zero exchange, payloads never shuffle;
    * non-audio payloads yield a null fingerprint. */
  def audioPrintFeatures(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        audioFingerprint(payload) match {
          case Some((n, nw, fp)) => AudioPrint(id, n, nw, fp)
          case None => AudioPrint(id, 0L, 0L, null)
        }
      })
      .toDF()
  }

  /** Typed audio-feature row (the audio twin of [[Feature]]). */
  case class AudioFeature(id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, pcm_sum: Long)

  /** Batched audio decode over (id, payload) rows: the full typed audio
    * schema ([[AudioMeta]] per payload; unreadable payloads decode as
    * all-zero rows so the batch stays total). Same scale shape as
    * [[decodeFeatures]]: mapPartitions, narrow output, payload bytes
    * never shuffle. */
  def decodeAudioFeatures(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeAudio(payload) match {
            case Some(a) =>
              AudioFeature(id, a.sampleRate, a.channels, a.nFrames, a.pcmSum)
            case None => AudioFeature(id, 0, 0, 0L, 0L)
          }
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
