package graft.core

/** Pure codec functions for the engine-internal scalar types of the
  * reference (SURVEY.md §1.3): RowId, Xid, Oracle NUMBER, Oracle DATE.
  *
  * All are side-effect-free and total over their documented domains so they
  * can be registered as deterministic Spark UDFs (and promoted to codegen'd
  * Catalyst expressions if they show up hot in profiles).
  *
  * Reference semantics (not code): RowId text form
  * `src/common/types/RowId.h:25-110`; Xid formats `src/common/types/Xid.h`;
  * NUMBER decode `src/builder/Builder.h:422-540`; DATE decode
  * `src/common/types/Data.cpp` (excess-100 7/11-byte encoding).
  */
object OracleCodecs {

  /** Oracle's rowid base-64 alphabet (A-Za-z0-9+/ — NOT RFC 4648 order-compatible
    * with padding; 18 chars: 6 dataObj, 3 afn, 6 block, 3 slot). */
  private val B64 =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
  private val B64Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    B64.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  private def encB64(value: Long, chars: Int): String = {
    val sb = new StringBuilder
    var i = chars - 1
    while (i >= 0) {
      sb.append(B64(((value >> (i * 6)) & 0x3f).toInt))
      i -= 1
    }
    sb.toString
  }

  private def decB64(s: String): Long = {
    var v = 0L
    var i = 0
    while (i < s.length) {
      val d = if (s(i) < 128) B64Rev(s(i).toInt) else -1
      require(d >= 0, s"invalid rowid char '${s(i)}'")
      v = (v << 6) | d
      i += 1
    }
    v
  }

  /** Encode (dataObj, dba, slot) → 18-char rowid text. The absolute file
    * number is the top 10 bits of the dba; block is the low 22. */
  def rowIdEncode(dataObj: Long, dba: Long, slot: Int): String = {
    val afn = (dba >> 22) & 0x3ff
    val block = dba & 0x3fffff
    encB64(dataObj & 0xffffffffL, 6) + encB64(afn, 3) +
      encB64(block, 6) + encB64(slot.toLong & 0xffff, 3)
  }

  /** Decode 18-char rowid text → (dataObj, dba, slot). */
  def rowIdDecode(rid: String): (Long, Long, Int) = {
    require(rid.length == 18, s"rowid must be 18 chars, got ${rid.length}")
    val dataObj = decB64(rid.substring(0, 6))
    val afn = decB64(rid.substring(6, 9))
    val block = decB64(rid.substring(9, 15))
    val slot = decB64(rid.substring(15, 18)).toInt
    (dataObj, (afn << 22) | block, slot)
  }

  /** Xid = (usn, slt, sqn) packed into 64 bits: usn(16) slt(16) sqn(32). */
  def xidPack(usn: Int, slt: Int, sqn: Long): Long =
    ((usn.toLong & 0xffff) << 48) | ((slt.toLong & 0xffff) << 32) |
      (sqn & 0xffffffffL)

  def xidUsn(xid: Long): Int = ((xid >> 48) & 0xffff).toInt
  def xidSlt(xid: Long): Int = ((xid >> 32) & 0xffff).toInt
  def xidSqn(xid: Long): Long = xid & 0xffffffffL

  /** Default text form `0xusn.slt.sqn` (hex, widths 4/3/8). */
  def xidFormat(xid: Long): String =
    f"0x${xidUsn(xid)}%04x.${xidSlt(xid)}%03x.${xidSqn(xid)}%08x"

  def xidParse(s: String): Long = {
    val body = if (s.startsWith("0x")) s.substring(2) else s
    val parts = body.split('.')
    require(parts.length == 3, s"xid must be usn.slt.sqn, got '$s'")
    xidPack(Integer.parseInt(parts(0), 16), Integer.parseInt(parts(1), 16),
      java.lang.Long.parseLong(parts(2), 16))
  }

  /** XID_FORMAT::TEXT_DEC (BuilderJson.h:308-316): `usn.slt.sqn` decimal,
    * unpadded. (XID_FORMAT::NUMERIC is just the packed u64 itself.) */
  def xidFormatDec(xid: Long): String =
    s"${xidUsn(xid)}.${xidSlt(xid)}.${xidSqn(xid)}"

  /** XID_FORMAT::TEXT_REVERSED (BuilderJson.h:630-650): 16 hex chars — the
    * little-endian memory dump of each packed field, i.e. bytes of the
    * big-endian value in order b6 b7 b4 b5 b0 b1 b2 b3 (usn and slt as
    * 16-bit LE, sqn as 32-bit LE). */
  def xidFormatReversed(xid: Long): String = {
    val order = Array(6, 7, 4, 5, 0, 1, 2, 3)
    val sb = new StringBuilder(16)
    order.foreach(i => sb.append(f"${(xid >>> (8 * i)) & 0xffL}%02x"))
    sb.toString
  }

  /** INTERVAL_DTS_FORMAT::ISO8601_{SPACE,COMMA,DASH} (Builder.cpp:486-530):
    * `[-]D<sep>HH:MM:SS.fffffffff` — unpadded days, 2-digit h/m/s, exactly
    * 9 fraction digits. */
  def intervalDsString(nanos: Long, sep: Char = ' '): String = {
    val sign = if (nanos < 0) "-" else ""
    val a = math.abs(nanos)
    val frac = a % 1000000000L
    val s = a / 1000000000L
    f"$sign${s / 86400}%d$sep${s / 3600 % 24}%02d:${s / 60 % 60}%02d:${s % 60}%02d.$frac%09d"
  }

  /** INTERVAL_DTS_FORMAT::UNIX_{MICRO,MILLI,UNIX} round half-up on the
    * magnitude (Builder.cpp:538-546 adds 500/500000/500000000 before the
    * divide; the sign is carried separately). */
  def intervalDsUnix(nanos: Long, unitNanos: Long): Long = {
    val sign = if (nanos < 0) -1L else 1L
    sign * ((math.abs(nanos) + unitNanos / 2) / unitNanos)
  }

  /** INTERVAL_YTM_FORMAT::STRING_YM_{SPACE,COMMA,DASH} (Builder.cpp:
    * 400-428): `[-]Y<sep>M`, both unpadded (month is 0-11). */
  def intervalYmString(months: Long, sep: Char = ' '): String = {
    val sign = if (months < 0) "-" else ""
    val a = math.abs(months)
    s"$sign${a / 12}$sep${a % 12}"
  }

  /** Decode Oracle NUMBER bytes → canonical decimal string (exact; may
    * exceed Decimal(38), which is why the wire form stays a string).
    *
    * Format: byte0 = sign/exponent; positive numbers store exponent+193 and
    * digits as base-100 values +1; negatives store the complement and digits
    * as 101-value, with a 0x66 terminator when fewer than 21 bytes.
    */
  def numberToString(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return null
    val b0 = bytes(0) & 0xff
    if (bytes.length == 1 && b0 == 0x80) return "0"
    // -1e126 sentinel: 0x00 followed by nothing meaningful
    val positive = (b0 & 0x80) != 0
    if (positive) {
      val exp = (b0 & 0x7f) - 65 // power of 100 of the first mantissa digit
      val digits = bytes.drop(1).map(b => (b & 0xff) - 1)
      formatBase100(digits, exp, negative = false)
    } else {
      val exp = ((~b0) & 0x7f) - 65
      val raw = bytes.drop(1)
      val mantissa =
        if (raw.nonEmpty && (raw.last & 0xff) == 0x66) raw.dropRight(1) else raw
      val digits = mantissa.map(b => 101 - (b & 0xff))
      formatBase100(digits, exp, negative = true)
    }
  }

  /** Render base-100 mantissa digits with a base-100 exponent. */
  private def formatBase100(digits: Array[Int], exp: Int, negative: Boolean): String = {
    if (digits.isEmpty) return "0"
    val sb = new StringBuilder
    if (negative) sb.append('-')
    if (exp >= 0) {
      val intDigits = (0 to exp).map(i => if (i < digits.length) digits(i) else 0)
      val fracDigits = digits.drop(exp + 1)
      sb.append(intDigits.head.toString)
      intDigits.tail.foreach(d => sb.append(f"$d%02d"))
      if (fracDigits.nonEmpty) {
        sb.append('.')
        fracDigits.foreach(d => sb.append(f"$d%02d"))
      }
      trimFraction(sb)
    } else {
      sb.append("0.")
      var i = 0
      while (i < -exp - 1) { sb.append("00"); i += 1 }
      digits.foreach(d => sb.append(f"$d%02d"))
      trimFraction(sb)
    }
    sb.toString
  }

  private def trimFraction(sb: StringBuilder): Unit = {
    if (sb.indexOf(".") >= 0) {
      while (sb.nonEmpty && sb.last == '0') sb.setLength(sb.length - 1)
      if (sb.nonEmpty && sb.last == '.') sb.setLength(sb.length - 1)
    }
  }

  /** Encode a decimal string to Oracle NUMBER bytes (inverse of
    * [[numberToString]]; used by fixtures/property tests). */
  def stringToNumber(s: String): Array[Byte] = {
    if (s == null) return null
    val neg = s.startsWith("-")
    val body = if (neg) s.substring(1) else s
    val (intPartRaw, fracPartRaw) = body.span(_ != '.')
    val intPart = intPartRaw.dropWhile(_ == '0')
    val fracPart = fracPartRaw.drop(1).reverse.dropWhile(_ == '0').reverse
    if (intPart.isEmpty && fracPart.isEmpty) return Array(0x80.toByte)
    // align to base-100 digit pairs around the decimal point
    val intPadded = if (intPart.length % 2 == 1) "0" + intPart else intPart
    val fracPadded = if (fracPart.length % 2 == 1) fracPart + "0" else fracPart
    val allPairs = (intPadded + fracPadded).grouped(2).map(_.toInt).toArray
    var exp = intPadded.length / 2 - 1
    // strip leading zero pairs (adjusting exponent)
    var start = 0
    while (start < allPairs.length && allPairs(start) == 0) { start += 1; exp -= 1 }
    var end = allPairs.length
    while (end > start && allPairs(end - 1) == 0) end -= 1
    val digits = allPairs.slice(start, end)
    if (digits.isEmpty) return Array(0x80.toByte)
    if (!neg) {
      val header = (exp + 65) | 0x80
      (header.toByte +: digits.map(d => (d + 1).toByte)).toArray
    } else {
      val header = (~((exp + 65) | 0x80)) & 0xff
      val mantissa = digits.map(d => (101 - d).toByte)
      val withTerm =
        if (mantissa.length < 20) mantissa :+ 0x66.toByte else mantissa
      (header.toByte +: withTerm).toArray
    }
  }

  /** Decode Oracle 7-byte DATE (excess-100 century/year, 1-based h/m/s)
    * → epoch seconds UTC. 11-byte TIMESTAMP adds big-endian nanos. */
  def oracleDateToEpoch(bytes: Array[Byte]): Long = oracleDateToEpoch(bytes, 0)

  /** DATE decode under a `db-timezone` offset (reference
    * src/builder/Builder.cpp:200 valuesToEpoch(..., metadata->dbTimezone),
    * knob parsed at src/metadata/SerializerJson.cpp:651-659): the stored
    * fields are wall-clock in the DB's zone, so epoch = fields − offset.
    * `tzSec` is the SIGNED east-of-UTC offset from [[parseTzOffset]]. */
  def oracleDateToEpoch(bytes: Array[Byte], tzSec: Int): Long = {
    require(bytes != null && bytes.length >= 7, "DATE needs >= 7 bytes")
    val century = (bytes(0) & 0xff) - 100
    val year2 = (bytes(1) & 0xff) - 100
    val year = century * 100 + year2
    val month = bytes(2) & 0xff
    val day = bytes(3) & 0xff
    val hour = (bytes(4) & 0xff) - 1
    val minute = (bytes(5) & 0xff) - 1
    val second = (bytes(6) & 0xff) - 1
    java.time.LocalDateTime.of(year, month, day, hour, minute, second)
      .toEpochSecond(java.time.ZoneOffset.UTC) - tzSec
  }

  /** Inverse of [[oracleDateToEpoch]]: epoch seconds → the 7-byte DATE a
    * redo record in a `db-timezone = tzSec` database would carry (the
    * wall-clock fields of that zone). */
  def oracleDateEncode(epochSec: Long, tzSec: Int = 0): Array[Byte] = {
    val dt = java.time.LocalDateTime.ofEpochSecond(
      epochSec + tzSec, 0, java.time.ZoneOffset.UTC)
    require(dt.getYear >= 0, "BC encoding out of scaffolding scope")
    Array[Byte](
      (dt.getYear / 100 + 100).toByte, (dt.getYear % 100 + 100).toByte,
      dt.getMonthValue.toByte, dt.getDayOfMonth.toByte,
      (dt.getHour + 1).toByte, (dt.getMinute + 1).toByte,
      (dt.getSecond + 1).toByte)
  }

  /** `db-timezone` / `host-timezone` / `log-timezone` value → signed
    * east-of-UTC seconds. The alias whitelist mirrors the reference's
    * (Data.cpp:53-112 parseTimezone) EXACTLY, including its non-POSIX
    * reading of Etc/GMT±N: the reference maps Etc/GMT-5 to the literal
    * "-05:00" (UTC-5), NOT the IANA/POSIX inversion (where Etc/GMT-5
    * means UTC+5) — its observable output is the contract, so we match it.
    * The negative branch reaches Etc/GMT-14 and the positive stops at
    * Etc/GMT+12, the exact bounds of the reference list. Numeric offsets
    * accept "±H:MM"/"±HH:MM" capped at Oracle's DBTIMEZONE range ±14:00
    * (minutes must be 00 at 14 — the reference's own digit loop is looser,
    * but those values are unreachable from a real database). The
    * reference's digit arithmetic also negates the tens-of-hours digit
    * (Data.cpp:124, `-(str[1]-'0')*36000`); we implement the documented
    * intent — sign honored, east positive. */
  def parseTzOffset(s: String): Option[Int] = {
    val named = Map(
      "HST" -> -10 * 3600, "PST" -> -8 * 3600, "PST8PDT" -> -8 * 3600,
      "MST" -> -7 * 3600, "MST7MDT" -> -7 * 3600, "CST" -> -6 * 3600,
      "CST6CDT" -> -6 * 3600, "EST" -> -5 * 3600, "EST5EDT" -> -5 * 3600,
      "GMT" -> 0, "Etc/GMT" -> 0, "Greenwich" -> 0, "Etc/Greenwich" -> 0,
      "GMT0" -> 0, "Etc/GMT0" -> 0, "GMT+0" -> 0, "UTC" -> 0,
      "Etc/UTC" -> 0, "UCT" -> 0, "Etc/UCT" -> 0, "Universal" -> 0,
      "Etc/Universal" -> 0, "WET" -> 0, "MET" -> 3600, "CET" -> 3600,
      "EET" -> 2 * 3600, "PRC" -> 8 * 3600, "ROC" -> 8 * 3600)
    if (named.contains(s)) return Some(named(s))
    val etc = "Etc/GMT([+-])(\\d{1,2})".r
    val hm = "([+-])(\\d{1,2}):(\\d{2})".r
    s match {
      case etc("-", h) if h.toInt <= 14 => Some(-h.toInt * 3600)
      case etc("+", h) if h.toInt <= 12 => Some(h.toInt * 3600)
      case hm(sign, h, m) if m.toInt <= 59 &&
          (h.toInt < 14 || (h.toInt == 14 && m.toInt == 0)) =>
        Some((if (sign == "-") -1 else 1) * (h.toInt * 3600 + m.toInt * 60))
      case _ => None
    }
  }

  /** 11-byte TIMESTAMP → epoch micros (nanos truncated to micros). */
  def oracleTimestampToEpochMicros(bytes: Array[Byte]): Long = {
    val sec = oracleDateToEpoch(bytes)
    val nanos =
      if (bytes.length >= 11)
        ((bytes(7) & 0xffL) << 24) | ((bytes(8) & 0xffL) << 16) |
          ((bytes(9) & 0xffL) << 8) | (bytes(10) & 0xffL)
      else 0L
    sec * 1000000L + nanos / 1000L
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** INTERVAL YEAR TO MONTH (type 182), 5 bytes: big-endian years
    * excess-2^31, months byte excess-60 → total months (signed). */
  def intervalYmToMonths(bytes: Array[Byte]): Long = {
    require(bytes != null && bytes.length >= 5, "INTERVAL YM needs 5 bytes")
    val years = be32(bytes, 0) - 0x80000000L
    val months = (bytes(4) & 0xff) - 60
    years * 12 + months
  }

  /** INTERVAL DAY TO SECOND (type 183), 11 bytes: days excess-2^31 (4B),
    * hour/min/sec bytes excess-60, nanos excess-2^31 (4B) → total nanos. */
  def intervalDsToNanos(bytes: Array[Byte]): Long = {
    require(bytes != null && bytes.length >= 11, "INTERVAL DS needs 11 bytes")
    val days = be32(bytes, 0) - 0x80000000L
    val hours = (bytes(4) & 0xff) - 60
    val minutes = (bytes(5) & 0xff) - 60
    val seconds = (bytes(6) & 0xff) - 60
    val nanos = be32(bytes, 7) - 0x80000000L
    (((days * 24 + hours) * 60 + minutes) * 60 + seconds) * 1000000000L + nanos
  }

  /** BINARY_FLOAT (type 100) on-disk form: positive values have the sign
    * bit set; negative values are fully complemented (so the byte order
    * sorts correctly). Inverse transform → IEEE 754 float. */
  def decodeBinaryFloat(bytes: Array[Byte]): Float = {
    require(bytes != null && bytes.length >= 4, "BINARY_FLOAT needs 4 bytes")
    val raw = be32(bytes, 0).toInt
    val bits = if ((raw & 0x80000000) != 0) raw & 0x7fffffff else ~raw
    java.lang.Float.intBitsToFloat(bits)
  }

  /** BINARY_DOUBLE (type 101): same sign-flip scheme over 8 bytes. */
  def decodeBinaryDouble(bytes: Array[Byte]): Double = {
    require(bytes != null && bytes.length >= 8, "BINARY_DOUBLE needs 8 bytes")
    val raw = (be32(bytes, 0) << 32) | be32(bytes, 4)
    val bits =
      if ((raw & 0x8000000000000000L) != 0L) raw & 0x7fffffffffffffffL
      else ~raw
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Encoders for the above (fixture/property-test support). */
  def encodeBinaryFloat(f: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val raw = if (bits >= 0) bits | 0x80000000 else ~bits
    Array((raw >> 24).toByte, (raw >> 16).toByte, (raw >> 8).toByte, raw.toByte)
  }
  def encodeBinaryDouble(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToRawLongBits(d)
    val raw = if (bits >= 0L) bits | 0x8000000000000000L else ~bits
    (0 to 7).map(i => (raw >> ((7 - i) * 8)).toByte).toArray
  }
  def encodeIntervalYm(months: Long): Array[Byte] = {
    val years = months / 12
    val m = months % 12
    val y = years + 0x80000000L
    Array((y >> 24).toByte, (y >> 16).toByte, (y >> 8).toByte, y.toByte,
      (m + 60).toByte)
  }
  def encodeIntervalDs(nanos: Long): Array[Byte] = {
    val ns = nanos % 1000000000L
    var rest = nanos / 1000000000L
    val sec = rest % 60; rest /= 60
    val min = rest % 60; rest /= 60
    val hr = rest % 24; rest /= 24
    val d = rest + 0x80000000L
    val n = ns + 0x80000000L
    Array((d >> 24).toByte, (d >> 16).toByte, (d >> 8).toByte, d.toByte,
      (hr + 60).toByte, (min + 60).toByte, (sec + 60).toByte,
      (n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte, n.toByte)
  }

  // ----- TIMESTAMP WITH TIME ZONE (type 181), 13 bytes -----------------
  // Builder.cpp:272-353: bytes 0-6 = excess-100 year pair + 1-offset
  // month/day/hour/min/sec, bytes 7-10 = big-endian nano fraction, bytes
  // 11-12 = either a numeric offset (data[11] in 5..36: hours excess-20,
  // minutes excess-60) or a region key (data[11]<<8|data[12]) resolved
  // through Locales::timeZoneMap. The FULL reference map (595 unique
  // region keys, Locales.cpp:40-642) ships as a TSV resource — behavioral
  // data, extracted with first-occurrence-wins to match C++ map-insert
  // semantics — so any region index a real redo stream carries renders to
  // the same zone name the reference emits; an absent key still renders
  // the "TZ?" miss marker.
  private[graft] lazy val timeZoneMap: Map[Int, String] = {
    val in = getClass.getResourceAsStream("/graft/timezone_map.tsv")
    require(in != null, "timezone_map.tsv resource missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val Array(k, name) = line.split('\t')
          Integer.decode(k).intValue() -> name
        }
        .toMap
    } finally in.close()
  }

  /** Scaffolding encoder (inverse of the decode path, as a redo record
    * would carry it): UTC epoch seconds + nano fraction + raw tz bytes. */
  def tzTimestampEncode(epochSec: Long, fraction: Long,
      b11: Int, b12: Int): Array[Byte] = {
    val dt = java.time.LocalDateTime.ofEpochSecond(
      epochSec, 0, java.time.ZoneOffset.UTC)
    require(dt.getYear >= 0, "BC encoding out of scaffolding scope")
    Array[Byte](
      (dt.getYear / 100 + 100).toByte, (dt.getYear % 100 + 100).toByte,
      dt.getMonthValue.toByte, dt.getDayOfMonth.toByte,
      (dt.getHour + 1).toByte, (dt.getMinute + 1).toByte,
      (dt.getSecond + 1).toByte,
      (fraction >> 24).toByte, (fraction >> 16).toByte,
      (fraction >> 8).toByte, fraction.toByte,
      b11.toByte, b12.toByte)
  }

  /** (epoch seconds, nano fraction, tz display string) from the 13-byte
    * value; null on out-of-range fields (the caller falls back to the
    * UNKNOWN hex dump, as columnUnknown does). */
  def tzTimestampDecode(bytes: Array[Byte]): (Long, Long, String) = {
    if (bytes == null || (bytes.length != 9 && bytes.length != 13)) return null
    val v1 = bytes(0) & 0xff
    val v2 = bytes(1) & 0xff
    val year =
      if (v1 >= 100 && v2 >= 100) (v1 - 100) * 100 + (v2 - 100)
      else -(((100 - v1) * 100) + (100 - v2))
    val month = (bytes(2) & 0xff) - 1 // 0..11
    val day = (bytes(3) & 0xff) - 1
    val hour = (bytes(4) & 0xff) - 1
    val minute = (bytes(5) & 0xff) - 1
    val second = (bytes(6) & 0xff) - 1
    var fraction = if (bytes.length == 13) be32(bytes, 7) else 0L
    val b11 = bytes(11) & 0xff
    val b12 = bytes(12) & 0xff
    val tz =
      if (b11 >= 5 && b11 <= 36) {
        val sign = if (b11 < 20 || (b11 == 20 && b12 < 60)) "-" else "+"
        val hours = if (b11 < 20) 20 - b11 else b11 - 20
        val mins = if (b12 < 60) 60 - b12 else b12 - 60
        f"$sign$hours%02d:$mins%02d"
      } else timeZoneMap.getOrElse((b11 << 8) | b12, "TZ?")
    if (second < 0 || second > 59 || minute < 0 || minute > 59 ||
      hour < 0 || hour > 23 || day < 0 || day > 30 ||
      month < 0 || month > 11) return null
    var epoch = java.time.LocalDateTime
      .of(year, month + 1, day + 1, hour, minute, second)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    if (year < 0 && fraction > 0) { fraction = 1000000000L - fraction; epoch -= 1 }
    (epoch, fraction, tz)
  }

  /** UNKNOWN_FORMAT::DUMP diagnostic line (Builder.h:395-405): the
    * payload value renders as "?" (columnString of a 1-char buffer); when
    * dump is on, a warning carries the byte count and a space-prefixed
    * lowercase hex pair per byte — "unknown value (column: c): 2 -  61 62"
    * (note the double space: " - " + " 61"). */
  def unknownDump(columnName: String, bytes: Array[Byte]): String = {
    val ss = bytes.map(b => f" ${b & 0xff}%02x").mkString
    s"unknown value (column: $columnName): ${bytes.length} - $ss"
  }

  /** TIMESTAMP_TZ_FORMAT::ISO8601_NANO_TZ (BuilderJson.cpp:338-348):
    * "2024-04-05T19:34:38.123456789Z Europe/Warsaw". */
  def tzTimestampIso(bytes: Array[Byte]): String = {
    val dec = tzTimestampDecode(bytes)
    if (dec == null) return null
    val (epoch, fraction, tz) = dec
    val dt = java.time.LocalDateTime.ofEpochSecond(
      epoch, 0, java.time.ZoneOffset.UTC)
    f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d" +
      f"T${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d" +
      f".$fraction%09dZ $tz"
  }

  /** TIMESTAMP_TZ_FORMAT::UNIX_NANO_STRING (BuilderJson.cpp:290-308):
    * the nanos integer (sign carried once, 18-digit-padded remainder for
    * |epoch| >= 1e9 — same digits as epoch*1e9+fraction), ",", tz. */
  def tzTimestampUnix(bytes: Array[Byte]): String = {
    val dec = tzTimestampDecode(bytes)
    if (dec == null) return null
    val (epoch, fraction, tz) = dec
    val digits =
      if (epoch < 1000000000L && epoch > -1000000000L)
        (epoch * 1000000000L + fraction).toString
      else {
        val firstDigits = epoch / 1000000000L
        val (absEpoch, frac) =
          if (epoch < 0) (-epoch, -fraction) else (epoch, fraction)
        f"$firstDigits%d${absEpoch % 1000000000L * 1000000000L + frac}%018d"
      }
    s"$digits,$tz"
  }
}
