package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.OracleCodecs._

class OracleCodecsSpec extends AnyFunSuite {

  /** Run a scalacheck property under ScalaTest (scalatestplus bridge is not
    * in the offline cache, so drive scalacheck directly). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("rowid roundtrip, known shape") {
    val rid = rowIdEncode(1000002L, (4L << 22) | 1234L, 7)
    assert(rid.length == 18)
    assert(rowIdDecode(rid) == ((1000002L, (4L << 22) | 1234L, 7)))
  }

  test("rowid roundtrip property") {
    check(Prop.forAll(Gen.chooseNum(0L, 0xffffffffL), Gen.chooseNum(0L, 0x3ffL),
      Gen.chooseNum(0L, 0x3fffffL), Gen.chooseNum(0, 0xffff)) {
      (dataObj: Long, afn: Long, block: Long, slot: Int) =>
        val dba = (afn << 22) | block
        rowIdDecode(rowIdEncode(dataObj, dba, slot)) == ((dataObj, dba, slot))
    })
  }

  test("xid pack/format/parse") {
    val xid = xidPack(6, 0x1a, 0x218L)
    assert(xidFormat(xid) == "0x0006.01a.00000218")
    assert(xidParse("0x0006.01a.00000218") == xid)
    assert(xidUsn(xid) == 6 && xidSlt(xid) == 0x1a && xidSqn(xid) == 0x218L)
  }

  test("xid roundtrip property") {
    check(Prop.forAll(Gen.chooseNum(0, 0xffff), Gen.chooseNum(0, 0xffff),
      Gen.chooseNum(0L, 0xffffffffL)) { (usn: Int, slt: Int, sqn: Long) =>
      val xid = xidPack(usn, slt, sqn)
      xidParse(xidFormat(xid)) == xid
    })
  }

  test("NUMBER: known encodings") {
    // 0 is the single byte 0x80
    assert(numberToString(Array(0x80.toByte)) == "0")
    assert(stringToNumber("0").toSeq == Seq(0x80.toByte))
    // 1 = exponent byte 0xC1, digit 1+1
    assert(numberToString(Array(0xc1.toByte, 2.toByte)) == "1")
    // 100 = 1 * 100^1
    assert(numberToString(Array(0xc2.toByte, 2.toByte)) == "100")
    // 1.5 = digits (1)(50)
    assert(numberToString(Array(0xc1.toByte, 2.toByte, 51.toByte)) == "1.5")
    // -1 = complement exponent 0x3E, digit 101-1, 0x66 terminator
    assert(numberToString(Array(0x3e.toByte, 100.toByte, 0x66.toByte)) == "-1")
    // 0.01 = 1 * 100^-1
    assert(numberToString(Array(0xc0.toByte, 2.toByte)) == "0.01")
  }

  test("NUMBER: decimal-string roundtrip property") {
    val decGen = for {
      neg <- Gen.oneOf("", "-")
      intPart <- Gen.chooseNum(0L, 999999999999L)
      scale <- Gen.chooseNum(0, 8)
      frac <- Gen.chooseNum(0L, 99999999L)
    } yield {
      val f = if (scale == 0) "" else {
        val fs = f"$frac%08d".take(scale).reverse.dropWhile(_ == '0').reverse
        if (fs.isEmpty) "" else "." + fs
      }
      val s = s"$neg$intPart$f"
      if (s == "-0" || s == "-") "0" else s
    }
    check(Prop.forAll(decGen) { s: String =>
      val canonical = new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
      val got = numberToString(stringToNumber(s))
      new java.math.BigDecimal(got).compareTo(new java.math.BigDecimal(s)) == 0 &&
        got == (if (canonical == "-0") "0" else canonical)
    })
  }

  test("NUMBER: beyond Decimal(38) stays exact as string") {
    val s = "9" * 44 // 44 nines — exceeds any Spark DecimalType
    assert(numberToString(stringToNumber(s)) == s)
  }

  test("DATE/TIMESTAMP decode") {
    // 2024-01-02 03:04:05 → bytes (excess-100 century/year, 1-based hms)
    val b = Array[Byte](120, 124, 1, 2, 4, 5, 6)
    assert(oracleDateToEpoch(b) ==
      java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)
        .toEpochSecond(java.time.ZoneOffset.UTC))
    val withNanos = b ++ Array[Byte](0x07, 0x5b, 0xcd.toByte, 0x15) // 123456789 ns
    assert(oracleTimestampToEpochMicros(withNanos) ==
      oracleDateToEpoch(b) * 1000000L + 123456L)
  }

  test("INTERVAL YM/DS roundtrip property") {
    check(Prop.forAll(Gen.chooseNum(-120000L, 120000L)) { m: Long =>
      intervalYmToMonths(encodeIntervalYm(m)) == m
    })
    // nanos within ±10^5 days (10^5 d × 86400e9 ns ≈ 8.6e18 < Long.Max)
    check(Prop.forAll(Gen.chooseNum(-8640000000000000000L, 8640000000000000000L)) {
      n: Long => intervalDsToNanos(encodeIntervalDs(n)) == n
    })
    assert(intervalYmToMonths(encodeIntervalYm(-13L)) == -13L)
    assert(intervalDsToNanos(encodeIntervalDs(90061000000001L)) ==
      90061000000001L) // 1d 1h 1m 1s + 1ns
  }

  test("BINARY_FLOAT / BINARY_DOUBLE sign-flip roundtrip property") {
    check(Prop.forAll { f: Float =>
      f.isNaN || decodeBinaryFloat(encodeBinaryFloat(f)) == f
    })
    check(Prop.forAll { d: Double =>
      d.isNaN || decodeBinaryDouble(encodeBinaryDouble(d)) == d
    })
    // encoded byte order sorts like the numeric order (the point of the
    // sign-flip scheme)
    val enc = Seq(-2.5f, -1.0f, 0.0f, 1.0f, 2.5f).map(encodeBinaryFloat)
    val sorted = enc.sortWith((a, b) =>
      java.util.Arrays.compareUnsigned(a, b) < 0)
    assert(sorted.map(decodeBinaryFloat) == Seq(-2.5f, -1.0f, 0.0f, 1.0f, 2.5f))
  }

  test("db-timezone: parseTzOffset signs, named zones, POSIX inversion") {
    assert(parseTzOffset("+05:30").contains(5 * 3600 + 30 * 60))
    assert(parseTzOffset("-08:00").contains(-8 * 3600))
    assert(parseTzOffset("-0:30").contains(-1800))
    assert(parseTzOffset("+00:00").contains(0))
    assert(parseTzOffset("UTC").contains(0))
    assert(parseTzOffset("PST").contains(-8 * 3600))
    assert(parseTzOffset("CET").contains(3600))
    // Reference behavior (Data.cpp:53-112): Etc/GMT-5 maps to the LITERAL
    // "-05:00" — the reference does NOT apply the IANA/POSIX inversion
    // (where Etc/GMT-5 would mean UTC+5), and we match its output.
    assert(parseTzOffset("Etc/GMT-5").contains(-5 * 3600))
    assert(parseTzOffset("Etc/GMT-14").contains(-14 * 3600))
    assert(parseTzOffset("Etc/GMT+12").contains(12 * 3600))
    assert(parseTzOffset("Etc/GMT+13").isEmpty) // whitelist stops at +12
    assert(parseTzOffset("Etc/GMT").contains(0))
    assert(parseTzOffset("Etc/GMT+0").contains(0))
    // reference-whitelisted aliases beyond the common set
    assert(parseTzOffset("MET").contains(3600))
    assert(parseTzOffset("Greenwich").contains(0))
    assert(parseTzOffset("UCT").contains(0))
    assert(parseTzOffset("Universal").contains(0))
    assert(parseTzOffset("GMT0").contains(0))
    assert(parseTzOffset("Etc/UTC").contains(0))
    assert(parseTzOffset("+15:00").isEmpty) // out of range
    assert(parseTzOffset("+14:00").contains(14 * 3600)) // DBTIMEZONE cap
    assert(parseTzOffset("+14:59").isEmpty) // beyond Oracle's ±14:00
    assert(parseTzOffset("-14:00").contains(-14 * 3600))
    assert(parseTzOffset("bogus").isEmpty)
  }

  test("full reference timeZoneMap resource: size + spot pins") {
    val m = graft.core.OracleCodecs.timeZoneMap
    // 597 reference entries, 595 unique keys (Locales.cpp:40-642;
    // first-occurrence-wins matches C++ map-insert semantics)
    assert(m.size == 595)
    // spot pins across the table, values straight from Locales.cpp
    assert(m(0x8004) == "Etc/GMT")
    assert(m(0x8008) == "Etc/GMT-14")
    assert(m(0x8070) == "Etc/UTC")
    assert(m(0x8190) == "America/New_York")
    assert(m(0x819c) == "America/Los_Angeles")
    assert(m(0x83e8) == "Asia/Shanghai")
    assert(m(0x842c) == "Asia/Tokyo")
    assert(m(0x85c4) == "Europe/London")
    assert(m(0x85fc) == "Europe/Berlin")
    assert(m(0x8638) == "Europe/Warsaw")
    assert(m(0xd004) == "UTC")
    assert(!m.contains(0x2500)) // q68's deliberate "TZ?" miss key
    // q68's breadth subset covers >= 50 distinct named zones
    assert(graft.queries.FormatOps.tzBreadth.size == 60)
    assert(graft.queries.FormatOps.tzBreadth.map(_._2).distinct.size == 60)
  }

  test("db-timezone: DATE encode/decode roundtrip with offsets") {
    // 2021-01-02 03:04:05 UTC
    val epoch = java.time.LocalDateTime.of(2021, 1, 2, 3, 4, 5)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    // a +05:30 database stores wall clock 08:34:05
    val east = oracleDateEncode(epoch, 5 * 3600 + 30 * 60)
    assert(east.toSeq == Seq[Byte](120, 121, 1, 2, 9, 35, 6))
    assert(oracleDateToEpoch(east, 5 * 3600 + 30 * 60) == epoch)
    // decoding the same bytes as UTC shifts by exactly the offset
    assert(oracleDateToEpoch(east, 0) == epoch + 19800)
    // a -08:00 database stores the PREVIOUS day's 19:04:05
    val west = oracleDateEncode(epoch, -8 * 3600)
    assert(west.toSeq == Seq[Byte](120, 121, 1, 1, 20, 5, 6))
    assert(oracleDateToEpoch(west, -8 * 3600) == epoch)
    // property: roundtrip holds for any offset at any epoch in range
    check(Prop.forAll(Gen.chooseNum(0L, 4102444800L),
      Gen.chooseNum(-14 * 3600, 14 * 3600)) { (e: Long, tz: Int) =>
      oracleDateToEpoch(oracleDateEncode(e, tz), tz) == e
    })
  }
}
