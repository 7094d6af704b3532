package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CharsetDecode, CosineSimilarity, KmvMinima, MinHashSig, MojibakeFix, NfcNormalize, Shingles3, SpanHashes, StripAccents, UrlCanon}

/** SQL function surface (SURVEY.md §2.10): the engine's native expressions
  * registered by name, so `spark.sql("SELECT minhash_sig(shingles3(text), 8)
  * ...")` works the same as the Column API.
  *
  * Two entry points:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *     (the idiomatic plug-in path for clusters);
  *   - [[GraftExtensions.register]] for an already-running session
  *     (notebooks, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triples — the injectFunction contract. */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine of two array<float> embeddings"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("graft_tokens"),
      info("graft_tokens",
        "graft_tokens(text) - non-empty space-delimited tokens " +
          "(one-pass codegen kernel)"),
      (args: Seq[Expression]) => graft.functions.Tokens(args.head)),
    (FunctionIdentifier("shingles3"),
      info("shingles3",
        "shingles3(text) - distinct space-token 3-gram shingles"),
      (args: Seq[Expression]) => Shingles3(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(shingles, n) - n md5-minhash values (n literal)"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intLit(args(1), "minhash_sig n"))),
    (FunctionIdentifier("span_hashes"),
      info("span_hashes",
        "span_hashes(text, n) - distinct md5 hashes of n-token spans " +
          "(one-pass kernel; n literal)"),
      (args: Seq[Expression]) =>
        SpanHashes(args(0), intLit(args(1), "span_hashes n"))),
    (FunctionIdentifier("pq_encode"),
      info("pq_encode",
        "pq_encode(q, cents, m, subdim) - PQ codes vs a packed codebook " +
          "(m/subdim literals)"),
      (args: Seq[Expression]) =>
        graft.functions.PqNative.PqEncode(args(0), args(1),
          intLit(args(2), "pq_encode m"), intLit(args(3), "pq_encode subdim"))),
    (FunctionIdentifier("adc_sum"),
      info("adc_sum",
        "adc_sum(codes, dtable, m) - asymmetric-distance sum over a " +
          "query's sub-distance table (m literal)"),
      (args: Seq[Expression]) =>
        graft.functions.PqNative.AdcSum(args(0), args(1),
          intLit(args(2), "adc_sum m"))),
    (FunctionIdentifier("url_canon"),
      info("url_canon",
        "url_canon(url) - canonical http(s) URL (case/www/default-port/" +
          "trailing-slash/fragment/tracking-param/param-order normalized)"),
      (args: Seq[Expression]) => UrlCanon(args.head)),
    (FunctionIdentifier("mojibake_fix"),
      info("mojibake_fix",
        "mojibake_fix(text) - repair cp1252-mojibake UTF-8 sequences"),
      (args: Seq[Expression]) => MojibakeFix(args.head)),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(text) - Unicode NFC canonical composition (UAX #15)"),
      (args: Seq[Expression]) => NfcNormalize(args.head)),
    (FunctionIdentifier("strip_accents"),
      info("strip_accents",
        "strip_accents(text) - NFD-decompose then drop non-spacing marks " +
          "(diacritic fold)"),
      (args: Seq[Expression]) => StripAccents(args.head)),
    (FunctionIdentifier("ora_charset_decode"),
      info("ora_charset_decode",
        "ora_charset_decode(bin, charset_id) - decode raw column bytes " +
          "under an Oracle NLS charset id (Locales.cpp id space)"),
      (args: Seq[Expression]) => CharsetDecode(args(0), args(1))),
    (FunctionIdentifier("kmv_minima"),
      info("kmv_minima",
        "kmv_minima(h, k) - k smallest distinct values (KMV sketch; " +
          "feed md5(x); k literal)"),
      (args: Seq[Expression]) =>
        KmvMinima(args(0), intLit(args(1), "kmv_minima k"))
          .toAggregateExpression()),
    // Spark's internal bloom-filter pair, surfaced by name: the standard
    // seen-before pre-filter for 100 TB dedup/anti-join pipelines
    // (catalyst ships them for runtime filters but registers no SQL name)
    (FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(x), items, bits) - bloom filter bytes"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))
          .toAggregateExpression()),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bf, xxhash64(x)) - membership test"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))

  /** Register on a live session (idempotent; createOrReplace semantics). */
  def register(spark: SparkSession): Unit = {
    val registry = org.apache.spark.sql.graftbridge.Bridge.functionRegistry(spark)
    entries.foreach { case (ident, inf, builder) =>
      registry.registerFunction(ident, inf, builder)
    }
    // scalar codecs (§2.7) as plain UDFs — small, driver-registered
    import graft.core.OracleCodecs
    spark.udf.register("rowid_encode",
      (obj: Long, dba: Long, slot: Int) =>
        OracleCodecs.rowIdEncode(obj, dba, slot))
    spark.udf.register("xid_format",
      (xid: Long) => OracleCodecs.xidFormat(xid))
    spark.udf.register("xid_format_dec",
      (xid: Long) => OracleCodecs.xidFormatDec(xid))
    spark.udf.register("xid_format_reversed",
      (xid: Long) => OracleCodecs.xidFormatReversed(xid))
    spark.udf.register("oracle_number",
      (b: Array[Byte]) => OracleCodecs.numberToString(b))
    spark.udf.register("interval_ds_string",
      (nanos: Long, sep: String) =>
        OracleCodecs.intervalDsString(nanos, sep.headOption.getOrElse(' ')))
    spark.udf.register("interval_ym_string",
      (months: Long, sep: String) =>
        OracleCodecs.intervalYmString(months, sep.headOption.getOrElse(' ')))
    spark.udf.register("tz_timestamp_iso",
      (b: Array[Byte]) => OracleCodecs.tzTimestampIso(b))
    spark.udf.register("unknown_dump",
      (name: String, b: Array[Byte]) => OracleCodecs.unknownDump(name, b))
    // an unparseable db-timezone is a CONFIG ERROR (the reference refuses
    // to start, OpenLogReplicator.cpp:913-925) — failing the query beats
    // silently decoding under UTC
    def tzOrThrow(tz: String): Int =
      OracleCodecs.parseTzOffset(tz).getOrElse(
        throw new IllegalArgumentException(s"unparseable db-timezone: $tz"))
    spark.udf.register("oracle_date_encode",
      (epochSec: Long, tz: String) =>
        OracleCodecs.oracleDateEncode(epochSec, tzOrThrow(tz)))
    spark.udf.register("oracle_date_epoch",
      (b: Array[Byte], tz: String) =>
        OracleCodecs.oracleDateToEpoch(b, tzOrThrow(tz)))
  }
}
