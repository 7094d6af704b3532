package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic regression net behind the BASELINE.md JSON-vs-protobuf
  * envelope comparison (the reference's one published comparative perf
  * claim: its JSON writer ~2.5x its protobuf writer,
  * documentation/user-manual/3.output-format.adoc:23-26; our measured
  * wall ratio is pinned in BASELINE.md by graft.tools.EnvelopeBench).
  * Wall-clock is host-dependent, so the SPEC pins what is exact: the
  * total payload bytes each envelope emits over the sf0.001 feed —
  * 138097 JSON vs 48059 protobuf. A change to either wire format, the
  * knob defaults, or the materialize front end moves these totals and
  * must re-measure the BASELINE.md row. */
class EnvelopeSizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def mat = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    graft.cdc.Materialize(
      graft.tools.EnvelopeBench.messageFrame(spark, sf)
        .as[graft.cdc.ChangeMessage],
      graft.cdc.Dictionary(Seq(graft.cdc.DbTable(100L, 100L, "APP", "EVENTS",
        Seq(graft.cdc.DbColumn("value", 1, numPk = 1)), tagType = "pk"))))
  }

  test("JSON and protobuf envelopes emit their recorded byte totals") {
    val jsonBytes = graft.cdc.Envelope
      .forSink(graft.cdc.Envelope.toMessages(mat))
      .agg(sum(octet_length(col("value"))).cast("long")).head.getLong(0)
    val protoBytes = graft.cdc.ProtoEnvelope.toMessages(mat)
      .agg(sum(octet_length(col("value_bin"))).cast("long")).head.getLong(0)
    assert(jsonBytes == 138097L,
      s"JSON envelope bytes moved: $jsonBytes - re-measure the " +
        "BASELINE.md envelope row (graft.tools.EnvelopeBench)")
    assert(protoBytes == 48059L,
      s"protobuf envelope bytes moved: $protoBytes - re-measure the " +
        "BASELINE.md envelope row (graft.tools.EnvelopeBench)")
    // the direction both BASELINE.md and the reference's claim rest on:
    // proto trades smaller payloads for a slower writer
    assert(protoBytes < jsonBytes / 2)
  }
}
