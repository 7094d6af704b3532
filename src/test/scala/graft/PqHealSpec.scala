package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The pqAppend crash window, healed (the r15 ask): cells append FIRST,
  * codes second, so a crash between the two leaves the appended vectors
  * present in `<name>_cells` but absent from `<name>_pqcodes` — a
  * bounded, silent recall loss at ADC serving time (the gapped vectors
  * simply never appear as candidates). r15 documented the gap as
  * "detectable"; nothing detected it. VectorOps.pqHeal closes it:
  * anti-join the two tables, re-encode the missing vectors against the
  * FROZEN book, append their codes — idempotent, and run by the
  * streaming ingest's recovery pass on every (re)start (VecDupIngest
  * ADC mode).
  */
class PqHealSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("a crash between the cells and codes appends is found and healed") {
    val e = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 10 < 6)
    val inc = e.filter(col("vec_id") % 10 === 6)
    val name = "pqheal_idx"
    graft.operators.IvfIndex.write(spark, base, name)
    graft.queries.VectorOps.pqAttach(spark, name)
    // healthy state: one code row per cell row
    def cellsN = spark.table(s"${name}_cells").count()
    def codesN = spark.table(s"${name}_pqcodes").count()
    assert(cellsN == codesN)
    // simulate the crash: the cells append lands (keepPq — exactly what
    // pqAppend does first), the codes append never runs
    graft.operators.IvfIndex.append(spark, inc, name, keepPq = true)
    val gap = cellsN - codesN
    val incN = inc.count()
    assert(gap == incN, s"crash state not visible: gap $gap vs inc $incN")
    // recovery: heal re-encodes exactly the gapped vectors
    val healed = graft.queries.VectorOps.pqHeal(spark, name)
    assert(healed == incN, s"healed $healed of $incN gapped vectors")
    assert(cellsN == codesN)
    // the healed codes are real: every appended vector now serves
    val healedIds = spark.table(s"${name}_pqcodes")
      .join(inc.select("vec_id"), Seq("vec_id"), "left_semi").count()
    assert(healedIds == incN)
    // idempotent: a second pass finds nothing
    assert(graft.queries.VectorOps.pqHeal(spark, name) == 0L)
  }
}
