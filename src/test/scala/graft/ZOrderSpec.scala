package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: bit-exact key semantics + the measured pruning effect
  * (a 1-D layout serves its own dimension and nothing else; the z-layout
  * serves BOTH dimensions with a fraction of the files). */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("interleave2 matches a plain-Scala Morton encode") {
    import spark.implicits._
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 54321L),
      ((1L << 21) - 1, (1L << 21) - 1), (1048576L, 7L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 21)).collect()
      .map(_.getLong(0)).toSeq
    assert(got == cases.map { case (x, y) => morton(x, y, 21) })
  }

  private def matchingFiles(path: String, pred: DataFrame => DataFrame): Int = {
    val df = spark.read.parquet(path)
    pred(df).select(input_file_name()).distinct().count().toInt
  }

  test("z-layout prunes range scans on BOTH dimensions; 1-D layout cannot") {
    val dir = Files.createTempDirectory("zorder").toString
    val days = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val orders = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_custkey"), days.as("epoch_day"))
    val nFiles = 16
    val (cLo, cHi, dLo, dHi) = {
      val r = orders.agg(min("o_custkey"), max("o_custkey"),
        min("epoch_day"), max("epoch_day")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // 1-D layout: clustered by customer only
    ZOrder.writeZOrdered(orders, col("o_custkey"), s"$dir/bycust", nFiles)
    // 2-D z-layout over NORMALIZED dims (equal bit-width — see
    // ZOrder.normalize scaladoc for why raw values degrade to 1-D)
    ZOrder.writeZOrdered(orders,
      ZOrder.interleave2(
        ZOrder.normalize(col("o_custkey"), cLo, cHi, 10),
        ZOrder.normalize(col("epoch_day"), dLo, dHi, 10), 10),
      s"$dir/byz", nFiles)
    // a ~3% box on each dimension, anchored mid-range
    val cMid = cLo + (cHi - cLo) / 2
    val dMid = dLo + (dHi - dLo) / 2
    val custBox = (df: DataFrame) =>
      df.filter(col("o_custkey").between(cMid, cMid + (cHi - cLo) / 32))
    val dateBox = (df: DataFrame) =>
      df.filter(col("epoch_day").between(dMid, dMid + (dHi - dLo) / 32))

    val custOn1d = matchingFiles(s"$dir/bycust", custBox)
    val dateOn1d = matchingFiles(s"$dir/bycust", dateBox)
    val custOnZ = matchingFiles(s"$dir/byz", custBox)
    val dateOnZ = matchingFiles(s"$dir/byz", dateBox)
    info(s"files touched — 1-D: cust=$custOn1d date=$dateOn1d; " +
      s"z: cust=$custOnZ date=$dateOnZ (of $nFiles)")

    // the 1-D layout serves its own dimension…
    assert(custOn1d <= 2)
    // …and sprays the other across (nearly) every file
    assert(dateOn1d >= nFiles - 2)
    // the z-layout serves BOTH with a fraction of the files (a full-height
    // strip crosses ~sqrt(nFiles) tiles plus curve-boundary spill, so the
    // bound is 2/3, not 1/2 — the win grows with file count at scale)
    assert(custOnZ <= nFiles * 2 / 3, s"cust box on z touched $custOnZ")
    assert(dateOnZ <= nFiles * 2 / 3, s"date box on z touched $dateOnZ")
    // and its worst dimension beats the 1-D layout's worst dimension
    assert(math.max(custOnZ, dateOnZ) < math.max(custOn1d, dateOn1d))
  }
}
