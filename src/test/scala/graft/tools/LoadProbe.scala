package graft.tools

import org.apache.spark.sql.SparkSession

/** How much driver time does a bare spark.read.parquet (file listing +
  * footer schema inference) cost per Tables.load call? The bench makes
  * ~1.5k such calls across 229 queries × iterations. */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("lineitem", "documents", "embeddings", "events");
         rep <- 1 to 2) {
      val t0 = System.nanoTime()
      (1 to 50).foreach(_ => graft.core.Tables.load(spark, dir, t))
      println(f"$t rep$rep: ${(System.nanoTime() - t0) / 1e9 / 50 * 1000}%.1f ms/call")
    }
    spark.stop()
  }
}
