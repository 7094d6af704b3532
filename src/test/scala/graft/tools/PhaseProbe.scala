package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round probe: split each query's wall time into
  *   - build_s: `fn(spark, dir)` — plan construction + any EAGER work the
  *     query does before its action (index builds, fixture checkpoints,
  *     driver-side artifacts, analysis of big literal synths);
  *   - exec_s: the `count()` action (optimization + AQE jobs + tasks).
  * A tail query whose build_s dominates is bound by driver-side plan/eager
  * work, not by the scheduler floor — a different fix (guide §7.3).
  *
  * Usage: PhaseProbe <sfDir> <nameRegex> [reps=3]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pattern = args.lift(1).getOrElse(".*").r
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => pattern.findFirstIn(kv._1).isDefined)
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.01")
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => } }

    def releaseBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(200)
    }

    println(f"${"query"}%-28s ${"wall_s"}%7s ${"build_s"}%8s ${"exec_s"}%7s")
    picked.foreach { case (name, fn) =>
      var bw = Double.MaxValue
      var bb = 0.0
      var be = 0.0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = try fn(spark, sfDir) catch { case _: Throwable => null }
        val t1 = System.nanoTime()
        if (df != null) { try df.count() catch { case _: Throwable => } }
        val t2 = System.nanoTime()
        val w = (t2 - t0) / 1e9
        if (w < bw) { bw = w; bb = (t1 - t0) / 1e9; be = (t2 - t1) / 1e9 }
      }
      releaseBlocks()
      println(f"$name%-28s $bw%7.3f $bb%8.3f $be%7.3f")
    }
    spark.stop()
  }
}
