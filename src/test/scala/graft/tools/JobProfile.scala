package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: for each query matching the regex, report
  * wall seconds alongside the scheduler-side counters that explain them —
  * jobs launched, stages, tasks, summed task time, and shuffle bytes.
  * A query whose wall time is many times `task_s / cores` is bound by
  * job-launch/round-trip latency (driver loops, eager checkpoints,
  * broadcast builds, convergence counts), not by data work: the r16
  * optimization target list is exactly that ranking.
  *
  * Usage: JobProfile <sfDir> <nameRegex> [reps=3]
  */
object JobProfile {
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

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNs.addAndGet(m.executorRunTime * 1000000L)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => pattern.findFirstIn(kv._1).isDefined)
    // steady-state warmup at the small SF (the Bench discipline)
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.01")
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => } }

    def releaseBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(200)
    }

    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stg"}%5s " +
      f"${"tasks"}%6s ${"task_s"}%7s ${"shufMB"}%7s")
    picked.foreach { case (name, fn) =>
      var bestWall = Double.MaxValue
      var best = (0, 0, 0, 0.0, 0.0)
      (1 to reps).foreach { _ =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskNs.set(0); shufR.set(0); shufW.set(0)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain
        if (wall < bestWall) {
          bestWall = wall
          best = (jobs.get, stages.get, tasks.get, taskNs.get / 1e9,
            (shufR.get + shufW.get) / 2.0 / 1024 / 1024)
        }
      }
      releaseBlocks()
      println(f"$name%-28s $bestWall%7.3f ${best._1}%5d ${best._2}%5d " +
        f"${best._3}%6d ${best._4}%7.2f ${best._5}%7.2f")
    }
    spark.stop()
  }
}
