package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage breakdown of ONE query: stage id, callsite, task count,
  * summed task time — where JobProfile's aggregate says a query is
  * job-bound, this says which call sites own the jobs. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q136_curation_e2e")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.01")
    try fn(spark, warmDir).count() catch { case _: Throwable => }
    try fn(spark, sfDir).count() catch { case _: Throwable => }
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var t0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        rows.add(f"[${(System.nanoTime() - t0) / 1e9}%6.2f] stage ${i.stageId}%4d " +
          f"${i.taskMetrics.executorRunTime / 1e3}%6.2f task_s " +
          f"${i.numTasks}%4d tasks  ${i.name.take(90)}")
      }
    })
    t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(400)
    rows.forEach(println)
    println(f"TOTAL wall $wall%.2f s")
    spark.stop()
  }
}
