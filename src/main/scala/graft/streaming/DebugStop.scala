package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Enforcement for the config's `debug` element (json/3.debug.adoc;
  * parsed by [[ConfigLoader.DebugConf]]) — bounded-run stop triggers for
  * controlled tests, mapped onto the engine's own units:
  *
  *   - `stop-checkpoints` → stop after N micro-batches (the micro-batch
  *     is the LWN-checkpoint analogue, SURVEY §1.1);
  *   - `stop-transactions` → stop after N COMMITTED transactions,
  *     observed as drained keyed-state rows (a commit removes its XID's
  *     state row, so the progress events' `numRowsRemoved` counts
  *     exactly the processed transactions);
  *   - `owner`/`table` → [[checkBatch]] inside foreachBatch stops the
  *     query as soon as any materialized DML touches the debug table
  *     (the reference stops on DML to it, commit not required).
  *
  * Stops are asynchronous (`query.stop()` from the listener thread or
  * the batch seam), matching the reference's "abrupt termination"
  * caution — in-flight batch output may or may not be emitted.
  */
object DebugStop {

  final class Stopper(query: StreamingQuery, conf: ConfigLoader.DebugConf)
      extends StreamingQueryListener {
    private val batches = new AtomicLong
    private val drained = new AtomicLong
    @volatile var stopReason: Option[String] = None

    private def stop(reason: String): Unit = {
      if (stopReason.isEmpty) stopReason = Some(reason)
      // stop() from the listener thread deadlocks the stream execution
      // thread it is called back from — hand it to a daemon thread
      val t = new Thread(() => try query.stop() catch { case _: Throwable => },
        "graft-debug-stop")
      t.setDaemon(true)
      t.start()
    }

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.id == query.id) {
        val n = batches.incrementAndGet()
        if (conf.stopCheckpoints > 0 && n >= conf.stopCheckpoints)
          stop(s"stop-checkpoints: $n micro-batches")
        val so = e.progress.stateOperators
        if (conf.stopTransactions > 0 && so != null && so.nonEmpty) {
          val d = drained.addAndGet(so.map(_.numRowsRemoved).sum)
          if (d >= conf.stopTransactions)
            stop(s"stop-transactions: $d committed")
        }
      }
  }

  /** Attach the batch/transaction stop counters to a running query. */
  def attach(spark: SparkSession, query: StreamingQuery,
      conf: ConfigLoader.DebugConf): Stopper = {
    val s = new Stopper(query, conf)
    spark.streams.addListener(s)
    s
  }

  def detach(spark: SparkSession, s: Stopper): Unit =
    spark.streams.removeListener(s)

  /** foreachBatch seam for the debug-table trigger: returns true (and
    * stops `query`, when given) if any message in the batch touches
    * `owner`.`table`. The check is one short aggregation over the
    * already-materialized batch — no extra scan. */
  def checkBatch(batch: DataFrame, conf: ConfigLoader.DebugConf,
      query: Option[StreamingQuery] = None): Boolean = {
    if (conf.owner.isEmpty || conf.table.isEmpty) false
    else {
      val hit = batch
        .filter(upper(col("owner")) === conf.owner.toUpperCase &&
          upper(col("table_name")) === conf.table.toUpperCase)
        .limit(1).count() > 0
      if (hit) query.foreach { q =>
        val t = new Thread(() => try q.stop() catch { case _: Throwable => },
          "graft-debug-stop")
        t.setDaemon(true)
        t.start()
      }
      hit
    }
  }
}
