package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T6/J3 LOB page assembly (SURVEY.md §2.3/§2.5).
  *
  * In the reference, LOB column values arrive page-wise under their own
  * opcodes (19.1/26.2/26.6), possibly before the owning DML; `LobCtx` maps
  * lobId → page chain and the builder stitches pages into the column value
  * at materialization (`src/common/LobCtx.cpp:28-187`, orphan parking
  * `src/parser/Parser.cpp:1214-1220`).
  *
  * Spark-first translation: LOB pages are just rows — one `groupBy(lobId)`
  * with an order-restoring `array_sort` rebuilds every chain in a single
  * shuffle, and matching chains to their owning DML (J3) is a join on the
  * lobId reference, not keyed state. Orphaned chains (no owning DML) fall
  * out of the join unmatched — the relational analogue of LobCtx parking
  * then discarding them.
  *
  * Feed convention: a page event has `op = LOB_DATA` and carries
  * `after = {lobId, page, data}`. A DML column whose value is a LOB stores
  * the reference marker `"lob:<lobId>"`; [[resolve]] replaces markers
  * with assembled chain data.
  */
object LobAssembly {

  /** Marker prefix a DML column value uses to reference a LOB chain. */
  val Marker = "lob:"

  /** Assemble page events into full LOB values: one row per lobId with the
    * pages concatenated in page order.
    *
    * Scale shape: single shuffle on lobId; per-group work is the sorted
    * concat (array_sort + array_join, codegen'd); chain size is bounded by
    * the reference's LOB page-chain length, not by the feed size.
    */
  def assemble(events: DataFrame): DataFrame =
    events.filter(col("op") === Op.LobData)
      .select(
        element_at(col("after"), "lobId").as("lob_id"),
        element_at(col("after"), "page").cast("int").as("page"),
        element_at(col("after"), "data").as("chunk"))
      .filter(col("lob_id").isNotNull && col("page").isNotNull)
      .groupBy("lob_id")
      .agg(
        count(lit(1)).as("n_pages"),
        array_join(
          transform(array_sort(collect_list(struct(col("page"), col("chunk")))),
            p => p.getField("chunk")),
          "").as("lob_data"))

  /** J3: replace `lob:<id>` markers in the before/after images of
    * materialized messages with assembled chain data.
    *
    * Plan: extract the (few) lob references per message, join ONLY those
    * against the assembled chains, regroup to a per-message lobId→data map,
    * and rewrite the images with `transform_values`. The shuffle is
    * proportional to the number of LOB references, never to image width.
    * Unresolved markers (missing chain = orphaned owner) become null —
    * the reference emits LOB columns only when the chain is complete.
    */
  def resolve(messages: DataFrame, lobs: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    val emptyMap = map().cast("map<string,string>")
    val refsOf = (img: Column) =>
      transform(
        filter(map_values(coalesce(img, emptyMap)),
          v => v.startsWith(Marker)),
        v => v.substr(lit(Marker.length + 1), lit(Int.MaxValue)))
    val keyed = messages.withColumn("_refs",
      array_distinct(concat(refsOf(col("before")), refsOf(col("after")))))

    val refs = keyed
      .filter(size(col("_refs")) > 0)
      .select(col("xid"), col("cScn"), col("cIdx"),
        explode(col("_refs")).as("lob_id"))
    val resolved = refs
      .join(lobs.select(col("lob_id"), col("lob_data")), Seq("lob_id"), "left")
      .groupBy("xid", "cScn", "cIdx")
      .agg(map_from_entries(
        collect_list(struct(col("lob_id"), col("lob_data")))).as("_lobmap"))

    val rewrite = (img: Column, lobmap: Column) =>
      when(img.isNull, img).otherwise(
        transform_values(img, (_, v) =>
          when(v.startsWith(Marker),
            element_at(coalesce(lobmap, emptyMap),
              v.substr(lit(Marker.length + 1), lit(Int.MaxValue))))
            .otherwise(v)))

    keyed
      .join(resolved, Seq("xid", "cScn", "cIdx"), "left")
      .withColumn("before", rewrite(col("before"), col("_lobmap")))
      .withColumn("after", rewrite(col("after"), col("_lobmap")))
      .drop("_refs", "_lobmap")
  }

  // ---- streaming path (T6 across micro-batches) -------------------------

  /** One event on the lobId-keyed stream: a parked page (`kind = "page"`)
    * or an owning-DML reference (`kind = "ref"`, carrying the owner's
    * message coordinates). */
  case class LobEvent(lobId: String, kind: String, page: Int, data: String,
      xid: String, cScn: Long, cIdx: Long, scn: Long)

  /** Parked page chain per lobId (the LobCtx analogue). */
  case class LobChainState(pages: Seq[(Int, String)])

  /** A reference resolved against its (possibly cross-batch) chain.
    * `lobData = None` reproduces the batch path's orphaned-owner rule. */
  case class ResolvedLob(xid: String, cScn: Long, cIdx: Long,
      lobId: String, lobData: Option[String], nPages: Int)

  /** Streaming T6: pages park in lobId-keyed state across micro-batch
    * boundaries; an owning reference consumes the parked chain when it
    * arrives (pages sorted by page number, like [[assemble]]), after
    * which the chain is PURGED — the reference frees LobCtx data once
    * the owning DML materializes. A chain no owner ever claims times out
    * after `orphanTtlMs` (processing time) and is dropped, the streaming
    * analogue of Parser.cpp:1214-1220's orphan parking + discard.
    *
    * Scale shape: state per lobId holds only that chain's pages (chain
    * length is a page-chain bound, not feed-sized) and drains on
    * ownership, so store size ∝ in-flight chains — the same
    * open-work-only discipline as TxnAssembly's keyed state. */
  def streamResolve(events: org.apache.spark.sql.Dataset[LobEvent],
      orphanTtlMs: Long = 0L)(
      implicit spark: SparkSession): org.apache.spark.sql.Dataset[ResolvedLob] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val timeout =
      if (orphanTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.lobId).flatMapGroupsWithState(
      OutputMode.Append, timeout)(
      (lobId: String, it: Iterator[LobEvent],
          state: GroupState[LobChainState]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // within a batch the group arrives unordered; scn order is the
          // redo order (pages precede their owning DML's commit)
          var pages = state.getOption.map(_.pages).getOrElse(Seq.empty)
          val out = Seq.newBuilder[ResolvedLob]
          it.toSeq.sortBy(_.scn).foreach { e =>
            if (e.kind == "page") pages = pages :+ (e.page -> e.data)
            else {
              val chain = pages.sortBy(_._1)
              out += ResolvedLob(e.xid, e.cScn, e.cIdx, lobId,
                if (chain.isEmpty) None else Some(chain.map(_._2).mkString),
                chain.size)
              pages = Seq.empty // purge on materialization
            }
          }
          if (pages.nonEmpty) {
            state.update(LobChainState(pages))
            if (orphanTtlMs > 0) state.setTimeoutDuration(orphanTtlMs)
          } else state.remove()
          out.result().iterator
        }
      })
  }

  /** Adapter: the ChangeEvent feed → the lobId-keyed [[LobEvent]] stream.
    * Page events come from `op = LOB_DATA`; references from DML events
    * whose before OR after image carries `lob:<id>` markers (one event
    * per distinct marker — the same two-image extraction the batch
    * [[resolve]] performs, in streaming shape). */
  def toLobEvents(events: org.apache.spark.sql.Dataset[ChangeEvent])(
      implicit spark: SparkSession): org.apache.spark.sql.Dataset[LobEvent] = {
    import spark.implicits._
    val pages = events.toDF().filter(col("op") === Op.LobData)
      .select(
        element_at(col("after"), "lobId").as("lobId"),
        lit("page").as("kind"),
        element_at(col("after"), "page").cast("int").as("page"),
        element_at(col("after"), "data").as("data"),
        col("xid"), col("scn").as("cScn"), lit(0L).as("cIdx"), col("scn"))
      .filter(col("lobId").isNotNull && col("page").isNotNull)
    val emptyMap = map().cast("map<string,string>")
    def refsOf(img: Column) =
      transform(
        filter(map_values(coalesce(img, emptyMap)),
          v => v.startsWith(Marker)),
        v => v.substr(lit(Marker.length + 1), lit(Int.MaxValue)))
    val refs = events.toDF().filter(col("op") =!= Op.LobData)
      .select(col("xid"), col("scn"), explode(array_distinct(
          concat(refsOf(col("before")), refsOf(col("after")))))
        .as("lobId"))
      .select(col("lobId"), lit("ref").as("kind"),
        lit(-1).as("page"), lit(null).cast("string").as("data"),
        col("xid"), col("scn").as("cScn"), lit(0L).as("cIdx"), col("scn"))
    pages.unionByName(refs).as[LobEvent]
  }
}
