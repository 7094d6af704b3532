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
}
