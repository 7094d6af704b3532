package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pair each row with its successor id in ONE pass — the (id, id+1)
  * candidate primitive used by the pairwise-similarity queries (q26 n-gram
  * Jaccard, q30 cosine pairs, q34 embedding near-dup).
  *
  * Shape matters at scale: a self-join on `id_b = id_a + 1` shuffles and
  * sorts BOTH sides and evaluates the (possibly expensive) payload twice;
  * a global `lead() OVER (ORDER BY id)` is one pass but an unpartitioned
  * window — Spark moves every row into a single task. This instead buckets
  * ids by range (`id div width`), duplicates only each bucket's first row
  * into the previous bucket so boundary pairs (k·width−1, k·width) stay
  * visible, and runs `lead` per bucket: one shuffle on a dense key, window
  * partitions capped at `width` rows, every bucket independent — the plan
  * a 1000-executor cluster wants.
  */
object AdjacentPairs {

  /** All columns of `df` paired with the next-id row's: `<c>_a`/`<c>_b`
    * for every column c, keeping only rows where id_b == id_a + 1.
    * `id` must be a non-negative integral column, unique per row.
    * Width trades per-task payload (≤ width rows buffered per window
    * group, which for wide payloads like embeddings is the bound that
    * matters) against boundary-row duplication (1/width): 1024 keeps a
    * 768-float embedding window under ~3 MB and still splits even a
    * small corpus across tasks. */
  def pairs(df: DataFrame, id: String, width: Long = 1024L): DataFrame = {
    val payload = df.columns.filter(_ != id).toSeq
    val bucketed = df.withColumn("__bucket",
      explode(
        when(pmod(col(id), lit(width)) === 0,
          array(expr(s"$id div $width"), expr(s"$id div $width - 1")))
          .otherwise(array(expr(s"$id div $width")))))
    val w = Window.partitionBy("__bucket").orderBy(col(id))
    val led = payload.foldLeft(
      bucketed.withColumn("__id_b", lead(col(id), 1).over(w))) { (d, c) =>
      d.withColumn(s"__${c}_b", lead(col(c), 1).over(w))
    }
    led.filter(col("__id_b") === col(id) + 1)
      .select(col(id).as(s"${id}_a") +: col("__id_b").as(s"${id}_b") +:
        (payload.map(c => col(c).as(s"${c}_a")) ++
          payload.map(c => col(s"__${c}_b").as(s"${c}_b"))): _*)
  }
}
