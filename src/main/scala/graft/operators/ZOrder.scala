package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the multi-dimensional clustering tool
  * for 100 TB tables (the Delta/Iceberg OPTIMIZE ZORDER idea, expressed
  * as plain columns so any write path can use it).
  *
  * Why it matters at scale: parquet skipping is driven by per-file and
  * per-row-group min/max stats, which only prune on the SORT dimension.
  * A table laid out by `o_custkey` answers customer-range scans with a
  * few files but date-range scans with ALL files. Interleaving the bits
  * of both keys makes file min/max ranges approximate 2-D tiles, so
  * range predicates on EITHER dimension (or both) prune to ~sqrt of the
  * files instead of all of them — ZOrderSpec measures exactly that on a
  * real two-layout write.
  *
  * The key is pure per-row integer arithmetic (built-in functions only,
  * codegen'd, no UDF) and deterministic, so it is oracle-gated
  * hash-for-hash as q107.
  */
object ZOrder {

  /** Interleave the low `bits` of two NON-NEGATIVE long columns:
    * result bit 2i = bit i of x, bit 2i+1 = bit i of y. Values must fit
    * `bits` (callers normalize/clamp first); 2·bits ≤ 62. */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc
        + call_function("shiftleft",
            call_function("shiftright", x, i) % 2L, i * 2)
        + call_function("shiftleft",
            call_function("shiftright", y, i) % 2L, i * 2 + 1))
  }

  /** Scale a long column from [lo, hi] onto the full [0, 2^bits) range,
    * clamping out-of-range values. Interleaving only clusters well when
    * every dimension spans comparable bit-widths — a dimension whose
    * values share constant high bits (epoch days, ids with an offset)
    * otherwise dominates the key and degrades z-order to a 1-D sort.
    * This is the cheap stand-in for the rank/range-id normalization the
    * OPTIMIZE ZORDER implementations use; lo/hi come from stats the
    * writer already has. */
  def normalize(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = math.max(1L, hi - lo)
    val top = (1L << bits) - 1
    least(lit(top), greatest(lit(0L),
      floor((v - lit(lo)).cast("double") * top / span).cast("long")))
  }

  /** Write `df` range-partitioned + sorted by the z-key: each output file
    * covers one contiguous z-range ≙ one 2-D tile, which is what makes
    * min/max skipping effective on both dimensions. */
  def writeZOrdered(df: DataFrame, zkey: Column, path: String,
      files: Int): Unit =
    df.withColumn("_z", zkey)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
