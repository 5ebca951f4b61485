package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order data layout — the clustering lever for multi-dimensional scan
  * pruning at 100 TB. Parquet min/max statistics prune row groups only
  * when the layout makes per-file ranges TIGHT; a single-column sort
  * tightens one dimension and scrambles the rest, while z-ordering
  * (interleaving the bits of the clustering keys and range-partitioning +
  * sorting on the interleaved value) keeps every clustered dimension's
  * per-file range compact, so a conjunctive box predicate skips all but
  * the files whose z-region intersects the box.
  *
  * The z-value is computed entirely with codegen'd bitwise Column
  * arithmetic (the classic shift-or-mask bit spread) — no UDF; the only
  * extra work over a plain sorted write is one stats-sized min/max
  * aggregate to normalize the keys to 16 bits.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions (classic
    * shift-or-mask interleave step), in long arithmetic. */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: a in even bits, b in odd. */
  def zkey2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale an integral column into [0, 65535] over [lo, hi] (integer
    * arithmetic; degenerate ranges collapse to 0). */
  private def norm16(c: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    // Column./ is double division; the products here stay well inside
    // double's exact-integer range, so floor+cast restores exact longs
    else floor((c.cast("long") - lo) * 65535L / (hi - lo)).cast("long")

  /** Write `df` z-clustered on two integral columns into `nFiles` parquet
    * files: one stats aggregate for the normalization bounds, then
    * range-partition + sort on the Morton code. Every output file covers a
    * compact z-region, so min/max stats are tight in BOTH dimensions. */
  def writeZordered2(df: DataFrame, ca: String, cb: String,
      nFiles: Int, path: String): Unit = {
    val r = df.agg(
      min(col(ca).cast("long")), max(col(ca).cast("long")),
      min(col(cb).cast("long")), max(col(cb).cast("long"))).collect()(0)
    if (r.isNullAt(0)) { // empty input: nothing to cluster, write the schema
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zkey2(
      norm16(col(ca), r.getLong(0), r.getLong(1)),
      norm16(col(cb), r.getLong(2), r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
