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

  /** Bits each dimension keeps in an N-way interleave: 16 for 2-3 dims,
    * then shrinking so the code stays inside the 63 non-sign bits (a set
    * sign bit would invert long ordering and scramble the range
    * partition). */
  def bitsPerDim(n: Int): Int = math.min(16, 63 / n)

  /** N-way Morton code (r10, the 100 TB layout usually interleaves 3-4
    * columns — date × key × geography): bit j of cols(i) lands at position
    * j·n + i. n=2 rides the fast shift-or-mask spread (bit-identical
    * placement); general n uses the per-bit shift-or chain — all codegen'd
    * bitwise Column arithmetic, no UDF, write-time only. */
  def zkeyN(cols: Seq[Column]): Column = {
    val n = cols.length
    require(n >= 2 && n <= 6, s"zkeyN interleaves 2-6 columns, got $n")
    if (n == 2) zkey2(cols(0), cols(1))
    else {
      val bits = bitsPerDim(n)
      cols.zipWithIndex.map { case (c, i) =>
        (0 until bits).map { j =>
          shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
        }.reduce(_.bitwiseOR(_))
      }.reduce(_.bitwiseOR(_))
    }
  }

  /** Scale an integral column into [0, 2^bits - 1] over [lo, hi]
    * (degenerate ranges collapse to 0). The arithmetic runs in DOUBLE end
    * to end: an int64 multiply (c-lo)·maxVal overflows once the range
    * exceeds ~2^47 (epoch-microsecond timestamps — the headline
    * date-dimension use case — span ~2^51), which under ANSI mode kills
    * the write job. Doubles never overflow here; for ranges past 2^53 the
    * mantissa rounds the BUCKETING (layout quality, never answers) by a
    * relative 1e-16 — deterministic, and bit-identical to the old integer
    * path wherever that path was exact. */
  private def normBits(c: Column, lo: Long, hi: Long, bits: Int): Column =
    if (hi <= lo) lit(0L)
    else floor((c.cast("double") - lit(lo.toDouble)) *
      ((1L << bits) - 1).toDouble / (hi.toDouble - lo.toDouble)).cast("long")

  /** Write `df` z-clustered on two integral columns into `nFiles` parquet
    * files — the 2-D spelling of [[writeZorderedN]]. */
  def writeZordered2(df: DataFrame, ca: String, cb: String,
      nFiles: Int, path: String): Unit =
    writeZorderedN(df, Seq(ca, cb), nFiles, path)

  /** Compact a fragmented parquet directory into ~`targetBytes` files —
    * the small-files maintenance pass every long-lived 100 TB table needs
    * (each tiny file costs a task, an open, a footer parse; metadata
    * pressure grows with file COUNT, not bytes). Sizing reads the
    * directory listing only; the data moves through `coalesce` — partition
    * CONCATENATION, no shuffle, per-file row order preserved — so
    * compaction costs one read+write pass and nothing else. Returns the
    * target file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, in: String,
      out: String, targetBytes: Long): Int = {
    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(in))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).coalesce(n)
      .write.mode("overwrite").parquet(out)
    n
  }

  /** Write `df` z-clustered on N integral columns into `nFiles` parquet
    * files: one stats aggregate for the normalization bounds, then
    * range-partition + sort on the Morton code. Every output file covers a
    * compact z-region, so min/max stats are tight in EVERY clustered
    * dimension. */
  def writeZorderedN(df: DataFrame, cs: Seq[String],
      nFiles: Int, path: String): Unit = {
    val bits = bitsPerDim(cs.length)
    val aggs = cs.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (r.isNullAt(0)) { // empty input: nothing to cluster, write the schema
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zkeyN(cs.zipWithIndex.map { case (c, i) =>
      normBits(col(c), r.getLong(2 * i), r.getLong(2 * i + 1), bits)
    })
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
