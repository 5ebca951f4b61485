package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without a nested loop.
  *
  * Spark plans a pure theta join — `ON p.v BETWEEN i.lo AND i.hi` with no
  * equi key — as BroadcastNestedLoopJoin (or worse, a cartesian), an
  * O(points × intervals) scan that is THE classic scale trap for
  * point-in-range enrichment (IP→geo ranges, value bands, validity
  * windows). Binning restores an equi key: every interval registers in
  * each fixed-width bin it overlaps, a point looks up only its own bin,
  * and the exact predicate re-checks inside the bin — turning the plan
  * into a plain shuffled hash/sort-merge join both sides partition on.
  *
  * Cost model: the interval side replicates by its bin span
  * (ceil(len/binWidth) + 1 rows per interval), the point side not at all,
  * and each (point, interval) candidate pair arises in EXACTLY one bin —
  * the point's own — so no post-join dedup is needed. Pick `binWidth` of
  * the order of the typical interval length: too small replicates
  * intervals, too wide packs unrelated rows into one bin (the per-bin
  * fan-in is what the join's hash table sees). Skewed value
  * distributions concentrate bins; AQE's skew split handles the hot ones
  * (same posture as the substring-dedup join).
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose [loCol, hiCol]
    * (inclusive both ends) contains `pointCol`. Column names across the
    * two frames must be disjoint; intervals with hi < lo are dropped
    * (empty by definition). Bin arithmetic is IEEE-exact cross-engine:
    * floor of a double division, monotone in the point value, so an
    * interval always covers its points' bins. */
  def binned(points: DataFrame, pointCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")
    val p = points.withColumn("__pbin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__ibin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, col("__pbin") === col("__ibin") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__pbin", "__ibin")
  }
}
