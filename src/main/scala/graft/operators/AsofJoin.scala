package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the nearest right row (by event
  * time) with the same key — backward (most recent right time <= left, the
  * default) or forward (earliest right time >= left), optionally bounded by
  * a tolerance predicate (the pandas `merge_asof` surface). Spark has no
  * native as-of join; the naive formulation (range join + per-left max)
  * explodes into O(|L|·|R| per key) pairs.
  *
  * This implementation uses the union-sort trick: tag both sides, union,
  * and carry right-side values forward with `last(..., ignoreNulls)` over a
  * (key, time)-ordered window (time-DESCENDING for the forward direction —
  * the "most recently seen" right row in that order is the earliest one at
  * or after the left time). Cost = ONE shuffle on the key (the window), no
  * pair blowup — at 100 TB this is a single sort-merge pass, the same
  * shape databases use for ASOF JOIN.
  *
  * Ties: right rows sort before left rows at equal times (a right row
  * exactly at the left time matches in BOTH directions), and among equal
  * right times the highest `rightSeq` wins — callers must pass a unique
  * tiebreak column to make the join deterministic.
  *
  * `tolerance`, when set, is a predicate (leftTime, rightTime) => boolean;
  * a matched row failing it has its right values nulled — the match is
  * "too stale" (backward) or "too far ahead" (forward). Expressed as a
  * predicate so callers choose the arithmetic their time types need
  * (timestamp intervals, date diffs, integer versions).
  */
object AsofJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightSeq: String,
      rightVals: Seq[String],
      forward: Boolean = false,
      tolerance: (Column, Column) => Column = null): DataFrame = {

    val leftCols = left.columns.toSeq
    // Right-side values travel as ONE struct: last(_, ignoreNulls) then
    // skips left rows (null struct) but still attaches the most recent
    // right ROW even when one of its value fields is genuinely NULL —
    // per-value carrying would fall back to a stale older row's value.
    // The right TIME rides in the struct too (field "__rt") so the
    // tolerance predicate can see which right row actually matched.
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)) :+
        right.schema(rightTime).copy(name = "__rt"))
    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast("long").as("__seq"),
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(col)): _*)
    val rTagged = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightSeq).cast("long").as("__seq"),
        struct(rightVals.map(col) :+ col(rightTime).as("__rt"): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val order =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__seq").asc)
      else Seq(col("__t").asc, col("__side").asc, col("__seq").asc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val keepMatch =
      if (tolerance == null) col("__rvlast").isNotNull
      else col("__rvlast").isNotNull &&
        tolerance(col("__t"), col("__rvlast").getField("__rt"))
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__rvlast", last(col("__rv"), ignoreNulls = true).over(w))
      .select(
        (Seq(col("__side")) ++
          leftCols.map(col) ++
          rightVals.map(v =>
            when(keepMatch, col("__rvlast").getField(v)).as(v))): _*)

    carried.filter(col("__side") === 1).drop("__side")
  }

  /** NEAREST as-of: attach whichever same-key right row is closer in time,
    * looking BOTH directions (pandas `merge_asof(direction='nearest')`).
    * Ties — equal distance before and after — keep the backward match,
    * matching pandas.
    *
    * Fused, not composed: the tagged union is built ONCE and carried twice
    * (an ascending window for the backward candidate, a descending one for
    * the forward candidate). Both windows partition on the same key, so
    * Catalyst plans ONE exchange with two sorts — not the two full
    * shuffles a backward-asof ⋈ forward-asof composition would pay.
    *
    * `distance` maps (leftTime, rightTime) to an orderable distance; the
    * default is the absolute microsecond gap, which both engines compute
    * by flooring to micros first (exact cross-engine compares). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightSeq: String,
      rightVals: Seq[String],
      distance: (Column, Column) => Column =
        (lt, rt) => abs(unix_micros(lt) - unix_micros(rt))): DataFrame = {

    val leftCols = left.columns.toSeq
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)) :+
        right.schema(rightTime).copy(name = "__rt"))
    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast("long").as("__seq"),
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(col)): _*)
    val rTagged = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightSeq).cast("long").as("__seq"),
        struct(rightVals.map(col) :+ col(rightTime).as("__rt"): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val db = distance(col("__t"), col("__b").getField("__rt"))
    val df = distance(col("__t"), col("__f").getField("__rt"))
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(db <= df, col("__b"))
      .otherwise(col("__f"))
    lTagged.unionByName(rTagged)
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__rv"), ignoreNulls = true).over(wF))
      .withColumn("__pick", pick)
      .filter(col("__side") === 1)
      .select(
        (leftCols.map(col) ++
          rightVals.map(v => col("__pick").getField(v).as(v))): _*)
  }
}
