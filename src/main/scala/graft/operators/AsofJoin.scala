package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row (by
  * event time) with the same key and time <= left time. Spark has no native
  * as-of join; the naive formulation (range join + per-left max) explodes
  * into O(|L|·|R| per key) pairs.
  *
  * This implementation uses the union-sort trick: tag both sides, union,
  * and carry right-side values forward with `last(..., ignoreNulls)` over a
  * (key, time)-ordered window. Cost = ONE shuffle on the key (the window),
  * no pair blowup — at 100 TB this is a single sort-merge pass, the same
  * shape databases use for ASOF JOIN.
  *
  * Ties: right rows sort before left rows at equal times (a right row
  * exactly at the left time matches), and among equal right times the
  * highest `rightSeq` wins — callers must pass a unique tiebreak column to
  * make the join deterministic.
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
      rightVals: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    // Right-side values travel as ONE struct: last(_, ignoreNulls) then
    // skips left rows (null struct) but still attaches the most recent
    // right ROW even when one of its value fields is genuinely NULL —
    // per-value carrying would fall back to a stale older row's value.
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)))
    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast("long").as("__seq"),
        lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(col)): _*)
    val rTagged = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightSeq).cast("long").as("__seq"),
        struct(rightVals.map(col): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumn("__rvlast", last(col("__rv"), ignoreNulls = true).over(w))
      .select(
        (Seq(col("__side")) ++
          leftCols.map(col) ++
          rightVals.map(v => col("__rvlast").getField(v).as(v))): _*)

    carried.filter(col("__side") === 1).drop("__side")
  }
}
