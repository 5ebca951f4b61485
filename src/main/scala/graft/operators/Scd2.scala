package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 build: turn a change log (key,
  * change-time, attributes) into validity intervals — each change row
  * becomes a version valid from its own timestamp until the key's next
  * change (`valid_to` NULL ⇒ current version). The as-of join
  * ([[AsofJoin]]) is the QUERY side of this shape; this is the BUILD side
  * a warehouse runs to materialize the dimension.
  *
  * Scale shape: one shuffle on the key and a per-key sorted lead() —
  * identical cost to any windowed pass over the change log; nothing
  * driver-side. `tiebreak` columns make same-timestamp changes
  * deterministic (the last tiebreak-ordered change wins the instant: its
  * predecessor gets a zero-length interval, never a nondeterministic
  * one). */
object Scd2 {

  def fromChangeLog(changes: DataFrame, keys: Seq[String], ts: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    // Accept either timestamp flavor: parquet written with
    // isAdjustedToUTC=false loads as TIMESTAMP_NTZ, and downstream
    // consumers (unix_micros projections, watermarks) reject NTZ. Cast once
    // at entry — sessions are pinned UTC, so the instant is preserved.
    val log = changes.schema.fields.find(_.name == ts).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        changes.withColumn(ts, col(ts).cast("timestamp"))
      case _ => changes
    }
    val order: Seq[Column] = col(ts) +: tiebreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    log
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", lead(col(ts), 1).over(w).isNull)
  }
}
