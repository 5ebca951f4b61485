package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) for parquet-table workflows — the warehouse
  * operation plain OSS Spark has no verb for: apply a (possibly partial)
  * `updates` table to `target` by key, where matched rows take the
  * update's values, unmatched updates insert, and unmatched target rows
  * carry over unchanged.
  *
  * Scale shape: ONE full-outer shuffle join on the key and a per-column
  * coalesce projection — the minimum MERGE semantics force. The target is
  * scanned once and never moves twice; nothing is collected. Updates may
  * carry any SUBSET of target's columns (plus the key): columns absent
  * from the updates keep the target's value even for matched rows, and
  * inserts take NULL there — classic MERGE column semantics. A `__upd`
  * presence marker (not null-coalescing on data columns) decides matched
  * overwrites, so an update can legitimately SET a column to NULL.
  */
object Upsert {

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updCols = updates.columns.toSet
    require(keys.forall(updCols.contains), "updates must carry every key column")
    val t = target.as("t")
    val u = updates.withColumn("__upd", lit(true)).as("u")
    val cond = keys.map(k => col(s"t.$k") === col(s"u.$k")).reduce(_ && _)
    t.join(u, cond, "full_outer")
      .select(target.columns.map { c =>
        if (keys.contains(c)) coalesce(col(s"u.$c"), col(s"t.$c")).as(c)
        else if (updCols.contains(c))
          when(col("__upd").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
        else col(s"t.$c").as(c)
      }: _*)
  }
}
