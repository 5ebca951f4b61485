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

  /** Snapshot diff — the regression check between two versions of a keyed
    * table (yesterday's build vs today's): classify every key as `added`
    * (only in `right`), `removed` (only in `left`), `changed` (both, any
    * non-key column differs — null-safe compare) or `same`. ONE full-outer
    * shuffle join on the key, the minimum the semantics force; the
    * downstream rollup is aggregate-sized. Columns must match. */
  def diff(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(left.columns.sameElements(right.columns),
      "diff requires identical schemas")
    val dataCols = left.columns.filterNot(keys.contains)
    val l = left.withColumn("__l", lit(true)).as("l")
    val r = right.withColumn("__r", lit(true)).as("r")
    val cond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val anyChanged = dataCols
      .map(c => !(col(s"l.$c") <=> col(s"r.$c")))
      .foldLeft(lit(false))(_ || _)
    l.join(r, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) :+
          when(col("__l").isNull, lit("added"))
            .when(col("__r").isNull, lit("removed"))
            .when(anyChanged, lit("changed"))
            .otherwise(lit("same")).as("diff_class"): _*)
  }

  /** Version-guarded MERGE — the CDC-apply form: a matched row takes the
    * update's values ONLY when the update's `version` tuple (compared
    * lexicographically, e.g. (ts, event_id)) is >= the target's; stale
    * or reordered updates lose. With a version tuple that totally orders
    * a key's updates, the final state after ANY partition of the update
    * stream into sequential merges is the per-key argmax — which is what
    * makes this the right apply operator under out-of-order delivery
    * (a spec proves 1-batch and N-batch replays agree). `updates` must
    * be unique per key (pre-reduce each batch to its per-key max).
    * Same one-full-outer-join scale shape as [[upsert]]; updates must
    * carry all of target's columns. */
  def upsertVersioned(target: DataFrame, updates: DataFrame,
      keys: Seq[String], version: Seq[String]): DataFrame = {
    require(version.nonEmpty, "need at least one version column")
    val updCols = updates.columns.toSet
    require(target.columns.forall(updCols.contains),
      "versioned updates must carry every target column")
    // Normalize TIMESTAMP_NTZ version/ts columns on both sides so (a) a
    // mixed-flavor struct comparison can't fail analysis and (b) the merged
    // output carries TimestampType for downstream unix_micros/watermarks.
    // Sessions are pinned UTC, so the cast preserves the instant.
    def deNtz(df: DataFrame): DataFrame =
      df.schema.fields.filter(_.dataType ==
          org.apache.spark.sql.types.TimestampNTZType)
        .foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast("timestamp")))
    val t = deNtz(target).withColumn("__tgt", lit(true)).as("t")
    val u = deNtz(updates).withColumn("__upd", lit(true)).as("u")
    val cond = keys.map(k => col(s"t.$k") === col(s"u.$k")).reduce(_ && _)
    val newer = struct(version.map(v => col(s"u.$v")): _*) >=
      struct(version.map(v => col(s"t.$v")): _*)
    val takeUpdate = col("__upd").isNotNull &&
      (col("__tgt").isNull || newer)
    t.join(u, cond, "full_outer")
      .select(target.columns.map { c =>
        when(takeUpdate, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
      }: _*)
  }
}
