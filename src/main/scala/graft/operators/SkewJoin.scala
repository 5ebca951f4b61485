package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handling splits
  * oversized partitions at runtime, but only for sort-merge joins and only
  * per-partition; when one key dominates (a null-like sentinel, a "guest"
  * user, an empty-document hash), pre-salting is the deterministic fix:
  *
  *   - the LEFT (big, skewed) side gets a salt in [0, salts) derived by
  *     hashing a uniqueness column — rows of one hot key spread over
  *     `salts` shuffle partitions;
  *   - the RIGHT side is replicated `salts` times (explode of a literal
  *     range — cheap when right is the smaller side);
  *   - the join key becomes (key, salt).
  *
  * Semantics are identical to `left.join(right, keys)` for any inner
  * equi-join; only the shuffle layout changes.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBy: String,
      salts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(salts.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
