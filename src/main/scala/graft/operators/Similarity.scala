package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3 #41-42).
  *
  * Scale shape: the corpus is NEVER shuffled whole. Brute force scores
  * per-partition and pre-selects k rows per (query, partition) before the
  * only shuffle (q × partitions × k scored 3-column rows); the LSH variant
  * buckets the corpus once and probes only matching buckets.
  */
object Similarity {

  /** Exact cosine top-k for each query vector, two-stage:
    * stage 1 (map-side): score + per-(query, input-partition) top-k via a
    * window keyed by spark_partition_id — no data movement;
    * stage 2: global top-k over the q·p·k survivors. Queries are a broadcast
    * (tiny by construction). */
  def topKBruteForce(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("pid", spark_partition_id())
    val partial = Window.partitionBy(col("query_id"), col("pid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("prn", row_number().over(partial)).filter(col("prn") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: corpus bucketed once by random-hyperplane signature;
    * each query probes its own bucket plus all hamming-1 neighbor buckets
    * (multi-probe — recovers most of the recall the quantization loses).
    * Exact cosine ranks within the probed buckets. */
  def topKLsh(emb: DataFrame, queries: DataFrame, k: Int = 5, nBits: Int = 8,
      dim: Int = 64): DataFrame = {
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("bucket", Dedup.hyperplaneBucket(col("v"), nBits, dim))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("qbucket", Dedup.hyperplaneBucket(col("qv"), nBits, dim))
    // multi-probe: own bucket + flip each of the nBits bits once
    val probes = q.select(col("query_id"), col("qv"),
      explode(concat(array(col("qbucket")),
        transform(sequence(lit(0), lit(nBits - 1)),
          i => col("qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("bucket"))
    val scored = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }
}
