package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  final case class Scored(query_id: Long, vec_id: Long, cos: Double)

  /** Typed top-k aggregator: the buffer is a k-bounded sorted list, so the
    * aggregation is PARTIAL on the map side (each input partition reduces
    * to <= k rows per query before the shuffle) and the exchange moves only
    * q × partitions × k entries. A window over spark_partition_id does NOT
    * achieve this — the window itself shuffles every scored row first. */
  private final class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] = {
      if (buf.size >= k && (buf.last.cos > s.cos ||
          (buf.last.cos == s.cos && buf.last.vec_id < s.vec_id))) buf
      else (buf :+ s).sortBy(x => (-x.cos, x.vec_id)).take(k)
    }
    override def zero: Seq[Scored] = Nil
    override def reduce(buf: Seq[Scored], s: Scored): Seq[Scored] = insert(buf, s)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Scored]): Seq[Scored] =
      buf.sortBy(x => (-x.cos, x.vec_id))
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Exact cosine top-k for each query vector. Scoring is a map-only pass
    * (queries broadcast); selection is the typed partial top-k aggregator
    * above, so the only shuffle carries k-bounded buffers per (query,
    * partition) — the corpus itself never moves. */
  def topKBruteForce(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
      .as[Scored]
    scored.groupByKey(_.query_id)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (_, topk) =>
        topk.zipWithIndex.map { case (s, i) => (s.query_id, s.vec_id, s.cos, i + 1) }
      }
      .toDF("query_id", "vec_id", "cos", "rank")
  }

  /** LSH-bucketed ANN: corpus bucketed once per table by banded
    * random-hyperplane signatures; each query probes, per table, its own
    * bucket plus all hamming-1 neighbor buckets (multi-probe). A corpus
    * vector is scored if it shares a probed bucket in ANY table; exact
    * cosine ranks within the probed buckets.
    *
    * `nBits <= 0` (default) derives bucket width from the corpus count
    * ([[Dedup.nBitsFor]]) so bucket occupancy — the per-probe scan cost —
    * stays constant as the corpus grows; `nTables` independent plane
    * families hold recall up as nBits grows (the minhash-band trick).
    * Pass `n` (the corpus row count) when known to skip the count() job —
    * for a filtered/computed corpus that job re-runs the upstream plan. */
  def topKLsh(emb: DataFrame, queries: DataFrame, k: Int = 5, nBits: Int = 0,
      dim: Int = 64, nTables: Int = 2, n: Long = -1L): DataFrame = {
    Dedup.validateDim(emb, dim)
    val bits = if (nBits > 0) nBits else Dedup.nBitsFor(if (n > 0) n else emb.count())
    // the probes side is broadcast, so carrying v through the bucket
    // explode keeps the corpus map-side (never shuffled)
    val corpus = Dedup.multiTableBuckets(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      bits, dim, nTables, carry = Seq("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    // per-table query signature, bound once, then exploded into the probe
    // set: own bucket + each single-bit flip (qbucket is a bound attribute
    // here, so the flips are cheap bitwise ops, not signature recomputes)
    val qb = q.select(col("query_id"), col("qv"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          Dedup.hyperplaneBucket(col("qv"), bits, dim, t).as("qbucket"))): _*)).as("tb"))
      .select(col("query_id"), col("qv"), col("tb.t").as("t"), col("tb.qbucket").as("qbucket"))
    val probes = qb.select(col("query_id"), col("qv"), col("t"),
      explode(concat(array(col("qbucket")),
        transform(sequence(lit(0), lit(bits - 1)),
          i => col("qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("bucket"))
    val scored = corpus.join(broadcast(probes), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
      .distinct() // a (query, vec) pair can collide in several tables/probes
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the coarse-quantizer scale path
  // ------------------------------------------------------------------

  /** Deterministic spherical k-means centroids (Lloyd's, fixed iterations)
    * trained on a hash-ordered SAMPLE of the corpus.
    *
    * The sample is the `sampleSize` vectors with the smallest
    * xxhash64(vec_id) — a uniform, reproducible draw with no RNG state,
    * collected with one TakeOrdered pass (map-side top-k per partition,
    * tiny reduce). Lloyd's then iterates DRIVER-SIDE on that sample: at
    * 100 TB the training cost is one corpus scan instead of `iters`
    * full-corpus passes with two jobs each, and the driver holds only
    * sampleSize × dim doubles. Centroid quality is statistically identical
    * — k-means centroids estimated on a uniform sample converge at
    * O(1/sqrt(sampleSize)), far below the quantization error nProbe
    * absorbs. Initialization = first nCentroids of the sample, which is
    * exactly the full-corpus init (same hash order). */
  def trainCentroids(
      emb: DataFrame,
      nCentroids: Int,
      iters: Int = 3,
      sampleSize: Int = 4096): Array[Array[Double]] = {
    require(sampleSize >= nCentroids, s"sampleSize $sampleSize < nCentroids $nCentroids")
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val sample: Array[Array[Double]] = corpus
      .orderBy(xxhash64(col("vec_id").cast("string")), col("vec_id"))
      .limit(sampleSize)
      .collect().map(_.getSeq[Double](1).toArray)
    var centroids = sample.take(nCentroids)
    val dim = centroids(0).length
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nCentroids)(Array.fill(dim)(0.0))
      val counts = Array.fill(nCentroids)(0L)
      sample.foreach { v =>
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < nCentroids) {
          val s = cos(v, centroids(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old // empty cluster keeps its centroid
        else {
          val mean = sums(c).map(_ / counts(c))
          val n = math.sqrt(mean.map(x => x * x).sum)
          if (n == 0.0) old else mean.map(_ / n)
        }
      }
    }
    centroids
  }

  /** IVF ANN: assign the corpus to its nearest centroid ONCE (one map
    * pass), then each query probes only its `nProbe` closest centroids'
    * inverted lists — the corpus shuffle is a single int-keyed
    * partitioning, and query cost scales with nProbe/nCentroids of the
    * data. Exact cosine ranks within the probed lists. */
  def topKIvf(
      spark: SparkSession,
      emb: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val centroids = trainCentroids(emb, nCentroids)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("scores", transform(cLit, c => Dedup.cosine(col("v"), c)))
      .withColumn("cid",
        (array_position(col("scores"), array_max(col("scores"))) - 1).cast("int"))
      .drop("scores")
    val probes = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("scores", transform(cLit, c => Dedup.cosine(col("qv"), c)))
      .withColumn("cid", explode(slice(
        // centroid ids sorted by query-to-centroid similarity, best first
        transform(array_sort(zip_with(col("scores"),
          sequence(lit(0), lit(nCentroids - 1)),
          (s, i) => struct((-s).as("negs"), i.as("i")))), p => p.getField("i")),
        1, nProbe)))
      .select(col("query_id"), col("qv"), col("cid").cast("int").as("cid"))
    val scored = corpus.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("v"), col("qv")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** L2 norm of a double-array vector, folded in element order — the same
    * sequential accumulation every engine's list-sum uses, so the value is
    * bit-identical cross-engine. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))

  /** L2-normalize a vector given its precomputed norm (bind the norm to a
    * column of the same projection — an inline l2Norm(v) would re-fold the
    * array once per element). Zero vectors pass through unchanged. */
  def l2Normalize(v: Column, norm: Column): Column =
    when(norm > 0, transform(v, x => x / norm)).otherwise(v)

  /** Symmetric int8 scalar quantization of a double-array vector:
    * q_i = floor(x_i · 127 / max|x| + 0.5), the 4× storage reduction an
    * ANN corpus takes before sharding (dequantize with scale = max|x|/127).
    * Rounding is an explicit floor(+0.5) — round-half-up — so the result
    * is bit-identical in any engine computing in doubles (no dependence on
    * an engine's round() tie rule). Map-only; `maxAbs` must be the bound
    * column of the same projection (lambda re-evaluation pitfall). */
  def quantizeInt8(v: Column, maxAbs: Column): Column =
    transform(v, x =>
      when(maxAbs > 0, floor(x * lit(127.0) / maxAbs + lit(0.5)).cast("long"))
        .otherwise(lit(0L)))
}
