package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** IVF ANN: recall against the exact answer on clustered vectors, and the
  * index contract (corpus assigned once, tiny centroid table). */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val nClusters = 8
  private val perCluster = 15

  private def center(c: Int): Array[Double] =
    Array.tabulate(dim)(j => (((c * 131 + j * 37) % 101) - 50) / 50.0)

  private lazy val corpusLocal: Seq[(Long, Array[Float])] =
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { i =>
        val id = (c * perCluster + i).toLong
        val noise = Array.tabulate(dim)(j => (((id * 17 + j * 7) % 13) - 6) / 500.0)
        id -> center(c).zip(noise).map { case (x, n) => (x + n).toFloat }
      }
    }
  private lazy val corpus: DataFrame = corpusLocal.toDF("vec_id", "embedding")
  private lazy val queries: DataFrame =
    corpusLocal.filter(_._1 % perCluster == 0).toDF("vec_id", "embedding")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("IVF top-k recall >= 0.8 on clustered vectors") {
    val k = 5
    val want = corpusLocal.filter(_._1 % perCluster == 0).map { case (qid, qv) =>
      qid -> corpusLocal.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
    val got = Similarity.topKIvf(spark, corpus, queries, k, nCentroids = 8, nProbe = 2)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = want.map { case (q, ids) =>
      got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean IVF recall $mean")
  }

  test("centroid training is deterministic (driver and distributed paths)") {
    val c1 = Similarity.trainCentroids(corpus, 4, iters = 2)
    val c2 = Similarity.trainCentroids(corpus, 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 4 && c1(0).length == dim)
    // force the distributed path (sample × k above the driver-loop gate)
    val big = (Similarity.driverLoopMaxWork / 4 + 1).toInt
    val d1 = Similarity.trainCentroids(corpus, 4, iters = 2, sampleSize = big)
    val d2 = Similarity.trainCentroids(corpus, 4, iters = 2, sampleSize = big)
    assert(d1.map(_.toSeq).toSeq == d2.map(_.toSeq).toSeq)
  }

  test("distributed training job count is bounded: 2 setup jobs + one per iteration") {
    val sc = spark.sparkContext
    sc.setJobGroup("ivf-train-count", "counting training jobs")
    val iters = 3
    // sampleSize above the driver-loop gate forces the distributed path
    // (the tiny corpus then IS the sample)
    val c = Similarity.trainCentroids(corpus, 4, iters = iters,
      sampleSize = (Similarity.driverLoopMaxWork / 4 + 1).toInt)
    sc.clearJobGroup()
    // Distributed Lloyd's: one TakeOrdered for the hash threshold, one for
    // the initial centroids (this materializes the cached sample — the ONLY
    // corpus scan), then one aggregation per iteration over the cached
    // sample (AQE materializes its shuffle stage as a second job, hence
    // 2 per iteration). The r2 version ran 1 + 2*iters FULL-CORPUS jobs.
    val jobs = sc.statusTracker.getJobIdsForGroup("ivf-train-count")
    assert(jobs.length <= 2 + 2 * iters,
      s"training ran ${jobs.length} jobs, expected <= ${2 + 2 * iters}")
    assert(c.length == 4 && c(0).length == dim)
  }

  test("training scales past the old 4096-vector driver ceiling (k=256 on sf0.1)") {
    // the documented SemDeDup lever is nCentroids ∝ n (the paper runs 50k);
    // the r6 driver-side loop threw above k=4096 and iterated
    // O(sample×k×dim) single-threaded — train at k=256 on the real sf0.1
    // embeddings to pin the distributed path end to end
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val cents = Similarity.trainCentroids(emb, 256, iters = 2)
    assert(cents.length == 256 && cents(0).length == 64)
    // spherical k-means: every trained centroid is unit-norm (or a kept
    // init vector); none may be the zero vector
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(n > 0.0, "zero-norm centroid")
    }
  }

  test("IVF-PQ composes: recall >= 0.8 on clustered vectors, true rerank cosines") {
    val k = 5
    val want = corpusLocal.filter(_._1 % perCluster == 0).map { case (qid, qv) =>
      qid -> corpusLocal.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
    val got = Similarity.topKIvfPq(spark, corpus, queries, k,
        nCentroids = 8, nProbe = 3, m = 8, kSub = 8, rerank = 24)
      .collect()
    val byQ = got.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = want.map { case (q, ids) =>
      byQ.getOrElse(q, Set.empty).intersect(ids).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean IVF-PQ recall $mean")
    // rerank returns exact cosines, not ADC approximations
    val byId = corpusLocal.toMap
    got.take(10).foreach { r =>
      val expect = cosine(byId(r.getAs[Long]("vec_id")), byId(r.getAs[Long]("query_id")))
      assert(math.abs(r.getAs[Double]("cos") - expect) < 1e-12)
    }
  }

  test("zero-norm vectors never enter training or inverted lists") {
    val withZeros = (corpusLocal :+ (900L -> Array.fill(dim)(0f)) :+
      (901L -> Array.fill(dim)(0f))).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(withZeros, 4, iters = 2)
    assert(cents.forall(c => math.sqrt(c.map(x => x * x).sum) > 0.0))
    // IVF drops cid -1 (zero-norm) rows from the lists: results must never
    // contain the zero vectors, and every query still gets k hits
    val got = Similarity.topKIvf(spark, withZeros, queries, 5, nCentroids = 4, nProbe = 2)
      .collect()
    assert(got.nonEmpty)
    assert(!got.exists(r => r.getAs[Long]("vec_id") >= 900L),
      "zero-norm vector leaked into ANN results")
  }

  test("IVF recall holds when trained on a small sample") {
    val k = 5
    val want = corpusLocal.filter(_._1 % perCluster == 0).map { case (qid, qv) =>
      qid -> corpusLocal.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
    val cents = Similarity.trainCentroids(corpus, 8, iters = 3, sampleSize = 48)
    assert(cents.length == 8)
    val got = Similarity.topKIvf(spark, corpus, queries, k, nCentroids = 8, nProbe = 2)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = want.map { case (q, ids) =>
      got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean IVF recall $mean with sampled training")
  }
}
