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

  test("centroid training is deterministic") {
    val c1 = Similarity.trainCentroids(corpus, 4, iters = 2)
    val c2 = Similarity.trainCentroids(corpus, 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 4 && c1(0).length == dim)
  }

  test("training reads one bounded sample, not per-iteration corpus passes") {
    val sc = spark.sparkContext
    sc.setJobGroup("ivf-train-count", "counting training jobs")
    val c = Similarity.trainCentroids(corpus, 4, iters = 3, sampleSize = 64)
    sc.clearJobGroup()
    // Lloyd's iterates driver-side on the sample: the only cluster work is
    // the single TakeOrdered sample collection (the r2 version ran
    // 1 + 2*iters full-corpus jobs here)
    val jobs = sc.statusTracker.getJobIdsForGroup("ivf-train-count")
    assert(jobs.length == 1, s"training ran ${jobs.length} jobs, expected 1")
    assert(c.length == 4 && c(0).length == dim)
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
