package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale properties of the banded multi-table hyperplane LSH (VERDICT r2
  * item 1): recall must survive wide buckets (nBits >= 12) via the table
  * banding, bucket occupancy must stay bounded as the corpus grows, and
  * nBitsFor must derive widths that keep occupancy ~constant.
  */
class LshScaleSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random unit-ish vector. */
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      var z = seed.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) % 1000L).toFloat / 1000f
    }

  test("nBitsFor keeps expected occupancy near the target across scales") {
    assert(Dedup.nBitsFor(1000L) == 4) // floor: never below 16 buckets
    assert(Dedup.nBitsFor(1024L * 1024) == 10) // 1M / 1k target = 2^10
    assert(Dedup.nBitsFor(1024L * (1L << 20)) == 20) // 1B vectors
    assert(Dedup.nBitsFor(Long.MaxValue / 4) == 24) // clamped ceiling
    // occupancy stays within 2x of target wherever the [4,24] clamp
    // doesn't bind (below 2^14 the 4-bit floor intentionally wins)
    for (exp <- 14 to 23) {
      val n = 1L << exp
      val bits = Dedup.nBitsFor(n)
      val occupancy = n.toDouble / (1L << bits)
      assert(occupancy <= 1024.0 && occupancy >= 256.0,
        s"n=$n bits=$bits occupancy=$occupancy")
    }
  }

  test("planted near-dup recall >= 0.8 with nBits >= 12 (banded tables)") {
    val nPlanted = 25
    // planted pairs: (i, i+1000) where i+1000 is a tiny perturbation of i
    val pairs = (0 until nPlanted).map { i =>
      val a = vec(i * 31 + 7)
      val b = a.zipWithIndex.map { case (x, j) => x + (if (j == 0) 0.003f else 0f) }
      Seq((i.toLong, a), (i.toLong + 1000L, b))
    }
    val fillers = (0 until 400).map(i => Seq((2000L + i, vec(i * 131 + 3))))
    val emb: DataFrame = (pairs ++ fillers).flatten.toDF("vec_id", "embedding")

    val found = Dedup.embedNearDup(emb, threshold = 0.999, nBits = 12,
        dim = dim, nTables = 4).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
    val planted = (0 until nPlanted).map(i => (i.toLong, i.toLong + 1000L)).toSet
    val recall = found.intersect(planted).size.toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall with nBits=12, found ${found.size} pairs")
  }

  test("auto nBits bounds max bucket occupancy on a 100k-vector corpus") {
    val n = 100000L
    val bits = Dedup.nBitsFor(n)
    assert(bits == 7, s"100k/1024 target => 7 bits, got $bits") // 128 buckets
    // synthetic corpus generated distributed (no driver-side materialization)
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(concat_ws("_", col("id"), j)), lit(2000L))
          .cast("double") - 1000.0) / 1000.0).as("v"))
    val occ = Dedup.multiTableBuckets(emb, bits, dim, nTables = 2)
      .groupBy(col("t"), col("bucket")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).first().getLong(0)
    val expected = n.toDouble / (1L << bits)
    // hyperplane buckets of non-adversarial vectors stay within a small
    // constant of uniform; 8x headroom keeps the spec robust
    assert(occ <= 8 * expected, s"max occupancy $occ vs expected $expected")
  }

  test("multi-table LSH ANN recall holds with corpus-derived nBits") {
    // clustered corpus: queries' true neighbors are same-cluster
    val nClusters = 8
    val perCluster = 50
    def center(c: Int): Array[Float] = vec(c * 977 + 11)
    val corpusLocal = (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { i =>
        val id = (c * perCluster + i).toLong
        val noise = Array.tabulate(dim)(j => (((id * 17 + j * 7) % 13) - 6).toFloat / 300f)
        id -> center(c).zip(noise).map { case (x, nz) => x + nz }
      }
    }
    val corpus = corpusLocal.toDF("vec_id", "embedding")
    val queries = corpusLocal.filter(_._1 % perCluster == 0).toDF("vec_id", "embedding")

    def cosineL(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val k = 5
    val want = corpusLocal.filter(_._1 % perCluster == 0).map { case (qid, qv) =>
      qid -> corpusLocal.filter(_._1 != qid)
        .map { case (id, v) => (id, cosineL(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap

    val got = Similarity.topKLsh(corpus, queries, k, dim = dim, nTables = 4)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = want.map { case (q, ids) =>
      got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall $mean with auto nBits")
  }
}
