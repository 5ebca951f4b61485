package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzz for the statistics tier (the FusedExprPropSpec
  * treatment): seeded random micro-datasets run through the production
  * faces AND through straight-line brute-force reimplementations written
  * from the textbook definitions (pair loops, sorted-scan ECDFs,
  * contingency maps — no shared code, no shared decomposition). The
  * oracle pins cross-engine equality and StatTestsSpec pins hand-derived
  * examples; this pins the MATH across the small-input space, including
  * tie pile-ups a hand example misses. Deterministic (fixed seeds) so
  * failures reproduce.
  */
class StatPropSpec extends SparkSpec {
  import spark.implicits._

  private val dir =
    java.nio.file.Files.createTempDirectory("graft_statprop_").toString

  private def samples[T](g: Gen[T], n: Int, seed0: Long): Seq[T] = {
    var s = Seed(seed0)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, s, 500)
      s = s.next
      v
    }
  }

  private def writeLineitem(rows: Seq[(Double, Double, String, String)]): Unit =
    rows.toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  private def writeOrders(countsByDay: Seq[Int]): Unit =
    countsByDay.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"))
    }.toDF("o_orderdate")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

  /** Textbook average (tie-mid) rank of each element of xs. */
  private def avgRanks(xs: Seq[Double]): Seq[Double] = {
    val sorted = xs.sorted
    xs.map { v =>
      val lo = sorted.indexWhere(_ == v) + 1
      val hi = sorted.lastIndexWhere(_ == v) + 1
      (lo + hi) / 2.0
    }
  }

  private def pearson(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length.toDouble
    val (sa, sb) = (a.sum, b.sum)
    val saa = a.map(x => x * x).sum
    val sbb = b.map(x => x * x).sum
    val sab = a.zip(b).map { case (x, y) => x * y }.sum
    (n * sab - sa * sb) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
  }

  // variance in both coordinates guaranteed by construction: two fixed
  // anti-diagonal pairs are always appended
  private val xyGen: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(3, 38)
    xs <- Gen.listOfN(n, Gen.choose(1, 6))
    ys <- Gen.listOfN(n, Gen.choose(1, 5))
  } yield (1, 5) :: (6, 1) :: xs.zip(ys)

  private val gvGen: Gen[List[(String, Int)]] = for {
    nR <- Gen.choose(2, 20)
    nA <- Gen.choose(2, 20)
    rs <- Gen.listOfN(nR, Gen.choose(1, 8))
    as <- Gen.listOfN(nA, Gen.choose(1, 8))
  } yield rs.map("R" -> _) ++ as.map("A" -> _)

  // at least two distinct daily counts by construction
  private val dayGen: Gen[List[Int]] = for {
    n <- Gen.choose(7, 23)
    cs <- Gen.listOfN(n, Gen.choose(1, 6))
  } yield 1 :: 6 :: cs

  test("q_spearman ≡ textbook rho on random tied data") {
    for (data <- samples(xyGen, 10, 101L)) {
      writeLineitem(data.map { case (x, y) => (x.toDouble, y.toDouble, "R", "O") })
      val got = SparkEntry.queries("q_spearman")(spark, dir).collect().head
      val want = pearson(avgRanks(data.map(_._1.toDouble)),
        avgRanks(data.map(_._2.toDouble)))
      assert(got.getLong(0) == data.length)
      assert(math.abs(got.getDouble(1) - want) < 1e-9, s"data=$data")
    }
  }

  test("q_kendall ≡ brute pair loop on random tied data") {
    for (data <- samples(xyGen, 10, 202L)) {
      writeLineitem(data.map { case (x, y) => (x.toDouble, y.toDouble, "R", "O") })
      val got = SparkEntry.queries("q_kendall")(spark, dir).collect().head
      var c = 0L; var d = 0L
      for (i <- data.indices; j <- i + 1 until data.length) {
        val s = math.signum((data(i)._1 - data(j)._1).toDouble) *
          math.signum((data(i)._2 - data(j)._2).toDouble)
        if (s > 0) c += 1 else if (s < 0) d += 1
      }
      val n = data.length.toLong
      val n0 = n * (n - 1) / 2
      def ties(sel: ((Int, Int)) => Int) = data.groupBy(sel).values
        .map(g => g.size.toLong * (g.size - 1) / 2).sum
      val want = (c - d).toDouble /
        (math.sqrt((n0 - ties(_._1)).toDouble) *
          math.sqrt((n0 - ties(_._2)).toDouble))
      assert(got.getLong(1) == c && got.getLong(2) == d, s"data=$data")
      assert(math.abs(got.getDouble(3) - want) < 1e-9, s"data=$data")
    }
  }

  test("q_mannwhitney ≡ brute pair counting (ties at half weight)") {
    for (data <- samples(gvGen, 10, 303L)) {
      writeLineitem(data.map { case (g, v) => (v.toDouble, 0.0, g, "O") })
      val out = SparkEntry.queries("q_mannwhitney")(spark, dir)
        .collect().map(r => r.getString(0) -> r).toMap
      val rs = data.filter(_._1 == "R").map(_._2)
      val as = data.filter(_._1 == "A").map(_._2)
      val uR = rs.map(r => as.count(_ < r) + as.count(_ == r) / 2.0).sum
      val uA = rs.length.toDouble * as.length - uR
      assert(math.abs(out("R").getDouble(4) - uR) < 1e-9, s"data=$data")
      assert(math.abs(out("A").getDouble(4) - uA) < 1e-9, s"data=$data")
      assert(out("R").getLong(1) == rs.length && out("A").getLong(1) == as.length)
    }
  }

  test("q_ks_test ≡ brute ECDF sup over the pooled support") {
    for (data <- samples(gvGen, 10, 404L)) {
      writeLineitem(data.map { case (g, v) => (v.toDouble, 0.0, g, "O") })
      val got = SparkEntry.queries("q_ks_test")(spark, dir).collect().head
      val rs = data.filter(_._1 == "R").map(_._2)
      val as = data.filter(_._1 == "A").map(_._2)
      val d = (rs ++ as).distinct.map { v =>
        math.abs(rs.count(_ <= v).toDouble / rs.length -
          as.count(_ <= v).toDouble / as.length)
      }.max
      assert(got.getLong(0) == rs.length && got.getLong(1) == as.length)
      assert(math.abs(got.getDouble(3) - d) < 1e-9, s"data=$data")
    }
  }

  test("q_chi_square + q_cramers_v ≡ brute contingency map") {
    val cellGen: Gen[List[(String, String)]] = for {
      n <- Gen.choose(20, 60)
      l <- Gen.listOfN(n, Gen.zip(Gen.oneOf("R", "A", "N"), Gen.oneOf("O", "F")))
    } yield ("R", "O") :: ("A", "F") :: ("N", "O") :: l
    for (data <- samples(cellGen, 8, 505L)) {
      writeLineitem(data.map { case (f, st) => (1.0, 0.0, f, st) })
      val chi = SparkEntry.queries("q_chi_square")(spark, dir).collect().head
      val v = SparkEntry.queries("q_cramers_v")(spark, dir).collect().head
      val n = data.length.toDouble
      val cells = data.groupBy(identity).view.mapValues(_.size).toMap
      val rm = data.groupBy(_._1).view.mapValues(_.size).toMap
      val cm = data.groupBy(_._2).view.mapValues(_.size).toMap
      val want = (for ((f, st) <- cells.keys) yield {
        val e = rm(f) * cm(st) / n
        val o = cells((f, st)).toDouble
        (o - e) * (o - e) / e
      }).sum
      val kMin = math.min(rm.size - 1, cm.size - 1).toDouble
      assert(math.abs(chi.getDouble(3) - want) < 1e-9, s"data=$data")
      assert(chi.getLong(2) == (rm.size - 1).toLong * (cm.size - 1))
      assert(math.abs(v.getDouble(3) - math.sqrt(want / (n * kMin))) < 1e-9)
    }
  }

  test("q_mad / q_ks_continuous ≡ brute sorted scans on random cents") {
    val centsGen: Gen[List[(String, Long)]] = for {
      nR <- Gen.choose(3, 25)
      nA <- Gen.choose(3, 25)
      rs <- Gen.listOfN(nR, Gen.choose(100L, 900L))
      as <- Gen.listOfN(nA, Gen.choose(100L, 900L))
    } yield rs.map("R" -> _) ++ as.map("A" -> _)
    for (data <- samples(centsGen, 10, 707L)) {
      // l_extendedprice = cents / 100 round-trips exactly for these values
      data.map { case (g, c) => (1.0, 0.0, g, "O", c / 100.0) }
        .toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus",
          "l_extendedprice")
        .repartition(2)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      // MAD brute: lower median of values, then lower median of |x − med|
      val all = data.map(_._2).sorted
      def lowMed(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
      val med = lowMed(all)
      val mad = lowMed(all.map(v => math.abs(v - med)))
      val gotMad = SparkEntry.queries("q_mad")(spark, dir).collect().head
      assert((gotMad.getLong(0), gotMad.getLong(1), gotMad.getLong(2)) ==
        ((data.length.toLong, med, mad)), s"data=$data")
      // continuous KS brute over the pooled support
      val rs = data.filter(_._1 == "R").map(_._2)
      val as = data.filter(_._1 == "A").map(_._2)
      val d = (rs ++ as).distinct.map { v =>
        math.abs(rs.count(_ <= v).toDouble / rs.length -
          as.count(_ <= v).toDouble / as.length)
      }.max
      val gotKs = SparkEntry.queries("q_ks_continuous")(spark, dir)
        .collect().head
      assert(gotKs.getLong(0) == rs.length && gotKs.getLong(1) == as.length)
      assert(math.abs(gotKs.getDouble(3) - d) < 1e-9, s"data=$data")
    }
  }

  test("q_hhi ≡ brute share-of-squares per source") {
    val gen: Gen[List[(String, String)]] = for {
      n <- Gen.choose(10, 60)
      l <- Gen.listOfN(n, Gen.zip(Gen.oneOf("s0", "s1", "s2"),
        Gen.oneOf("en", "de", "fr", "es")))
    } yield ("s0", "en") :: l
    for (data <- samples(gen, 8, 808L)) {
      val d2 = java.nio.file.Files.createTempDirectory("graft_hhi_").toString
      data.zipWithIndex.map { case ((src, lang), i) =>
        (i.toLong, "x", lang, src, 1L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d2/documents.parquet")
      val got = SparkEntry.queries("q_hhi")(spark, d2)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      data.groupBy(_._1).foreach { case (src, rows) =>
        val n = rows.size.toLong
        val ss = rows.groupBy(_._2).values
          .map(g => g.size.toLong * g.size).sum
        val (gn, gss, ghhi) = got(src)
        assert(gn == n && gss == ss, s"src=$src data=$data")
        assert(math.abs(ghhi - ss.toDouble / (n * n).toDouble) < 1e-12)
      }
    }
  }

  test("q_cusum / q_runs_test / q_autocorr ≡ brute series scans") {
    for (cs <- samples(dayGen, 8, 606L)) {
      writeOrders(cs)
      val cusum = SparkEntry.queries("q_cusum")(spark, dir)
        .orderBy("day").collect()
      val cums = cs.scanLeft(0L)(_ + _).tail
      val total = cs.map(_.toLong).sum
      cusum.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(3) == cs.length * cums(i) - (i + 1) * total,
          s"cs=$cs i=$i")
      }
      val runsRow = SparkEntry.queries("q_runs_test")(spark, dir)
        .collect().head
      val med = cs.sorted.apply((cs.length + 1) / 2 - 1)
      val sg = cs.filter(_ != med).map(c => if (c > med) 1 else -1)
      val runs = if (sg.isEmpty) 0
        else 1 + sg.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      assert(runsRow.getLong(1) == med && runsRow.getLong(5) == runs, s"cs=$cs")
      assert(runsRow.getLong(2) == sg.count(_ == 1) &&
        runsRow.getLong(3) == sg.count(_ == -1), s"cs=$cs")
      // autocorr lag 1: days are contiguous in this generator, so row
      // offset == date offset; skip the degenerate zero-variance slices
      val ac = SparkEntry.queries("q_autocorr")(spark, dir)
        .collect().map(r => r.getLong(0) -> r).toMap
      val xs = cs.dropRight(1).map(_.toDouble)
      val ys = cs.drop(1).map(_.toDouble)
      assert(ac(1L).getLong(1) == cs.length - 1, s"cs=$cs")
      if (xs.distinct.size > 1 && ys.distinct.size > 1)
        assert(math.abs(ac(1L).getDouble(2) - pearson(xs, ys)) < 1e-9, s"cs=$cs")
    }
  }

  test("q_ttest_welch ≡ brute two-sample Welch on random tied data") {
    for (data <- samples(gvGen, 10, 707L)) {
      writeLineitem(data.map { case (g, v) => (v.toDouble, 0.0, g, "O") })
      val got = SparkEntry.queries("q_ttest_welch")(spark, dir).collect().head
      val rs = data.filter(_._1 == "R").map(_._2.toDouble)
      val as = data.filter(_._1 == "A").map(_._2.toDouble)
      def mv(xs: Seq[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val (mr, vr) = mv(rs); val (ma, va) = mv(as)
      val vnr = vr / rs.length; val vna = va / as.length
      val t = (mr - ma) / math.sqrt(vnr + vna)
      val df = (vnr + vna) * (vnr + vna) /
        (vnr * vnr / (rs.length - 1) + vna * vna / (as.length - 1))
      assert(got.getLong(0) == rs.length && got.getLong(1) == as.length)
      assert(math.abs(got.getDouble(2) - mr) < 1e-9, s"data=$data")
      assert(math.abs(got.getDouble(3) - ma) < 1e-9, s"data=$data")
      // zero pooled variance → 0/0 on BOTH sides; NaN must agree with NaN
      val (gt, gd) = (got.getDouble(4), got.getDouble(5))
      assert(gt == t || (math.abs(gt - t) < 1e-9) ||
        (gt.isNaN && t.isNaN), s"data=$data")
      assert(gd == df || (math.abs(gd - df) < 1e-9) ||
        (gd.isNaN && df.isNaN), s"data=$data")
    }
  }

  private val anovaGen: Gen[List[(String, Int)]] = for {
    ns <- Gen.listOfN(3, Gen.choose(2, 15))
    gs <- Gen.sequence[List[List[(String, Int)]], List[(String, Int)]](
      ns.zip(List("A", "N", "R")).map { case (n, g) =>
        Gen.listOfN(n, Gen.choose(1, 8)).map(_.map(g -> _))
      })
  } yield gs.flatten

  test("q_anova ≡ brute sums of squares on random 3-group data") {
    for (data <- samples(anovaGen, 10, 808L)) {
      writeAnovaLineitem(data.map { case (g, v) => (g, v.toDouble) })
      val got = SparkEntry.queries("q_anova")(spark, dir).collect().head
      val groups = data.groupBy(_._1).values.map(_.map(_._2.toDouble)).toList
      val n = data.length
      val grand = data.map(_._2.toDouble).sum / n
      val ssb = groups.map { g =>
        val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
      }.sum
      val ssw = groups.map { g =>
        val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
      }.sum
      val f = (ssb / (groups.length - 1)) / (ssw / (n - groups.length))
      assert(got.getLong(0) == groups.length && got.getLong(1) == n)
      assert(math.abs(got.getDouble(2) - ssb) < 1e-6, s"data=$data")
      assert(math.abs(got.getDouble(3) - ssw) < 1e-6, s"data=$data")
      val gf = got.getDouble(4)
      assert(math.abs(gf - f) < 1e-6 || (gf.isNaN && f.isNaN) ||
        (gf.isInfinite && f.isInfinite), s"data=$data")
    }
  }

  private def writeAnovaLineitem(rows: Seq[(String, Double)]): Unit =
    rows.map { case (g, x) => (1.0, x, g, "O") }
      .toDF("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  // days 1..k each with ≥1 event so both halves are populated
  private val evGen: Gen[List[(Int, String)]] = for {
    k <- Gen.choose(4, 16)
    days <- Gen.sequence[List[List[(Int, String)]], List[(Int, String)]](
      (1 to k).toList.map { d =>
        for {
          m <- Gen.choose(1, 5)
          ts <- Gen.listOfN(m, Gen.oneOf("purchase", "view", "click"))
        } yield ts.map(d -> _)
      })
  } yield days.flatten

  private def writeEvents(rows: Seq[(Int, String)]): Unit =
    rows.map { case (day, t) =>
      (Timestamp.valueOf(f"2024-01-${day}%02d 00:00:00"), t)
    }.toDF("ts", "event_type")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q_js_divergence / q_prop_ztest ≡ brute split distributions") {
    for (data <- samples(evGen, 8, 909L)) {
      writeEvents(data)
      val k = data.map(_._1).max
      def isE(day: Int): Boolean = (day - 1) * 2 <= (k - 1)
      val e = data.filter(d => isE(d._1)); val a = data.filterNot(d => isE(d._1))
      // JSD brute over the pooled type dictionary
      val jsd = {
        val types = data.map(_._2).distinct
        val (ne, na) = (e.length.toDouble, a.length.toDouble)
        types.map { t =>
          val p = e.count(_._2 == t) / ne
          val q = a.count(_._2 == t) / na
          val m = (p + q) / 2.0
          (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
            (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
        }.sum
      }
      val gj = SparkEntry.queries("q_js_divergence")(spark, dir)
        .collect().head
      assert(gj.getLong(1) == e.length && gj.getLong(2) == a.length)
      assert(math.abs(gj.getDouble(3) - jsd) < 1e-6, s"data=$data")
      // two-proportion z brute
      val (x1, x2) = (e.count(_._2 == "purchase"), a.count(_._2 == "purchase"))
      val (n1, n2) = (e.length, a.length)
      val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
      val pp = (x1 + x2).toDouble / (n1 + n2)
      val z = (p1 - p2) /
        math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
      val gz = SparkEntry.queries("q_prop_ztest")(spark, dir).collect().head
      assert((gz.getLong(0), gz.getLong(1), gz.getLong(2), gz.getLong(3)) ==
        ((n1.toLong, x1.toLong, n2.toLong, x2.toLong)), s"data=$data")
      val zg = gz.getDouble(6)
      assert(math.abs(zg - z) < 1e-9 || (zg.isNaN && z.isNaN), s"data=$data")
    }
  }
}
