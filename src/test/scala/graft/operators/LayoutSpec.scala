package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness against a reference
  * interleave, and the actual point — a 2-D box predicate prunes most of
  * a z-clustered scan while a linear layout reads everything. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def spreadRef(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  test("zkey2 equals the reference Morton interleave") {
    val pairs = for (a <- 0 to 40; b <- 0 to 40)
      yield (a.toLong * 1619L % 65536L, b.toLong * 2749L % 65536L)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zkey2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == (spreadRef(a) | (spreadRef(b) << 1)))
    }
  }

  test("zkeyN equals the reference N-way interleave (and zkey2 at n=2)") {
    // reference: bit j of value i lands at j*n + i
    def refN(vals: Seq[Long], n: Int, bits: Int): Long =
      vals.zipWithIndex.map { case (v, i) =>
        (0 until bits).map(j => ((v >> j) & 1L) << (j * n + i)).reduce(_ | _)
      }.reduce(_ | _)
    val triples = for (a <- 0 to 12; b <- 0 to 12; c <- 0 to 12)
      yield (a.toLong * 1619L % 65536L, b.toLong * 2749L % 65536L,
        c.toLong * 4093L % 65536L)
    val got3 = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zkeyN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    triples.foreach { case (a, b, c) =>
      assert(got3((a, b, c)) == refN(Seq(a, b, c), 3, Layout.bitsPerDim(3)))
    }
    // n=2 rides the mask spread — must equal the same reference placement
    val pairs = (0 to 40).map(i => (i.toLong * 1619L % 65536L, i.toLong * 2749L % 65536L))
    val got2 = pairs.toDF("a", "b")
      .select(Layout.zkeyN(Seq(col("a"), col("b"))).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(got2).foreach { case ((a, b), z) =>
      assert(z == refN(Seq(a, b), 2, 16))
    }
    // n=4: 15 bits per dim keeps the code under the sign bit
    assert(Layout.bitsPerDim(4) == 15)
  }

  private def findScans(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(findScans)
  }

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    findScans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  test("2-D box predicate prunes the z-ordered layout, not the linear one") {
    // partkey × orderkey: both dimensions have wide domains (2000 / 15000
    // values at sf0.01), so per-file min/max stats can really be tight.
    // 256 files ≈ a 16×16 z-tile grid: coarser grids drown the win in
    // page-granularity floor (measured: 64 files shows only ~1.4×)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_")
    try {
      val zPath = root.resolve("zordered").toString
      val linPath = root.resolve("linear").toString
      Layout.writeZordered2(li, "l_partkey", "l_orderkey", nFiles = 256, zPath)
      // "linear" control: clustered on partkey ONLY — the classic single
      // sort; tight in one dimension, scrambled in the other
      li.repartitionByRange(256, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").parquet(linPath)

      val b = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_orderkey"), max("l_orderkey")).collect()(0)
      def mid(lo: Long, hi: Long, pct: Int): (Long, Long) = {
        val span = hi - lo
        (lo + span * (50 - pct / 2) / 100, lo + span * (50 + pct / 2) / 100)
      }
      // 10%×10% box: the partkey-only layout must still read every file
      // the partkey slice touches (~10% of rows) because orderkey is
      // scrambled within them; the z layout reads only intersecting tiles
      val (p1, p2) = mid(b.getLong(0), b.getLong(1), 10)
      val (s1, s2) = mid(b.getLong(2), b.getLong(3), 10)
      def box(path: String): DataFrame =
        spark.read.parquet(path).filter(
          col("l_partkey").between(p1, p2) && col("l_orderkey").between(s1, s2))

      assert(box(zPath).count() == box(linPath).count()) // layout-independent answer
      val zRows = scannedRows(box(zPath))
      val linRows = scannedRows(box(linPath))
      // measured 2578 vs 6328 (2.45×); assert the conservative 2× so page
      // granularity drift can't flake the spec
      assert(zRows * 2 < linRows,
        s"z layout scanned $zRows rows, linear scanned $linRows — no pruning win")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("compact: fragments merge to size-targeted files, content preserved") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft_compact_")
    try {
      val frag = root.resolve("frag").toString
      val out = root.resolve("out").toString
      li.repartition(48).write.mode("overwrite").parquet(frag)
      val fragBytes = java.nio.file.Files.list(root.resolve("frag")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
        .map(p => java.nio.file.Files.size(p)).sum
      // target ~quarter of the data per file → expect ~4 files, never 48
      val n = Layout.compact(spark, frag, out, targetBytes = fragBytes / 4)
      val outFiles = java.nio.file.Files.list(root.resolve("out")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
      // coalesce may emit fewer files than the target when a merged
      // partition lands empty — pin the ORDER of magnitude, not the exact
      // count: a handful of size-targeted files, never the 48 fragments
      assert(outFiles.length <= n && n <= 6 && outFiles.length >= 2,
        s"expected a few compacted files, got ${outFiles.length} (n=$n)")
      // content-preserving: same multiset of rows (integer-exact sums)
      def sig(df: DataFrame): Map[Long, (Long, Long)] =
        df.groupBy(col("l_orderkey"))
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              col("l_quantity").cast("long")).as("q"))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
      assert(sig(li) == sig(spark.read.parquet(out)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("hive partition pruning: filtered reads scan only matching partitions") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft_hivepart_")
    try {
      val p = root.resolve("byflag").toString
      li.write.partitionBy("l_returnflag").mode("overwrite").parquet(p)
      val df = spark.read.parquet(p).filter(col("l_returnflag") === "R")
      val total = df.count()
      assert(total == li.filter(col("l_returnflag") === "R").count())
      // the filter must land in PartitionFilters (directory pruning), not
      // as a post-scan predicate over all partitions
      val scans = findScans(df.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      assert(scans.forall(_.partitionFilters.exists(
        _.toString.contains("l_returnflag"))),
        scans.map(_.partitionFilters).toString)
      // and the scan reads only the matching partition's rows
      assert(scannedRows(df) == total)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("3-D box predicate prunes the 3-way z layout, not the single sort") {
    // the 100 TB layout story: date × key × geography — here
    // partkey × orderkey × suppkey. The single-column control is tight in
    // partkey only; a 3-D box over the z layout reads only intersecting
    // z-tiles.
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_partkey"), col("l_orderkey"), col("l_suppkey"),
        col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft_zorder3_")
    try {
      val zPath = root.resolve("z3").toString
      val linPath = root.resolve("linear").toString
      // grid resolution divides across dimensions (bits/dim =
      // log2(nFiles)/n): 3 dims at 256 files leave ~2.7 bits per dim
      // (simulated only 1.08x at a 10% box); 512 files restore enough
      // per-dim resolution for a decisive win — the documented trade when
      // widening the clustering key set
      Layout.writeZorderedN(li,
        Seq("l_partkey", "l_orderkey", "l_suppkey"), nFiles = 512, zPath)
      li.repartitionByRange(512, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").parquet(linPath)
      val b = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_orderkey"), max("l_orderkey"),
        min("l_suppkey"), max("l_suppkey")).collect()(0)
      def mid(lo: Long, hi: Long, pct: Int): (Long, Long) = {
        val span = hi - lo
        (lo + span * (50 - pct / 2) / 100, lo + span * (50 + pct / 2) / 100)
      }
      // 20%^3 box ≈ 0.8% of the data; simulated 3516 vs 12187 rows (3.47x)
      // — assert the conservative 2x
      val (p1, p2) = mid(b.getLong(0), b.getLong(1), 20)
      val (o1, o2) = mid(b.getLong(2), b.getLong(3), 20)
      val (s1, s2) = mid(b.getLong(4), b.getLong(5), 20)
      def box(path: String): DataFrame =
        spark.read.parquet(path).filter(
          col("l_partkey").between(p1, p2) &&
            col("l_orderkey").between(o1, o2) &&
            col("l_suppkey").between(s1, s2))
      assert(box(zPath).count() == box(linPath).count())
      val zRows = scannedRows(box(zPath))
      val linRows = scannedRows(box(linPath))
      assert(zRows * 2 < linRows,
        s"3-D z layout scanned $zRows rows, linear scanned $linRows")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
