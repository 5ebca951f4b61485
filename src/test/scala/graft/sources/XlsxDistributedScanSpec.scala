package graft.sources.xlsx

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed SINGLE-FILE xlsx scan (r12, SURVEY #337): a workbook with
  * the graft row-group index splits into segment-range InputPartitions
  * when the scan would otherwise under-parallelize — one big file stops
  * being one task. Pins: (a) the split actually happens and the rows are
  * exactly the sequential read's (no dup/loss at range boundaries),
  * (b) header + skipRows prefixes deal across ranged partitions, (c) an
  * explicit `threads` option preserves the reference's one-partition
  * intra-file semantics (no split).
  */
class XlsxDistributedScanSpec extends SparkSpec {

  private val rows = 60000
  private lazy val file: java.io.File = {
    val f = java.io.File.createTempFile("distscan", ".xlsx")
    f.deleteOnExit()
    val fos = new java.io.FileOutputStream(f)
    try XlsxWriter.write(fos, Seq(XlsxWriter.SheetSpec("S",
      Some(Seq("id", "price", "name")),
      (1 to rows).iterator.map(i =>
        Seq[Any](i.toLong, i * 1.25, s"n#${i % 313}")))))
    finally fos.close()
    f
  }

  test("one indexed workbook splits into multiple partitions with exactly " +
      "the sequential rows") {
    val df = spark.read.format("xlsx").load(file.getAbsolutePath)
    assert(df.rdd.getNumPartitions > 1,
      s"expected a segment split, got ${df.rdd.getNumPartitions} partition(s)")
    val agg = df.agg(count(lit(1)), sum(col("id")), sum(col("price")))
      .collect()(0)
    assert(agg.getLong(0) == rows)
    assert(agg.getDouble(1) == (rows.toLong * (rows + 1) / 2).toDouble)
    assert(math.abs(agg.getDouble(2) - 1.25 * rows.toLong * (rows + 1) / 2) < 1e-6)
    // row-identity against the unsplit reference path (threads=1 forces it)
    val seq = spark.read.format("xlsx").option("threads", "1")
      .load(file.getAbsolutePath)
    assert(seq.rdd.getNumPartitions == 1)
    assert(df.exceptAll(seq).isEmpty && seq.exceptAll(df).isEmpty,
      "split scan rows differ from the sequential scan")
  }

  test("skipRows prefix deals across segment-range partitions") {
    val skip = 30000 // deep inside a later segment
    val df = spark.read.format("xlsx")
      .option("skipRows", skip.toString)
      .load(file.getAbsolutePath)
    assert(df.rdd.getNumPartitions > 1)
    val seq = spark.read.format("xlsx").option("threads", "1")
      .option("skipRows", skip.toString).load(file.getAbsolutePath)
    assert(df.count() == seq.count())
    assert(df.exceptAll(seq).isEmpty && seq.exceptAll(df).isEmpty,
      "skipRows handling differs between split and sequential scans")
  }

  test("a forced-zip64 workbook still splits into segment-range " +
      "partitions (the >4 GiB regime the splitter was built for)") {
    val f64 = java.io.File.createTempFile("distscan64", ".xlsx")
    f64.deleteOnExit()
    java.nio.file.Files.write(f64.toPath,
      Zip64Force.rewrite(java.nio.file.Files.readAllBytes(file.toPath)))
    val df = spark.read.format("xlsx").load(f64.getAbsolutePath)
    assert(df.rdd.getNumPartitions > 1,
      s"zip64 archive fell back to ${df.rdd.getNumPartitions} partition(s)")
    val agg = df.agg(count(lit(1)), sum(col("id"))).collect()(0)
    assert(agg.getLong(0) == rows)
    assert(agg.getDouble(1) == (rows.toLong * (rows + 1) / 2).toDouble)
  }

  test("an explicit threads option keeps the reference's one-partition " +
      "intra-file semantics") {
    val df = spark.read.format("xlsx").option("threads", "4")
      .load(file.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == rows)
  }
}
