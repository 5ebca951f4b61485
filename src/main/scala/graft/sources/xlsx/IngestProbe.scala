package graft.sources.xlsx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Decomposes the single-big-workbook ingest path to locate the gap between
  * the raw parse rate (ParseBench, ~9.5M cells/s at 4 workers) and the DSv2
  * end-to-end rate (~6.5M cells/s): raw parse → parse+convert →
  * PartitionReader drive → full Spark scan. Run:
  *   sbt "runMain graft.sources.xlsx.IngestProbe [threads] [reps]"
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 4
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture: one xlsx holding 5 lineitem columns (~600k rows at sf0.1)
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_probe", "lineitem_single")
    if (!java.nio.file.Files.isDirectory(out)) {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_linestatus")
        .coalesce(1)
        .write.format("xlsx").mode("overwrite").save(out.toString)
    }
    val xlsx: String = {
      val listing = java.nio.file.Files.list(out)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".xlsx")).toSeq.sorted.headOption
          .getOrElse(throw new IllegalStateException(
            s"no .xlsx fixture found under $out — delete the directory and rerun"))
      } finally listing.close()
    }
    println(s"fixture: $xlsx")
    val rows = spark.read.format("xlsx").load(xlsx).count()
    val cells = rows * 5
    println(s"rows=$rows cells=$cells")

    def bench(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        best = math.min(best, s)
        println(f"  $label: $s%.3f s  ${n / s / 1e6}%.2f M cells/s")
      }
      println(f"$label BEST: ${cells / best / 1e6}%.2f M cells/s")
    }

    def wb() = XlsxDataSource.workbook(xlsx, XlsxDataSource.hadoopConf())
    val sheet = "xl/worksheets/sheet1.xml"

    // 1. raw parse (workers materialize XCell arrays)
    bench(s"raw parse t=$threads") {
      val it = wb().rowIterator(sheet, threads)
      var n = 0L
      while (it.hasNext) { val (_, cs) = it.next(); n += cs.length }
      n
    }

    // 2. parse + worker-side convert (the DSv2 convert fn shape)
    val schema = StructType(Seq(
      StructField("l_orderkey", DoubleType), StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType), StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType)))
    val types: Array[DataType] = schema.fields.map(_.dataType)
    bench(s"parse+convert t=$threads") {
      val conv: Array[XCell] => AnyRef = { cs =>
        val vs = new Array[Any](types.length)
        var i = 0
        while (i < types.length) {
          val c: XCell = if (i < cs.length) cs(i) else XCell.XNone
          vs(i) = XlsxPartitionReader.convert(c, types(i), coerce = false)
          i += 1
        }
        vs
      }
      val e = wb().convertingRowIterator(sheet, threads, conv)
      val it = e.toOption.get
      var n = 0L
      while (it.hasNext) { val (_, _, w) = it.nextConverted(); n += w }
      n
    }

    // 3. full PartitionReader drive (merge + row build + filter accept)
    bench(s"partition reader t=$threads") {
      val opts = XlsxOptions(None, None, hasHeader = false, skipRows = 0,
        userTypes = None, forceTypes = false, coerceToString = false,
        writeHeader = true, threads = Some(threads))
      val r = new XlsxPartitionReader(xlsx, None, schema, schema, opts,
        XlsxDataSource.captureConf(), Array.empty, threads)
      var n = 0L
      while (r.next()) { r.get(); n += 5 }
      r.close()
      n
    }

    // 4. Spark end-to-end (noop sink)
    bench(s"spark e2e t=$threads") {
      spark.read.format("xlsx").option("threads", threads.toString).load(xlsx)
        .write.format("noop").mode("overwrite").save()
      cells
    }

    spark.stop()
  }
}
