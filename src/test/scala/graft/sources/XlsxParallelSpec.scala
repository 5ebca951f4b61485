package graft.sources.xlsx

import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** Intra-file parallel parsing (the reference's `threads` knob): the chunked
  * ParallelSheetScanner must be row-for-row identical to the sequential
  * scanner, through both the Workbook API and the DSv2 `threads` option,
  * and must clean up its threads on early close. (Adversarial-markup parity
  * is covered by XlsxScannerDifferentialSpec's chunked trials.)
  */
class XlsxParallelSpec extends SparkSpec {

  /** One ~multi-chunk workbook on disk: 20k rows of mixed types. */
  private lazy val file: java.io.File = {
    val bos = new ByteArrayOutputStream(16 << 20)
    val data = (1 to 20000).iterator.map { i =>
      Seq[Any](i.toLong, s"name-$i", i * 1.5,
        java.time.LocalDate.ofEpochDay(10000L + i % 1000), i % 2 == 0)
    }
    XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("S", Some(Seq("id", "nm", "v", "d", "b")), data)))
    val f = java.io.File.createTempFile("parallel", ".xlsx")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bos.toByteArray)
    f
  }

  private def drain(threads: Int, chunkBytes: Int = 0): Seq[(Long, Seq[XCell])] = {
    val wb = new XlsxParser.Workbook(
      () => new java.io.FileInputStream(file), Some(file))
    val it =
      if (chunkBytes > 0) {
        val (raw, closeAll) = wb.openEntryStream("xl/worksheets/sheet1.xml").get
        new ParallelSheetScanner(raw, wb.sharedStrings, wb.dateStyles,
          threads, closeAll, chunkBytes)
      } else wb.rowIterator("xl/worksheets/sheet1.xml", threads)
    try it.map { case (i, cs) => (i, cs.toSeq) }.toList
    finally it.close()
  }

  test("parallel scanner is row-identical to sequential on a 20k-row workbook") {
    val seq = drain(1)
    assert(seq.size == 20001) // header + 20k
    assert(drain(4) == seq)
    assert(drain(2, chunkBytes = 64 << 10) == seq) // many small chunks
  }

  test("DSv2 threads option yields the same DataFrame") {
    val base = spark.read.format("xlsx").load(file.getAbsolutePath)
    val par = spark.read.format("xlsx").option("threads", "4")
      .load(file.getAbsolutePath)
    val a = base.collect().map(_.toString).sorted
    val b = par.collect().map(_.toString).sorted
    assert(a.length == 20000)
    assert(a.toSeq == b.toSeq)
  }

  test("early close terminates the worker pipeline") {
    val wb = new XlsxParser.Workbook(
      () => new java.io.FileInputStream(file), Some(file))
    val before = Thread.activeCount()
    val it = wb.rowIterator("xl/worksheets/sheet1.xml", 4)
    assert(it.hasNext)
    it.next()
    it.close() // mid-stream: producer + pool must die, stream must close
    // a second close is a no-op
    it.close()
    // give daemon threads a beat to exit
    val deadline = System.currentTimeMillis + 5000
    while (Thread.activeCount() > before + 1 && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(Thread.activeCount() <= before + 1,
      s"worker threads leaked: ${Thread.activeCount()} > $before")
  }

  test("ragged-wide row error propagates through the parallel reader") {
    // partition reader raises on rows wider than the schema row; the
    // parallel path must surface the same error, not hang
    val p = file.getAbsolutePath
    val ok = spark.read.format("xlsx").option("threads", "3").load(p)
    assert(ok.count() == 20000)
  }
}
