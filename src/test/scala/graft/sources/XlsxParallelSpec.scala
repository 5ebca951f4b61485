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

  test("worker-side conversion stitches indices and widths across many chunks") {
    val wb = new XlsxParser.Workbook(
      () => new java.io.FileInputStream(file), Some(file))
    val (raw, closeAll) = wb.openEntryStream("xl/worksheets/sheet1.xml").get
    // tiny chunks force dozens of ParsedChunks through the converted face
    val par = new ParallelSheetScanner(raw, wb.sharedStrings, wb.dateStyles,
      threads = 3, closeAll, chunkBytes = 32 << 10,
      convert = cells => Integer.valueOf(cells.length))
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
    while (par.hasNext) {
      val (i, v, w) = par.nextConverted()
      out += ((i, v.asInstanceOf[Integer].intValue, w))
    }
    val seq = drain(1)
    assert(out.size == seq.size)
    assert(out.map(_._1).toSeq == seq.map(_._1)) // stitched absolute indices
    assert(out.map(_._3).toSeq == seq.map(_._2.size)) // widths track the cells
    assert(out.forall(t => t._2 == t._3)) // convert() saw the same rows
    // the raw Iterator face must refuse, not return garbage
    val wb2 = new XlsxParser.Workbook(
      () => new java.io.FileInputStream(file), Some(file))
    val (raw2, closeAll2) = wb2.openEntryStream("xl/worksheets/sheet1.xml").get
    val par2 = new ParallelSheetScanner(raw2, wb2.sharedStrings, wb2.dateStyles,
      threads = 2, closeAll2, convert = cells => Integer.valueOf(0))
    try intercept[UnsupportedOperationException] { par2.next() }
    finally par2.close()
  }

  test("skipRows and pushed filters behave identically under threads") {
    val bos = new ByteArrayOutputStream()
    XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("S", None,
      Iterator[Seq[Any]](Seq("junk one"), Seq("junk two"),
        Seq("id", "v")) ++ (1 to 100).iterator.map(i => Seq[Any](i.toDouble, s"r$i")))))
    val f = java.io.File.createTempFile("skipthreads", ".xlsx")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bos.toByteArray)
    def read(threads: Int) = spark.read.format("xlsx")
      .option("skipRows", "2").option("threads", threads.toString)
      .load(f.getAbsolutePath)
      .filter(org.apache.spark.sql.functions.col("id") <= 50)
      .collect().map(_.toString).sorted.toSeq
    assert(read(1).size == 50)
    assert(read(3) == read(1))
  }

  test("columnar chunk dealing: skipRows prefix spans many tiny chunks exactly") {
    // 3 junk rows + header + 300 data rows read with chunkBytes=256 —
    // dozens of chunks, so the header/skipRows prefix and the first data
    // rows land in DIFFERENT chunks and the producer's boundary-count
    // dealing (dropFor) must hand each worker exactly its share. Compare
    // against the sequential read, which drops rows one by one.
    val bos = new ByteArrayOutputStream()
    XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("S", None,
      Iterator[Seq[Any]](Seq("junk a"), Seq("junk b"), Seq("junk c"),
        Seq("id", "v")) ++
        (1 to 300).iterator.map(i => Seq[Any](i.toDouble, s"row-$i")))))
    val f = java.io.File.createTempFile("chunkdeal", ".xlsx")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bos.toByteArray)
    def read(extra: Map[String, String]) = {
      var r = spark.read.format("xlsx").option("skipRows", "3")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load(f.getAbsolutePath).collect().map(_.toString).sorted.toSeq
    }
    val serial = read(Map("threads" -> "1"))
    assert(serial.size == 300)
    val chunked = read(Map("threads" -> "3", "chunkBytes" -> "256"))
    assert(chunked == serial)
    // pushed filter evaluated in the chunk workers, same tiny chunks
    def readFiltered(threads: Int) = {
      spark.read.format("xlsx").option("skipRows", "3")
        .option("threads", threads.toString).option("chunkBytes", "256")
        .load(f.getAbsolutePath)
        .filter(org.apache.spark.sql.functions.col("id") > 250.0)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(readFiltered(3).size == 50)
    assert(readFiltered(3) == readFiltered(1))
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
    // a workbook whose row 3 is wider than row 1: the partition reader must
    // raise the reference's ragged-row error through the threads path and
    // tear the pipeline down rather than hang
    val sheet =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>2</v></c></row>
        |<row r="3"><c r="A3"><v>3</v></c><c r="B3"><v>4</v></c><c r="C3"><v>5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    Seq(
      "xl/workbook.xml" ->
        """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet
    ).foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    val f = java.io.File.createTempFile("ragged", ".xlsx")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bos.toByteArray)
    val e = intercept[Exception] {
      spark.read.format("xlsx").option("threads", "3")
        .load(f.getAbsolutePath).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("more columns"), msgs)
  }

  test("a stream failure mid-parse surfaces the cause and kills the pipeline") {
    // the inflated stream dies after some bytes: hasNext must throw the
    // cause (not hang on the queue) and the daemon threads must exit
    val failing = new java.io.InputStream {
      private val head =
        "<worksheet><sheetData><row r=\"1\"><c><v>1</v></c></row>".getBytes("UTF-8")
      private var i = 0
      override def read(): Int =
        if (i < head.length) { i += 1; head(i - 1) & 0xff }
        else throw new java.io.IOException("stream died mid-entry")
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= head.length) throw new java.io.IOException("stream died mid-entry")
        val n = math.min(len, head.length - i)
        System.arraycopy(head, i, b, off, n)
        i += n
        n
      }
    }
    val before = Thread.activeCount()
    var closed = false
    val it = new ParallelSheetScanner(failing, Array.empty, Array.empty,
      threads = 2, () => closed = true, chunkBytes = 16)
    val e = intercept[Exception] { while (it.hasNext) it.next() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("stream died"), msgs)
    assert(closed, "underlying close hook must run on failure")
    val deadline = System.currentTimeMillis + 5000
    while (Thread.activeCount() > before + 1 && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(Thread.activeCount() <= before + 1, "threads leaked after failure")
  }

  private def defaultOpts: XlsxOptions =
    XlsxOptions.from(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap[String, String]()))

  private def threadsOf(parts: Array[org.apache.spark.sql.connector.read.InputPartition]): Seq[Int] =
    parts.map(_.asInstanceOf[XlsxInputPartition].threads).toSeq

  test("auto parallelism: lone indexed file SPLITS into ranged partitions, " +
      "saturated scan stays serial, option wins") {
    assert(spark.sparkContext.defaultParallelism == 4) // the arithmetic below assumes it
    // single INDEXED file on 4 cores: since r12 the planner prefers
    // segment-range partitions over intra-task threads (SURVEY #337) —
    // partition counts scale with min(segments, cores), every range serial
    val lone = XlsxScan.partitionsFor(Seq(file.toString), defaultOpts)
      .map(_.asInstanceOf[XlsxInputPartition])
    assert(lone.length > 1, s"expected a segment split, got ${lone.length}")
    assert(lone.forall(p => p.segRange.isDefined && p.threads == 1),
      s"ranged partitions must stay single-threaded: ${lone.toSeq}")
    // the ranges tile [0, nSeg) contiguously without gap or overlap
    val ranges = lone.map(_.segRange.get).sortBy(_.s0)
    assert(ranges.head.s0 == 0 &&
      ranges.sliding(2).forall(w => w.length < 2 || w(0).s1 == w(1).s0),
      s"ranges must tile: ${ranges.toSeq}")
    // scan with >= cores partitions: every task already owns a core
    val many = XlsxScan.partitionsFor(
      (1 to 4).map(_ => file.toString), defaultOpts)
    assert(threadsOf(many) == Seq(1, 1, 1, 1), s"got ${threadsOf(many)}")
    // an explicit threads option applies verbatim — and DISABLES the
    // split (the reference's intra-file semantics, preserved verbatim)
    val explicit = XlsxScan.partitionsFor(
      Seq(file.toString, file.toString), defaultOpts.copy(threads = Some(3)))
    assert(threadsOf(explicit) == Seq(3, 3), s"got ${threadsOf(explicit)}")
    assert(explicit.map(_.asInstanceOf[XlsxInputPartition])
      .forall(_.segRange.isEmpty))
    // and the auto path must not change WHAT is read: same rows either way
    val auto = spark.read.format("xlsx").load(file.toString)
    val serial = spark.read.format("xlsx").option("threads", "1").load(file.toString)
    assert(auto.count() == 20000L)
    assert(auto.exceptAll(serial).isEmpty && serial.exceptAll(auto).isEmpty)
  }

  test("auto parallelism: the indexed straggler splits, the small " +
      "unindexed sibling stays one serial partition") {
    // one ~20k-row file (indexed: > one segment) + one 3-row file (too
    // small for a cut — no index) on 4 cores: the straggler's spare-core
    // share arrives as EXTRA PARTITIONS now, the small file stays as-is
    val small = {
      val bos = new ByteArrayOutputStream()
      XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("S", Some(Seq("id", "nm", "v", "d", "b")),
        (1 to 3).iterator.map(i => Seq[Any](i.toLong, s"n$i", i * 1.0,
          java.time.LocalDate.ofEpochDay(10000L + i), i % 2 == 0)))))
      val f = java.io.File.createTempFile("small", ".xlsx")
      f.deleteOnExit()
      java.nio.file.Files.write(f.toPath, bos.toByteArray)
      f
    }
    val parts = XlsxScan.partitionsFor(
      Seq(file.toString, small.toString), defaultOpts)
      .map(_.asInstanceOf[XlsxInputPartition])
    val straggler = parts.filter(_.path == file.toString)
    val sibling = parts.filter(_.path == small.toString)
    assert(straggler.length > 1 && straggler.forall(_.segRange.isDefined),
      s"straggler should split: ${straggler.toSeq}")
    assert(sibling.length == 1 && sibling.head.segRange.isEmpty,
      s"small sibling: ${sibling.toSeq}")
  }
}
