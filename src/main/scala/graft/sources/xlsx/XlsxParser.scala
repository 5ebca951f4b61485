package graft.sources.xlsx

import java.io.InputStream
import java.time.LocalDate
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Cell model mirroring the reference's type lattice
  * (reference: src/sheetreader_extension.cpp:152-178 — VARCHAR/DOUBLE/
  * BOOLEAN/DATE are the only materialized types; empty/error cells → NULL).
  */
sealed trait XCell
object XCell {
  final case class XString(value: String) extends XCell
  final case class XNumber(value: Double) extends XCell
  final case class XBool(value: Boolean) extends XCell
  /** Excel date serial: fractional days since 1899-12-30. */
  final case class XDate(serial: Double) extends XCell
  case object XError extends XCell
  case object XNone extends XCell

  /** Excel's day-0 epoch. serial→epochDay conversion mirrors the reference's
    * seconds/86400 floor (sheetreader_extension.cpp:170-175). */
  private val excelEpoch: Long = LocalDate.of(1899, 12, 30).toEpochDay
  def serialToEpochDay(serial: Double): Int = (excelEpoch + math.floor(serial).toLong).toInt
}

final case class SheetInfo(name: String, target: String)

/** UTF-16 → UTF-8 transcoding stream (r10): workbooks with a UTF-16 BOM
  * (never produced by Excel, but legal XML) used to fall back to the StAX
  * row path — correct, but off the byte scanner AND off the columnar batch
  * builder. Transcoding the inflated entry on the fly lets UTF-16 sheets
  * ride the exact same scanner/columnar pipeline as UTF-8 ones: the
  * scanner matches tags bytewise and never consults the XML prolog's
  * declared encoding, so the transcoded bytes are indistinguishable from a
  * native UTF-8 workbook. A truncated trailing surrogate pair is held back
  * across chunk boundaries so supplementary-plane text survives intact.
  */
private[xlsx] final class Utf16ToUtf8Stream(in: InputStream)
    extends InputStream {
  // UTF_16 consumes the BOM (and defaults to BE without one, per XML rules)
  private val reader =
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_16)
  private val cbuf = new Array[Char](8192)
  private var carry: Int = -1 // held-back high surrogate at a chunk edge
  private var bbuf: Array[Byte] = Array.emptyByteArray
  private var pos = 0

  private def fill(): Boolean = {
    var off = 0
    if (carry >= 0) { cbuf(0) = carry.toChar; off = 1; carry = -1 }
    val n = reader.read(cbuf, off, cbuf.length - off)
    if (n < 0 && off == 0) return false
    var len = off + math.max(n, 0)
    // a lone trailing high surrogate may pair with the next chunk's first
    // char — encoding it now would emit a replacement character
    if (n >= 0 && len > 0 && Character.isHighSurrogate(cbuf(len - 1))) {
      carry = cbuf(len - 1); len -= 1
      if (len == 0) return fill()
    }
    bbuf = new String(cbuf, 0, len)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    pos = 0
    bbuf.length > 0 || fill()
  }

  override def read(): Int =
    if (pos < bbuf.length || fill()) { val b = bbuf(pos) & 0xff; pos += 1; b }
    else -1

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (pos >= bbuf.length && !fill()) return -1
    val n = math.min(len, bbuf.length - pos)
    System.arraycopy(bbuf, pos, b, off, n)
    pos += n
    n
  }

  override def close(): Unit = reader.close()
}

/** Streaming XLSX (zip + SpreadsheetML) puller built on JDK ZipInputStream +
  * StAX. One pass per needed zip entry; only the shared-strings table is held
  * in memory (sized by the file, not the dataset — same tradeoff as the
  * reference core). No external dependencies.
  */
object XlsxParser {
  private val xif = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  /** Opens `open()` several times — once per zip entry family — so the
    * source can be any re-openable stream (local file, HDFS, S3A).
    *
    * `localFile`, when set, short-circuits entry access through
    * `java.util.zip.ZipFile` (central-directory seek) instead of
    * sequentially inflating the stream up to each entry — a reader touches
    * ~6 entries per file (rels, workbook, styles, shared strings, schema
    * probe, row scan), so direct seeks measurably cut per-file overhead on
    * multi-file scans. Object stores keep the streaming path. */
  final class Workbook(open: () => InputStream,
      localFile: Option[java.io.File] = None,
      maxSharedStringsBytes: Long = SharedStringsScanner.DefaultMaxBytes) {

    /** Sheets in workbook order: (name, worksheet part path). */
    lazy val sheets: Seq[SheetInfo] = {
      val rels = readRels()
      val out = ArrayBuffer[SheetInfo]()
      foreachEntry("xl/workbook.xml") { xr =>
        while (xr.hasNext) {
          if (xr.next() == XMLStreamConstants.START_ELEMENT && xr.getLocalName == "sheet") {
            val name = attr(xr, "name").getOrElse("")
            val rid = attr(xr, "id").getOrElse("") // r:id resolves by local name
            val target = rels.getOrElse(rid, "worksheets/sheet1.xml")
            val path = if (target.startsWith("/")) target.drop(1)
                       else if (target.startsWith("xl/")) target else "xl/" + target
            out += SheetInfo(name, path)
          }
        }
      }
      out.toSeq
    }

    /** Hot for string-heavy workbooks (Excel interns every sheet string
      * here) — byte scanner by default, StAX on a UTF-16 BOM. */
    lazy val sharedStrings: Array[String] =
      openEntryStream("xl/sharedStrings.xml") match {
        case None => Array.empty
        case Some((raw, closeAll)) =>
          try {
            val in = new java.io.PushbackInputStream(raw, 2)
            val b0 = in.read(); val b1 = in.read()
            val utf16 = (b0 == 0xFE && b1 == 0xFF) || (b0 == 0xFF && b1 == 0xFE)
            if (b1 != -1) in.unread(b1)
            if (b0 != -1) in.unread(b0)
            // UTF-16 transcodes on the fly and rides the SAME byte scanner
            // (r10 — the StAX shared-strings fallback is now fuzz-only)
            val src: InputStream = if (utf16) new Utf16ToUtf8Stream(in) else in
            SharedStringsScanner.parse(src, maxSharedStringsBytes).toArray
          } finally closeAll()
      }

    /** package-visible so the differential fuzz can drive the StAX path
      * against the byte scanner on identical input */
    private[xlsx] def sharedStringsStax(xr: XMLStreamReader): Array[String] = {
      val out = ArrayBuffer[String]()
      var inSi = false
      var phoneticDepth = 0 // inside <rPh>/<phoneticPr>: furigana, not text
      var retained = 0L
      // count UTF-8 bytes like the byte-scanner path (UTF-16 chars would
      // under-enforce the budget up to 3x on CJK text, exactly where the
      // OOM guard matters); surrogate pairs count 3+3 vs a true 4, erring
      // toward earlier abort. Checked per <t> fragment, not just at </si>,
      // so a single giant run still hits the guard (one element's text is
      // the remaining granularity — StAX materializes it whole, and this
      // path only serves the rare UTF-16 workbooks).
      def utf8Len(s: CharSequence): Long = {
        var n = 0L
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          n += (if (c < 0x80) 1 else if (c < 0x800) 2 else 3)
          i += 1
        }
        n
      }
      var pendingBytes = 0L
      val sb = new StringBuilder
      while (xr.hasNext) {
        xr.next() match {
          case XMLStreamConstants.START_ELEMENT if xr.getLocalName == "si" =>
            inSi = true; sb.setLength(0); pendingBytes = 0L
          case XMLStreamConstants.START_ELEMENT
              if inSi && (xr.getLocalName == "rPh" || xr.getLocalName == "phoneticPr") =>
            phoneticDepth += 1
          case XMLStreamConstants.START_ELEMENT
              if inSi && phoneticDepth == 0 && xr.getLocalName == "t" =>
            val frag = xr.getElementText
            pendingBytes += utf8Len(frag)
            if (retained + pendingBytes > maxSharedStringsBytes)
              throw new IllegalStateException(
                SharedStringsScanner.guardMessage(maxSharedStringsBytes))
            sb.append(frag)
          case XMLStreamConstants.END_ELEMENT
              if inSi && (xr.getLocalName == "rPh" || xr.getLocalName == "phoneticPr") =>
            phoneticDepth -= 1
          case XMLStreamConstants.END_ELEMENT if xr.getLocalName == "si" =>
            inSi = false
            retained += pendingBytes
            pendingBytes = 0L
            out += sb.toString
          case _ =>
        }
      }
      out.toArray
    }

    /** styleIndex → isDateFormat, from xl/styles.xml cellXfs numFmtIds. */
    lazy val dateStyles: Array[Boolean] = {
      val custom = mutable.Map[Int, String]()
      val xfFmts = ArrayBuffer[Int]()
      foreachEntry("xl/styles.xml") { xr =>
        var inCellXfs = false
        while (xr.hasNext) {
          xr.next() match {
            case XMLStreamConstants.START_ELEMENT => xr.getLocalName match {
              case "numFmt" =>
                (attr(xr, "numFmtId"), attr(xr, "formatCode")) match {
                  case (Some(id), Some(code)) => custom(id.toInt) = code
                  case _ =>
                }
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                xfFmts += attr(xr, "numFmtId").map(_.toInt).getOrElse(0)
              case _ =>
            }
            case XMLStreamConstants.END_ELEMENT if xr.getLocalName == "cellXfs" =>
              inCellXfs = false
            case _ =>
          }
        }
      }
      xfFmts.map(id => isDateFmt(id, custom.get(id))).toArray
    }

    /** Builtin date numFmtIds per ECMA-376 §18.8.30, plus custom formats
      * containing date/time tokens (the same heuristic family the reference
      * core uses to tag cells T_DATE). */
    private def isDateFmt(id: Int, code: Option[String]): Boolean = {
      val builtinDate = (id >= 14 && id <= 22) || (id >= 27 && id <= 36) ||
        (id >= 45 && id <= 47) || (id >= 50 && id <= 58)
      builtinDate || code.exists { c =>
        val noLiterals = c.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
        noLiterals.exists(ch => "ymdhs".indexOf(ch.toLower) >= 0)
      }
    }

    def sheetPath(sheetName: Option[String], sheetIndex: Int): String = {
      sheetName match {
        case Some(n) =>
          sheets.find(_.name == n).map(_.target)
            .getOrElse(throw new IllegalArgumentException(s"Sheet '$n' not found; have ${sheets.map(_.name).mkString(", ")}"))
        case None =>
          if (sheetIndex < 1 || sheetIndex > sheets.size)
            throw new IllegalArgumentException(s"sheet_index $sheetIndex out of range 1..${sheets.size}")
          sheets(sheetIndex - 1).target
      }
    }

    /** Stream rows of one worksheet. Rows arrive as dense arrays (width =
      * max seen cell column in that row); gaps are XNone. Stops early when
      * `onRow` returns false (schema probes read only 2 rows). */
    def foreachRow(path: String, onRow: (Long, Array[XCell]) => Boolean): Unit = {
      val it = rowIterator(path)
      try {
        var continue = true
        while (continue && it.hasNext) {
          val (idx, cells) = it.next()
          continue = onRow(idx, cells)
        }
      } finally it.close()
    }

    /** Pull-based row iterator over one worksheet — the shape a Spark DSv2
      * PartitionReader needs (next()/get() driven from the scan), so the
      * sheet never has to be buffered in memory. Close() releases the zip
      * stream; exhausting the iterator also closes it.
      *
      * Hot path is the byte-level [[SheetScanner]]; `threads >= 2` engages
      * the chunked [[ParallelSheetScanner]] (the reference's `threads` knob:
      * one big workbook parsed by N cores); UTF-16 workbooks transcode on
      * the fly ([[Utf16ToUtf8Stream]]) and ride the same scanners.
      */
    /** Open `path` and sniff the encoding BOM once: Left(an iterator for
      * the missing-entry StAX fallback), Right(the positioned byte stream
      * + closer) for the byte scanners. A UTF-16 BOM no longer falls back
      * to StAX (r10): the entry transcodes to UTF-8 on the fly and rides
      * the same scanner + columnar pipeline — the scanner matches tags
      * bytewise and ignores the prolog's declared encoding. The single
      * copy of this dispatch — rowIterator and convertingRowIterator both
      * ride it. */
    private def openSniffed(path: String): Either[CellRowIterator, (InputStream, () => Unit)] =
      openEntryStream(path) match {
        case None => Left(new RowIterator(None, sharedStrings, dateStyles))
        case Some((raw, closeAll)) =>
          val in = new java.io.PushbackInputStream(raw, 2)
          val b0 = in.read(); val b1 = in.read()
          val utf16 = (b0 == 0xFE && b1 == 0xFF) || (b0 == 0xFF && b1 == 0xFE)
          if (b1 != -1) in.unread(b1)
          if (b0 != -1) in.unread(b0)
          if (utf16) Right((new Utf16ToUtf8Stream(in), closeAll))
          else Right((in, closeAll))
      }

    /** The workbook's graft row-group index for a worksheet entry, when
      * present AND the raw deflate geometry is locatable (file-backed,
      * zip32, method=deflate). A workbook with an index is our own
      * writer's output — UTF-8 by construction, so the segmented path
      * never needs the encoding sniff. Any parse surprise → None → the
      * streaming pipeline (parallelism fallback, never correctness).
      *
      * `threads >= 3` gate: in segment mode the N workers carry inflate
      * AND parse, while the streaming pipeline runs producer + prefetch
      * threads BESIDE its N workers — measured crossover: at t=2 the
      * streaming path wins (12.3 vs 8.5 M cells/s), from t=4 the
      * segmented path pulls away (19.9 vs 16.1, then 38 vs 15 at t=8). */
    private def segmentIndexFor(path: String, threads: Int)
        : Option[ParallelSheetScanner.SegmentIndex] =
      if (threads < 3) None else segmentIndexRaw(path)

    /** The index regardless of thread count — the DSv2 planner uses this
      * to SPLIT one workbook across Spark partitions (segment-range
      * input partitions), which beats intra-task threads when cores are
      * otherwise idle: partition-level parallelism schedules, retries
      * and locality-tracks like any other scan. */
    private[xlsx] def segmentIndexRaw(path: String)
        : Option[ParallelSheetScanner.SegmentIndex] =
      localFile.flatMap { f =>
        openEntryStream(XlsxWriter.segmentIndexName(path)).flatMap {
          case (s, closeAll) =>
            try {
              val d = new java.io.DataInputStream(
                new java.io.BufferedInputStream(s))
              if (d.readLong() != XlsxWriter.SegmentMagic ||
                  d.readInt() != 1) None
              else {
                val n = d.readInt()
                val cuts = Array.fill(n) {
                  Array(d.readLong(), d.readLong(), d.readLong())
                }
                val totalUncomp = d.readLong()
                val totalRows = d.readLong()
                ZipRaw.locate(f, path)
                  .filter(_.method == java.util.zip.ZipEntry.DEFLATED)
                  .map(re => ParallelSheetScanner.SegmentIndex(
                    f, re.dataOffset, re.compressedSize, cuts,
                    totalUncomp, totalRows))
              }
            } catch { case _: java.io.IOException => None }
            finally closeAll()
        }
      }

    /** Sequential iterator over segments [s0, s1) of an indexed worksheet
      * — the execution face of a segment-range InputPartition: pread the
      * compressed slice, inflate it alone (full-flush start), cap the
      * inflated side at the recorded uncompressed length (a mid-stream
      * slice never "finishes" the inflater — the cap is what ends it),
      * and run the ordinary [[SheetScanner]]. None when the index (or
      * the raw zip geometry) is unavailable — callers treat that as a
      * hard error, because re-reading the whole file in a RANGE
      * partition would duplicate rows, not merely slow down. */
    private[xlsx] def segmentRangeRowIterator(path: String, s0: Int, s1: Int)
        : Option[CellRowIterator] =
      segmentIndexRaw(path).map { seg =>
        val nSeg = seg.cuts.length + 1
        require(s0 >= 0 && s0 < s1 && s1 <= nSeg,
          s"bad segment range [$s0,$s1) of $nSeg")
        val c0 = if (s0 == 0) 0L else seg.cuts(s0 - 1)(0)
        val u0 = if (s0 == 0) 0L else seg.cuts(s0 - 1)(1)
        val c1 = if (s1 == nSeg) seg.compressedSize else seg.cuts(s1 - 1)(0)
        val u1 = if (s1 == nSeg) seg.totalUncomp else seg.cuts(s1 - 1)(1)
        val fis = new java.io.FileInputStream(seg.file)
        fis.getChannel.position(seg.dataOffset + c0)
        val inf = new java.util.zip.Inflater(true)
        val inflated = new java.util.zip.InflaterInputStream(
          new BoundedInputStream(
            new java.io.BufferedInputStream(fis, 1 << 16), c1 - c0),
          inf, 1 << 16)
        new SheetScanner(new BoundedInputStream(inflated, u1 - u0),
          sharedStrings, dateStyles,
          () => { inf.end(); fis.close() })
      }

    def rowIterator(path: String, threads: Int = 1): CellRowIterator = {
      if (threads >= 2) segmentIndexFor(path, threads) match {
        case Some(seg) =>
          return new ParallelSheetScanner(null, sharedStrings, dateStyles,
            threads, () => (), segmented = seg)
        case None =>
      }
      openSniffed(path) match {
        case Left(it) => it
        case Right((in, closeAll)) =>
          if (threads >= 2)
            new ParallelSheetScanner(in, sharedStrings, dateStyles, threads, closeAll)
          else new SheetScanner(in, sharedStrings, dateStyles, closeAll)
      }
    }

    /** Parallel row iterator with a WORKER-side per-row transform — the
      * DSv2 reader passes its cell→Catalyst conversion here so that work
      * fans out with the parse. Right(parallel scanner, drive with
      * nextConverted — its raw Iterator face is disabled) on the byte
      * path; Left(plain iterator) when the entry is missing or UTF-16
      * (the caller converts on its own thread there). */
    private[xlsx] def convertingRowIterator(path: String, threads: Int,
        convert: Array[XCell] => AnyRef,
        chunkBytes: Int = ParallelSheetScanner.DefaultChunkBytes): Either[CellRowIterator, ParallelSheetScanner] = {
      segmentIndexFor(path, threads).foreach { seg =>
        return Right(new ParallelSheetScanner(null, sharedStrings, dateStyles,
          threads, () => (), chunkBytes = chunkBytes, convert = convert,
          segmented = seg))
      }
      openSniffed(path) match {
        case Left(it) => Left(it)
        case Right((in, closeAll)) =>
          Right(new ParallelSheetScanner(in, sharedStrings, dateStyles, threads,
            closeAll, chunkBytes = chunkBytes, convert = convert))
      }
    }

    /** Parallel row iterator with a WORKER-side per-CHUNK transform — the
      * columnar DSv2 reader passes its rows→ColumnarBatch builder here so
      * whole batches materialize off the consumer thread. Right(parallel
      * scanner, drive with advanceChunk); Left(plain iterator) when the
      * entry is missing or UTF-16 (the caller batches on its own thread). */
    private[xlsx] def chunkingRowIterator(path: String, threads: Int,
        chunkConvert: (Array[Array[XCell]], Int) => AnyRef,
        dropFirstRows: Long = 0L,
        chunkBytes: Int = ParallelSheetScanner.DefaultChunkBytes): Either[CellRowIterator, ParallelSheetScanner] = {
      segmentIndexFor(path, threads).foreach { seg =>
        return Right(new ParallelSheetScanner(null, sharedStrings, dateStyles,
          threads, () => (), chunkBytes = chunkBytes,
          chunkConvert = chunkConvert, dropFirstRows = dropFirstRows,
          segmented = seg))
      }
      openSniffed(path) match {
        case Left(it) => Left(it)
        case Right((in, closeAll)) =>
          Right(new ParallelSheetScanner(in, sharedStrings, dateStyles, threads,
            closeAll, chunkBytes = chunkBytes, chunkConvert = chunkConvert,
            dropFirstRows = dropFirstRows))
      }
    }

    /** StAX-backed row iterator regardless of encoding — the differential
      * fuzz spec drives this against the byte scanner on identical input. */
    private[xlsx] def rowIteratorStax(path: String): CellRowIterator =
      new RowIterator(openEntry(path), sharedStrings, dateStyles)

    /** Raw inflated entry stream for throughput probes (graft.tools). */
    def entryStreamForProbe(path: String): (InputStream, () => Unit) =
      openEntryStream(path).getOrElse(
        throw new IllegalArgumentException(s"no entry $path"))

    final class RowIterator(
        entry: Option[(XMLStreamReader, () => Unit)],
        strings: Array[String],
        dates: Array[Boolean])
        extends CellRowIterator {
      private val xr = entry.map(_._1).orNull
      private var closed = entry.isEmpty
      private var nextRow: (Long, Array[XCell]) = _
      private var rowIdx = -1L

      override def hasNext: Boolean = {
        if (nextRow != null) return true
        if (closed) return false
        nextRow = advance()
        if (nextRow == null) { close(); false } else true
      }

      override def next(): (Long, Array[XCell]) = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }

      override def close(): Unit = if (!closed) { closed = true; entry.foreach(_._2()) }

      /** Advance the StAX cursor to the next </row>; null at stream end. */
      private def advance(): (Long, Array[XCell]) = {
        var cells = ArrayBuffer[XCell]()
        var col = -1
        var t = ""
        var style = -1
        var inV = false
        var inIs = false
        val text = new StringBuilder
        while (xr.hasNext) {
          xr.next() match {
            case XMLStreamConstants.START_ELEMENT => xr.getLocalName match {
              case "row" =>
                rowIdx = attr(xr, "r").map(_.toLong - 1).getOrElse(rowIdx + 1)
                cells = ArrayBuffer[XCell]()
              case "c" =>
                col = attr(xr, "r").map(colOf).getOrElse(cells.length)
                t = attr(xr, "t").getOrElse("")
                style = attr(xr, "s").map(_.toInt).getOrElse(-1)
              case "v" => inV = true; text.setLength(0)
              case "is" => inIs = true; text.setLength(0)
              case "t" if inIs => text.append(xr.getElementText)
              case _ =>
            }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV =>
              text.appendAll(xr.getTextCharacters, xr.getTextStart, xr.getTextLength)
            case XMLStreamConstants.END_ELEMENT => xr.getLocalName match {
              case "v" =>
                inV = false
                setCell(cells, col, parseCell(t, text.toString, style, strings, dates))
              case "is" =>
                inIs = false
                setCell(cells, col, XCell.XString(text.toString))
              case "c" =>
                // <c> with no <v>/<is> child: leave as gap (XNone)
                col = -1; t = ""; style = -1
              case "row" =>
                return (rowIdx, cells.toArray)
              case _ =>
            }
            case _ =>
          }
        }
        null
      }
    }

    private def parseCell(t: String, raw: String, style: Int,
                          strings: Array[String], dates: Array[Boolean]): XCell = t match {
      case "s" =>
        // Bad/empty shared-string index → error cell → NULL, not a crashed
        // scan (reference: sheetreader_extension.cpp:117-135).
        try {
          val i = raw.trim.toInt
          if (i >= 0 && i < strings.length) XCell.XString(strings(i)) else XCell.XError
        } catch { case _: NumberFormatException => XCell.XError }
      case "str" | "inlineStr" => XCell.XString(raw)
      case "b" => XCell.XBool(raw.trim == "1" || raw.trim.equalsIgnoreCase("true"))
      case "e" => XCell.XError
      case "" | "n" =>
        try {
          val d = raw.trim.toDouble
          if (style >= 0 && style < dates.length && dates(style)) XCell.XDate(d)
          else XCell.XNumber(d)
        } catch { case _: NumberFormatException => XCell.XError }
      case _ => XCell.XError
    }

    private def setCell(cells: ArrayBuffer[XCell], col: Int, v: XCell): Unit = {
      val c = if (col < 0) cells.length else col
      while (cells.length <= c) cells += XCell.XNone
      cells(c) = v
    }

    /** Column index from an A1-style ref: "BC12" → 54. */
    private def colOf(ref: String): Int = {
      var i = 0; var n = 0
      while (i < ref.length && ref.charAt(i).isLetter) {
        n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
      }
      n - 1
    }

    private def readRels(): Map[String, String] = {
      val m = mutable.Map[String, String]()
      foreachEntry("xl/_rels/workbook.xml.rels") { xr =>
        while (xr.hasNext) {
          if (xr.next() == XMLStreamConstants.START_ELEMENT && xr.getLocalName == "Relationship")
            for (id <- attr(xr, "Id"); tgt <- attr(xr, "Target")) m(id) = tgt
        }
      }
      m.toMap
    }

    /** Scan the zip stream for `name` and run `f` over its XML. Missing
      * entry (e.g. no sharedStrings.xml) is a no-op. */
    private def foreachEntry(name: String)(f: XMLStreamReader => Unit): Unit =
      openEntry(name) match {
        case Some((xr, closeAll)) => try f(xr) finally closeAll()
        case None =>
      }

    /** Open the zip and position an XML reader at entry `name`; the returned
      * thunk closes both the XML reader and the zip stream. None if the
      * entry does not exist. */
    private def openEntry(name: String): Option[(XMLStreamReader, () => Unit)] =
      openEntryStream(name).map { case (s, closeAll) =>
        val xr = xif.createXMLStreamReader(s)
        (xr, () => { try xr.close() finally closeAll() })
      }

    /** Open the zip and position the raw inflated byte stream at entry
      * `name`; the thunk closes the zip stream. None if absent. */
    private[xlsx] def openEntryStream(name: String): Option[(InputStream, () => Unit)] =
      localFile match {
        case Some(f) =>
          val zf = new java.util.zip.ZipFile(f)
          Option(zf.getEntry(name)) match {
            case None => zf.close(); None
            case Some(e) =>
              val s = zf.getInputStream(e)
              Some((s, () => { try s.close() finally zf.close() }))
          }
        case None =>
          val in = new ZipInputStream(open())
          var e = in.getNextEntry
          while (e != null) {
            if (e.getName == name)
              return Some((new NonClosingStream(in), () => in.close()))
            e = in.getNextEntry
          }
          in.close()
          None
      }

    private def attr(xr: XMLStreamReader, local: String): Option[String] = {
      var i = 0
      while (i < xr.getAttributeCount) {
        if (xr.getAttributeLocalName(i) == local) return Some(xr.getAttributeValue(i))
        i += 1
      }
      None
    }
  }

  /** Reads at most `limit` bytes from `in`, then reports EOF WITHOUT
    * touching the underlying stream again — the cap that ends a
    * mid-stream deflate slice cleanly (asking the inflater for one more
    * byte past the recorded length would throw "unexpected end"). */
  private[xlsx] final class BoundedInputStream(in: InputStream, limit: Long)
      extends InputStream {
    private var left = limit
    override def read(): Int =
      if (left <= 0) -1
      else { val b = in.read(); if (b >= 0) left -= 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (left <= 0) return -1
      val n = in.read(b, off, math.min(len.toLong, left).toInt)
      if (n > 0) left -= n
      n
    }
    override def close(): Unit = in.close()
  }

  /** StAX close() would close the whole zip stream; shield it. */
  private final class NonClosingStream(in: InputStream) extends InputStream {
    override def read(): Int = in.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = in.read(b, off, len)
    override def close(): Unit = ()
  }
}
