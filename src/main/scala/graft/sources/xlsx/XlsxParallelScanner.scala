package graft.sources.xlsx

import java.io.{ByteArrayInputStream, InputStream}
import java.util.concurrent.{ArrayBlockingQueue, Callable, ExecutorService, Executors, Future, ThreadFactory, TimeUnit}

import scala.collection.mutable.ArrayBuffer

/** Intra-file parallel worksheet parsing — the Spark-side equivalent of the
  * reference's `threads` knob (reference: src/sheetreader_extension.cpp:36-53,
  * 294-458 parses ONE workbook with N workers into per-thread buffers).
  *
  * Deflate streams are not splittable, so the inflate pass is inherently
  * sequential; what CAN fan out is everything after it — attribute parsing,
  * entity decoding, number parsing, cell materialization, which dominate the
  * per-byte cost. The pipeline:
  *
  *   producer thread:  inflate → locate row boundaries → cut ~`chunkBytes`
  *                     chunks ending on a row boundary
  *   worker pool (N):  parse each chunk with an ordinary [[SheetScanner]]
  *   caller thread:    merge chunk results in submission order, stitching
  *                     implicit (r-attribute-less) row indices across chunks
  *
  * Backpressure is the bounded future queue: at most `threads * 2` chunks
  * are in flight, so memory is O(threads · chunkBytes) regardless of sheet
  * size. The boundary locator ([[RowBoundaryTracker]]) is an incremental
  * mimic of [[SheetScanner]]'s markup state machine — quotes, comments,
  * CDATA, processing instructions, `<v>`/`<is>` text containment and the
  * entity quirk included — so a chunk cut is NEVER inside markup that the
  * scanner would have treated as content (the differential fuzz drives the
  * chunked path against StAX on adversarial sheets).
  *
  * This is for the reference's headline scenario — one huge workbook on an
  * otherwise idle machine. Under a normal multi-file Spark scan each task
  * is already one core of parallelism and `threads` stays 1.
  */
final class ParallelSheetScanner(
    in: InputStream,
    strings: Array[String],
    dates: Array[Boolean],
    threads: Int,
    closeUnderlying: () => Unit,
    chunkBytes: Int = ParallelSheetScanner.DefaultChunkBytes,
    /** Optional per-row transform applied IN THE WORKER right after a row
      * parses (the DSv2 reader passes its cell→Catalyst-value conversion
      * here, so the per-cell match/boxing work fans out with the parse
      * instead of serializing on the consumer thread). When set, drive the
      * iterator with [[nextConverted]]; the raw `next()` face is disabled.
      * The transform must be thread-safe and must not depend on the row's
      * global index (workers see chunk-local parses). */
    convert: Array[XCell] => AnyRef = null,
    /** Optional per-CHUNK transform: called IN THE WORKER with all of a
      * chunk's parsed rows at once — `(rows, dropFirst) => batch` — so a
      * columnar reader can build one ColumnarBatch per chunk off the
      * consumer thread. `dropFirst` is how many leading rows of THIS chunk
      * fall inside the file-level `dropFirstRows` prefix (header/skipRows):
      * the producer derives it EXACTLY from its boundary counts, so the
      * transform must exclude those rows from the batch (they still appear
      * in the chunk metadata arrays for row-index stitching). Mutually
      * exclusive with `convert`; drive the iterator with [[advanceChunk]] +
      * the `chunk*` fields. Must be thread-safe and row-order-preserving. */
    chunkConvert: (Array[Array[XCell]], Int) => AnyRef = null,
    /** File-level leading-row drop (header + skipRows) dealt out to chunk
      * workers via `chunkConvert`'s dropFirst argument. Chunk-face only. */
    dropFirstRows: Long = 0L,
    /** SEGMENT mode (non-null): the workbook carries a graft row-group
      * index ([[XlsxWriter.SegmentBytes]]), so the producer does NO
      * inflate and NO boundary tracking — it submits one task per
      * pre-recorded segment, and each WORKER preads its raw deflate
      * slice, inflates it independently (segments start on FULL_FLUSH
      * byte boundaries with a reset history window), and parses. The
      * whole pipeline becomes embarrassingly parallel; `in` may be null.
      * Measured motivation: at t=8 the stream producer spends ~75% of
      * its wall time in boundary tracking — the plateau this removes. */
    segmented: ParallelSheetScanner.SegmentIndex = null,
    /** SPECULATIVE-TRACKING override for the index-less stream path:
      * null = auto (engage at `threads >= 4`, where the single-thread
      * boundary tracker is the measured pipeline floor), TRUE/FALSE =
      * force. See [[produceSpeculative]]. */
    specTrack: java.lang.Boolean = null)
    extends CellRowIterator {
  require(convert == null || chunkConvert == null,
    "convert and chunkConvert are mutually exclusive")
  require(threads >= 2, s"ParallelSheetScanner needs >= 2 threads, got $threads")
  import ParallelSheetScanner._

  // DEFAULT OFF: the interleaved A/B (ParseBench foreign mode) measured
  // the streaming pipeline already at the single-thread INFLATE ceiling
  // on this class of hardware (track ~600 MB/s ≈ inflate ~650 MB/s, the
  // two sequential stages pipeline to max ≈ inflate), so moving tracking
  // into the worker pool only adds competition (0.82-0.96x). The
  // machinery stays (differential-fuzz-pinned) as the opt-in for
  // environments where tracking, not inflate, is the floor.
  private val speculative: Boolean =
    segmented == null && (
      if (specTrack != null) specTrack.booleanValue()
      else sys.props.get("graft.spectrack").contains("always"))

  // futures in submission order; capacity bounds in-flight chunks
  private val queue = new ArrayBlockingQueue[AnyRef](threads * 2)
  // chunk buffers recycled worker→producer: a big sheet otherwise allocates
  // (and the JVM zeroes) sheetBytes worth of fresh arrays — measurable on
  // the producer thread, which is the pipeline's sequential stage.
  // ArrayBlockingQueue: offer() gives an EXACT O(1) capacity bound (the
  // earlier ConcurrentLinkedQueue size()-check-then-offer was an O(n)
  // traversal and racy across workers, so the bound was only advisory).
  // Buffers that became undersized after a growth event are discarded on
  // poll — the producer's buffer only ever grows, so they can never fit
  // again and re-offering would clog the pool with dead weight.
  private val bufPool =
    new java.util.concurrent.ArrayBlockingQueue[Array[Byte]](threads * 2)
  @volatile private var producerError: Throwable = _
  @volatile private var stopped = false

  private val pool: ExecutorService =
    Executors.newFixedThreadPool(threads, new ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"xlsx-parse-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  // Inflate on its own thread: deflate yields ~4 KiB per read and costs a
  // core of its own; decoupling it from boundary tracking makes the
  // pipeline's sequential stage max(inflate, track), not their sum. Depth
  // 8 × 1 MiB absorbs inflate burstiness (zlib throughput varies with
  // block content) so the tracker — the slower stage — never starves.
  // Segment mode needs neither: workers inflate their own slices.
  private val prefetch =
    if (segmented == null) new PrefetchStream(in, 1 << 20, 8, () => stopped)
    else null

  // one channel, positional (thread-safe) reads from every worker
  private val segChannel =
    if (segmented == null) null
    else java.nio.channels.FileChannel.open(segmented.file.toPath,
      java.nio.file.StandardOpenOption.READ)

  private val producer = new Thread(() => produce(), "xlsx-chunk-producer")
  producer.setDaemon(true)
  producer.start()

  // ---- producer -----------------------------------------------------------

  private def produce(): Unit = {
    try {
      if (segmented != null) { produceSegments(); return }
      if (speculative) { produceSpeculative(); return }
      val debug = java.lang.Boolean.getBoolean("graft.parsedebug")
      var tRead, tScan, tSubmit = 0L
      val tAll = System.nanoTime()
      val tracker = new RowBoundaryTracker
      var buf = new Array[Byte](chunkBytes + (chunkBytes >> 2))
      var filled = 0
      var lastBoundary = -1 // offset just past the last row end seen in buf
      // rows already handed to workers — every boundary the tracker has
      // seen at cut time is inside the cut (the cut IS the last boundary),
      // so cumulative boundary counts deal the file-level dropFirstRows
      // prefix out to chunks EXACTLY, even when the prefix spans chunks
      var rowsBefore = 0L
      def dropFor(): Int =
        math.min(math.max(0L, dropFirstRows - rowsBefore), Int.MaxValue.toLong).toInt
      var done = false
      while (!done && !stopped) {
        var t0 = if (debug) System.nanoTime() else 0L
        val n = prefetch.read(buf, filled, buf.length - filled)
        if (debug) tRead += System.nanoTime() - t0
        if (n < 0) {
          if (filled > 0) submit(buf, filled, dropFor())
          done = true
        } else if (n > 0) {
          val from = filled
          filled += n
          if (debug) t0 = System.nanoTime()
          val b = tracker.scan(buf, from, filled)
          if (debug) tScan += System.nanoTime() - t0
          if (b >= 0) lastBoundary = b
          if (filled >= chunkBytes && lastBoundary > 0) {
            if (debug) t0 = System.nanoTime()
            // zero-copy handoff: the worker parses [0, lastBoundary) of THIS
            // buffer; only the tail carries over into a fresh (or recycled)
            // one
            val tail = filled - lastBoundary
            val minLen = math.max(buf.length, chunkBytes + (chunkBytes >> 2))
            val recycled = bufPool.poll()
            val nbuf =
              if (recycled != null && recycled.length >= minLen) recycled
              else new Array[Byte](minLen)
            System.arraycopy(buf, lastBoundary, nbuf, 0, tail)
            submit(buf, lastBoundary, dropFor())
            rowsBefore = tracker.boundaries
            buf = nbuf
            if (debug) tSubmit += System.nanoTime() - t0
            filled = tail
            lastBoundary = -1
          } else if (filled == buf.length) {
            // a single row larger than the chunk target: grow and keep going
            buf = java.util.Arrays.copyOf(buf, buf.length * 2)
          }
        }
      }
      if (debug) System.err.println(
        f"[parse-producer] total ${(System.nanoTime() - tAll) / 1e9}%.3f s: " +
        f"read ${tRead / 1e9}%.3f scan ${tScan / 1e9}%.3f submit ${tSubmit / 1e9}%.3f")
    } catch {
      case _: InterruptedException => // close() raced us; fall through to End
      case t: Throwable => producerError = t
    } finally {
      putQuietly(End)
    }
  }

  /** SPECULATIVE parallel boundary tracking for index-less streams — the
    * r12 measurement showed the stream producer spends ~75% of its wall
    * time in [[RowBoundaryTracker.scan]], capping foreign (no-index)
    * workbooks at a one-core tracking floor however many parse workers
    * wait behind it. This producer removes tracking from the sequential
    * path:
    *
    *   1. blocks are cut at SPECULATIVE boundaries — the last literal
    *      `</row>` byte sequence in each ~chunkBytes window, found by a
    *      plain substring scan over the inflated bytes (no state
    *      machine: the literal may legitimately sit inside a comment,
    *      CDATA section, PI, or `<is><t>` text — validation below
    *      catches exactly those);
    *   2. each block runs a FRESH [[RowBoundaryTracker]] in the worker
    *      pool, assuming it starts just past a genuine row boundary in
    *      clean Text state (exactly a fresh tracker's initial state);
    *   3. this thread settles track results IN ORDER and validates the
    *      chain inductively: block 0 starts at the true stream start, and
    *      block i+1's assumption is PROVEN by block i's track ending
    *      clean — every boundary counted and every byte attributed
    *      exactly as the sequential tracker would have, or nothing is.
    *
    * When a block does NOT end clean (an adversarial cut, or a row
    * spanning the block), only its validated prefix [0, lastBoundary)
    * parses; the tail carries into the next block, whose speculative
    * result is discarded and re-tracked on this thread from the genuine
    * boundary (the carry always starts at one). Worst case — pathological
    * sheets where every cut lands inside markup — degrades to exactly the
    * sequential tracking cost, never to wrong output; the differential
    * fuzz drives this path with forced-tiny blocks over comment/CDATA
    * sheets. Parse submission order, chunk semantics, dropFirstRows
    * dealing and the consumer contract are IDENTICAL to the streaming
    * producer — workers just do the tracking too. */
  private def produceSpeculative(): Unit = {
    val lit = Array[Byte]('<', '/', 'r', 'o', 'w', '>')
    final case class TrackRes(rows: Long, lastBoundary: Int, cleanEnd: Boolean)
    def track(buf: Array[Byte], len: Int): Future[TrackRes] =
      pool.submit(new Callable[TrackRes] {
        override def call(): TrackRes = {
          val tr = new RowBoundaryTracker
          val last = tr.scan(buf, 0, len)
          TrackRes(tr.boundaries, last, last == len && tr.freshText)
        }
      })
    // blocks awaiting in-order validation; bounded so memory stays
    // O(threads · chunkBytes) alongside the parse queue's own bound
    val pending = new java.util.ArrayDeque[(Array[Byte], Int, Future[TrackRes])]()
    var rowsBefore = 0L
    def dropFor(): Int =
      math.min(math.max(0L, dropFirstRows - rowsBefore), Int.MaxValue.toLong).toInt
    var chainClean = true // next pending block truly starts at a boundary
    var carry: Array[Byte] = null // bytes after the last GENUINE boundary
    var carryLen = 0

    // sequential re-track of a broken-chain block (rare): the carry always
    // starts at a genuine boundary, so a fresh tracker is the true state
    def settleBroken(buf: Array[Byte], len: Int): Unit = {
      val merged = new Array[Byte](carryLen + len)
      if (carryLen > 0) System.arraycopy(carry, 0, merged, 0, carryLen)
      System.arraycopy(buf, 0, merged, carryLen, len)
      val mlen = carryLen + len
      val tr = new RowBoundaryTracker
      val last = tr.scan(merged, 0, mlen)
      if (last == mlen && tr.freshText) {
        submit(merged, mlen, dropFor()); rowsBefore += tr.boundaries
        carry = null; carryLen = 0; chainClean = true
      } else if (last > 0) {
        carry = java.util.Arrays.copyOfRange(merged, last, mlen)
        carryLen = mlen - last
        submit(merged, last, dropFor()); rowsBefore += tr.boundaries
      } else {
        carry = merged; carryLen = mlen
      }
    }

    def settleOne(): Unit = {
      val (buf, len, fut) = pending.pollFirst()
      if (chainClean) {
        val res = fut.get()
        if (res.cleanEnd) {
          submit(buf, len, dropFor()); rowsBefore += res.rows
        } else if (res.lastBoundary > 0) {
          // valid track, bogus speculative END cut: parse the validated
          // prefix, carry the tail (copied BEFORE the parse worker may
          // recycle the array)
          carry = java.util.Arrays.copyOfRange(buf, res.lastBoundary, len)
          carryLen = len - res.lastBoundary
          submit(buf, res.lastBoundary, dropFor()); rowsBefore += res.rows
          chainClean = false
        } else {
          // no boundary in the whole block: everything carries
          carry = java.util.Arrays.copyOf(buf, len); carryLen = len
          chainClean = false
        }
      } else {
        // chain broken upstream: this block's speculative track assumed a
        // start state that never happened — discard and re-track from the
        // carried genuine boundary. The zombie task may still be reading
        // `buf`, so the array is NOT recycled on this path.
        fut.cancel(false)
        settleBroken(buf, len)
      }
    }

    var buf: Array[Byte] = {
      val r = bufPool.poll()
      if (r != null && r.length >= chunkBytes) r else new Array[Byte](chunkBytes)
    }
    var filled = 0
    var lastLit = -1 // end offset of the last `</row>` literal seen in buf
    var done = false
    while (!done && !stopped) {
      val n = prefetch.read(buf, filled, buf.length - filled)
      if (n < 0) done = true
      else if (n > 0) {
        // incremental literal scan over the new bytes (5-byte overlap
        // covers a literal split across reads)
        var q = math.max(0, filled - 5)
        filled += n
        val stop = filled - lit.length
        while (q <= stop) {
          if (buf(q) == '<' && buf(q + 1) == '/' && buf(q + 2) == 'r' &&
              buf(q + 3) == 'o' && buf(q + 4) == 'w' && buf(q + 5) == '>')
            lastLit = q + 6
          q += 1
        }
        if (filled >= chunkBytes && lastLit > 0) {
          val cut = lastLit
          val tail = filled - cut
          val minLen = math.max(buf.length, chunkBytes)
          val recycled = bufPool.poll()
          val nbuf =
            if (recycled != null && recycled.length >= minLen) recycled
            else new Array[Byte](minLen)
          System.arraycopy(buf, cut, nbuf, 0, tail)
          pending.addLast((buf, cut, track(buf, cut)))
          buf = nbuf
          filled = tail
          lastLit = -1
          if (pending.size > threads) settleOne()
        } else if (filled == buf.length) {
          // no boundary candidate yet: grow and keep reading
          buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        }
      }
    }
    while (!pending.isEmpty && !stopped) settleOne()
    if (!stopped && (filled > 0 || carryLen > 0)) {
      // final remainder (worksheet trailer included), via the carry path
      // so a broken chain merges correctly; chainClean w/ no carry is the
      // same arraycopy with carryLen = 0
      val fb = buf; val fl = filled
      if (chainClean && carryLen == 0) submit(fb, fl, dropFor())
      else {
        val merged = new Array[Byte](carryLen + fl)
        if (carryLen > 0) System.arraycopy(carry, 0, merged, 0, carryLen)
        System.arraycopy(fb, 0, merged, carryLen, fl)
        submit(merged, carryLen + fl, dropFor())
      }
    }
  }

  /** Segment-mode producer: one task per recorded segment. All the work
    * — pread, inflate, parse, convert — happens in the WORKERS; this
    * thread only enqueues (backpressured by the bounded future queue, so
    * at most threads×2 segments are in flight and memory stays
    * O(threads × segmentBytes) like the streaming path). */
  private def produceSegments(): Unit = {
    val seg = segmented
    val nSeg = seg.cuts.length + 1
    var i = 0
    while (i < nSeg && !stopped) {
      val cOff = if (i == 0) 0L else seg.cuts(i - 1)(0)
      val uOff = if (i == 0) 0L else seg.cuts(i - 1)(1)
      val rowsBefore = if (i == 0) 0L else seg.cuts(i - 1)(2)
      val cEnd = if (i < seg.cuts.length) seg.cuts(i)(0) else seg.compressedSize
      val uEnd = if (i < seg.cuts.length) seg.cuts(i)(1) else seg.totalUncomp
      val drop = math.min(math.max(0L, dropFirstRows - rowsBefore),
        Int.MaxValue.toLong).toInt
      val cLen = (cEnd - cOff).toInt
      val uLen = (uEnd - uOff).toInt
      val dataOff = seg.dataOffset + cOff
      val segNo = i
      putQuietly(pool.submit(new Callable[ParsedChunk] {
        override def call(): ParsedChunk = {
          val comp = java.nio.ByteBuffer.allocate(cLen)
          var pos = dataOff
          while (comp.hasRemaining) {
            val r = segChannel.read(comp, pos)
            if (r < 0) throw new java.io.EOFException(
              s"xlsx segment $segNo: EOF at file offset $pos")
            pos += r
          }
          val recycled = bufPool.poll()
          val out =
            if (recycled != null && recycled.length >= uLen) recycled
            else new Array[Byte](uLen)
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(comp.array(), 0, cLen)
            var off = 0
            while (off < uLen) {
              val k = inf.inflate(out, off, uLen - off)
              if (k == 0) throw new java.io.IOException(
                s"xlsx segment $segNo truncated: $off of $uLen bytes " +
                  s"(finished=${inf.finished()})")
              off += k
            }
          } finally inf.end()
          parseChunk(out, uLen, drop)
        }
      }))
      i += 1
    }
  }

  /** put() that gives up when the consumer has been closed (the queue may
    * be full and never drained again — don't leave a zombie thread). */
  private def putQuietly(x: AnyRef): Unit = {
    var ok = false
    while (!ok && !stopped)
      ok = queue.offer(x, 50, TimeUnit.MILLISECONDS)
  }

  private def submit(chunk: Array[Byte], len: Int, dropFirst: Int): Unit =
    putQuietly(pool.submit(new Callable[ParsedChunk] {
      override def call(): ParsedChunk = parseChunk(chunk, len, dropFirst)
    }))

  private def parseChunk(chunk: Array[Byte], len: Int, dropFirst: Int): ParsedChunk = {
    val sc = new SheetScanner(
      new ByteArrayInputStream(chunk, 0, len), strings, dates, () => ())
    val idx = new ArrayBuffer[Long]()
    val explicitR = new ArrayBuffer[Boolean]()
    val rows = if (convert == null) new ArrayBuffer[Array[XCell]]() else null
    val conv = if (convert != null) new ArrayBuffer[AnyRef]() else null
    val widths = if (convert != null || chunkConvert != null) new ArrayBuffer[Int]() else null
    while (sc.hasNext) {
      val (i, cells) = sc.next()
      idx += i
      explicitR += sc.lastRowExplicit
      if (convert == null) rows += cells
      else { conv += convert(cells); widths += cells.length }
      if (chunkConvert != null) widths += cells.length
    }
    val out = if (chunkConvert != null) {
      val rowArr = rows.toArray
      val dropped = math.min(dropFirst, rowArr.length)
      ParsedChunk(idx.toArray, explicitR.toArray, null, null, widths.toArray,
        chunkConvert(rowArr, dropped), dropped)
    } else
      ParsedChunk(idx.toArray, explicitR.toArray,
        if (rows == null) null else rows.toArray,
        if (conv == null) null else conv.toArray,
        if (widths == null) null else widths.toArray)
    // the chunk's bytes are fully consumed — recycle the buffer; offer()
    // drops it when the pool is at capacity (exact bound, no size() scan)
    bufPool.offer(chunk)
    out
  }

  // ---- consumer (the iterator face) ---------------------------------------

  private var cur: ParsedChunk = _
  private var curI = 0
  private var lastIdx = -1L // last emitted absolute row index
  private var ended = false
  private var nrValid = false
  private var nrIdx = 0L
  private var nrCells: Array[XCell] = _
  private var nrConv: AnyRef = _
  private var nrWidth = 0

  override def hasNext: Boolean = {
    if (chunkConvert != null) throw new UnsupportedOperationException(
      "row faces are disabled when a chunkConvert fn is set; drive advanceChunk()")
    if (nrValid) return true
    if (ended) return false
    while (cur == null || curI >= cur.idx.length) {
      queue.take() match {
        case End =>
          ended = true
          if (producerError != null) { close(); throw producerError }
          close()
          return false
        case f: Future[_] =>
          // a worker parse failure must tear the pipeline down (producer,
          // prefetch, pool, underlying stream) and surface the CAUSE, the
          // same exception the sequential scanner would have thrown
          cur =
            try f.get().asInstanceOf[ParsedChunk]
            catch {
              case e: java.util.concurrent.ExecutionException =>
                ended = true
                close()
                throw Option(e.getCause).getOrElse(e)
              case e: InterruptedException =>
                ended = true
                close()
                throw e
            }
          curI = 0
      }
    }
    // stitch: an implicit row numbers from the previously EMITTED row, not
    // from the chunk-local counter (which started at -1)
    val abs = if (cur.explicitR(curI)) cur.idx(curI) else lastIdx + 1
    lastIdx = abs
    nrIdx = abs
    if (convert == null) nrCells = cur.rows(curI)
    else { nrConv = cur.conv(curI); nrWidth = cur.widths(curI) }
    nrValid = true
    curI += 1
    true
  }

  override def next(): (Long, Array[XCell]) = {
    // with a convert fn the raw cells are never materialized chunk-side;
    // the Iterator face is deliberately unusable rather than subtly wrong
    if (convert != null) throw new UnsupportedOperationException(
      "next() is disabled when a convert fn is set; drive nextConverted()")
    if (!hasNext) throw new NoSuchElementException
    nrValid = false
    (nrIdx, nrCells)
  }

  /** Converted-row face (convert != null): (absolute row index, the
    * convert() result, the parsed cell count for ragged-row checks). */
  def nextConverted(): (Long, AnyRef, Int) = {
    require(convert != null, "nextConverted() needs a convert fn")
    if (!hasNext) throw new NoSuchElementException
    nrValid = false
    (nrIdx, nrConv, nrWidth)
  }

  /** Allocation-free converted-row face: `advance()` then read the three
    * `row*` fields. `nextConverted` allocates a Tuple3 + two boxes per row —
    * real money on the consumer thread, which is the pipeline's sequential
    * merge stage. Fields are valid until the next `advance()`. */
  def advance(): Boolean = {
    val h = hasNext
    if (h) nrValid = false
    h
  }
  def rowIdx: Long = nrIdx
  def rowConv: AnyRef = nrConv
  def rowWidth: Int = nrWidth

  // ---- chunk face (chunkConvert != null) -----------------------------------

  private var chunkCur: ParsedChunk = _

  /** Whole-chunk face: pull the next parsed chunk (worker-built batch plus
    * the per-row index/width metadata the consumer needs for row-number
    * stitching, skipRows and ragged checks). Returns false at stream end.
    * A chunk may carry ZERO rows (a producer tail holding only trailing
    * markup) — its batch is whatever chunkConvert returned for an empty
    * row set; callers skip it and keep pulling. Do not interleave with the
    * row faces. */
  def advanceChunk(): Boolean = {
    require(chunkConvert != null, "advanceChunk() needs a chunkConvert fn")
    if (ended) return false
    queue.take() match {
      case End =>
        ended = true
        if (producerError != null) { close(); throw producerError }
        close()
        false
      case f: Future[_] =>
        chunkCur =
          try f.get().asInstanceOf[ParsedChunk]
          catch {
            case e: java.util.concurrent.ExecutionException =>
              ended = true
              close()
              throw Option(e.getCause).getOrElse(e)
            case e: InterruptedException =>
              ended = true
              close()
              throw e
          }
        true
    }
  }
  def chunkBatch: AnyRef = chunkCur.batch
  def chunkIdx: Array[Long] = chunkCur.idx
  def chunkExplicitR: Array[Boolean] = chunkCur.explicitR
  def chunkWidths: Array[Int] = chunkCur.widths
  /** Leading rows of this chunk excluded from the batch (file-level
    * header/skipRows prefix): present in the metadata arrays, exempt from
    * ragged checks — the sequential reader never width-checks dropped rows. */
  def chunkDropped: Int = chunkCur.dropped

  override def close(): Unit = if (!stopped) {
    stopped = true
    producer.interrupt()
    if (prefetch != null) prefetch.shutdown()
    pool.shutdownNow()
    // drain so a blocked producer put can finish dying
    while (queue.poll() != null) ()
    if (segChannel != null) {
      try segChannel.close()
      catch { case _: java.io.IOException => }
    }
    closeUnderlying()
  }
}

/** Background-reader InputStream: a daemon thread drains `in` into FULL
  * `bufSize` buffers (an InflaterInputStream yields ~4 KiB per read — the
  * refill loop amortizes that) on a `depth`-bounded queue. Single-consumer. */
private final class PrefetchStream(in: java.io.InputStream, bufSize: Int,
    depth: Int, cancelled: () => Boolean) extends java.io.InputStream {
  import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}
  private val queue = new ArrayBlockingQueue[AnyRef](depth)
  @volatile private var err: Throwable = _
  @volatile private var stopped = false
  private case object Eof

  private val reader = new Thread(() => {
    try {
      var done = false
      while (!done && !stopped && !cancelled()) {
        val buf = new Array[Byte](bufSize)
        var n = 0
        var r = 0
        while (n < bufSize && r >= 0) {
          r = in.read(buf, n, bufSize - n)
          if (r > 0) n += r
        }
        if (n > 0) put((buf, n))
        if (r < 0) done = true
      }
    } catch {
      case _: InterruptedException =>
      case t: Throwable => err = t
    } finally put(Eof)
  }, "xlsx-inflate")
  reader.setDaemon(true)
  reader.start()

  private def put(x: AnyRef): Unit = {
    var ok = false
    while (!ok && !stopped && !cancelled())
      ok = queue.offer(x, 50, TimeUnit.MILLISECONDS)
  }

  private var cur: Array[Byte] = _
  private var curLen = 0
  private var curPos = 0
  private var eof = false

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (eof) return -1
    while (cur == null || curPos >= curLen) {
      queue.take() match {
        case Eof =>
          eof = true
          if (err != null) throw new java.io.IOException(err)
          return -1
        case (buf: Array[Byte], n: Integer) =>
          cur = buf; curLen = n; curPos = 0
      }
    }
    val take = math.min(len, curLen - curPos)
    System.arraycopy(cur, curPos, b, off, take)
    curPos += take
    take
  }

  def shutdown(): Unit = {
    stopped = true
    reader.interrupt()
    while (queue.poll() != null) ()
  }
}

object ParallelSheetScanner {
  /** 2 MiB: enough chunks that a 16-worker pool drains in many small waves
    * (short tail after the producer finishes) while per-chunk overhead
    * (buffer alloc, queue hop, per-chunk scanner setup) stays amortized. */
  val DefaultChunkBytes: Int = 2 << 20

  /** A workbook's graft row-group index, resolved to raw file geometry:
    * `cuts(i) = (compressed offset, uncompressed offset, rows before)` of
    * the (i+1)-th segment start WITHIN the worksheet entry's deflate
    * data, which begins at `dataOffset` in `file`. Segment boundaries are
    * writer-recorded FULL_FLUSH points landing exactly after a `</row>`
    * in Text state, so each slice inflates AND parses independently. */
  final case class SegmentIndex(file: java.io.File, dataOffset: Long,
      compressedSize: Long, cuts: Array[Array[Long]], totalUncomp: Long,
      totalRows: Long)

  private case object End
  private final case class ParsedChunk(
      idx: Array[Long], explicitR: Array[Boolean], rows: Array[Array[XCell]],
      conv: Array[AnyRef], widths: Array[Int], batch: AnyRef = null,
      dropped: Int = 0)
}

/** Incremental locator of row boundaries in a SpreadsheetML byte stream.
  *
  * `scan(buf, from, to)` consumes bytes and returns the offset just past the
  * LAST row end seen in this range (-1 if none); state persists across calls
  * so the stream can be fed in arbitrary slices. A "row end" is what
  * [[SheetScanner]] treats as one: a `</row>` close tag or a self-closing
  * `<row .../>`, in ordinary markup context — NOT inside a comment, CDATA
  * section, processing instruction, quoted attribute value, and not inside
  * `<v>`/`<is><t>` text content (where the scanner swallows stray close tags
  * as part of `handleTextMarkup`), and not shadowed by the scanner's
  * 12-byte entity-name consumption quirk. The transitions below mirror
  * SheetScanner method-for-method; divergence is a bug by definition and is
  * fuzzed against it.
  */
final class RowBoundaryTracker {
  import RowBoundaryTracker._

  // Persistent state between scan() calls. Inside scan() everything is
  // hoisted into locals — the tracker runs on ONE thread and must outrun N
  // parse workers, so per-transition field traffic matters.
  private var state = Text
  private var inV = false // element-containment flags, mirroring SheetScanner
  private var inIs = false
  private var inT = false
  private var ltFromText = false // did the '<' dispatch happen in text mode?
  // current element name packed little-endian into a Long (first 8 bytes,
  // prefix-stripped); len caps at 9 meaning "longer than any name we match"
  private var nameWord = 0L
  private var nameLen = 0
  private var kind = KOther // classification of the packed name
  private var quote = 0 // active attribute-value quote char
  private var entN = 0 // entity-name bytes consumed
  private var look1, look2 = 0 // lookbehind for -->, ]]>, ?>
  private var hdrLeft = 0 // remaining "CDATA[" header bytes
  private var bcount = 0L // row boundaries seen since construction

  /** Cumulative count of row boundaries seen across all scan() calls — the
    * chunk producer samples this at cut time to deal the file-level
    * leading-row drop out to chunk workers exactly (boundaries ≡ rows the
    * chunk's parser will emit, because cuts land ON boundaries). */
  def boundaries: Long = bcount

  /** True iff the tracker currently sits in plain Text state with no
    * element containment — exactly a FRESH tracker's initial state, which
    * is also the state just past any genuine row boundary. The
    * speculative producer's chain validation: a block whose scan ends
    * `freshText` at a counted boundary PROVES the next block's
    * fresh-tracker assumption. */
  def freshText: Boolean = state == Text && !inV && !inIs && !inT

  /** Feed buf[from, to); returns offset just past the last row end, or -1. */
  def scan(buf: Array[Byte], from: Int, to: Int): Int = {
    // hoist persistent state
    var st = state
    var iv = inV; var iis = inIs; var it = inT
    var ltText = ltFromText
    var word = nameWord; var wlen = nameLen; var k = kind
    var q0 = quote; var en = entN
    var l1 = look1; var l2 = look2; var hdr = hdrLeft
    var bc = bcount

    var last = -1
    var p = from

    // (classification is RowBoundaryTracker.classify — a static helper, so
    // the hoisted locals stay unboxed registers)

    while (p < to) {
      (st: @annotation.switch) match {
        case Text =>
          // Fused fast path: text run + ENTIRE tag (name, attribute region,
          // self-close, close semantics) per inner-loop pass, staying inside
          // this case across whole row/cell structures. The per-byte states
          // below survive purely as buffer-edge resume points and for the
          // rare constructs (comments, CDATA, PIs, entities) — each spill
          // sets the exact state the unfused machine would be in, so a cut
          // mid-anything resumes byte-identically (differential-fuzzed with
          // 48-byte chunk targets). Fusing matters because SpreadsheetML is
          // markup-dense: a ~40-byte cell tag otherwise costs ~12 dispatches
          // through the outer switch, which measured ~460 MB/s — the
          // sequential floor of the whole parallel-parse pipeline.
          var fast = true
          while (fast) {
            // ---- text run ----
            var q = p
            if (iv || it) while (q < to && buf(q) != '<' && buf(q) != '&') q += 1
            else while (q < to && buf(q) != '<') q += 1
            if (q >= to) { p = q; fast = false }
            else if (buf(q) == '&') { st = Entity; en = 0; p = q + 1; fast = false }
            else if (LittleEndian && q + 8 <= to && {
              // Literal-tag probe: ONE unaligned 8-byte load covers the
              // fixed no-attribute tags that dominate SpreadsheetML
              // (</c>, <v>, </v>, <is>, </is>, <t>, </t>, </row> — ~20 of
              // the ~26 tags in a typical row). Each branch applies EXACTLY
              // the semantics the generic path would conclude for that tag
              // in the current containment context, so this is a pure
              // short-circuit — tags with attributes and every rare
              // construct fall through to the machinery below.
              val w8 = org.apache.spark.unsafe.Platform.getLong(buf,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + q)
              ltText = iv || it
              if ((w8 & 0xFFFFFFFFL) == LitCloseC) { p = q + 4; true }
              else if ((w8 & 0xFFFFFFL) == LitOpenV) {
                p = q + 3; if (!ltText) iv = true; true
              } else if ((w8 & 0xFFFFFFFFL) == LitCloseV) {
                // ltText close dispatch and main close dispatch agree: v → iv off
                p = q + 4; iv = false; true
              } else if ((w8 & 0xFFFFFFFFFFFFL) == LitCloseRow) {
                p = q + 6
                if (!ltText) { last = p; bc += 1 } // in-text </row> is content
                true
              } else if ((w8 & 0xFFFFFFFFL) == LitOpenIs) {
                p = q + 4; if (!ltText) iis = true; true
              } else if ((w8 & 0xFFFFFFFFFFL) == LitCloseIs) {
                p = q + 5; iis = false; it = false; true
              } else if ((w8 & 0xFFFFFFL) == LitOpenT) {
                p = q + 3; if (!ltText && iis) it = true; true
              } else if ((w8 & 0xFFFFFFFFL) == LitCloseT) {
                // main-loop close dispatch ignores t; only in-text t closes
                p = q + 4; if (ltText && it) it = false; true
              } else if (w8 == LitRowRQ || (w8 & 0xFFFFFFFFFFFFL) == LitCRQ) {
                // `<row r="` (a full 8-byte literal) / `<c r="`: skip the
                // quoted ref, then the tag usually ends right there — `>`
                // opens (row/c open tags change no state) or `/>`
                // self-closes (boundary iff row). ANY other continuation
                // (a t=/s= attribute, buffer edge) falls back to the
                // generic machinery from the '<', which re-reads the ~8
                // probed bytes — the probe mutated nothing.
                val isRow = w8 == LitRowRQ
                var i = q + (if (isRow) 8 else 6)
                while (i < to && buf(i) != '"') i += 1
                if (i + 1 < to && buf(i + 1) == '>') {
                  p = i + 2; true // plain open tag: no containment for row/c
                } else if (i + 2 < to && buf(i + 1) == '/' && buf(i + 2) == '>') {
                  p = i + 3
                  if (isRow && !ltText) { last = p; bc += 1 }
                  true
                } else false // bail: generic path re-dispatches from q
              } else false
            }) ()
            else {
              ltText = iv || it
              p = q + 1
              if (p >= to) { st = Lt; fast = false }
              else {
                val b = buf(p) & 0xff
                p += 1
                if (b == '!') { st = Bang0; fast = false }
                else if (b == '?' && !ltText) { st = Pi; l1 = 0; fast = false }
                else if (b == '/') {
                  // ---- close tag: name, then blind skip to '>' ----
                  var w = 0L; var n = 0
                  var r = p
                  var stop = false
                  while (r < to && !stop) {
                    val c = buf(r) & 0xff
                    if (NameStop(c)) stop = true
                    else {
                      if (c == ':') { w = 0L; n = 0 }
                      else if (n < 8) { w |= c.toLong << (n * 8); n += 1 }
                      else n = 9
                      r += 1
                    }
                  }
                  if (!stop) { word = w; wlen = n; p = r; st = CloseName; fast = false }
                  else {
                    k = RowBoundaryTracker.classify(w, n)
                    while (r < to && buf(r) != '>') r += 1
                    if (r >= to) { p = r; st = CloseRest; fast = false }
                    else {
                      p = r + 1
                      if (ltText) {
                        // handleTextMarkup's close dispatch: v / t / is only
                        if (k == KV) iv = false
                        else if (k == KT && it) it = false
                        else if (k == KIs) { iis = false; it = false }
                      } else {
                        // main-loop close dispatch: v / is / row
                        if (k == KV) iv = false
                        else if (k == KIs) { iis = false; it = false }
                        else if (k == KRow) { last = p; bc += 1 }
                      }
                    }
                  }
                } else {
                  // ---- open tag: name ----
                  var w = 0L; var n = 0
                  if (b != ':') { w = b.toLong; n = 1 }
                  var r = p
                  var stop = false
                  while (r < to && !stop) {
                    val c = buf(r) & 0xff
                    if (NameStop(c)) stop = true
                    else {
                      if (c == ':') { w = 0L; n = 0 }
                      else if (n < 8) { w |= c.toLong << (n * 8); n += 1 }
                      else n = 9
                      r += 1
                    }
                  }
                  if (!stop) { word = w; wlen = n; p = r; st = OpenName; fast = false }
                  else {
                    k = RowBoundaryTracker.classify(w, n)
                    if (buf(r) == '>') {
                      p = r + 1
                      if (!ltText) {
                        if (k == KV) iv = true
                        else if (k == KIs) iis = true
                        else if (k == KT && iis) it = true
                      }
                    } else {
                      // ---- attribute region (AttrScan semantics, fused) ----
                      var done = false
                      while (!done) {
                        if (r >= to) { p = r; st = AttrScan; fast = false; done = true }
                        else {
                          val c = buf(r) & 0xff
                          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') r += 1
                          else if (c == '>') {
                            p = r + 1
                            if (!ltText) {
                              if (k == KV) iv = true
                              else if (k == KIs) iis = true
                              else if (k == KT && iis) it = true
                            }
                            done = true
                          } else if (c == '/') {
                            if (r + 1 >= to) { p = r + 1; st = AttrSlash; fast = false; done = true }
                            else if (buf(r + 1) == '>') {
                              p = r + 2
                              // self-closing tag: no containment; a row IS a boundary
                              if (!ltText && k == KRow) { last = p; bc += 1 }
                              done = true
                            } else r += 1 // AttrSlash reprocesses the byte in AttrScan
                          } else if (c == '=') {
                            // stray '=': empty attr name — straight to value
                            r += 1
                            while (r < to && {
                              val x = buf(r) & 0xff
                              x == ' ' || x == '\t' || x == '\n' || x == '\r'
                            }) r += 1
                            if (r >= to) { p = r; st = AttrEq; fast = false; done = true }
                            else {
                              val qc = buf(r) & 0xff
                              r += 1
                              if (qc == '"' || qc == '\'') {
                                while (r < to && (buf(r) & 0xff) != qc) r += 1
                                if (r >= to) { p = r; q0 = qc; st = AttrValue; fast = false; done = true }
                                else r += 1
                              } // else: unquoted byte consumed and dropped
                            }
                          } else {
                            // attribute name — ws — '=' — ws — quoted value
                            while (r < to && !NameStop(buf(r) & 0xff)) r += 1
                            if (r >= to) { p = r; st = AttrName; fast = false; done = true }
                            else {
                              while (r < to && {
                                val x = buf(r) & 0xff
                                x == ' ' || x == '\t' || x == '\n' || x == '\r'
                              }) r += 1
                              if (r >= to) { p = r; st = AttrAfterName; fast = false; done = true }
                              else if ((buf(r) & 0xff) != '=') () // reprocess in attr loop
                              else {
                                r += 1
                                while (r < to && {
                                  val x = buf(r) & 0xff
                                  x == ' ' || x == '\t' || x == '\n' || x == '\r'
                                }) r += 1
                                if (r >= to) { p = r; st = AttrEq; fast = false; done = true }
                                else {
                                  val qc = buf(r) & 0xff
                                  r += 1
                                  if (qc == '"' || qc == '\'') {
                                    while (r < to && (buf(r) & 0xff) != qc) r += 1
                                    if (r >= to) { p = r; q0 = qc; st = AttrValue; fast = false; done = true }
                                    else r += 1
                                  } // else: unquoted byte consumed and dropped
                                }
                              }
                            }
                          }
                        }
                      }
                    }
                  }
                }
              }
            }
          }
        case Lt =>
          val b = buf(p) & 0xff
          p += 1
          if (b == '/') { st = CloseName; word = 0L; wlen = 0 }
          else if (b == '!') st = Bang0
          else if (b == '?' && !ltText) { st = Pi; l1 = 0 }
          else { // text-mode '?' lands here too: handleTextMarkup readName()s it
            st = OpenName
            if (b == ':') { word = 0L; wlen = 0 }
            else { word = b.toLong; wlen = 1 }
          }
        case OpenName =>
          var q = p
          var w = word; var n = wlen
          var stop = false
          while (q < to && !stop) {
            val b = buf(q) & 0xff
            if (NameStop(b)) stop = true
            else {
              if (b == ':') { w = 0L; n = 0 }
              else if (n < 8) { w |= b.toLong << (n * 8); n += 1 }
              else n = 9
              q += 1
            }
          }
          word = w; wlen = n
          if (!stop) p = q
          else {
            k = RowBoundaryTracker.classify(w, n)
            // fused common delimiter: a bare '>' ends the tag right here
            if (buf(q) == '>') {
              p = q + 1
              st = Text
              if (!ltText) {
                if (k == KV) iv = true
                else if (k == KIs) iis = true
                else if (k == KT && iis) it = true
              }
            } else { p = q; st = AttrScan } // '/', ws, '=' handled there
          }
        case CloseName =>
          var q = p
          var w = word; var n = wlen
          var stop = false
          while (q < to && !stop) {
            val b = buf(q) & 0xff
            if (NameStop(b)) stop = true
            else {
              if (b == ':') { w = 0L; n = 0 }
              else if (n < 8) { w |= b.toLong << (n * 8); n += 1 }
              else n = 9
              q += 1
            }
          }
          word = w; wlen = n
          if (!stop) p = q
          else {
            k = RowBoundaryTracker.classify(w, n)
            // fused CloseRest: skip to '>' and apply close semantics
            var r = q
            while (r < to && buf(r) != '>') r += 1
            if (r >= to) { p = r; st = CloseRest }
            else {
              p = r + 1
              st = Text
              if (ltText) {
                // handleTextMarkup's close dispatch: v / t / is only
                if (k == KV) iv = false
                else if (k == KT && it) it = false
                else if (k == KIs) { iis = false; it = false }
              } else {
                // main-loop close dispatch: v / is / row
                if (k == KV) iv = false
                else if (k == KIs) { iis = false; it = false }
                else if (k == KRow) { last = p; bc += 1 }
              }
            }
          }
        case CloseRest =>
          var q = p
          while (q < to && buf(q) != '>') q += 1
          if (q >= to) p = q
          else {
            p = q + 1
            st = Text
            if (ltText) {
              // handleTextMarkup's close dispatch: v / t / is only
              if (k == KV) iv = false
              else if (k == KT && it) it = false
              else if (k == KIs) { iis = false; it = false }
            } else {
              // main-loop close dispatch: v / is / row
              if (k == KV) iv = false
              else if (k == KIs) { iis = false; it = false }
              else if (k == KRow) { last = p; bc += 1 }
            }
          }
        case AttrScan =>
          val b = buf(p) & 0xff
          p += 1
          if (b == '>') {
            st = Text
            // open-tag-complete, not self-closing
            if (!ltText) {
              if (k == KV) iv = true
              else if (k == KIs) iis = true
              else if (k == KT && iis) it = true
            }
          } else if (b == '/') st = AttrSlash
          else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') ()
          // a stray '=' is an empty attribute name: the scanner's
          // readName('=') stops immediately and takes the value path
          else if (b == '=') st = AttrEq
          else st = AttrName // attribute name begins (content irrelevant)
        case AttrSlash =>
          val b = buf(p) & 0xff
          if (b == '>') {
            p += 1
            st = Text
            // self-closing tag: no containment flags; a row IS a boundary
            if (!ltText && k == KRow) { last = p; bc += 1 }
          } else st = AttrScan // scanner reprocesses this byte
        case AttrName =>
          // fused happy path for one whole attribute — name* ws* '=' ws*
          // quoted-value — with precise sub-state saves at buffer edges;
          // semantics per sub-step identical to the unfused states below
          var q = p
          while (q < to && !NameStop(buf(q) & 0xff)) q += 1
          if (q >= to) p = q // still AttrName
          else {
            var b = buf(q) & 0xff
            while (q < to && (b == ' ' || b == '\t' || b == '\n' || b == '\r')) {
              q += 1
              if (q < to) b = buf(q) & 0xff
            }
            if (q >= to) { p = q; st = AttrAfterName }
            else if (b != '=') { p = q; st = AttrScan } // reprocess there
            else {
              q += 1
              while (q < to && {
                val w = buf(q) & 0xff
                w == ' ' || w == '\t' || w == '\n' || w == '\r'
              }) q += 1
              if (q >= to) { p = q; st = AttrEq }
              else {
                val qc = buf(q) & 0xff
                q += 1
                if (qc == '"' || qc == '\'') {
                  while (q < to && (buf(q) & 0xff) != qc) q += 1
                  if (q >= to) { p = q; q0 = qc; st = AttrValue }
                  else { p = q + 1; st = AttrScan }
                } else { p = q; st = AttrScan } // unquoted byte dropped
              }
            }
          }
        case AttrAfterName =>
          val b = buf(p) & 0xff
          if (b == ' ' || b == '\t' || b == '\n' || b == '\r') p += 1
          else if (b == '=') { p += 1; st = AttrEq }
          else st = AttrScan
        case AttrEq =>
          val b = buf(p) & 0xff
          p += 1
          if (b == ' ' || b == '\t' || b == '\n' || b == '\r') ()
          else if (b == '"' || b == '\'') { q0 = b; st = AttrValue }
          else st = AttrScan // unquoted byte is consumed and dropped
        case AttrValue =>
          var q = p
          while (q < to && (buf(q) & 0xff) != q0) q += 1
          p = q
          if (q < to) { p = q + 1; st = AttrScan }
        case Bang0 =>
          val b = buf(p) & 0xff
          p += 1
          if (b == '-') st = Comment1
          else if (b == '[') { hdr = 6; st = CdataHdr }
          else if (b == '>') st = Text // empty <!>: skip-to-'>' done
          else st = BangSkip
        case Comment1 =>
          // scanner consumes the second '-' blindly
          p += 1
          st = Comment; l1 = 0; l2 = 0
        case Comment | Cdata =>
          // scan for the 3-byte terminator c2 c1 '>' with cross-call lookbehind
          val c = if (st == Comment) '-' else ']'
          var q = p
          var term = -1
          while (q < to && term < 0) {
            if (buf(q) == '>') {
              val b1 = if (q - 1 >= p) buf(q - 1) & 0xff else l1
              val b2 = if (q - 2 >= p) buf(q - 2) & 0xff
                       else if (q - 1 >= p) l1 else l2
              if (b1 == c && b2 == c) term = q + 1
            }
            q += 1
          }
          if (term >= 0) { st = Text; p = term }
          else {
            if (to - p >= 2) { l1 = buf(to - 1) & 0xff; l2 = buf(to - 2) & 0xff }
            else if (to - p == 1) { l2 = l1; l1 = buf(to - 1) & 0xff }
            p = to
          }
        case CdataHdr =>
          val take = math.min(hdr, to - p)
          p += take
          hdr -= take
          if (hdr == 0) { st = Cdata; l1 = 0; l2 = 0 }
        case Pi =>
          var q = p
          while (q < to && buf(q) != '>') q += 1
          if (q >= to) { if (q > p) l1 = buf(q - 1) & 0xff; p = q }
          else {
            val prev = if (q > p) buf(q - 1) & 0xff else l1
            p = q + 1
            if (prev == '?') st = Text else l1 = '>'
          }
        case BangSkip =>
          var q = p
          while (q < to && buf(q) != '>') q += 1
          p = if (q < to) { st = Text; q + 1 } else q
        case Entity =>
          // SheetScanner.readEntity: consume until ';' or 12 name bytes,
          // then one more byte is read and DROPPED (even '<')
          val b = buf(p) & 0xff
          p += 1
          if (b == ';') st = Text
          else { en += 1; if (en == 12) st = EntityDrop }
        case EntityDrop =>
          p += 1
          st = Text
      }
    }

    // persist hoisted state
    state = st
    inV = iv; inIs = iis; inT = it
    ltFromText = ltText
    nameWord = word; nameLen = wlen; kind = k
    quote = q0; entN = en
    look1 = l1; look2 = l2; hdrLeft = hdr
    bcount = bc
    last
  }
}

object RowBoundaryTracker {
  /** Bytes that terminate an element/attribute name in SheetScanner.readName. */
  final val NameStop: Array[Boolean] = {
    val a = new Array[Boolean](256)
    Seq(' ', '\t', '\n', '\r', '>', '/', '=').foreach(c => a(c) = true)
    a
  }

  /** Platform.getLong reads NATIVE order; the literal constants below are
    * little-endian, so the probe only runs on LE hardware (x86/aarch64 —
    * everything Spark ships on). On a BE JVM the masked compares would test
    * the wrong byte positions, so the probe is compiled out entirely and
    * every tag takes the generic (still exact) machinery. */
  final val LittleEndian: Boolean =
    java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.LITTLE_ENDIAN

  // whole-tag literals, little-endian byte order as Platform.getLong reads
  // them on x86/aarch64; masked to the literal's length
  final val LitCloseC: Long = 0x3E632F3CL // "</c>"
  final val LitOpenV: Long = 0x3E763CL // "<v>"
  final val LitCloseV: Long = 0x3E762F3CL // "</v>"
  final val LitCloseRow: Long = 0x3E776F722F3CL // "</row>"
  final val LitOpenIs: Long = 0x3E73693CL // "<is>"
  final val LitCloseIs: Long = 0x3E73692F3CL // "</is>"
  final val LitOpenT: Long = 0x3E743CL // "<t>"
  final val LitCloseT: Long = 0x3E742F3CL // "</t>"
  final val LitRowRQ: Long = 0x223D7220776F723CL // `<row r="` (8 bytes)
  final val LitCRQ: Long = 0x223D7220633CL // `<c r="` (6 bytes)

  // element names packed little-endian byte-per-char, as scan() builds them
  final val WordRow: Long = 'r' | ('o'.toLong << 8) | ('w'.toLong << 16)
  final val WordV: Long = 'v'
  final val WordIs: Long = 'i' | ('s'.toLong << 8)
  final val WordT: Long = 't'

  final val KOther = 0
  final val KRow = 1
  final val KV = 2
  final val KIs = 3
  final val KT = 4

  /** Classify a packed element name: row / v / is / t (anything else —
    * including c — has no effect on boundary state). */
  def classify(w: Long, n: Int): Int =
    if (n == 3 && w == WordRow) KRow
    else if (n == 1 && w == WordV) KV
    else if (n == 2 && w == WordIs) KIs
    else if (n == 1 && w == WordT) KT
    else KOther

  final val Text = 0
  final val Lt = 1
  final val OpenName = 2
  final val CloseName = 3
  final val CloseRest = 4
  final val AttrScan = 5
  final val AttrSlash = 6
  final val AttrName = 7
  final val AttrAfterName = 8
  final val AttrEq = 9
  final val AttrValue = 10
  final val Bang0 = 11
  final val Comment1 = 12
  final val Comment = 13
  final val CdataHdr = 14
  final val Cdata = 15
  final val Pi = 16
  final val BangSkip = 17
  final val Entity = 18
  final val EntityDrop = 19
}
