package graft.sources.xlsx

import java.io.RandomAccessFile

/** Raw zip central-directory locator: the byte range of an entry's
  * COMPRESSED data inside the archive file. `java.util.zip.ZipFile` only
  * hands out inflated streams; the segmented parallel scanner needs the
  * raw deflate bytes so each worker can inflate its own full-flush
  * segment independently (see [[XlsxWriter.SegmentBytes]]). Plain-zip32
  * only — a zip64 archive (or any parse surprise) returns None and the
  * caller falls back to the streaming pipeline, so this can never be a
  * correctness cliff, only a parallelism one.
  */
object ZipRaw {

  /** @param dataOffset     absolute file offset of the entry's first data byte
    * @param compressedSize deflate byte count (from the central directory)
    * @param method         zip method (8 = deflate) */
  final case class RawEntry(dataOffset: Long, compressedSize: Long, method: Int)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong | (u16(b, o + 2).toLong << 16)) & 0xffffffffL

  def locate(file: java.io.File, name: String): Option[RawEntry] = {
    val raf = new RandomAccessFile(file, "r")
    try {
      val len = raf.length()
      if (len < 22) return None
      // EOCD: fixed 22 bytes + up to 64 KiB archive comment
      val scanLen = math.min(len, 22L + 0xffffL).toInt
      val tail = new Array[Byte](scanLen)
      raf.seek(len - scanLen)
      raf.readFully(tail)
      var p = scanLen - 22
      while (p >= 0 && !(tail(p) == 0x50 && tail(p + 1) == 0x4b &&
          tail(p + 2) == 0x05 && tail(p + 3) == 0x06)) p -= 1
      if (p < 0) return None
      val total = u16(tail, p + 10)
      val cdOff = u32(tail, p + 16)
      if (total == 0xffff || cdOff == 0xffffffffL) return None // zip64
      val target = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      raf.seek(cdOff)
      val hdr = new Array[Byte](46)
      var i = 0
      while (i < total) {
        raf.readFully(hdr)
        if (u32(hdr, 0) != 0x02014b50L) return None
        val method = u16(hdr, 10)
        val csize = u32(hdr, 20)
        val nameLen = u16(hdr, 28)
        val extraLen = u16(hdr, 30)
        val cmtLen = u16(hdr, 32)
        val locOff = u32(hdr, 42)
        val nm = new Array[Byte](nameLen)
        raf.readFully(nm)
        if (java.util.Arrays.equals(nm, target)) {
          if (csize == 0xffffffffL || locOff == 0xffffffffL) return None
          // the LOCAL header's name/extra lengths govern the data offset
          // (they may differ from the central directory's)
          raf.seek(locOff)
          val loc = new Array[Byte](30)
          raf.readFully(loc)
          if (u32(loc, 0) != 0x04034b50L) return None
          val nl = u16(loc, 26)
          val el = u16(loc, 28)
          return Some(RawEntry(locOff + 30L + nl + el, csize, method))
        }
        var skip = extraLen + cmtLen
        while (skip > 0) skip -= raf.skipBytes(skip)
        i += 1
      }
      None
    } catch {
      case _: java.io.IOException => None
    } finally raf.close()
  }
}
