package graft.sources.xlsx

/** Test-only: rewrite a plain zip32 archive into a FORCED-ZIP64 one —
  * every central-directory entry gets saturated (0xffffffff) size/offset
  * fields with the real values moved into 0x0001 zip64 extra fields, and
  * the EOCD is saturated behind a zip64 EOCD record + locator. Local
  * headers and entry data are byte-identical, so the archive's content is
  * unchanged; only the directory switches to the ZIP64 encoding a >4 GiB
  * workbook would carry. This lets the specs exercise [[ZipRaw]]'s zip64
  * path without writing 4 GiB to disk.
  */
object Zip64Force {

  def rewrite(src: Array[Byte]): Array[Byte] = {
    def u16(o: Int): Int = (src(o) & 0xff) | ((src(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (u16(o).toLong | (u16(o + 2).toLong << 16)) & 0xffffffffL
    var p = src.length - 22
    while (p >= 0 && !(src(p) == 0x50 && src(p + 1) == 0x4b &&
        src(p + 2) == 0x05 && src(p + 3) == 0x06)) p -= 1
    require(p >= 0, "no EOCD")
    val total = u16(p + 10)
    val cdOff = u32(p + 16).toInt
    require(cdOff >= 0 && cdOff < src.length, "zip64 input not supported")

    val out = new java.io.ByteArrayOutputStream(src.length + 2048)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >> 32) & 0xffffffffL) }

    out.write(src, 0, cdOff) // local headers + data, byte-identical
    var q = cdOff
    var i = 0
    while (i < total) {
      require(u32(q) == 0x02014b50L, s"bad CD sig at $q")
      val csize = u32(q + 20)
      val usize = u32(q + 24)
      val nameLen = u16(q + 28)
      val extraLen = u16(q + 30)
      val cmtLen = u16(q + 32)
      val locOff = u32(q + 42)
      out.write(src, q, 6)              // sig + version made by
      w16(45)                           // version needed: 4.5 (zip64)
      out.write(src, q + 8, 12)         // flags..crc
      w32(0xffffffffL)                  // csize -> saturated
      w32(0xffffffffL)                  // usize -> saturated
      out.write(src, q + 28, 2)         // name len
      w16(extraLen + 28)                // extra grows by the 0x0001 field
      out.write(src, q + 32, 10)        // cmt len, disk, int/ext attrs
      w32(0xffffffffL)                  // local header offset -> saturated
      out.write(src, q + 46, nameLen)
      out.write(src, q + 46 + nameLen, extraLen)
      w16(0x0001); w16(24)              // zip64 extra: usize, csize, locOff
      w64(usize); w64(csize); w64(locOff)
      out.write(src, q + 46 + nameLen + extraLen, cmtLen)
      q += 46 + nameLen + extraLen + cmtLen
      i += 1
    }
    val cdSize = out.size().toLong - cdOff
    val eocd64Off = out.size().toLong
    w32(0x06064b50L); w64(44L)          // zip64 EOCD record, size-after-field
    w16(45); w16(45); w32(0L); w32(0L)  // versions, disk numbers
    w64(total.toLong); w64(total.toLong)
    w64(cdSize); w64(cdOff.toLong)
    w32(0x07064b50L); w32(0L)           // zip64 EOCD locator
    w64(eocd64Off); w32(1L)
    w32(0x06054b50L); w16(0); w16(0)    // saturated EOCD
    w16(0xffff); w16(0xffff)
    w32(0xffffffffL); w32(0xffffffffL); w16(0)
    out.toByteArray
  }
}
