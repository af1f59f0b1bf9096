package graft.functions

/** Real (non-stub) image metadata extraction from raw payload bytes —
  * container header parsing needs no codec library, only the published
  * file-format layouts:
  *
  *  - PNG (ISO 15948 §5.3 / §11.2.2): 8-byte signature, then the IHDR
  *    chunk whose first 8 data bytes are width/height as big-endian u32;
  *  - JPEG (ITU T.81 §B.2.2): marker scan from SOI to the first SOF0-15
  *    frame header, which carries height/width as big-endian u16;
  *  - GIF (87a/89a spec): logical screen width/height as little-endian
  *    u16 at offsets 6 and 8.
  *
  * Used by Multimodal.probeImageMeta to replace the planted metadata
  * with values parsed from the payload itself; pixel DECODE (the part
  * that genuinely needs a codec) remains behind the StubCodec boundary.
  */
object ImageHeaders {

  final case class Dims(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def beU16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def beU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** @return parsed (format, width, height), or None if the payload is
    *         not a recognizable image (never throws on truncated input) */
  def dimensions(bytes: Array[Byte]): Option[Dims] =
    if (bytes == null) None
    else png(bytes).orElse(gif(bytes)).orElse(jpeg(bytes))

  private def png(b: Array[Byte]): Option[Dims] =
    // signature + IHDR length/type (8) + 8 data bytes = 24 bytes minimum;
    // IHDR is required to be the first chunk (§5.3), its type at 12-15
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = beU32(b, 16); val h = beU32(b, 20)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(Dims("png", w.toInt, h.toInt))
      else None
    } else None

  private def gif(b: Array[Byte]): Option[Dims] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = leU16(b, 6); val h = leU16(b, 8)
      if (w > 0 && h > 0) Some(Dims("gif", w, h)) else None
    } else None

  private def jpeg(b: Array[Byte]): Option[Dims] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // marker desync
      val marker = u8(b, i + 1)
      marker match {
        case 0xd8 | 0x01 => i += 2 // standalone markers, no length
        case m if m >= 0xd0 && m <= 0xd7 => i += 2 // RSTn
        case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn frame header: len(2) precision(1) height(2) width(2)
          if (i + 8 >= b.length) return None
          val h = beU16(b, i + 5); val w = beU16(b, i + 7)
          return if (w > 0 && h > 0) Some(Dims("jpeg", w, h)) else None
        case _ =>
          if (i + 3 >= b.length) return None
          i += 2 + beU16(b, i + 2) // skip segment by its length field
      }
    }
    None
  }
}
