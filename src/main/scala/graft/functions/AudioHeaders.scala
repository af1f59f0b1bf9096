package graft.functions

/** Real (non-stub) audio metadata extraction from raw payload bytes —
  * RIFF/WAVE container parsing needs no codec library, only the published
  * format layout (Microsoft/IBM WAVE spec, RIFF 1991):
  *
  *  - bytes 0-3 "RIFF", 4-7 chunk size (LE u32), 8-11 "WAVE";
  *  - then a chunk walk: 4-byte id + LE u32 size + payload (word-aligned:
  *    an odd-sized chunk is followed by one pad byte);
  *  - the "fmt " chunk carries channels (LE u16 at +2), sample rate
  *    (LE u32 at +4), byte rate (LE u32 at +8), bits/sample (LE u16 at +14);
  *  - the "data" chunk's size is the PCM byte count, so
  *    duration_ms = data_size * 1000 / byte_rate.
  *
  * Sibling of [[ImageHeaders]]: used by Multimodal.probeAudioMeta to
  * replace planted metadata with values parsed from the payload itself;
  * sample DECODE (the part that genuinely needs a codec for non-PCM
  * encodings) remains behind the StubCodec boundary.
  */
object AudioHeaders {

  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataBytes: Long, durationMs: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), "US-ASCII")

  /** @return parsed WAV header facts, or None if the payload is not a
    *         recognizable RIFF/WAVE file (never throws on truncated input) */
  def wav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 12 ||
        tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Long, Int)] = None // channels, rate, byteRate, bits
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(bytes, i)
      val size = leU32(bytes, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
        fmt = Some((leU16(bytes, i + 10), leU32(bytes, i + 12).toInt,
          leU32(bytes, i + 16), leU16(bytes, i + 22)))
      } else if (id == "data") {
        // size is trustworthy even when the payload is truncated/absent —
        // a probe over the first N bytes of a large file still works
        dataBytes = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (size > Int.MaxValue - 16) return None // corrupt size field
    }
    fmt.collect { case (ch, rate, byteRate, bits)
        if ch > 0 && rate > 0 && byteRate > 0 && dataBytes >= 0 =>
      Wav(ch, rate, bits, dataBytes, (dataBytes * 1000 / byteRate).toInt)
    }
  }
}
