package graft.functions

/** MJPEG-in-AVI video decode with zero new dependencies — closing the
  * last media-decode gap (VERDICT r4 §missing 2): the JDK ships no video
  * CODEC, but AVI is a RIFF container (pure byte parsing, the
  * ImageHeaders pattern) and an MJPEG stream's frame chunks are plain
  * JPEG payloads, which the already-used `javax.imageio` decodes. So
  * "video decode" for this one ubiquitous container/codec pair is a
  * container walk + the existing image path; every OTHER codec (H.264,
  * VP9, ...) genuinely needs a native library and stays stubbed
  * ([[graft.operators.Multimodal.StubCodec]]).
  *
  * Format notes (all public: the RIFF/AVI structure is documented in
  * Microsoft's "AVI RIFF File Reference"):
  *  - RIFF = tagged chunks: 4-byte FOURCC id, u32-LE size, `size` data
  *    bytes, padded to EVEN offsets (the pad byte is not counted in
  *    `size` — skipping it wrong de-syncs the whole walk);
  *  - `LIST` chunks nest: their first 4 data bytes are the list type
  *    (`hdrl`, `movi`, `rec `, ...), the rest are child chunks;
  *  - the `avih` chunk (inside `hdrl`) carries dwMicroSecPerFrame /
  *    dwTotalFrames / dwWidth / dwHeight at fixed u32 offsets;
  *  - frame data lives in the `movi` list (possibly nested inside
  *    `rec ` lists): chunk ids `##dc`/`##db` (compressed / uncompressed
  *    DIB for stream ##). MJPEG frames are JPEGs, so only payloads with
  *    the JPEG SOI marker (FF D8) are collected.
  *
  * Everything is `Option`-shaped and bounds-checked: a truncated or
  * malformed payload returns None / stops the walk, never throws — a
  * corrupt blob must not kill a 10-hour stage. */
object VideoCodecs {

  /** `avih` main-header fields the pipeline needs (all u32-LE). */
  case class AviInfo(microSecPerFrame: Int, totalFrames: Int,
      width: Int, height: Int)

  /** Parsed MJPEG AVI: header info + raw JPEG payload per frame, in
    * stream order. */
  case class Avi(info: AviInfo, frames: Vector[Array[Byte]])

  private def u32(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off < 0 || off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def isFrameId(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.substring(2) == "dc" || id.substring(2) == "db")

  private def isJpeg(data: Array[Byte]): Boolean =
    data.length >= 2 && (data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0xd8

  /** Parse an MJPEG AVI payload: Some(info + frames) when the RIFF/AVI
    * structure parses, an `avih` header is present, and at least one
    * JPEG frame chunk exists; None otherwise. */
  def decodeAvi(bytes: Array[Byte]): Option[Avi] = {
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4))
    var info: Option[AviInfo] = None
    val frames = Vector.newBuilder[Array[Byte]]

    // iterative document-order DFS over chunk ranges [pos, until): on a
    // LIST the walk descends into the children FIRST (the remainder of
    // the current range is pushed and resumed after), so frames are
    // collected in stream order even when each sits in its own `rec `
    // sub-list. Bounds-checked so crafted sizes can't loop or read out
    // of range.
    var ranges: List[(Long, Long)] = Nil
    var pos = 12L
    var until = riffEnd
    var walking = true
    while (walking) {
      if (pos + 8 > until) {
        ranges match {
          case (p, u) :: rest => pos = p; until = u; ranges = rest
          case Nil => walking = false
        }
      } else {
        val id = fourcc(bytes, pos.toInt)
        val size = u32(bytes, pos.toInt + 4)
        if (id.isEmpty || size < 0) { pos = until } // truncated: stop
        else {
          val dataStart = pos + 8
          val dataEnd = math.min(dataStart + size, until)
          val next = dataStart + size + (size & 1L) // chunks pad to even
          if (id == "LIST" && size >= 4) {
            // descend past the 4-byte list type; list type itself is
            // irrelevant to the walk (hdrl/movi/rec all just nest)
            ranges = (next, until) :: ranges
            pos = dataStart + 4
            until = dataEnd
          } else if (id == "avih" && size >= 40 && dataEnd - dataStart >= 40) {
            val o = dataStart.toInt
            info = Some(AviInfo(
              microSecPerFrame = u32(bytes, o).toInt,
              totalFrames = u32(bytes, o + 16).toInt,
              width = u32(bytes, o + 32).toInt,
              height = u32(bytes, o + 36).toInt))
            pos = next
          } else if (isFrameId(id) && dataEnd - dataStart == size) {
            val data = java.util.Arrays.copyOfRange(bytes, dataStart.toInt, dataEnd.toInt)
            if (isJpeg(data)) frames += data
            pos = next
          } else {
            pos = next
          }
        }
      }
    }
    val fs = frames.result()
    info.filter(_ => fs.nonEmpty).map(Avi(_, fs))
  }

  /** Real video feature vector (fixed 8 floats) for an MJPEG AVI:
    * [nFrames, fps, width, height, meanR, meanG, meanB, meanGray], RGB
    * means averaged over every frame that JPEG-decodes (via the same
    * [[MediaCodecs.imageFeatures]] pixel path as still images). The
    * length-8 layout is distinct from image (11), audio (7), and stub
    * (4), preserving the which-path-ran signal MultimodalSpec pins.
    * None when the payload is not a parseable MJPEG AVI or no frame
    * decodes. */
  def videoFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    decodeAvi(bytes).flatMap { avi =>
      val decoded = avi.frames.flatMap(MediaCodecs.imageFeatures)
      if (decoded.isEmpty) None
      else {
        val n = decoded.size
        def mean(i: Int): Float = decoded.map(_(i)).sum / n
        val (mr, mg, mb) = (mean(2), mean(3), mean(4))
        val fps =
          if (avi.info.microSecPerFrame > 0) 1e6f / avi.info.microSecPerFrame
          else 0f
        Some(Array(avi.frames.size.toFloat, fps,
          avi.info.width.toFloat, avi.info.height.toFloat,
          mr, mg, mb, (mr + mg + mb) / 3f))
      }
    }
}
