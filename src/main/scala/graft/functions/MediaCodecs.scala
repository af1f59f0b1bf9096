package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL pixel/audio decode with zero new dependencies: the JDK ships
  * `javax.imageio` (PNG/JPEG/GIF/BMP pixel decode) and
  * `javax.sound.sampled` (WAV/AU/AIFF PCM decode); MJPEG-in-AVI video
  * decodes via [[VideoCodecs]] (RIFF walk + the same ImageIO path), so
  * only non-MJPEG video codecs genuinely need an external library and
  * stay stubbed ([[graft.operators.Multimodal.StubCodec]]). Everything here is pure
  * bytes-in/values-out and `Option`-shaped: an unparseable payload is
  * `None`, never an exception — the 100 TB posture, where a corrupt blob
  * must not kill a 10-hour stage.
  *
  * Executor-safety notes:
  *  - `ImageIO.setUseCache(false)` keeps decode entirely on-heap (the
  *    default writes spill files to java.io.tmpdir — a per-task disk
  *    dependency no Spark operator should smuggle in);
  *  - all methods are stateless and thread-safe; codec instances are not
  *    cached across calls, matching ImageIO's own reader-per-stream model.
  */
object MediaCodecs {
  ImageIO.setUseCache(false)

  /** Per-channel RGB statistics of a decoded image — the "real pixel
    * stats" feature vector. Layout (fixed 11 floats):
    * [width, height, meanR, meanG, meanB, minR, minG, minB,
    *  maxR, maxG, maxB]. Alpha is ignored (getRGB pre-multiplies
    * nothing; we read the packed sRGB channels). */
  def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    decodeImage(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      val mins = Array(255, 255, 255)
      val maxs = Array(0, 0, 0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          if (r < mins(0)) mins(0) = r; if (r > maxs(0)) maxs(0) = r
          if (g < mins(1)) mins(1) = g; if (g > maxs(1)) maxs(1) = g
          if (b < mins(2)) mins(2) = b; if (b > maxs(2)) maxs(2) = b
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Array(w.toFloat, h.toFloat,
        sr / n, sg / n, sb / n,
        mins(0).toFloat, mins(1).toFloat, mins(2).toFloat,
        maxs(0).toFloat, maxs(1).toFloat, maxs(2).toFloat)
    }

  /** Decode to a BufferedImage; None when no registered reader parses the
    * payload (truncated file, unsupported container, not an image). */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real pixel resize under a byte budget: scale both dimensions by
    * sqrt(budget / (w*h*3)) (3 = decoded RGB bytes per pixel), redraw
    * through Graphics2D, re-encode as PNG. Images already inside the
    * budget pass through unchanged. The budget bounds the DECODED size —
    * the honest capacity number for downstream feature models; the PNG
    * wire size after compression is typically far below it. */
  def resizeImage(bytes: Array[Byte], targetBytes: Int): Option[Array[Byte]] = {
    require(targetBytes > 0, "targetBytes must be positive")
    decodeImage(bytes).map { img =>
      val raw = img.getWidth.toLong * img.getHeight * 3
      if (raw <= targetBytes) bytes
      else {
        val scale = math.sqrt(targetBytes.toDouble / raw)
        // when one dimension collapses to the 1-pixel floor, the other
        // must be re-derived from the budget directly or the area bound
        // is silently skipped (a 4000x1 banner would keep 1264 columns)
        var nw = (img.getWidth * scale).toInt
        var nh = (img.getHeight * scale).toInt
        if (nh < 1) { nh = 1; nw = math.min(img.getWidth, (targetBytes / 3).toInt) }
        if (nw < 1) { nw = 1; nh = math.min(img.getHeight, (targetBytes / 3).toInt) }
        nw = math.max(1, nw); nh = math.max(1, nh)
        val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
        val buf = new ByteArrayOutputStream()
        ImageIO.write(out, "png", buf)
        buf.toByteArray
      }
    }
  }

  /** Perceptual difference-hash (dHash) of a decoded image: nearest-
    * neighbor downsample to 9×8, luma per pixel (ITU-R 601 integer
    * weights), bit (y, x) = [luma(y, x+1) > luma(y, x)] packed
    * row-major into 64 bits. Robust to re-encode/resize/brightness
    * shifts, flipped by crops — the standard cheap image near-dup
    * signature; Hamming distance between dHashes ranks visual
    * similarity, so the signature plugs straight into
    * [[graft.operators.Dedup.hammingPairs]]'s pigeonhole join. Integer
    * arithmetic throughout → deterministic for a given decoded raster. */
  def dHash64(img: BufferedImage): Long = {
    val (w, h) = (9, 8)
    val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
    val luma = Array.tabulate(h, w) { (y, x) =>
      val rgb = scaled.getRGB(x, y)
      ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
    }
    var hash = 0L
    var bit = 0
    for (y <- 0 until h; x <- 0 until w - 1) {
      if (luma(y)(x + 1) > luma(y)(x)) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  /** PCM sample statistics of a decoded audio payload. Layout (fixed
    * 7 floats): [nSamples, sampleRate, channels, mean, min, max,
    * meanAbs] over all interleaved channel samples. Supports the PCM
    * encodings `javax.sound` decodes natively (WAV/AU/AIFF, 8/16-bit);
    * None for anything else. */
  def audioFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        if (bits != 8 && bits != 16) None
        else {
          val data = in.readAllBytes()
          val bytesPer = bits / 8
          val n = data.length / bytesPer
          if (n == 0) None
          else {
            var i = 0
            var sum = 0L; var sumAbs = 0L
            var min = Int.MaxValue; var max = Int.MinValue
            while (i < n) {
              val v =
                if (bits == 8) {
                  // 8-bit WAV PCM is unsigned, centered at 128
                  if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                    (data(i) & 0xff) - 128
                  else data(i).toInt
                } else {
                  val (b0, b1) =
                    if (fmt.isBigEndian) (data(2 * i + 1) & 0xff, data(2 * i))
                    else (data(2 * i) & 0xff, data(2 * i + 1))
                  // 16-bit PCM_UNSIGNED (rare but legal WAV) is centered
                  // at 32768 — parsing it as signed would skew every stat
                  if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                    ((((b1 & 0xff) << 8) | b0) & 0xffff) - 32768
                  else (b1 << 8) | b0
                }
              sum += v; sumAbs += math.abs(v)
              if (v < min) min = v
              if (v > max) max = v
              i += 1
            }
            Some(Array(n.toFloat, fmt.getSampleRate, fmt.getChannels.toFloat,
              sum.toFloat / n, min.toFloat, max.toFloat, sumAbs.toFloat / n))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}
