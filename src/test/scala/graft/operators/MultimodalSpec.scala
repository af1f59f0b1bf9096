package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    MediaRow(0L, "image", Array.tabulate(100)(_.toByte),
      MediaMeta(Some(10), Some(10), None, None)),
    MediaRow(1L, "audio", Array.tabulate(50)(i => (i * 2).toByte),
      MediaMeta(None, None, Some(16000), Some(1000))),
    MediaRow(2L, "video", Array.tabulate(200)(_.toByte),
      MediaMeta(Some(64), Some(64), None, Some(100))),
  ).toDS()

  test("feature extraction is deterministic and batched") {
    val f = extractFeatures(media, batchSize = 2).collect()
      .map(m => m.media_id -> m).toMap
    assert(f.keySet == Set(0L, 1L, 2L))
    assert(f(0L).n_bytes == 100)
    assert(f(0L).feature.length == 4)
    assert(f(0L).feature(0) == 100.0f) // n
    assert(f(0L).feature(1) == 49.5f)  // mean of 0..99
    // determinism
    val again = extractFeatures(media, batchSize = 2).collect()
      .map(m => m.media_id -> m.checksum).toMap
    assert(again == f.view.mapValues(_.checksum).toMap)
  }

  test("resize shrinks only image payloads to the byte budget") {
    val r = resizeImages(media, targetBytes = 10).collect()
      .map(m => m.media_id -> m.bytes.length).toMap
    assert(r == Map(0L -> 10, 1L -> 50, 2L -> 200))
  }

  test("frame sampling fans out video rows only") {
    val frames = sampleFrames(media, everyMs = 25).collect()
    assert(frames.forall(_.media_id == 2L))
    assert(frames.length == 4) // 100ms / 25ms
    assert(frames.map(_.frame_ms).toSeq == Seq(0, 25, 50, 75))
  }

  // Minimal but REAL container headers, per-spec byte layouts.
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = Array[Byte](0, 0, 0, 13, 'I', 'H', 'D', 'R',
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      8, 2, 0, 0, 0)
    sig ++ ihdr
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++                 // SOI
      Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 'J', 'F') ++ // APP0 (len 4)
      Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8,        // SOF0, precision
        (h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte, 1, 0)
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](w.toByte, (w >> 8).toByte, h.toByte, (h >> 8).toByte, 0, 0, 0)

  test("image header parsing reads real PNG/JPEG/GIF dimensions") {
    import graft.functions.ImageHeaders
    assert(ImageHeaders.dimensions(pngBytes(640, 480))
      .contains(ImageHeaders.Dims("png", 640, 480)))
    assert(ImageHeaders.dimensions(jpegBytes(1024, 768))
      .contains(ImageHeaders.Dims("jpeg", 1024, 768)))
    assert(ImageHeaders.dimensions(gifBytes(320, 200))
      .contains(ImageHeaders.Dims("gif", 320, 200)))
    // truncated and garbage payloads: None, never an exception
    assert(ImageHeaders.dimensions(pngBytes(640, 480).take(20)).isEmpty)
    assert(ImageHeaders.dimensions("not an image".getBytes).isEmpty)
    assert(ImageHeaders.dimensions(Array.emptyByteArray).isEmpty)
  }

  test("probeImageMeta overwrites planted meta with parsed ground truth") {
    val withHeaders = Seq(
      MediaRow(10L, "image", pngBytes(640, 480), MediaMeta(Some(1), Some(1), None, None)),
      MediaRow(11L, "image", jpegBytes(1024, 768), MediaMeta(None, None, None, None)),
      MediaRow(12L, "image", "garbage".getBytes, MediaMeta(Some(7), Some(7), None, None)),
      MediaRow(13L, "audio", pngBytes(9, 9), MediaMeta(None, None, Some(44100), None)),
    ).toDS()
    val got = probeImageMeta(withHeaders).collect().map(m => m.media_id -> m.meta).toMap
    assert(got(10L) == MediaMeta(Some(640), Some(480), None, None))
    assert(got(11L) == MediaMeta(Some(1024), Some(768), None, None))
    assert(got(12L) == MediaMeta(Some(7), Some(7), None, None))   // unparseable: kept
    assert(got(13L) == MediaMeta(None, None, Some(44100), None)) // non-image: untouched
  }

  // Minimal but REAL RIFF/WAVE header: fmt + data chunk walk, LE fields.
  private def wavBytes(channels: Int, rate: Int, bits: Int,
      dataBytes: Int, oddJunkChunk: Boolean = false): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val byteRate = rate * channels * bits / 8
    val junk = if (oddJunkChunk) // odd-sized chunk + pad byte (word alignment)
      "LIST".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3, 0)
    else Array.emptyByteArray
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataBytes) ++ "WAVE".getBytes("US-ASCII") ++
      junk ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(byteRate) ++ le16(channels * bits / 8) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(dataBytes) ++ Array.fill(dataBytes)(0.toByte)
  }

  test("wav header parsing reads rate/channels/duration; chunk walk skips junk") {
    import graft.functions.AudioHeaders
    // 16 kHz mono 16-bit, 32000 data bytes = 1000 ms
    assert(AudioHeaders.wav(wavBytes(1, 16000, 16, 32000))
      .contains(AudioHeaders.Wav(1, 16000, 16, 32000, 1000)))
    // 44.1 kHz stereo, odd-sized junk chunk before fmt (alignment pad)
    assert(AudioHeaders.wav(wavBytes(2, 44100, 16, 44100 * 4, oddJunkChunk = true))
      .contains(AudioHeaders.Wav(2, 44100, 16, 44100 * 4, 1000)))
    // header-only probe: data size field present, payload truncated
    assert(AudioHeaders.wav(wavBytes(1, 8000, 8, 8000).take(60))
      .contains(AudioHeaders.Wav(1, 8000, 8, 8000, 1000)))
    // truncated/garbage payloads: None, never an exception
    assert(AudioHeaders.wav(wavBytes(1, 16000, 16, 100).take(10)).isEmpty)
    assert(AudioHeaders.wav("not audio at all".getBytes).isEmpty)
    assert(AudioHeaders.wav(Array.emptyByteArray).isEmpty)
  }

  test("probeAudioMeta overwrites planted meta with parsed ground truth") {
    val rows = Seq(
      MediaRow(20L, "audio", wavBytes(1, 16000, 16, 64000), MediaMeta(None, None, Some(1), Some(1))),
      MediaRow(21L, "audio", "garbage".getBytes, MediaMeta(None, None, Some(8000), Some(5))),
      MediaRow(22L, "image", wavBytes(1, 8000, 8, 100), MediaMeta(Some(3), Some(3), None, None)),
    ).toDS()
    val got = probeAudioMeta(rows).collect().map(m => m.media_id -> m.meta).toMap
    assert(got(20L) == MediaMeta(None, None, Some(16000), Some(2000)))
    assert(got(21L) == MediaMeta(None, None, Some(8000), Some(5)))  // unparseable: kept
    assert(got(22L) == MediaMeta(Some(3), Some(3), None, None))     // non-audio: untouched
  }

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("REAL pixel decode: committed PNG fixture yields exact per-channel stats") {
    val png = resource("/graft/fixture_4x2.png")
    val f = graft.functions.MediaCodecs.imageFeatures(png).get
    // pixels: (255,0,0)(0,255,0)(0,0,255)(255,255,255) / (0,0,0)(128,128,128)(64,32,16)(200,100,50)
    assert(f.length == 11)
    assert(f(0) == 4f && f(1) == 2f, "dimensions")
    assert(f(2) == 112.75f && f(3) == 96.25f && f(4) == 88f, "channel means")
    assert(f(5) == 0f && f(6) == 0f && f(7) == 0f, "channel mins")
    assert(f(8) == 255f && f(9) == 255f && f(10) == 255f, "channel maxs")
    // garbage in, None out — never an exception
    assert(graft.functions.MediaCodecs.imageFeatures("not a png".getBytes).isEmpty)
  }

  test("REAL PCM decode: committed WAV fixture yields exact sample stats") {
    val wav = resource("/graft/fixture_tone.wav")
    val f = graft.functions.MediaCodecs.audioFeatures(wav).get
    // samples: 0, ±1000..±7000, 8000 at 8 kHz mono PCM16
    assert(f.length == 7)
    assert(f(0) == 16f, "n samples")
    assert(f(1) == 8000f && f(2) == 1f, "rate/channels")
    assert(f(3) == 500f, "mean")
    assert(f(4) == -7000f && f(5) == 8000f, "min/max")
    assert(f(6) == 4000f, "mean abs")
    assert(graft.functions.MediaCodecs.audioFeatures("not audio".getBytes).isEmpty)
  }

  test("extractFeatures routes real payloads through the real codecs") {
    val rows = Seq(
      MediaRow(30L, "image", resource("/graft/fixture_4x2.png"), MediaMeta(None, None, None, None)),
      MediaRow(31L, "audio", resource("/graft/fixture_tone.wav"), MediaMeta(None, None, None, None)),
      MediaRow(32L, "image", "junk".getBytes, MediaMeta(None, None, None, None)),
      MediaRow(33L, "video", "junk".getBytes, MediaMeta(None, None, None, Some(10))),
    ).toDS()
    val got = extractFeatures(rows).collect().map(m => m.media_id -> m.feature).toMap
    assert(got(30L).length == 11 && got(30L)(2) == 112.75f, "real pixel path")
    assert(got(31L).length == 7 && got(31L)(3) == 500f, "real PCM path")
    assert(got(32L).length == 4, "unparseable image falls back to stub moments")
    assert(got(33L).length == 4, "non-MJPEG video falls back to stub moments")
  }

  test("REAL image resize scales pixels under the decoded-byte budget") {
    // synthesize a 100x50 gradient PNG in-memory
    val img = new java.awt.image.BufferedImage(100, 50,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 50; x <- 0 until 100)
      img.setRGB(x, y, ((x * 255 / 99) << 16) | ((y * 255 / 49) << 8) | 128)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val big = buf.toByteArray

    val rows = Seq(MediaRow(40L, "image", big, MediaMeta(None, None, None, None))).toDS()
    val out = resizeImages(rows, targetBytes = 1200).collect().head.bytes
    val dims = graft.functions.ImageHeaders.dimensions(out).get
    // sqrt(1200 / (100*50*3)) = 0.283 -> 28x14
    assert(dims.format == "png" && dims.width == 28 && dims.height == 14)
    assert(dims.width.toLong * dims.height * 3 <= 1200, "decoded size inside budget")
    // already-small images pass through untouched
    val small = resource("/graft/fixture_4x2.png")
    val keep = resizeImages(Seq(MediaRow(41L, "image", small,
      MediaMeta(None, None, None, None))).toDS(), targetBytes = 1200).collect().head.bytes
    assert(keep.sameElements(small))
  }

  test("perceptual dHash near-dup finds re-encoded images, not unrelated ones") {
    // three REAL images: a gradient, the same gradient with mild noise
    // in one corner (a near-dup), and an unrelated checkerboard
    def png(paint: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, paint(x, y))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    def gradient(x: Int, y: Int): Int =
      ((x * 4) << 16) | ((y * 4) << 8) | ((x + y) * 2)
    val base = png(gradient)
    val noisy = png((x, y) =>
      if (x < 8 && y < 8) gradient(x, y) ^ 0x0f0f0f else gradient(x, y))
    val board = png((x, y) => if (((x / 8) + (y / 8)) % 2 == 0) 0xffffff else 0)
    val rows = Seq(
      MediaRow(50L, "image", base, MediaMeta(None, None, None, None)),
      MediaRow(51L, "image", noisy, MediaMeta(None, None, None, None)),
      MediaRow(52L, "image", board, MediaMeta(None, None, None, None)),
      MediaRow(53L, "audio", base, MediaMeta(None, None, None, None)), // kind filter
      MediaRow(54L, "image", "not an image".getBytes, MediaMeta(None, None, None, None)),
    ).toDS()
    // only decodable image rows are hashed
    val hashes = imageDHashes(rows).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet == Set(50L, 51L, 52L))
    // dHash is deterministic in the decoded raster
    assert(hashes(50L) == graft.functions.MediaCodecs.dHash64(
      graft.functions.MediaCodecs.decodeImage(base).get))
    val pairs = imageNearDup(rows, maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((50L, 51L)), "corner-noise re-encode is a near-dup")
    assert(!pairs.contains((50L, 52L)) && !pairs.contains((51L, 52L)),
      "checkerboard is unrelated")
    // pairs come from the shared pigeonhole machinery: exactly Hamming<=maxDist
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(50L), hashes(51L)) <= 10)
    assert(ham(hashes(50L), hashes(52L)) > 10)
  }

  test("8-bit unsigned WAV decodes through the PCM_UNSIGNED branch") {
    // RIFF/WAVE, 1 channel, 8 kHz, 8-bit: samples stored offset-128
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val data = Array(128, 138, 118, 128 + 100, 128 - 100, 128).map(_.toByte)
    val wav =
      "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
        "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val f = graft.functions.MediaCodecs.audioFeatures(wav).get
    assert(f(0) == 6f && f(1) == 8000f && f(2) == 1f)
    assert(f(3) == 0f, "mean of 0,+10,-10,+100,-100,0")
    assert(f(4) == -100f && f(5) == 100f)
    assert(math.abs(f(6) - 220f / 6f) < 1e-4, "mean abs")
  }

  test("degenerate banner resize still honors the decoded-byte budget") {
    // 400x1: the height collapses to the 1-pixel floor, so the width must
    // be re-derived from the budget (naive sqrt-scaling would keep ~126
    // columns = 379 decoded bytes for a 120-byte budget)
    val img = new java.awt.image.BufferedImage(400, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 400) img.setRGB(x, 0, x % 256)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val out = graft.functions.MediaCodecs.resizeImage(buf.toByteArray, targetBytes = 120).get
    val dims = graft.functions.ImageHeaders.dimensions(out).get
    assert(dims.height == 1 && dims.width.toLong * dims.height * 3 <= 120,
      s"got ${dims.width}x${dims.height}")
  }

  test("1x1 and truncated images: smallest valid decode, graceful None") {
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (17 << 16) | (34 << 8) | 51)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val f = graft.functions.MediaCodecs.imageFeatures(buf.toByteArray).get
    assert(f.toSeq == Seq(1f, 1f, 17f, 34f, 51f, 17f, 34f, 51f, 17f, 34f, 51f))
    // truncating a REAL png mid-IDAT must yield None, not an exception
    val png = resource("/graft/fixture_4x2.png")
    assert(graft.functions.MediaCodecs.imageFeatures(png.take(40)).isEmpty)
    assert(graft.functions.MediaCodecs.audioFeatures(
      resource("/graft/fixture_tone.wav").take(30)).isEmpty)
  }

  test("REAL MJPEG-AVI decode: container walk extracts frames byte-identically") {
    import graft.functions.{MjpegAviTestSupport => A, VideoCodecs}
    // one odd-length frame forces the even-padding rule through the walk
    val frames = Seq(A.jpegFrame(8, 6, 0xff0000), A.jpegFrame(8, 6, 0x00ff00),
      A.jpegFrame(8, 6, 0x0000ff))
    for (nest <- Seq(false, true)) { // flat movi AND rec -nested layouts
      val avi = A.build(frames, usPerFrame = 40000, w = 8, h = 6, nestInRec = nest)
      val got = VideoCodecs.decodeAvi(avi).get
      assert(got.info == VideoCodecs.AviInfo(40000, 3, 8, 6), s"nest=$nest")
      assert(got.frames.size == 3 &&
        got.frames.zip(frames).forall { case (a, b) => a.sameElements(b) },
        s"frames byte-identical, nest=$nest")
    }
    // malformed payloads: None, never an exception
    val avi = A.build(frames, 40000, 8, 6)
    assert(VideoCodecs.decodeAvi(avi.take(40)).isEmpty, "truncated")
    assert(VideoCodecs.decodeAvi("RIFFxxxxWAVE".getBytes).isEmpty, "wrong form type")
    assert(VideoCodecs.decodeAvi(Array.emptyByteArray).isEmpty)
  }

  test("REAL MJPEG-AVI decode: committed fixture yields known frame stats") {
    import graft.functions.VideoCodecs
    val avi = resource("/graft/fixture_mjpeg.avi")
    val got = VideoCodecs.decodeAvi(avi).get
    assert(got.frames.size == 3 && got.info == VideoCodecs.AviInfo(40000, 3, 8, 6))
    val f = VideoCodecs.videoFeatures(avi).get
    // 3 solid 8x6 frames (red/green/blue) at 25 fps; per-channel means
    // averaged over the frames land near 255/3 (JPEG quantization moves
    // them a few counts — values recorded at fixture-generation time)
    assert(f.length == 8)
    assert(f(0) == 3f && f(1) == 25f && f(2) == 8f && f(3) == 6f)
    for (c <- 4 to 7)
      assert(math.abs(f(c) - 85f) < 3f, s"channel $c mean ${f(c)}")
    // the 8-float video path is selected by extractFeatures
    val rows = Seq(MediaRow(50L, "video", avi, MediaMeta(None, None, None, None))).toDS()
    val feat = extractFeatures(rows).collect().head.feature
    assert(feat.length == 8 && feat(0) == 3f)
  }

  test("frame sampling returns real JPEG frames for MJPEG-AVI payloads") {
    import graft.functions.{MjpegAviTestSupport => A, VideoCodecs}
    // 5 frames at 25 fps (40 ms apart) = 200 ms; sampling every 60 ms
    // gives samples at 0/60/120/180 ms -> frame indices 0/1/3/4
    val frames = (0 until 5).map(i => A.jpegFrame(4, 4, i * 0x101010))
    val avi = A.build(frames, usPerFrame = 40000, w = 4, h = 4)
    val rows = Seq(MediaRow(60L, "video", avi, MediaMeta(None, None, None, None))).toDS()
    val got = sampleFrames(rows, everyMs = 60).collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_ms).toSeq == Seq(0, 60, 120, 180))
    assert(got.zip(Seq(0, 1, 3, 4)).forall { case (fr, i) =>
      fr.bytes.sameElements(frames(i)) }, "each sample is the frame on screen")
    assert(got.forall(fr => graft.functions.MediaCodecs.decodeImage(fr.bytes).isDefined),
      "every sampled frame is a decodable JPEG")
  }

  test("documents-derived media table has the declared schema") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = mediaFromDocuments(spark, docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    assert(m.count() == docs.count())
    val feats = extractFeatures(m.limit(10).as[MediaRow])
    assert(feats.count() == 10)
  }
}
