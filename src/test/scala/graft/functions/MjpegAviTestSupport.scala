package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Test-side MJPEG-AVI writer: builds a REAL AVI RIFF container (per
  * Microsoft's AVI RIFF File Reference layout — hdrl/avih + strl
  * strh/strf + movi frame chunks + idx1) around JPEG frames produced by
  * the JDK's own ImageIO encoder. The writer lives in test sources on
  * purpose: the ENGINE only ever reads AVI; the writer exists to
  * manufacture ground-truth payloads whose frame bytes are known
  * exactly, so DecodeSpec can assert byte-identical extraction. */
object MjpegAviTestSupport {

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def cc(s: String) = s.getBytes("US-ASCII")

  /** A solid-color JPEG via ImageIO — the real encoder, so decode tests
    * exercise the same codec path production payloads would. */
  def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val buf = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", buf)
    buf.toByteArray
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    cc(id) ++ le32(data.length) ++ data ++ pad
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ children)

  /** Assemble the container. `nestInRec` wraps the frames in a `rec `
    * sub-list (a layout interleaved AVIs use) to exercise the walker's
    * recursion. */
  def build(frames: Seq[Array[Byte]], usPerFrame: Int, w: Int, h: Int,
      nestInRec: Boolean = false): Array[Byte] = {
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ Array.fill(48)(0.toByte))
    val strf = chunk("strf", // BITMAPINFOHEADER
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        cc("MJPG") ++ le32(w * h * 3) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val moviKids =
      if (nestInRec) frameChunks.map(fc => list("rec ", fc)).fold(Array.emptyByteArray)(_ ++ _)
      else frameChunks.fold(Array.emptyByteArray)(_ ++ _)
    val movi = list("movi", moviKids)
    // idx1: (fourcc, flags, offset, size) per frame — content irrelevant
    // to the reader under test, present for layout realism
    val idx1 = chunk("idx1",
      frames.map(f => cc("00dc") ++ le32(0x10) ++ le32(0) ++ le32(f.length))
        .fold(Array.emptyByteArray)(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi ++ idx1
    cc("RIFF") ++ le32(body.length) ++ body
  }
}

/** One-off generator for the committed fixture
  * (src/test/resources/graft/fixture_mjpeg.avi): three 8x6 solid-color
  * frames (red/green/blue) at 25 fps. Prints the decoded stats the spec
  * pins. Run: sbt "Test/runMain graft.functions.AviFixtureGen <path>" */
object AviFixtureGen {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("src/test/resources/graft/fixture_mjpeg.avi")
    val frames = Seq(0xff0000, 0x00ff00, 0x0000ff)
      .map(MjpegAviTestSupport.jpegFrame(8, 6, _))
    val avi = MjpegAviTestSupport.build(frames, usPerFrame = 40000, w = 8, h = 6)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), avi)
    println(s"wrote ${avi.length} bytes to $path")
    println("videoFeatures: " +
      VideoCodecs.videoFeatures(avi).map(_.mkString("[", ", ", "]")))
  }
}
