package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and the decode / feature-extract /
  * resize / frame-sample operators structured the way they run at 100 TB:
  *
  *  - payloads never pass through a shuffle — transforms are narrow
  *    (mapPartitions) over the batch iterator;
  *  - work is batched per partition (`batchSize`) so a decoder amortizes
  *    setup per batch, the same shape a vectorized/Arrow-batch UDF has;
  *  - image and audio decode are REAL ([[graft.functions.MediaCodecs]] —
  *    JDK `javax.imageio` pixel decode and `javax.sound` PCM decode, zero
  *    added dependencies), and video decode is REAL for MJPEG-in-AVI
  *    ([[graft.functions.VideoCodecs]] — RIFF container walk + per-frame
  *    JPEG via the same ImageIO path); the deterministic [[StubCodec]]
  *    byte-moments remain only for payloads no codec parses (for video
  *    that means every non-MJPEG codec — the JDK ships none).
  */
object Multimodal {

  /** media(media_id, kind, bytes, meta{width,height,sample_rate,duration_ms}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", IntegerType))))))

  case class MediaMeta(width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], duration_ms: Option[Int])
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_ms: Int, bytes: Array[Byte])

  /** Fallback decoder: deterministic byte-stream moments for payloads no
    * real codec parses — for video that means every codec except
    * MJPEG-in-AVI ([[graft.functions.VideoCodecs]]), since the JDK ships
    * no video codec library. Deterministic in the payload bytes so tests
    * and oracle-style checks are stable. */
  object StubCodec {
    /** Deterministic fake: 4 moments of the byte stream. */
    def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
      var sum = 0L; var min = 255; var max = 0
      bytes.foreach { b => val v = b & 0xff; sum += v; min = math.min(min, v); max = math.max(max, v) }
      val n = math.max(bytes.length, 1)
      Array(n.toFloat, sum.toFloat / n, min.toFloat, max.toFloat)
    }
    /** Fallback resize: deterministic subsample to `targetBytes`. */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
      if (bytes.length <= targetBytes) bytes
      else Array.tabulate(targetBytes)(i => bytes(i * bytes.length / targetBytes))
    }
    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + (b & 0xff))
  }

  /** Batched per-partition transform — the Scala analogue of a vectorized
    * batch UDF: groups the partition iterator into `batchSize` chunks and
    * applies `f` per batch. Narrow (no shuffle), lazy (iterator-based). */
  def mapBatches[T, U: org.apache.spark.sql.Encoder](ds: Dataset[T], batchSize: Int)(
      f: Seq[T] => Seq[U]): Dataset[U] =
    ds.mapPartitions(it => it.grouped(batchSize).flatMap(f))(implicitly)

  /** Decode + feature-extract every payload (batched). Image payloads
    * decode to real per-channel pixel stats (11 floats —
    * [[graft.functions.MediaCodecs.imageFeatures]]), audio payloads to
    * real PCM sample stats (7 floats —
    * [[graft.functions.MediaCodecs.audioFeatures]]), video payloads to
    * real MJPEG frame stats (8 floats —
    * [[graft.functions.VideoCodecs.videoFeatures]]); any payload no
    * codec parses falls back to the 4-float [[StubCodec]] byte moments.
    * The feature-vector LENGTH therefore tells which path ran —
    * asserted in MultimodalSpec. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val feature = m.kind match {
          case "image" => graft.functions.MediaCodecs.imageFeatures(m.bytes)
            .getOrElse(StubCodec.decodeFeatures(m.bytes))
          case "audio" => graft.functions.MediaCodecs.audioFeatures(m.bytes)
            .getOrElse(StubCodec.decodeFeatures(m.bytes))
          case "video" => graft.functions.VideoCodecs.videoFeatures(m.bytes)
            .getOrElse(StubCodec.decodeFeatures(m.bytes))
          case _ => StubCodec.decodeFeatures(m.bytes)
        }
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          StubCodec.checksum(m.bytes), feature)
      }
    }
  }

  /** Resize image payloads to a byte budget (non-images pass through).
    * Decodable images get a REAL pixel resize (Graphics2D redraw + PNG
    * re-encode, budget = decoded w*h*3 —
    * [[graft.functions.MediaCodecs.resizeImage]]); payloads ImageIO
    * cannot parse fall back to the deterministic byte subsample. */
  def resizeImages(media: Dataset[MediaRow], targetBytes: Int,
      batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize)(_.map { m =>
      if (m.kind == "image")
        m.copy(bytes = graft.functions.MediaCodecs.resizeImage(m.bytes, targetBytes)
          .getOrElse(StubCodec.resize(m.bytes, targetBytes)))
      else m
    })
  }

  /** Sample every `everyMs` frame of video payloads — a row fan-out
    * (flatMap), still narrow. MJPEG-in-AVI payloads get REAL frames:
    * the sample at t = i·everyMs is the JPEG of the frame on screen at
    * that instant (index floor(t / msPerFrame), clamped to the last
    * frame), duration = nFrames·msPerFrame from the avih header. Other
    * codecs fall back to the stub slice over the supplied meta
    * duration. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int,
      batchSize: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    val every = math.max(everyMs, 1)
    mapBatches(media, batchSize)(_.flatMap { m =>
      if (m.kind != "video") Seq.empty
      else graft.functions.VideoCodecs.decodeAvi(m.bytes) match {
        case Some(avi) =>
          // Long arithmetic throughout: a crafted avih header can carry
          // microSecPerFrame near 2^32, and Int dur would overflow to
          // negative (zero frames emitted for a payload that parsed).
          // The sample count is also capped — sampling much faster than
          // the frame rate on a crafted long-duration header would
          // otherwise fan one row out into millions of duplicates.
          val msPer = math.max(avi.info.microSecPerFrame.toLong / 1000L, 1L)
          val dur = avi.frames.size.toLong * msPer
          // every instant t = i·every with t < dur has a frame on
          // screen, so the sample count is ceil(dur / every)
          val wanted = (dur + every - 1) / every
          val n = math.min(wanted, math.max(avi.frames.size.toLong * 4, 1024L))
          (0L until n).map { i =>
            val ms = i * every
            val idx = math.min(ms / msPer, avi.frames.size - 1L).toInt
            Frame(m.media_id, i.toInt, ms.toInt, avi.frames(idx))
          }
        case None =>
          val dur = m.meta.duration_ms.getOrElse(0)
          (0 until math.max(dur / every, 0)).map { i =>
            val ms = i * every
            // non-MJPEG codec: deterministic byte slice per frame (stub)
            val fb = StubCodec.resize(m.bytes.drop(ms % math.max(m.bytes.length, 1)), 16)
            Frame(m.media_id, i, ms, fb)
          }
      }
    })
  }

  /** REAL metadata probe (no stub): parse width/height out of the payload
    * bytes themselves via container-header parsing
    * ([[graft.functions.ImageHeaders]] — PNG IHDR, JPEG SOF marker scan,
    * GIF logical screen). Image rows whose payload parses get their meta
    * replaced by ground truth; unparseable or non-image rows keep the
    * supplied meta. Same narrow batched shape as the stubs — only pixel
    * DECODE still needs a codec library. */
  def probeImageMeta(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize)(_.map { m =>
      if (m.kind != "image") m
      else graft.functions.ImageHeaders.dimensions(m.bytes) match {
        case Some(d) => m.copy(meta = m.meta.copy(
          width = Some(d.width), height = Some(d.height)))
        case None => m
      }
    })
  }

  /** REAL audio metadata probe (no stub), sibling of [[probeImageMeta]]:
    * parse sample_rate/duration out of RIFF/WAVE payload bytes
    * ([[graft.functions.AudioHeaders]] — fmt/data chunk walk). Audio rows
    * whose payload parses get their meta replaced by ground truth;
    * unparseable or non-audio rows keep the supplied meta. */
  def probeAudioMeta(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize)(_.map { m =>
      if (m.kind != "audio") m
      else graft.functions.AudioHeaders.wav(m.bytes) match {
        case Some(w) => m.copy(meta = m.meta.copy(
          sample_rate = Some(w.sampleRate), duration_ms = Some(w.durationMs)))
        case None => m
      }
    })
  }

  /** Perceptual dHash signatures of every DECODABLE image payload —
    * (id, simhash) rows ready for [[graft.operators.Dedup.hammingPairs]].
    * Same narrow batched decode shape as [[extractFeatures]]; payloads
    * ImageIO cannot parse (and non-image rows) are dropped rather than
    * stub-hashed — a byte-moment fake would manufacture false near-dup
    * pairs between visually unrelated images. */
  def imageDHashes(media: Dataset[MediaRow], batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize)(_.flatMap { m =>
      if (m.kind != "image") None
      else graft.functions.MediaCodecs.decodeImage(m.bytes)
        .map(img => (m.media_id, graft.functions.MediaCodecs.dHash64(img)))
    }).toDF("id", "simhash")
  }

  /** Image near-duplicate pairs by perceptual hash: decode → 64-bit
    * dHash ([[graft.functions.MediaCodecs.dHash64]]) → exactly the
    * Hamming ≤ maxDist pairs via the simhash family's pigeonhole
    * chunk-table join — the multimodal arm of the dedup suite, sharing
    * the text family's scale machinery (balanced chunks, salted bucket
    * join, verify-before-distinct) instead of reinventing it. Decode is
    * narrow and per-partition; only (media_id, 64-bit hash) ever
    * shuffles, so the pair stage costs the same as text simhash no
    * matter how heavy the payloads are — the 100 TB property. maxDist
    * ~10 of the 64 gradient bits is the usual re-encode/resize tolerance;
    * the pair list is candidates for an exact byte- or pixel-level
    * verify downstream, mirroring verifiedJaccard's candidates+verify
    * split. */
  def imageNearDup(media: Dataset[MediaRow], maxDist: Int = 10,
      batchSize: Int = 64): DataFrame =
    Dedup.hammingPairs(imageDHashes(media, batchSize), maxDist, bits = 64)

  /** Demo media table derived from the documents fixture (payload = utf-8
    * bytes), so the plumbing runs against real testdata shapes. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "utf-8").as("bytes"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10).cast("int").as("duration_ms")).as("meta"))
      .as[MediaRow]
  }
}
