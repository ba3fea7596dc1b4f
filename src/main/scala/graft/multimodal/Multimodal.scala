package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata (SURVEY extension; the reference's image hops through S3/tmp
  * files are replaced by bytes-in-column processing).
  *
  * Processing runs as `mapPartitions` batches — the JVM analogue of
  * arrow-batched pandas UDFs: one codec instance per partition, bytes
  * never leave the executor, output is a typed Dataset so the optimizer
  * sees real schemas. At scale the media table is partitioned by
  * media_id; every op below is narrow (zero shuffle).
  *
  * Codec reality: PNG decode/resize use the JDK's ImageIO — real codecs,
  * no external deps. Video frame extraction has no JDK codec, so
  * [[SyntheticCodec]] implements the documented STUB boundary over the
  * deterministic synthetic blob format (header + LCG payload) used by
  * fixtures and the driver oracle.
  */
final case class MediaBlob(media_id: Long, kind: String, content: Array[Byte])

final case class MediaMeta(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_bytes: Int,
    valid: Boolean)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_bytes: Int,
    mean_byte: Double,
    histogram4: Array[Long])

trait MediaCodec extends Serializable {
  def decodeMeta(blob: MediaBlob): MediaMeta
  /** Sampled payload frames for video-kind blobs (STUB for real codecs). */
  def sampleFrames(blob: MediaBlob, everyN: Int): Seq[Array[Byte]]
}

/** Codec for the deterministic synthetic blob format:
  * bytes = "GFT1" | kind byte | width | height | payload (LCG bytes).
  * Ints are big-endian. */
class SyntheticCodec extends MediaCodec {
  override def decodeMeta(blob: MediaBlob): MediaMeta = {
    val b = blob.content
    if (b.length < 13 || new String(b, 0, 4, "ASCII") != "GFT1")
      return MediaMeta(blob.media_id, blob.kind, -1, -1, b.length, valid = false)
    val bb = java.nio.ByteBuffer.wrap(b, 5, 8)
    MediaMeta(blob.media_id, blob.kind, bb.getInt(), bb.getInt(), b.length,
      valid = true)
  }

  override def sampleFrames(blob: MediaBlob, everyN: Int): Seq[Array[Byte]] = {
    // STUB boundary: a real implementation decodes container frames; the
    // synthetic format treats each 16-byte payload block as one "frame".
    val payload = blob.content.drop(13)
    payload.grouped(16).toSeq.zipWithIndex
      .collect { case (frame, i) if i % everyN == 0 => frame }
  }
}

object Multimodal {

  /** Deterministic synthetic media corpus (mirrored by the python oracle
    * generator — keep the two in sync). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.range(n).map { id =>
      MediaBlob(id, kindOf(id), syntheticBytes(id))
    }
  }

  def kindOf(id: Long): String =
    Seq("image", "audio", "video")((id % 3).toInt)

  def syntheticBytes(id: Long): Array[Byte] = {
    val width = 16 + (id % 32).toInt
    val height = 16 + (id * 3 % 32).toInt
    val payloadLen = 64 + (id % 64).toInt
    val bb = java.nio.ByteBuffer.allocate(13 + payloadLen)
    bb.put("GFT1".getBytes("ASCII"))
    bb.put((id % 3).toByte)
    bb.putInt(width)
    bb.putInt(height)
    (0 until payloadLen).foreach(i => bb.put(((id * 31 + i * 7) % 256).toByte))
    bb.array()
  }

  /** Decode + feature-extract as one partition-batched pass. */
  def mediaFeatures(
      media: Dataset[MediaBlob],
      codec: MediaCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { blobs =>
      blobs.map { blob =>
        val meta = codec.decodeMeta(blob)
        val payload = blob.content.drop(13)
        val mean =
          if (payload.isEmpty) 0.0
          else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
        val hist = Array.fill(4)(0L)
        payload.foreach(b => hist((b & 0xff) / 64) += 1)
        MediaFeatures(meta.media_id, meta.kind, meta.width, meta.height,
          meta.n_bytes, math.rint(mean * 10000) / 10000, hist)
      }
    }
  }

  /** Frame sampling fan-out for video blobs (one row per sampled frame). */
  def sampledFrames(
      media: Dataset[MediaBlob],
      codec: MediaCodec,
      everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { blob =>
        codec.sampleFrames(blob, everyN).zipWithIndex.map { case (f, i) =>
          (blob.media_id, i, f.length,
            f.map(b => (b & 0xff).toLong).sum)
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes", "byte_sum")
  }

  /** Perceptual average-hash (aHash) of 64 gray "pixels": threshold each
    * pixel at the integer mean, one bit per pixel. Integer-only math, so
    * the hash is engine/oracle reproducible. */
  def aHash64(px: Array[Int]): Long = {
    require(px.length == 64, s"aHash needs 64 pixels, got ${px.length}")
    val mean = px.sum / 64 // integer mean — deterministic
    px.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
      if (v > mean) h | (1L << i) else h
    }
  }

  /** aHash over a synthetic blob: the payload bytes, cycled to 64, ARE
    * the pixels (STUB pixel source; the real-image path is [[aHashPng]]). */
  def aHashSynthetic(blob: MediaBlob): Long = {
    val p = blob.content.drop(13)
    aHash64(Array.tabulate(64)(i => p(i % p.length) & 0xff))
  }

  /** Real-codec aHash: decode via ImageIO (PNG or JPEG — the container
    * is sniffed), resize to 8x8, luma grayscale, mean-threshold — the
    * standard near-duplicate image fingerprint. */
  def aHashImage(bytes: Array[Byte]): Option[Long] = aHashPng(bytes)

  def aHashPng(bytes: Array[Byte]): Option[Long] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    Option(src).map(aHashOf)
  }

  /** (media_id, ahash) for image-kind blobs, partition-batched. */
  def aHashes(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(_.map(b => (b.media_id, aHashSynthetic(b))))
      .toDF("media_id", "ahash")
  }

  /** Real-codec audio path: decode WAV bytes via javax.sound (JDK) and
    * return (sampleRate, nFrames, rms of the first channel) — the audio
    * analogue of the ImageIO PNG path: genuine container parsing, no
    * external deps. Compressed codecs (mp3/aac) stay behind the
    * documented STUB boundary. */
  def wavFeatures(bytes: Array[Byte]): Option[(Float, Long, Double)] =
    // undecodable bytes yield None, matching decodePngDims/aHashPng — a
    // bad blob must not kill the task (AudioSystem throws on non-WAV)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val frames = in.getFrameLength
          val data = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val step = fmt.getFrameSize / 2 // 16-bit samples per frame
          var i = 0
          var sum = 0.0
          var n = 0L
          // 2*i+1 < length: a truncated payload's trailing odd byte is
          // ignored instead of reading past the buffer
          while (i * 2 + 1 < data.length) {
            if (i % step == 0) { // first channel only
              val s = bb.getShort(i * 2) / 32768.0
              sum += s * s
              n += 1
            }
            i += 1
          }
          Some((fmt.getSampleRate, frames,
            if (n == 0) 0.0 else math.sqrt(sum / n)))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => None
    }

  /** Real-codec path: decode image bytes via JDK ImageIO and return
    * dims. ImageIO sniffs the container, so this decodes PNG *and* JPEG
    * (both JDK-native) — proves the plumbing carries real image formats,
    * not only the synthetic one. */
  def decodeImageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    Option(img).map(i => (i.getWidth, i.getHeight))
  }

  /** Back-compat alias of [[decodeImageDims]]. */
  def decodePngDims(bytes: Array[Byte]): Option[(Int, Int)] =
    decodeImageDims(bytes)

  /** Encode a W x H grayscale pattern as REAL JPEG bytes via ImageIO:
    * `shade(x, y)` gives the gray level. Used to build lossy-codec
    * fixtures whose decoded aHash is ANALYTIC: with block-aligned
    * high-contrast patterns (quadrants of 0 vs 255 on 8px multiples),
    * JPEG quantization noise is a few gray levels around each extreme,
    * nowhere near the ~127 threshold — so the fingerprint is exact by
    * construction, independent of encoder tables. */
  def encodeJpeg(w: Int, h: Int, shade: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = shade(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Deterministic real-JPEG fixture corpus: three 64x64 two-tone
    * patterns aligned to JPEG's 8x8 block grid. Decoded aHashes are the
    * analytic bit masks of the white region (see [[encodeJpeg]]). */
  def jpegFixtures(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    val patterns: Seq[(Long, (Int, Int) => Int)] = Seq(
      0L -> ((x: Int, _: Int) => if (x >= 32) 255 else 0), // left|right
      1L -> ((_: Int, y: Int) => if (y >= 32) 255 else 0), // top/bottom
      2L -> ((x: Int, y: Int) => // quadrant checkerboard
        if ((x >= 32) != (y >= 32)) 255 else 0))
    spark.createDataset(patterns.map { case (id, shade) =>
      MediaBlob(id, "image", encodeJpeg(64, 64, shade))
    })
  }

  /** Real-JPEG decode summary: dims + aHash per blob, partition-batched
    * through the genuine ImageIO codec (sniffed JPEG), plus the JPEG SOI
    * marker check proving the bytes really are JPEG containers. */
  def jpegSummary(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { b =>
      // JPEG SOI marker FF D8
      val isJpeg = b.content.length >= 2 &&
        (b.content(0) & 0xff) == 0xff && (b.content(1) & 0xff) == 0xd8
      val dims = decodeImageDims(b.content)
      (b.media_id, isJpeg,
        dims.map(_._1).getOrElse(-1), dims.map(_._2).getOrElse(-1),
        aHashImage(b.content).getOrElse(0L))
    }).toDF("media_id", "is_jpeg", "width", "height", "ahash")
  }

  /** aHash of an already-decoded image: resize to 8x8, integer luma,
    * mean-threshold. The shared core of [[aHashPng]] and the GIF frame
    * path. */
  def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val dst = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val px = Array.tabulate(64) { i =>
      val rgb = dst.getRGB(i % 8, i / 8)
      val (r, gr, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      (r * 299 + gr * 587 + b * 114) / 1000 // integer luma
    }
    aHash64(px)
  }

  /** Encode a REAL multi-frame animated GIF via ImageIO's sequence
    * writer: each `shade(x, y)` function is one full frame. GIF's LZW
    * compression is LOSSLESS and two-tone 0/255 gray survives palette
    * quantization exactly, so — unlike JPEG — decoded pixels equal the
    * encoded pattern bit for bit and per-frame aHashes are analytic
    * with no noise argument needed. This is the honest JDK-native
    * "video-like" container: a genuine multi-frame format for the
    * frame-sampling path, no external codec. */
  def encodeGif(w: Int, h: Int, frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { shade =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = shade(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Deterministic animated-GIF fixture corpus: blob k holds k+2 full
    * 64x64 frames; frame f is white where x >= 8*(f+1) (8px-aligned
    * two-tone columns, so each 8x8 aHash cell is uniform and the
    * fingerprint is the white-region bit mask by construction). */
  def gifFixtures(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.createDataset((0L until 3L).map { k =>
      val frames = (0 until (k.toInt + 2)).map { f =>
        (x: Int, _: Int) => if (x >= 8 * (f + 1)) 255 else 0
      }
      MediaBlob(k, "video", encodeGif(64, 64, frames))
    })
  }

  /** Real multi-frame decode: one row per GIF frame — container magic,
    * frame count from the container, per-frame dims + aHash through the
    * genuine ImageIO GIF reader. The GIF analogue of [[sampledFrames]]
    * with a REAL codec instead of the synthetic stub. */
  def gifFrames(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { b =>
      val isGif = b.content.length >= 4 &&
        new String(b.content, 0, 4, "ASCII") == "GIF8"
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b.content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); Seq.empty }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n).map { f =>
            val img = reader.read(f)
            (b.media_id, isGif, n, f, img.getWidth, img.getHeight,
              aHashOf(img))
          }
        } finally {
          reader.dispose()
          iis.close()
        }
      }
    }).toDF("media_id", "is_gif", "n_frames", "frame_no", "width",
      "height", "ahash")
  }

  /** Deterministic MJPEG-AVI fixture corpus: blob k holds k+2 real
    * JPEG frames in a RIFF/AVI container ([[MjpegAvi.encode]]); frame
    * patterns match [[gifFixtures]] (white where x >= 8*(f+1)), so the
    * decoded per-frame aHashes are the same analytic bit masks — JPEG
    * quantization noise cannot cross the ~127 threshold on these
    * block-aligned two-tone frames (the [[encodeJpeg]] argument). */
  def aviFixtures(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.createDataset((0L until 3L).map { k =>
      val frames = (0 until (k.toInt + 2)).map { f =>
        encodeJpeg(64, 64, (x, _) => if (x >= 8 * (f + 1)) 255 else 0)
      }
      MediaBlob(k, "video", MjpegAvi.encode(frames, 64, 64))
    })
  }

  /** Compressed-video decode: demux the RIFF/AVI container
    * ([[MjpegAvi.decode]] — general chunk walk, not an offset reader),
    * then decode each MJPEG frame through the genuine ImageIO JPEG
    * codec. One row per frame; `n_frames_hdr` comes from the avih
    * header (proving the header parse) while rows themselves come from
    * the demuxed movi chunks; width/height are DECODED frame dims
    * (proving the codec ran), and the RIFF magic check proves the
    * container really is AVI. */
  def aviFrames(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { b =>
      val isAvi = b.content.length >= 12 &&
        new String(b.content, 0, 4, "ASCII") == "RIFF" &&
        new String(b.content, 8, 4, "ASCII") == "AVI "
      MjpegAvi.decode(b.content).toSeq.flatMap { avi =>
        avi.frames.zipWithIndex.flatMap { case (jpeg, f) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jpeg))
          if (img == null) Seq.empty
          else Seq((b.media_id, isAvi, avi.totalFrames, f,
            img.getWidth, img.getHeight, aHashOf(img)))
        }
      }
    }).toDF("media_id", "is_avi", "n_frames_hdr", "frame_no", "width",
      "height", "ahash")
  }

  /** Encode 16-bit mono PCM as a G.711 u-law WAV — a REAL lossy,
    * COMPRESSED audio codec (8-bit logarithmic companding, ITU-T
    * G.711) that the JDK ships natively in javax.sound. This narrows
    * the compressed-audio stub the same way MJPEG-AVI narrowed video:
    * the remaining boundary is perceptual codecs (mp3/aac), for which
    * the JDK has no decoder. */
  def encodeWavUlaw(samples: Array[Short], rate: Float): Array[Byte] =
    encodeWavG711(samples, rate,
      javax.sound.sampled.AudioFormat.Encoding.ULAW)

  /** Encode 16-bit mono PCM as a G.711 A-law WAV — the companion
    * companding law (ITU-T G.711 A-law, the European PSTN variant);
    * also a JDK-native javax.sound codec. With u-law and A-law both
    * byte-matched against independent ITU-T encoders, the JDK-native
    * compressed-audio surface is CLOSED — what remains (mp3/aac) has
    * no JDK decoder. */
  def encodeWavAlaw(samples: Array[Short], rate: Float): Array[Byte] =
    encodeWavG711(samples, rate,
      javax.sound.sampled.AudioFormat.Encoding.ALAW)

  private def encodeWavG711(samples: Array[Short], rate: Float,
      enc: javax.sound.sampled.AudioFormat.Encoding): Array[Byte] = {
    import javax.sound.sampled._
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, 1, 2, rate, false)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val pcm = new AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), pcmFmt, samples.length)
    val g711Fmt = new AudioFormat(enc, rate, 8, 1, 1, rate, false)
    val g711 = AudioSystem.getAudioInputStream(g711Fmt, pcm)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(g711, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a u-law WAV back to 16-bit PCM samples; None for
    * undecodable bytes or a non-ULAW container. */
  def decodeWavUlaw(bytes: Array[Byte]): Option[(Float, Array[Short])] =
    decodeWavG711(bytes, javax.sound.sampled.AudioFormat.Encoding.ULAW)

  /** Decode an A-law WAV back to 16-bit PCM samples; None for
    * undecodable bytes or a non-ALAW container. */
  def decodeWavAlaw(bytes: Array[Byte]): Option[(Float, Array[Short])] =
    decodeWavG711(bytes, javax.sound.sampled.AudioFormat.Encoding.ALAW)

  private def decodeWavG711(bytes: Array[Byte],
      enc: javax.sound.sampled.AudioFormat.Encoding)
      : Option[(Float, Array[Short])] = {
    import javax.sound.sampled._
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != enc) None
        else {
          val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            2 * fmt.getChannels, fmt.getSampleRate, false)
          val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
          val data = pcm.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Some((fmt.getSampleRate,
            Array.tabulate(data.length / 2)(i => bb.getShort(i * 2))))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => None
    }
  }

  /** Deterministic u-law fixture samples for blob k: a full-scale-ish
    * integer ramp exercising both companding polarities. */
  def ulawSamples(k: Long): Array[Short] =
    Array.tabulate(800 + 100 * k.toInt) { i =>
      (((i * 37 + k * 11) % 4000 - 2000) * 8).toShort
    }

  def ulawFixtures(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.createDataset((0L until 3L).map(k =>
      MediaBlob(k, "audio", encodeWavUlaw(ulawSamples(k), 8000f))))
  }

  /** Deterministic A-law fixture samples for blob k: a distinct ramp
    * (different stride/phase than [[ulawSamples]]) exercising both
    * polarities across the A-law segments. Samples are 13-bit-ALIGNED
    * (x8) because G.711 defines the A-law table on 13-bit PCM — how an
    * encoder rounds 16->13 bits for unaligned input is implementation
    * convention, so byte-pinning happens on the defined domain. */
  def alawSamples(k: Long): Array[Short] =
    Array.tabulate(700 + 150 * k.toInt) { i =>
      (((i * 53 + k * 29) % 4400 - 2200) * 8).toShort
    }

  def alawFixtures(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.createDataset((0L until 3L).map(k =>
      MediaBlob(k, "audio", encodeWavAlaw(alawSamples(k), 8000f))))
  }

  /** A-law decode summary, the [[ulawSummary]] twin: container
    * encoding check, rate, frame count, companding round-trip error
    * bound. A-law quantizes a 13-bit magnitude (16-bit input >> 3)
    * with per-segment steps up to 128 at that scale, i.e. 1024 at
    * 16-bit scale; half-step reconstruction plus the >>3 truncation
    * keeps |err| <= 1024 — the same ITU-T bound as u-law, for the
    * same engine-neutral reason. */
  def alawSummary(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { b =>
      decodeWavAlaw(b.content) match {
        case None => (b.media_id, false, -1, -1L, false)
        case Some((rate, decoded)) =>
          val ref = alawSamples(b.media_id)
          val maxErr =
            if (decoded.length != ref.length) Int.MaxValue
            else (0 until ref.length)
              .map(i => math.abs(decoded(i) - ref(i))).foldLeft(0)(math.max)
          (b.media_id, true, rate.toInt, decoded.length.toLong,
            maxErr <= 1024)
      }
    }).toDF("media_id", "is_alaw", "sample_rate", "n_frames", "within_g711_tol")
  }

  /** Compressed-audio decode summary: container encoding check, rate,
    * frame count, and the companding round-trip error bound against the
    * regenerated reference samples. G.711 quantizes a 14-bit magnitude
    * with per-segment steps up to 256, i.e. up to 1024 at 16-bit scale;
    * half-step reconstruction keeps |err| <= 512 + rounding, so
    * max|err| <= 1024 is the REAL codec-accuracy claim — engine-neutral
    * because G.711 is an ITU-T table, not a JDK choice. (MultimodalSpec
    * pins the exact table behavior with an independent decoder.) */
  def ulawSummary(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { b =>
      decodeWavUlaw(b.content) match {
        case None => (b.media_id, false, -1, -1L, false)
        case Some((rate, decoded)) =>
          val ref = ulawSamples(b.media_id)
          val maxErr =
            if (decoded.length != ref.length) Int.MaxValue
            else (0 until ref.length)
              .map(i => math.abs(decoded(i) - ref(i))).foldLeft(0)(math.max)
          (b.media_id, true, rate.toInt, decoded.length.toLong,
            maxErr <= 1024)
      }
    }).toDF("media_id", "is_ulaw", "sample_rate", "n_frames", "within_g711_tol")
  }

  /** Deterministic IMA-ADPCM fixture samples for blob k: a triangle
    * wave (bounded slope — the signal class a tracking quantizer is
    * specified for) with per-blob amplitude/period, long enough to
    * span multiple 512-byte blocks. */
  def adpcmSamples(k: Long): Array[Short] = {
    val period = 400 + 80 * k.toInt
    val amp = 6000 + 1500 * k.toInt
    Array.tabulate(2500 + 300 * k.toInt) { i =>
      val ph = i % period
      val tri = if (ph < period / 2) ph else period - ph
      (tri * 4 * amp / period - amp).toShort
    }
  }

  def adpcmFixtures(spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.createDataset((0L until 3L).map(k =>
      MediaBlob(k, "audio", ImaAdpcm.encodeWav(adpcmSamples(k), 8000))))
  }

  /** IMA-ADPCM decode summary: container format check, rate, true
    * (fact-chunk) sample count, and the tracking-quantizer error bound
    * against the regenerated reference samples. For a bounded-slope
    * signal the adapted step sits near 8x the per-sample slope and the
    * reconstruction error near step/8; direction reversals transiently
    * overshoot, so the pinned claim is |err| <= 1024 at 16-bit scale —
    * validated over the whole fixture family in MultimodalSpec, which
    * also pins the quantizer itself against hand-derived vectors from
    * the published IMA algorithm. */
  def adpcmSummary(media: Dataset[MediaBlob]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { b =>
      ImaAdpcm.decodeWav(b.content) match {
        case None => (b.media_id, false, -1, -1L, false)
        case Some((rate, decoded)) =>
          val ref = adpcmSamples(b.media_id)
          val maxErr =
            if (decoded.length != ref.length) Int.MaxValue
            else (0 until ref.length)
              .map(i => math.abs(decoded(i) - ref(i))).foldLeft(0)(math.max)
          (b.media_id, true, rate, decoded.length.toLong, maxErr <= 1024)
      }
    }).toDF("media_id", "is_adpcm", "sample_rate", "n_samples",
      "within_adpcm_tol")
  }

  /** Real-codec resize via JDK imaging (bilinear). */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, w, h, null)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }
}
