package graft

import graft.multimodal.{MediaBlob, Multimodal, SyntheticCodec}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: synthetic-format decode in partition batches plus
  * the REAL JDK ImageIO codec path over genuinely encoded PNG bytes. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("synthetic decode round-trips header fields") {
    val feats = Multimodal.mediaFeatures(
      Multimodal.syntheticMedia(spark, 30), new SyntheticCodec).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.width == 16 + (f.media_id % 32).toInt)
      assert(f.height == 16 + (f.media_id * 3 % 32).toInt)
      assert(f.histogram4.sum == f.n_bytes - 13)
    }
  }

  test("real PNG decode + resize via JDK ImageIO inside the pipeline") {
    import spark.implicits._
    // encode genuine PNGs driver-side
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val blobs = Seq(
      MediaBlob(0L, "image", png(40, 20)),
      MediaBlob(1L, "image", png(64, 64))).toDS()
    val dims = blobs.mapPartitions(_.map { b =>
      val Some((w, h)) = Multimodal.decodePngDims(b.content)
      val resized = Multimodal.resizePng(b.content, 8, 8)
      val Some((rw, rh)) = Multimodal.decodePngDims(resized)
      (b.media_id, w, h, rw, rh)
    }).collect().sortBy(_._1)
    assert(dims.toSeq == Seq((0L, 40, 20, 8, 8), (1L, 64, 64, 8, 8)))
  }

  test("real-PNG perceptual hash: identical images collide, noise differs") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, f(x, y) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val gradient = (x: Int, y: Int) => (x * 8) << 16 | (y * 8) << 8
    val a = Multimodal.aHashPng(png(32, 32, gradient)).get
    // same scene re-encoded at a different size -> tiny hamming distance
    val b = Multimodal.aHashPng(png(64, 64,
      (x, y) => gradient(x / 2, y / 2))).get
    // structurally different scene -> far away
    val c = Multimodal.aHashPng(png(32, 32,
      (x, y) => if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0)).get
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) <= 6, s"rescaled twin too far: ${ham(a, b)}")
    assert(ham(a, c) > 16, s"different scene too close: ${ham(a, c)}")
  }

  test("real JPEG decode: containers, dims, analytic aHash masks") {
    val rows = Multimodal.jpegSummary(Multimodal.jpegFixtures(spark))
      .orderBy("media_id").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getBoolean(1), "fixture bytes must carry the JPEG SOI marker")
      assert(r.getInt(2) == 64 && r.getInt(3) == 64)
    }
    // white-region bit masks, exact by construction (block-aligned
    // two-tone patterns; lossy noise stays far from the threshold)
    assert(rows(0).getLong(4) == 0xF0F0F0F0F0F0F0F0L) // left|right
    assert(rows(1).getLong(4) == 0xFFFFFFFF00000000L) // top/bottom
    assert(rows(2).getLong(4) == 0x0F0F0F0FF0F0F0F0L) // quadrants
  }

  test("JPEG survives resize + re-decode through the real codec") {
    val jpeg = Multimodal.encodeJpeg(64, 48, (x, _) => if (x >= 32) 255 else 0)
    assert(Multimodal.decodeImageDims(jpeg).contains((64, 48)))
    val resized = Multimodal.resizePng(jpeg, 16, 12) // decode JPEG, emit PNG
    assert(Multimodal.decodeImageDims(resized).contains((16, 12)))
  }

  test("real WAV decode via javax.sound inside the pipeline") {
    import spark.implicits._
    // encode a genuine 16-bit mono WAV: 1000 samples of a known square wave
    def wav(amplitude: Short, n: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = java.nio.ByteBuffer.allocate(n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i =>
        pcm.putShort(if (i % 2 == 0) amplitude else (-amplitude).toShort))
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm.array()), fmt, n),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val blobs = Seq(
      MediaBlob(0L, "audio", wav(16384, 1000)),  // half-scale square wave
      MediaBlob(1L, "audio", wav(0, 500))).toDS() // silence
    val got = blobs.mapPartitions(_.map { b =>
      val Some((rate, frames, rms)) = Multimodal.wavFeatures(b.content)
      (b.media_id, rate, frames, math.rint(rms * 1000) / 1000)
    }).collect().sortBy(_._1)
    assert(got(0) == (0L, 8000f, 1000L, 0.5), s"square wave: ${got(0)}")
    assert(got(1) == (1L, 8000f, 500L, 0.0), s"silence: ${got(1)}")
  }

  test("video frame sampling fans out deterministically") {
    val frames = Multimodal.sampledFrames(
      Multimodal.syntheticMedia(spark, 30), new SyntheticCodec, everyN = 2)
      .collect()
    assert(frames.nonEmpty)
    // only video-kind ids (id % 3 == 2)
    assert(frames.forall(_.getLong(0) % 3 == 2))
  }

  test("animated GIF: real multi-frame container round-trips losslessly") {
    val rows = Multimodal.gifFrames(Multimodal.gifFixtures(spark))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6)))
      .sortBy(t => (t._1, t._4))
    // blob k holds k+2 frames, all flagged as genuine GIF containers
    assert(rows.map(_._1).distinct === Seq(0L, 1L, 2L))
    (0L until 3L).foreach { k =>
      val fs = rows.filter(_._1 == k)
      assert(fs.length == k.toInt + 2, s"blob $k frame count")
      assert(fs.forall(_._3 == k.toInt + 2), s"blob $k container n_frames")
    }
    assert(rows.forall(_._2), "GIF87a/89a magic must hold")
    assert(rows.forall(t => t._5 == 64 && t._6 == 64))
    // GIF is lossless: frame f's aHash is the analytic column mask
    rows.foreach { case (k, _, _, f, _, _, h) =>
      val expected = ((0xffL << (f + 1)) & 0xffL) * 0x0101010101010101L
      assert(h == expected,
        s"blob $k frame $f: got $h expected $expected")
    }
  }

  test("a non-GIF blob yields no frame rows instead of failing the task") {
    import spark.implicits._
    val junk = spark.createDataset(Seq(
      MediaBlob(9L, "video", Array[Byte](1, 2, 3, 4, 5))))
    assert(Multimodal.gifFrames(junk).collect().isEmpty)
  }

  test("MJPEG-AVI: container round-trips through the RIFF demuxer") {
    import graft.multimodal.MjpegAvi
    val frames = (0 until 3).map(f =>
      Multimodal.encodeJpeg(48, 32, (x, _) => if (x >= 16 * f) 255 else 0))
    val avi = MjpegAvi.encode(frames, 48, 32, fps = 5)
    val dec = MjpegAvi.decode(avi)
    assert(dec.isDefined, "well-formed AVI must parse")
    val a = dec.get
    assert(a.totalFrames == 3 && a.width == 48 && a.height == 32)
    assert(a.frames.length == 3)
    // demuxed payloads are byte-identical to the encoded JPEGs
    a.frames.zip(frames).foreach { case (got, exp) =>
      assert(java.util.Arrays.equals(got, exp), "frame payload changed")
    }
    // and each decodes through the real codec at the declared dims
    a.frames.foreach { jpeg =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(img != null && img.getWidth == 48 && img.getHeight == 32)
    }
  }

  test("MJPEG-AVI: malformed bytes decode to None, never throw") {
    import graft.multimodal.MjpegAvi
    assert(MjpegAvi.decode(Array.emptyByteArray).isEmpty)
    assert(MjpegAvi.decode("RIFFxxxxWAVE".getBytes("ASCII")).isEmpty)
    assert(MjpegAvi.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    // truncated mid-chunk: parse stops cleanly, header never found
    val good = MjpegAvi.encode(
      Seq(Multimodal.encodeJpeg(16, 16, (_, _) => 0)), 16, 16)
    assert(MjpegAvi.decode(good.take(20)).isEmpty)
    // crafted deep LIST nesting must hit the depth bound, not the stack
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write("RIFF".getBytes("ASCII"))
    val n = 5000
    val inner = 4 // innermost empty list body
    def sizeAt(level: Int): Int = inner + 12 * (n - 1 - level)
    bomb.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4 + 12 * n).array())
    bomb.write("AVI ".getBytes("ASCII"))
    (0 until n).foreach { i =>
      bomb.write("LIST".getBytes("ASCII"))
      bomb.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(sizeAt(i) + 4).array())
      bomb.write("hdrl".getBytes("ASCII"))
    }
    assert(MjpegAvi.decode(bomb.toByteArray).isEmpty) // and no overflow
    // chunk size near Int.MaxValue: `p + 8 + size` wraps negative in Int
    // arithmetic, bypassing the bound check and reading past the buffer —
    // the guard must compare in Long and return None, not throw
    val wrap = new java.io.ByteArrayOutputStream()
    wrap.write("RIFF".getBytes("ASCII"))
    wrap.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(12).array())
    wrap.write("AVI ".getBytes("ASCII"))
    wrap.write("avih".getBytes("ASCII"))
    wrap.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0x7FFFFFF0).array())
    assert(MjpegAvi.decode(wrap.toByteArray).isEmpty)
  }

  /** Independent ITU-T G.711 u-law encoder (CCITT table, bias 0x84) —
    * written from the standard, NOT from the JDK source, so matching
    * the JDK codec's raw bytes pins both against the spec. */
  private def g711Encode(sIn: Short): Byte = {
    val Bias = 0x84; val Clip = 32635
    var s = sIn.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)).toByte
  }

  test("u-law WAV: JDK codec bytes match an independent G.711 encoder") {
    val samples = Multimodal.ulawSamples(1L)
    val wav = Multimodal.encodeWavUlaw(samples, 8000f)
    // compression is real: 8-bit companded payload, half the PCM size
    assert(wav.length < samples.length * 2)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val raw = in.readAllBytes(); in.close()
    assert(raw.length == samples.length)
    raw.zip(samples).zipWithIndex.foreach { case ((b, s), i) =>
      assert(b == g711Encode(s),
        s"sample $i ($s): jdk=${b & 0xff} ref=${g711Encode(s) & 0xff}")
    }
  }

  /** Independent ITU-T G.711 A-law encoder (CCITT segment table,
    * 13-bit magnitude, 0x55 toggle mask) — written from the standard,
    * NOT from the JDK source, so matching the JDK codec's raw bytes
    * pins both against the spec. */
  private def g711AlawEncode(sIn: Short): Byte = {
    var pcm = sIn.toInt >> 3 // 16 -> 13 bit
    val mask = if (pcm >= 0) 0xD5 else { pcm = -pcm - 1; 0x55 }
    val segEnds = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
    val seg = segEnds.indexWhere(pcm <= _) match {
      case -1 => 8
      case s => s
    }
    if (seg >= 8) (0x7F ^ mask).toByte
    else {
      val mant =
        if (seg < 2) (pcm >> 1) & 0x0F else (pcm >> seg) & 0x0F
      (((seg << 4) | mant) ^ mask).toByte
    }
  }

  test("A-law WAV: JDK codec bytes match an independent G.711 encoder") {
    val samples = Multimodal.alawSamples(1L)
    val wav = Multimodal.encodeWavAlaw(samples, 8000f)
    // compression is real: 8-bit companded payload, half the PCM size
    assert(wav.length < samples.length * 2)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ALAW)
    val raw = in.readAllBytes(); in.close()
    assert(raw.length == samples.length)
    raw.zip(samples).zipWithIndex.foreach { case ((b, s), i) =>
      assert(b == g711AlawEncode(s),
        s"sample $i ($s): jdk=${b & 0xff} ref=${g711AlawEncode(s) & 0xff}")
    }
  }

  test("A-law round trip stays within the ITU-T companding bound") {
    val samples = Multimodal.alawSamples(2L)
    val dec = Multimodal.decodeWavAlaw(
      Multimodal.encodeWavAlaw(samples, 8000f))
    assert(dec.isDefined)
    val (rate, decoded) = dec.get
    assert(rate == 8000f && decoded.length == samples.length)
    val maxErr = decoded.zip(samples).map { case (d, s) =>
      math.abs(d - s) }.max
    assert(maxErr <= 1024, s"G.711 A-law bound violated: $maxErr")
    assert(maxErr > 0, "a lossy codec with zero error means no codec ran")
    // a u-law container is NOT an A-law container (and vice versa)
    assert(Multimodal.decodeWavAlaw(
      Multimodal.encodeWavUlaw(Multimodal.ulawSamples(0L), 8000f)).isEmpty)
    assert(Multimodal.decodeWavUlaw(
      Multimodal.encodeWavAlaw(samples, 8000f)).isEmpty)
  }

  test("IMA ADPCM: quantizer matches hand-derived vectors from the spec") {
    import graft.multimodal.ImaAdpcm
    // samples [0, 100, -100, 5000] from header state (pred=0, idx=0),
    // stepped BY HAND through the published IMA algorithm:
    //  s1=100:  step=7,  diff=100  -> code 0b0111=7;
    //           diffq=0+7+3+1=11,  pred=11,  idx=0+8=8
    //  s2=-100: step=16, diff=-111 -> code 0b1111=15;
    //           diffq=2+16+8+4=30, pred=-19, idx=8+8=16
    //  s3=5000: step=34, diff=5019 -> code 0b0111=7;
    //           diffq=4+34+17+8=63, pred=44, idx=16+8=24
    val wav = ImaAdpcm.encodeWav(Array[Short](0, 100, -100, 5000), 8000)
    val dec = ImaAdpcm.decodeWav(wav)
    assert(dec.isDefined)
    val (rate, decoded) = dec.get
    assert(rate == 8000 && decoded.length == 4)
    assert(decoded.toSeq == Seq[Short](0, 11, -19, 44))
    // the raw nibble stream too: data chunk is the LAST 512 bytes
    // (4-byte block header 00 00 00 00, then low-nibble-first codes)
    val block = wav.takeRight(512)
    assert(block.take(4).toSeq == Seq[Byte](0, 0, 0, 0))
    assert((block(4) & 0xff) == (7 | (15 << 4))) // codes 7, 15
    assert((block(5) & 0x0f) == 7) // code 7
  }

  test("IMA ADPCM: round trip, 4:1 ratio, splittable blocks") {
    import graft.multimodal.ImaAdpcm
    (0L until 3L).foreach { k =>
      val samples = Multimodal.adpcmSamples(k)
      val wav = ImaAdpcm.encodeWav(samples, 8000)
      // compression is real: 4-bit codes, ~4x under 16-bit PCM
      assert(wav.length < samples.length / 2 + 600)
      val Some((rate, decoded)) = ImaAdpcm.decodeWav(wav)
      assert(rate == 8000 && decoded.length == samples.length)
      val maxErr = decoded.zip(samples).map { case (d, s) =>
        math.abs(d - s) }.max
      assert(maxErr <= 1024, s"blob $k tracking bound violated: $maxErr")
      assert(maxErr > 0, "a lossy codec with zero error means no codec ran")
      // block boundaries carry the sample VERBATIM in the header —
      // the property that makes the stream splittable for distributed
      // readers (any block decodes with zero upstream state)
      val spb = ImaAdpcm.samplesPerBlock(ImaAdpcm.BlockAlign)
      (1 to (samples.length - 1) / spb).foreach { blk =>
        assert(decoded(blk * spb) == samples(blk * spb),
          s"block $blk header sample not verbatim")
      }
    }
  }

  test("IMA ADPCM: malformed bytes decode to None, never throw") {
    import graft.multimodal.ImaAdpcm
    assert(ImaAdpcm.decodeWav(Array.emptyByteArray).isEmpty)
    assert(ImaAdpcm.decodeWav(Array.fill[Byte](64)(0x41)).isEmpty)
    // a PCM-family (u-law) WAV is NOT an ADPCM container
    assert(ImaAdpcm.decodeWav(
      Multimodal.encodeWavUlaw(Multimodal.ulawSamples(0L), 8000f)).isEmpty)
    // truncated mid-chunk
    val good = ImaAdpcm.encodeWav(Array[Short](0, 1, 2, 3), 8000)
    assert(ImaAdpcm.decodeWav(good.take(30)).isEmpty)
    // chunk size near Int.MaxValue must fail the Long bound check
    val wrap = new java.io.ByteArrayOutputStream()
    wrap.write("RIFF".getBytes("ASCII"))
    wrap.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(12).array())
    wrap.write("WAVE".getBytes("ASCII"))
    wrap.write("fmt ".getBytes("ASCII"))
    wrap.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0x7FFFFFF0).array())
    assert(ImaAdpcm.decodeWav(wrap.toByteArray).isEmpty)
    // block header carrying step index > 88: malformed, must be None
    // (not zero-padded wrong samples) — poison block 0's index byte,
    // which sits at data-chunk offset + 2
    val wav = ImaAdpcm.encodeWav(
      Array.tabulate(600)(i => (i * 37 % 4001 - 2000).toShort), 8000)
    assert(ImaAdpcm.decodeWav(wav).isDefined)
    val dataAt = (0 until wav.length - 4).find(i =>
      wav(i) == 'd' && wav(i + 1) == 'a' && wav(i + 2) == 't' &&
        wav(i + 3) == 'a').get
    wav(dataAt + 8 + 2) = 99.toByte
    assert(ImaAdpcm.decodeWav(wav).isEmpty,
      "step index 99 must fail the None contract")
  }

  test("u-law round trip stays within the ITU-T companding bound") {
    val samples = Multimodal.ulawSamples(2L)
    val dec = Multimodal.decodeWavUlaw(
      Multimodal.encodeWavUlaw(samples, 8000f))
    assert(dec.isDefined)
    val (rate, decoded) = dec.get
    assert(rate == 8000f && decoded.length == samples.length)
    val maxErr = decoded.zip(samples).map { case (d, s) =>
      math.abs(d - s) }.max
    assert(maxErr <= 1024, s"G.711 bound violated: $maxErr")
    assert(maxErr > 0, "a lossy codec with zero error means no codec ran")
    // a plain PCM wav is NOT a u-law container
    assert(Multimodal.decodeWavUlaw(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("MJPEG-AVI fixture corpus: per-frame analytic masks hold") {
    val rows = Multimodal.aviFrames(Multimodal.aviFixtures(spark))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6)))
      .sortBy(t => (t._1, t._4))
    assert(rows.map(_._1).distinct === Seq(0L, 1L, 2L))
    (0L until 3L).foreach { k =>
      val fs = rows.filter(_._1 == k)
      assert(fs.length == k.toInt + 2, s"blob $k demuxed frame count")
      assert(fs.forall(_._3 == k.toInt + 2), s"blob $k header n_frames")
    }
    assert(rows.forall(_._2), "RIFF/AVI magic must hold")
    assert(rows.forall(t => t._5 == 64 && t._6 == 64))
    rows.foreach { case (k, _, _, f, _, _, h) =>
      val expected = ((0xffL << (f + 1)) & 0xffL) * 0x0101010101010101L
      assert(h == expected, s"blob $k frame $f: got $h expected $expected")
    }
  }
}
