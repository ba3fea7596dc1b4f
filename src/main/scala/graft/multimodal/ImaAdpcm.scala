package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** IMA/DVI ADPCM (4-bit adaptive differential PCM, 4:1 compression) —
  * implemented FROM THE PUBLISHED STANDARD (IMA "Recommended Practices
  * for Enhancing Digital Audio Compatibility", rev 3.00, 1992; the
  * step/index tables and quantizer are reproduced in RFC 3551 §4.5.1
  * and the multimedia-registration WAVE format docs for tag 0x0011).
  *
  * This extends the engine's REAL-codec surface past the JDK-native
  * set (PNG/JPEG/GIF/MJPEG-AVI via ImageIO, G.711 u-law/A-law via
  * javax.sound): the JDK ships NO ADPCM codec, so both the encoder and
  * decoder here are written from the spec. With no independent JDK
  * twin to byte-match, MultimodalSpec pins the quantizer against
  * hand-derived analytic vectors (codes computed by hand from the
  * published algorithm) plus round-trip, 4:1-ratio, and
  * block-independence properties.
  *
  * Container: canonical WAVE with format tag 0x0011 — 20-byte fmt
  * chunk (cbSize = 2, wSamplesPerBlock extra field), a fact chunk
  * carrying the true sample count, and block-aligned data where each
  * block opens with a 4-byte state header (predictor:int16,
  * step index:uint8, reserved:0) followed by two 4-bit codes per byte,
  * LOW nibble first. Every block is independently decodable — the
  * property that makes ADPCM data SPLITTABLE for a distributed reader
  * (a task can start at any block boundary without upstream state).
  */
object ImaAdpcm {

  /** IMA step-size table (89 entries, spec values verbatim). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index-adjustment table for the 3 magnitude bits of each code. */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Default block size in bytes: 4-byte header + 508 code bytes =
    * 1017 samples per mono block (header carries sample 0 verbatim). */
  val BlockAlign = 512

  def samplesPerBlock(blockAlign: Int): Int = (blockAlign - 4) * 2 + 1

  private def clamp16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  private def clampIndex(i: Int): Int =
    if (i > 88) 88 else if (i < 0) 0 else i

  /** Quantizer state threaded through encode/decode — the encoder
    * tracks the DECODER's reconstruction (standard ADPCM discipline:
    * predict from what the decoder will see, not from the input). */
  final private class State(var predictor: Int, var index: Int) {
    /** Dequantize `code` and advance state; returns the new predictor. */
    def decodeStep(code: Int): Int = {
      val step = StepTable(index)
      // diffq = (step/8) + (b2)*step + (b1)*step/2 + (b0)*step/4,
      // in integer arithmetic exactly as the spec lays it out
      var diffq = step >> 3
      if ((code & 4) != 0) diffq += step
      if ((code & 2) != 0) diffq += step >> 1
      if ((code & 1) != 0) diffq += step >> 2
      predictor =
        if ((code & 8) != 0) clamp16(predictor - diffq)
        else clamp16(predictor + diffq)
      index = clampIndex(index + IndexTable(code & 7))
      predictor
    }

    /** Quantize `sample` against the current state, advance the state
      * through [[decodeStep]], return the 4-bit code. */
    def encodeStep(sample: Int): Int = {
      val step = StepTable(index)
      var diff = sample - predictor
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      if (diff >= step) { code |= 4; diff -= step }
      if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) code |= 1
      decodeStep(code)
      code
    }
  }

  /** Encode 16-bit mono PCM into block-aligned IMA ADPCM payload
    * (headers included). Each block RESTARTS state from its own header
    * (predictor = that block's first sample, index carried over), so
    * blocks decode independently. */
  private def encodeBlocks(samples: Array[Short], blockAlign: Int)
      : Array[Byte] = {
    val spb = samplesPerBlock(blockAlign)
    val nBlocks = (samples.length + spb - 1) / spb
    val out = ByteBuffer.allocate(nBlocks * blockAlign)
      .order(ByteOrder.LITTLE_ENDIAN)
    var index = 0
    var s = 0
    while (s < samples.length) {
      val n = math.min(spb, samples.length - s)
      // block header: first sample verbatim + current step index
      val first = samples(s).toInt
      out.putShort(first.toShort)
      out.put(index.toByte)
      out.put(0.toByte)
      val st = new State(first, index)
      var i = 1
      var lowNibble = -1
      while (i < spb) {
        // missing tail samples of a short final block repeat the last
        // real sample (decoders stop at the fact-chunk count anyway)
        val sample =
          if (i < n) samples(s + i).toInt else st.predictor
        val code = st.encodeStep(sample)
        if (lowNibble < 0) lowNibble = code
        else { out.put((lowNibble | (code << 4)).toByte); lowNibble = -1 }
        i += 1
      }
      if (lowNibble >= 0) out.put(lowNibble.toByte)
      index = st.index // carry the adapted index into the next block
      s += spb
    }
    out.array()
  }

  /** Decode block-aligned IMA ADPCM payload back to `nSamples` 16-bit
    * mono PCM samples; None when a block header is malformed (step
    * index past the table end), so [[decodeWav]]'s "None unless
    * well-formed" contract holds instead of silently emitting
    * zero-padded wrong samples. */
  private def decodeBlocks(
      data: Array[Byte], blockAlign: Int,
      nSamples: Int): Option[Array[Short]] = {
    val spb = samplesPerBlock(blockAlign)
    val out = new Array[Short](nSamples)
    var s = 0
    var b = 0
    while (s < nSamples && b + blockAlign <= data.length) {
      val bb = ByteBuffer.wrap(data, b, blockAlign)
        .order(ByteOrder.LITTLE_ENDIAN)
      val st = new State(bb.getShort.toInt, bb.get & 0xff)
      bb.get // reserved
      if (st.index > 88) return None // malformed block header
      out(s) = st.predictor.toShort
      var i = 1
      while (i < spb && s + i < nSamples) {
        val byte = bb.get(b + 4 + ((i - 1) >> 1)) & 0xff
        val code = if ((i & 1) == 1) byte & 0x0f else byte >> 4
        out(s + i) = st.decodeStep(code).toShort
        i += 1
      }
      s += spb
      b += blockAlign
    }
    Some(out)
  }

  /** Encode 16-bit mono PCM as a canonical IMA-ADPCM WAV (format tag
    * 0x0011, fmt cbSize 2 with wSamplesPerBlock, fact chunk). */
  def encodeWav(samples: Array[Short], rate: Int,
      blockAlign: Int = BlockAlign): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign must be >= 8 and word-aligned, got $blockAlign")
    val payload = encodeBlocks(samples, blockAlign)
    val spb = samplesPerBlock(blockAlign)
    val byteRate = (rate.toLong * blockAlign / spb).toInt
    val riffLen = 4 + (8 + 20) + (8 + 4) + (8 + payload.length)
    val out = ByteBuffer.allocate(8 + riffLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("ASCII"))
    out.put("fmt ".getBytes("ASCII")).putInt(20)
      .putShort(0x0011) // WAVE_FORMAT_IMA_ADPCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(byteRate)
      .putShort(blockAlign.toShort)
      .putShort(4) // bits per sample
      .putShort(2) // cbSize
      .putShort(spb.toShort)
    out.put("fact".getBytes("ASCII")).putInt(4).putInt(samples.length)
    out.put("data".getBytes("ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  /** Decode an IMA-ADPCM WAV; None unless it is a well-formed mono
    * format-0x0011 container (never throws on arbitrary bytes). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def cc(at: Int) =
      if (at + 4 <= bytes.length) new String(bytes, at, 4, "ASCII") else ""
    if (cc(0) != "RIFF" || cc(8) != "WAVE") return None
    var p = 12
    var fmt: Option[(Int, Int, Int)] = None // rate, blockAlign, spb
    var fact = -1
    var data: Option[(Int, Int)] = None // offset, length
    while (p + 8 <= bytes.length) {
      val id = cc(p)
      val size = bb.getInt(p + 4)
      if (size < 0 || p.toLong + 8L + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 20) return None
          val tag = bb.getShort(p + 8) & 0xffff
          val channels = bb.getShort(p + 10) & 0xffff
          if (tag != 0x0011 || channels != 1) return None
          val rate = bb.getInt(p + 12)
          val blockAlign = bb.getShort(p + 20) & 0xffff
          val spb = bb.getShort(p + 26) & 0xffff
          if (blockAlign < 8 || spb != samplesPerBlock(blockAlign))
            return None
          fmt = Some((rate, blockAlign, spb))
        case "fact" =>
          if (size < 4) return None
          fact = bb.getInt(p + 8)
        case "data" => data = Some((p + 8, size))
        case _ => ()
      }
      p += 8 + size + (size % 2)
    }
    for {
      (rate, blockAlign, spb) <- fmt
      (off, len) <- data
      if fact >= 0 && len % blockAlign == 0 &&
        fact <= (len / blockAlign).toLong * spb
      pcm <- decodeBlocks(
        java.util.Arrays.copyOfRange(bytes, off, off + len),
        blockAlign, fact)
    } yield (rate, pcm)
  }
}
