package graft.multimodal

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** REAL audio decode behind the [[Multimodal.MediaCodec]] boundary,
  * built entirely on the JDK's `javax.sound.sampled` (ships in Java 17 —
  * no external codec): claims RIFF/WAVE-magic payloads and decodes PCM
  * WAV (8-bit unsigned, 16/24/32-bit signed, mono or multichannel,
  * either endianness) into the same 8-dim feature shape
  * [[Multimodal.pixelFeatures]] produces for images:
  *
  *   f0  mean signed amplitude mapped to [0,1] ((mean+1)/2; 0.5 = silence)
  *   f1  RMS amplitude in [0,1]
  *   f2  peak |amplitude| in [0,1]
  *   f3  zero-crossing rate of the mono mix (sign flips / sample pairs)
  *   f4  mean |sample-to-sample delta| of the mono mix / 2 (in [0,1])
  *   f5  channels/(channels+1) (the aspect analog: 0.5 mono, 2/3 stereo)
  *   f6  log10(1 + sampleRate) / 6 (unit scale up to 1 MHz)
  *   f7  log10(1 + frameCount) / 9 (unit scale up to 1e9 frames)
  *
  * Exact on synthetic signals by construction: a constant +0.5 signal
  * reads f0=0.75, f1=f2=0.5, f3=f4=0 — impossible for the byte-hash stub
  * to fake, pinned in ExtensionsSpec on WAVs generated through the same
  * JDK writer a deployment would read with.
  *
  * Corrupt/truncated payloads whose magic still claims fail SOFT to the
  * documented stub feature ([[Multimodal.stubDecode]], dims None) — the
  * same fail-soft contract the imageio path has for truncated images, so
  * adding this codec to [[Multimodal.defaultCodecs]] changes NO existing
  * output: undecodable payloads produce byte-identical rows to the
  * codec-less build (spec-pinned; the `mm_decode_features` digest is
  * unchanged because utf-8 payloads never carry the RIFF magic).
  *
  * Scale: decode is per-row bounded by payload size, no shared state —
  * the object ships to executors in the mapPartitions closure like any
  * codec. Compressed WAV variants (A-law/µ-law/float) that
  * `AudioSystem` exposes only via conversion are routed through
  * `getAudioInputStream(targetFormat, in)` to 16-bit signed PCM first.
  */
object WavCodec extends Multimodal.MediaCodec {
  val name = "wav-jdk"

  /** RIFF....WAVE magic — definitive for the container, cheap (12 bytes). */
  def claims(mediaType: String, p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  def decode(mediaType: String, payload: Array[Byte]): Multimodal.Decoded =
    try decodePcm(payload)
    catch { case _: Exception => // truncated/corrupt/unsupported payload:
      // the documented stub boundary, same as the codec-less build
      Multimodal.Decoded(None, None, Multimodal.stubDecode(payload))
    }

  private def decodePcm(payload: Array[Byte]): Multimodal.Decoded = {
    val raw = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val enc = raw.getFormat.getEncoding
    // non-PCM WAV payloads (A-law/µ-law/float): convert to 16-bit
    // signed PCM through the JDK's own conversion chain
    val in =
      if (enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED) raw
      else {
        val f = raw.getFormat
        AudioSystem.getAudioInputStream(new AudioFormat(
          f.getSampleRate, 16, f.getChannels, true, false), raw)
      }
    try {
      val fmt = in.getFormat
      val channels = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val bytesPer = (bits + 7) / 8
      val frameSize = bytesPer * channels
      val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      val bigEndian = fmt.isBigEndian
      require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
        s"unsupported PCM width $bits")
      val data = in.readAllBytes()
      val frames = data.length / frameSize
      val half = (1L << (bits - 1)).toDouble

      // one-pass stats over the mono mix (mean of channels per frame)
      var sum, sumSq, sumDelta = 0.0
      var peak = 0.0
      var crossings = 0L
      var prevMix = 0.0
      var f = 0
      while (f < frames) {
        var mix = 0.0
        var c = 0
        while (c < channels) {
          val off = f * frameSize + c * bytesPer
          var v = 0L
          var b = 0
          while (b < bytesPer) {
            val idx = if (bigEndian) off + b else off + (bytesPer - 1 - b)
            v = (v << 8) | (data(idx) & 0xffL)
            b += 1
          }
          // sign-extend signed samples; recenter unsigned ones
          val s =
            if (unsigned) (v - half) / half
            else {
              val shift = 64 - bits
              ((v << shift) >> shift) / half
            }
          mix += s
          peak = math.max(peak, math.abs(s))
          c += 1
        }
        mix /= channels
        sum += mix
        sumSq += mix * mix
        if (f > 0) {
          sumDelta += math.abs(mix - prevMix)
          if ((prevMix < 0) != (mix < 0)) crossings += 1
        }
        prevMix = mix
        f += 1
      }
      val inv = if (frames > 0) 1.0 / frames else 0.0
      val nPairs = math.max(1L, frames - 1L)
      val feature = Array(
        ((sum * inv + 1.0) / 2.0).toFloat,
        math.sqrt(sumSq * inv).toFloat,
        peak.toFloat,
        (crossings.toDouble / nPairs).toFloat,
        (sumDelta / nPairs / 2.0).toFloat,
        (channels.toDouble / (channels + 1)).toFloat,
        (math.log10(1.0 + fmt.getSampleRate) / 6.0).toFloat,
        (math.log10(1.0 + frames) / 9.0).toFloat)
      Multimodal.Decoded(None, None, feature)
    } finally in.close()
  }
}
