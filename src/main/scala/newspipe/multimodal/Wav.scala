package newspipe.multimodal

import java.io.{BufferedInputStream, ByteArrayInputStream,
  ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

/** WAV PCM decode / resample / re-encode via the JDK's own
  * `javax.sound.sampled` — headless, zero extra dependencies, the exact
  * precedent [[Jpeg]] set with `javax.imageio`. This makes the AUDIO
  * column family real end-to-end: [[Media.resampleAudio]] parses the
  * container, transforms genuine samples and re-encodes, instead of the
  * earlier byte-slice stub (mp4 video remains the one documented stub —
  * the JDK truly ships no codec there).
  *
  * Samples are normalized to 16-bit signed PCM on decode (the JDK
  * converts 8/24/32-bit and unsigned variants), interleaved by channel —
  * the shape every waveform kernel (RMS windows, resample) works on.
  */
object Wav {

  /** Decoded waveform: interleaved 16-bit samples, `samples.length =
    * frames * channels`.
    */
  final case class Audio(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else frames * 1000L / sampleRate
  }

  /** None for anything the JDK's WAV reader rejects (our caller then
    * falls to its documented stub path, same contract as image decode).
    */
  def decode(bytes: Array[Byte]): Option[Audio] =
    try {
      val src = AudioSystem.getAudioInputStream(
        new BufferedInputStream(new ByteArrayInputStream(bytes)))
      try {
        val f = src.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        val pcm =
          if (f.matches(target)) src
          else AudioSystem.getAudioInputStream(target, src)
        val raw = readAll(pcm)
        val n = raw.length / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some(Audio(math.round(f.getSampleRate), f.getChannels, out))
      } finally src.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }

  /** 16-bit little-endian PCM WAVE container. */
  def encode(a: Audio): Array[Byte] = {
    val raw = new Array[Byte](a.samples.length * 2)
    var i = 0
    while (i < a.samples.length) {
      raw(2 * i) = (a.samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((a.samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(a.sampleRate.toFloat, 16, a.channels,
      true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt,
      a.frames.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** Nearest-frame resample (deterministic integer math, so an external
    * oracle can replay it): output frame `i` copies source frame
    * `floor(i * srcRate / dstRate)`, all channels. `outFrames =
    * floor(frames * dstRate / srcRate)`. Never interpolates — closed-form
    * over the input samples, the property the q147 contract needs.
    */
  def resample(a: Audio, targetRate: Int): Audio = {
    require(targetRate > 0, "targetRate must be positive")
    if (targetRate == a.sampleRate) return a
    if (a.frames == 0) return a.copy(sampleRate = targetRate)
    val outFrames =
      (a.frames.toLong * targetRate / a.sampleRate).toInt
    val out = new Array[Short](outFrames * a.channels)
    var i = 0
    while (i < outFrames) {
      val src = (i.toLong * a.sampleRate / targetRate).toInt
      var c = 0
      while (c < a.channels) {
        out(i * a.channels + c) = a.samples(src * a.channels + c)
        c += 1
      }
      i += 1
    }
    Audio(targetRate, a.channels, out)
  }

  /** Per-window RMS over channel 0 — `dim` equal frame windows, the audio
    * sibling of [[Ppm.bandLuminance]] (a real spatial/temporal feature,
    * not a byte histogram).
    */
  def rmsWindows(a: Audio, dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    val frames = a.frames
    if (frames == 0) return f
    var w = 0
    while (w < dim) {
      val lo = (w.toLong * frames / dim).toInt
      val hi = math.max(lo + 1, ((w + 1).toLong * frames / dim).toInt)
      var s = 0.0
      var i = lo
      while (i < hi) {
        val v = a.samples(i * a.channels).toDouble / 32768.0
        s += v * v
        i += 1
      }
      f(w) = math.sqrt(s / (hi - lo)).toFloat
      w += 1
    }
    f
  }

  private def readAll(in: AudioInputStream): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) bos.write(buf, 0, n)
      n = in.read(buf)
    }
    bos.toByteArray
  }
}
