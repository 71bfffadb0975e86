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

  /** In-place iterative radix-2 Cooley–Tukey FFT. Twiddles via StrictMath
    * so the transform is bit-deterministic across JVMs/platforms — the
    * property every other kernel in this tree holds and a distributed
    * retry needs. Lengths must be powers of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0,
      s"fft needs power-of-two equal-length arrays, got ${re.length}/${im.length}")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * StrictMath.PI / len
      val wr = StrictMath.cos(ang)
      val wi = StrictMath.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val er = re(base + k); val ei = im(base + k)
          val or0 = re(base + k + len / 2); val oi = im(base + k + len / 2)
          val tr = or0 * cr - oi * ci
          val ti = or0 * ci + oi * cr
          re(base + k) = er + tr; im(base + k) = ei + ti
          re(base + k + len / 2) = er - tr; im(base + k + len / 2) = ei - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Mean power spectrum of channel-0 over consecutive non-overlapping
    * `frame`-sample windows (rectangular window — exact-bin tones with an
    * integer number of cycles per frame land in ONE bin, which is what
    * makes the feature closed-form replayable): `frame / 2` bins, bin k
    * centered at `k * sampleRate / frame` Hz. Empty/short audio → all
    * zeros, zero windows.
    */
  def powerSpectrum(a: Audio, frame: Int): (Array[Double], Int) = {
    require(frame >= 2 && (frame & (frame - 1)) == 0,
      s"frame must be a power of two >= 2, got $frame")
    val bins = new Array[Double](frame / 2)
    val frames = a.frames
    val windows = frames / frame
    if (windows == 0) return (bins, 0)
    val re = new Array[Double](frame)
    val im = new Array[Double](frame)
    var w = 0
    while (w < windows) {
      var i = 0
      while (i < frame) {
        re(i) = a.samples((w * frame + i) * a.channels).toDouble / 32768.0
        im(i) = 0.0
        i += 1
      }
      fft(re, im)
      var k = 0
      while (k < frame / 2) {
        bins(k) += (re(k) * re(k) + im(k) * im(k)) / windows
        k += 1
      }
      w += 1
    }
    (bins, windows)
  }

  /** Spectral features from [[powerSpectrum]]: the dominant non-DC bin's
    * center frequency and the power-weighted spectral centroid, both in
    * Hz. (0, 0) when no full analysis window fits.
    */
  def spectralFeatures(a: Audio, frame: Int): SpectralFeatures = {
    val (bins, windows) = powerSpectrum(a, frame)
    if (windows == 0) return SpectralFeatures(0.0, 0.0, 0)
    var best = 1
    var k = 2
    while (k < bins.length) {
      if (bins(k) > bins(best)) best = k
      k += 1
    }
    var pow = 0.0
    var wsum = 0.0
    k = 1
    while (k < bins.length) {
      pow += bins(k)
      wsum += bins(k) * k
      k += 1
    }
    val hz = a.sampleRate.toDouble / frame
    SpectralFeatures(best * hz,
      if (pow == 0.0) 0.0 else wsum / pow * hz, windows)
  }

  final case class SpectralFeatures(dominantHz: Double, centroidHz: Double,
      windows: Int)

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
