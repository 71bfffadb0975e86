package newspipe.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec for the multimodal kernels — closes the "compressed
  * formats are stubs" gap for PNG without any codec library: the container
  * is public (RFC 2083), and the JDK ships the only hard part (zlib, via
  * `java.util.zip.Inflater`/`Deflater`).
  *
  * Decode accepts the still-image baseline: 8-bit depth, color types 0
  * (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, with all five
  * standard scanline filters (None/Sub/Up/Average/Paeth). Output is the same
  * [[Ppm.Image]] RGB surface the PPM path produces (gray replicated, alpha
  * dropped), so every downstream kernel — resize, luminance features —
  * works on PNG payloads unchanged. Anything else (palette/16-bit/interlace,
  * any parse or inflate failure, oversized rasters) returns None and callers
  * fall back to their stub path — a payload is never half-decoded.
  *
  * Encode writes 8-bit RGB (color type 2), filter 0, one IDAT — a valid
  * baseline PNG any reader accepts.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Strict baseline parse; None on anything not a complete supported PNG. */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = {
    if (bytes == null || bytes.length < Signature.length + 25) return None
    var k = 0
    while (k < Signature.length) {
      if (bytes(k) != Signature(k)) return None
      k += 1
    }
    try decodeChunks(bytes) catch { case _: Exception => None }
  }

  private def decodeChunks(bytes: Array[Byte]): Option[Ppm.Image] = {
    var i = Signature.length
    var width, height, colorType = -1
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (i + 8 > bytes.length) return None
      val len = be32(bytes, i)
      if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length) return None
      val ctype = new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val dataOff = i + 8
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(bytes, dataOff).toInt
          height = be32(bytes, dataOff + 4).toInt
          val bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val compression = bytes(dataOff + 10) & 0xff
          val filter = bytes(dataOff + 11) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (width <= 0 || height <= 0 || bitDepth != 8 || compression != 0 ||
            filter != 0 || interlace != 0 ||
            !(colorType == 0 || colorType == 2 || colorType == 4 || colorType == 6))
            return None
        case "IDAT" => idat.write(bytes, dataOff, len.toInt)
        case "IEND" => seenIend = true
        case _ => // ancillary chunk (tEXt, pHYs, …) — skip
      }
      i = dataOff + len.toInt + 4 // skip CRC (not validated; zlib adler catches corruption)
    }
    if (width < 0 || colorType < 0) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    val stride = width.toLong * channels
    val rawLen = (stride + 1) * height
    if (rawLen > Int.MaxValue || width.toLong * height * 3 > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // 0 bytes while unfinished = truncated input or preset-dictionary
        // stream — both unsupported
        if (n == 0 && !inf.finished()) return None
        off += n
      }
      if (off != raw.length) return None
    } finally inf.end()
    defilter(raw, width, height, channels)
    // channel conversion → RGB
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    var src = 0
    var dst = 0
    while (y < height) {
      src += 1 // skip the (already-applied) filter byte
      var x = 0
      while (x < width) {
        colorType match {
          case 0 =>
            val g = raw(src); rgb(dst) = g; rgb(dst + 1) = g; rgb(dst + 2) = g
            src += 1
          case 2 =>
            rgb(dst) = raw(src); rgb(dst + 1) = raw(src + 1); rgb(dst + 2) = raw(src + 2)
            src += 3
          case 4 =>
            val g = raw(src); rgb(dst) = g; rgb(dst + 1) = g; rgb(dst + 2) = g
            src += 2 // alpha dropped
          case 6 =>
            rgb(dst) = raw(src); rgb(dst + 1) = raw(src + 1); rgb(dst + 2) = raw(src + 2)
            src += 4 // alpha dropped
        }
        dst += 3
        x += 1
      }
      y += 1
    }
    Some(Ppm.Image(width, height, rgb))
  }

  /** In-place scanline defilter (PNG spec §6): raw holds height rows of
    * [filterByte, stride pixel bytes]; after this, pixel bytes are absolute.
    */
  private def defilter(raw: Array[Byte], width: Int, height: Int, channels: Int): Unit = {
    val stride = width * channels
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      val px = rowOff + 1
      val prevPx = px - (stride + 1)
      var x = 0
      filter match {
        case 0 => // None
        case 1 => // Sub: + left
          x = channels
          while (x < stride) {
            raw(px + x) = (raw(px + x) + raw(px + x - channels)).toByte; x += 1
          }
        case 2 => // Up: + above
          if (y > 0) {
            while (x < stride) { raw(px + x) = (raw(px + x) + raw(prevPx + x)).toByte; x += 1 }
          }
        case 3 => // Average: + floor((left + above) / 2)
          while (x < stride) {
            val a = if (x >= channels) raw(px + x - channels) & 0xff else 0
            val b = if (y > 0) raw(prevPx + x) & 0xff else 0
            raw(px + x) = (raw(px + x) + ((a + b) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth predictor
          while (x < stride) {
            val a = if (x >= channels) raw(px + x - channels) & 0xff else 0
            val b = if (y > 0) raw(prevPx + x) & 0xff else 0
            val c = if (x >= channels && y > 0) raw(prevPx + x - channels) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(px + x) = (raw(px + x) + pred).toByte
            x += 1
          }
        case _ => throw new IllegalArgumentException(s"unknown PNG filter $filter")
      }
      y += 1
    }
  }

  /** 8-bit RGB, filter 0, single IDAT. */
  def encode(img: Ppm.Image): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // filter byte 0 already zero-initialized
      System.arraycopy(img.rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val def_ = new Deflater()
    val compressed = try {
      def_.setInput(raw); def_.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!def_.finished()) out.write(buf, 0, def_.deflate(buf))
      out.toByteArray
    } finally def_.end()
    val ihdr = new Array[Byte](13)
    def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    putBe32(ihdr, 0, img.width); putBe32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type RGB; rest zero
    val out = new java.io.ByteArrayOutputStream(compressed.length + 64)
    out.write(Signature, 0, Signature.length)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val lenB = new Array[Byte](4); putBe32(lenB, 0, data.length)
      out.write(lenB, 0, 4)
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      val crcB = new Array[Byte](4); putBe32(crcB, 0, crc.getValue.toInt)
      out.write(crcB, 0, 4)
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", compressed)
    chunk("IEND", Array.empty)
    out.toByteArray
  }
}
