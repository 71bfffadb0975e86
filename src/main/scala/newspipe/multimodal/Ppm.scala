package newspipe.multimodal

/** Pure-JVM binary PPM (P6) codec — the uncompressed RGB interchange format
  * (netpbm). No codec libraries exist in this image, but P6 needs none: the
  * format is an ASCII header (`P6`, width, height, maxval, `#` comments
  * allowed between tokens) followed by `width*height*3` raw bytes. This
  * gives the multimodal operators a REAL decode → transform → re-encode
  * path for uncompressed images; compressed formats (png/jpeg) and av
  * containers remain the documented stubs.
  *
  * Only `maxval = 255` (the common 8-bit case) is accepted — anything else
  * (or any parse failure) returns None and callers fall back to their stub
  * path, so a payload is never half-decoded.
  */
object Ppm {

  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width*$height*3")
  }

  /** Strict P6 parse; None on anything that is not a complete 8-bit P6. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 9 ||
      bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && i < bytes.length) {
        val c = bytes(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else going = false
      }
    }
    def token(): Option[Int] = {
      skipSpaceAndComments()
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- token()
      h <- token()
      maxval <- token()
      if maxval == 255 && w > 0 && h > 0
      // exactly ONE whitespace byte separates header from raster
      if i < bytes.length && (bytes(i) == '\n' || bytes(i) == ' ' ||
        bytes(i) == '\t' || bytes(i) == '\r')
      need = w.toLong * h * 3
      if need <= Int.MaxValue && bytes.length - (i + 1) >= need
    } yield Image(w, h,
      java.util.Arrays.copyOfRange(bytes, i + 1, i + 1 + need.toInt))
  }

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor resample — deterministic, engine-replayable (source
    * pixel of output (x,y) is floor(x·w/nw), floor(y·h/nh)).
    */
  def resizeNearest(img: Image, nw: Int, nh: Int): Image = {
    require(nw > 0 && nh > 0, s"target dims must be positive, got ${nw}x$nh")
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * img.height / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * img.width / nw).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * nw + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(nw, nh, out)
  }

  /** Per-band mean luminance feature (Rec.601 weights), `dim` horizontal
    * bands, L2-normalized — a real spatial image feature for decoded
    * payloads.
    */
  def bandLuminance(img: Image, dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    val counts = new Array[Int](dim)
    var y = 0
    while (y < img.height) {
      // long arithmetic: y * dim overflows Int for the tall-thin images
      // decode() legitimately accepts (1 x 200M is a valid ~600 MB P6)
      val band = math.min(dim - 1, (y.toLong * dim / img.height).toInt)
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val lum = 0.299f * (img.rgb(s) & 0xff) + 0.587f * (img.rgb(s + 1) & 0xff) +
          0.114f * (img.rgb(s + 2) & 0xff)
        f(band) += lum / 255.0f
        counts(band) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { if (counts(i) > 0) f(i) /= counts(i); i += 1 }
    val norm = math.sqrt(f.map(v => v.toDouble * v).sum).toFloat
    if (norm == 0f) f else f.map(_ / norm)
  }
}
