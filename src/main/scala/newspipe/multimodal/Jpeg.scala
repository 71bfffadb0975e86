package newspipe.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Baseline JPEG decode/encode via the JDK's own `javax.imageio` (headless,
  * zero extra dependencies) — the container 100 TB image corpora actually
  * arrive in. Signature-dispatched like [[Ppm]]/[[Png]]: only payloads
  * opening with the SOI marker (`FF D8`) are attempted, so the dispatch
  * chain stays O(2 bytes) for non-JPEG payloads. JPEG is LOSSY: a
  * round-trip preserves dimensions exactly and pixel values approximately
  * — codec pins assert a per-channel tolerance, not the bit-equality the
  * lossless PPM/PNG legs get.
  */
object Jpeg {

  def looksLikeJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  /** JPEG bytes → packed-RGB [[Ppm.Image]]; None when the payload is not a
    * JPEG or does not decode. Pixel access goes through `getRGB`, so any
    * source color model (grayscale, YCbCr, CMYK-converted) lands in sRGB.
    */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = {
    if (!looksLikeJpeg(bytes)) return None
    val buf =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (buf == null) None
    else {
      val w = buf.getWidth
      val h = buf.getHeight
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = buf.getRGB(x, y)
          rgb(i) = ((px >> 16) & 0xff).toByte
          rgb(i + 1) = ((px >> 8) & 0xff).toByte
          rgb(i + 2) = (px & 0xff).toByte
          x += 1
          i += 3
        }
        y += 1
      }
      Some(Ppm.Image(w, h, rgb))
    }
  }

  /** Packed RGB → baseline JPEG at `quality` (default 0.95 — tight enough
    * that solid-color fields round-trip within a few code values).
    */
  def encode(img: Ppm.Image, quality: Float = 0.95f): Array[Byte] = {
    val buf = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    var i = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        buf.setRGB(x, y, ((img.rgb(i) & 0xff) << 16) |
          ((img.rgb(i + 1) & 0xff) << 8) | (img.rgb(i + 2) & 0xff))
        x += 1
        i += 3
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(buf, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }
}
