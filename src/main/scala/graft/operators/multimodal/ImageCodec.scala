package graft.operators.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec on the JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP
  * readers and the PNG writer ship with every JVM — no external library).
  * This is the production half of the codec seam: [[Multimodal]] sniffs
  * each blob's magic bytes and routes real containers here, everything
  * else to the clearly-marked synthetic [[Multimodal.FakeCodec]].
  *
  * Reference scope: the reference has no media surface at all (walex is
  * CDC-only); this family is the brief's LLM-pipeline extension. Decode
  * semantics are the standard ones a training pipeline needs: header
  * probe (dimensions without full pixel decode where the reader allows),
  * frame access, nearest-neighbor resample, and a fixed-width luminance
  * histogram as the stand-in feature vector.
  *
  * Thread-safety/scale: every method is stateless over its arguments;
  * `ImageIO` disk caching is disabled once per JVM so executor threads
  * never contend on a temp-file cache. All work is per-row inside
  * `mapPartitions` — narrow map, no shuffle, parquet split parallelism.
  */
object ImageCodec {

  ImageIO.setUseCache(false)

  /** Container from magic bytes (None = not a known image container).
    * PNG: 89 50 4E 47; JPEG: FF D8 FF; GIF: "GIF8"; BMP: "BM".
    */
  def sniff(blob: Array[Byte]): Option[String] = {
    if (blob == null) return None
    def b(i: Int) = blob(i) & 0xFF
    if (blob.length >= 8 && b(0) == 0x89 && b(1) == 0x50 && b(2) == 0x4E &&
      b(3) == 0x47) Some("png")
    else if (blob.length >= 3 && b(0) == 0xFF && b(1) == 0xD8 && b(2) == 0xFF)
      Some("jpeg")
    else if (blob.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') Some("gif")
    else if (blob.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else None
  }

  /** Decode frame `idx` (0 for single-frame formats). None when the blob
    * is not a decodable image — the seam then falls back synthetic, so a
    * corrupt blob degrades instead of failing the partition.
    */
  def decodeFrame(blob: Array[Byte], idx: Int): Option[BufferedImage] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val r = readers.next()
      try { r.setInput(in, false, true); Some(r.read(idx)) }
      catch { case _: Exception => None }
      finally r.dispose()
    } finally in.close()
  }

  def decode(blob: Array[Byte]): Option[BufferedImage] = decodeFrame(blob, 0)

  /** Decode several frames in ONE pass over the container (one reader,
    * one input stream): what per-media frame sampling needs — calling
    * [[decodeFrame]] per index would re-parse the whole container per
    * frame, O(frames²) for an animation. `indices` must be ascending;
    * unreadable frames yield None in place.
    */
  def decodeFrames(blob: Array[Byte], indices: Seq[Int]): Seq[Option[BufferedImage]] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return indices.map(_ => None)
      val r = readers.next()
      try {
        r.setInput(in, false, true)
        indices.map { i => try Some(r.read(i)) catch { case _: Exception => None } }
      } finally r.dispose()
    } finally in.close()
  }

  /** Header probe: dimensions via the reader's header path (`getWidth`
    * does not decode pixels for the JDK readers) and the real frame count
    * (GIF animations report every frame; PNG/JPEG report 1).
    */
  def probe(blob: Array[Byte]): Option[Multimodal.FakeCodec.Meta] =
    sniff(blob).flatMap { codec =>
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(in, false, true)
          val n = try math.max(1, r.getNumImages(true)) catch { case _: Exception => 1 }
          Some(Multimodal.FakeCodec.Meta(r.getWidth(0), r.getHeight(0), n, codec))
        } catch { case _: Exception => None }
        finally r.dispose()
      } finally in.close()
    }

  /** Nearest-neighbor resample: dst pixel (x,y) = src pixel
    * (x*srcW/dstW, y*srcH/dstH) — the 2-D form of the synthetic codec's
    * 1-D index arithmetic, on real pixels.
    */
  def resizeNN(img: BufferedImage, dstW: Int, dstH: Int): BufferedImage = {
    val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * img.getHeight / dstH).toInt
      var x = 0
      while (x < dstW) {
        out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / dstW).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Packed row-major RGB bytes (3 per pixel) — the resize/frame payload. */
  def rgbBytes(img: BufferedImage): Array[Byte] = {
    val out = new Array[Byte]((img.getWidth * img.getHeight * 3).toInt)
    var i = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        out(i) = ((p >> 16) & 0xFF).toByte
        out(i + 1) = ((p >> 8) & 0xFF).toByte
        out(i + 2) = (p & 0xFF).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Integer ITU-R 601 luma, exactly `(299r + 587g + 114b) / 1000` —
    * kept in integer arithmetic so the mm06 oracle can re-derive it in
    * SQL bit-for-bit.
    */
  def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** 16-bucket luminance histogram (bucket = luma / 16): the real-pixel
    * analogue of the synthetic byte histogram, same shape downstream.
    */
  def lumaHistogram16(img: BufferedImage): Array[Long] = {
    val h = new Array[Long](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { h(luma(img.getRGB(x, y)) >> 4) += 1L; x += 1 }
      y += 1
    }
    h
  }

  /** Deterministic PNG: pixel (x,y) = `px(x,y)` packed 0xRRGGBB. PNG is
    * lossless, so decode returns these exact pixels — the mm06 round-trip
    * fixture generator (and the spec's).
    */
  def encodePng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, px(x, y) & 0xFFFFFF); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
