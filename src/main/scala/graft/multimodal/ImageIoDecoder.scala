package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Production [[MediaDecoder]] backed by `javax.imageio` — JDK-builtin,
  * no external dependency. Covers the still-image formats the JDK ships
  * readers for (PNG, JPEG, GIF, BMP, WBMP) and multi-frame GIF for the
  * frame-sampling path. Container video (mp4/avi/mkv) has no JDK codec;
  * a production deployment plugs an ffmpeg/JavaCV-backed implementation
  * into the same [[MediaDecoder]] seam without touching any plan.
  *
  * Pixel layout is normalized to 3-channel RGB row-major regardless of
  * the source color model (alpha is dropped, palettes resolved), so
  * downstream resize/featurize see one shape.
  */
object ImageIoDecoder extends MediaDecoder {

  // ImageIO defaults to a disk-backed stream cache; these decodes are
  // per-row on executors, so keep everything on-heap
  ImageIO.setUseCache(false)

  private def toDecoded(img: java.awt.image.BufferedImage): DecodedImage = {
    val w = img.getWidth
    val h = img.getHeight
    // bulk getRGB resolves any color model to packed ARGB ints
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < argb.length) {
      val v = argb(i)
      px(3 * i) = ((v >> 16) & 0xff).toByte
      px(3 * i + 1) = ((v >> 8) & 0xff).toByte
      px(3 * i + 2) = (v & 0xff).toByte
      i += 1
    }
    DecodedImage("", w, h, 3, px)
  }

  private def withReader[A](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => A): A = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new java.io.IOException(
          "no javax.imageio reader recognizes these bytes")
      val r = readers.next()
      r.setInput(iis)
      try f(r)
      finally r.dispose()
    } finally iis.close()
  }

  override def decodeImage(bytes: Array[Byte]): DecodedImage =
    withReader(bytes)(r => toDecoded(r.read(0)))

  /** Frame count with forced full scan (`allowSearch = true`) — for
    * GIF the count is not in any header, the reader must walk the
    * stream. */
  override def frameCount(bytes: Array[Byte]): Int =
    withReader(bytes)(_.getNumImages(true))

  /** KNOWN RESTRICTION: frames are returned as stored. Animated GIFs
    * using inter-frame optimization (delta rectangles + disposal
    * methods — common encoder output) need composition over the
    * logical screen per the disposal metadata, which this decoder does
    * not perform; such frames come back as raw sub-rectangles.
    * Full-replacement GIFs decode exactly. A production video path
    * sits behind an ffmpeg-backed [[MediaDecoder]] anyway (see class
    * doc), which composes frames natively. */
  override def decodeFrame(bytes: Array[Byte], idx: Int): DecodedImage =
    withReader(bytes)(r => toDecoded(r.read(idx)))
}
