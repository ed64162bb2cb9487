package graft.operators

/** Minimal pure-JVM binary-PPM (P6) codec — the one genuinely decoded
  * format behind the multimodal seam (the container has no native media
  * libraries, so a header+raster format that decodes with zero
  * dependencies keeps the seam REAL: [[Multimodal.decodeFeatures]] routes
  * `media_type = 'image'` payloads here and everything else to the
  * documented [[Multimodal.StubDecoder]]).
  *
  * Format (netpbm spec): `P6` magic, whitespace-separated ASCII width,
  * height, maxval (each optionally preceded by `#` comment lines), one
  * whitespace byte, then `width*height*3` raw RGB bytes.
  */
object Ppm {

  final case class Image(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** Serialize an RGB raster as P6. The header's maxval must describe the
    * samples it precedes — [[parse]] accepts any maxval < 256 and
    * [[resizeNearest]] preserves it, so a round trip through encode must
    * carry it too (a header claiming 255 over unrescaled maxval-31 samples
    * would silently brighten the image for any conforming reader).
    */
  def encode(width: Int, height: Int, pixels: Array[Byte], maxVal: Int = 255): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"raster must be width*height*3 bytes, got ${pixels.length}")
    require(maxVal > 0 && maxVal < 256, s"1-byte P6 needs 0 < maxval < 256, got $maxVal")
    s"P6\n$width $height\n$maxVal\n".getBytes("US-ASCII") ++ pixels
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'

  /** Strict parse; throws IllegalArgumentException on anything malformed. */
  def parse(payload: Array[Byte]): Image = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var more = true
      while (more) {
        while (pos < payload.length && isWs(payload(pos))) pos += 1
        if (pos < payload.length && payload(pos) == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < payload.length && !isWs(payload(pos))) pos += 1
      require(pos > start, "truncated PPM header")
      new String(payload, start, pos - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM: magic '$magic'")
    val (w, h, mv) =
      try (token().toInt, token().toInt, token().toInt)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException("non-numeric PPM dimensions") }
    require(w > 0 && h > 0 && mv > 0 && mv < 256, s"bad PPM geometry ${w}x$h/$mv")
    pos += 1 // exactly one whitespace byte separates maxval from the raster
    val n = w * h * 3
    require(payload.length - pos >= n,
      s"truncated raster: need $n bytes, have ${payload.length - pos}")
    Image(w, h, mv, java.util.Arrays.copyOfRange(payload, pos, pos + n))
  }

  /** Nearest-neighbor downsample: destination pixel (x, y) samples source
    * pixel (x*srcW/dstW, y*srcH/dstH) (integer division) — the simplest
    * deterministic resize, chosen so an external engine can replay the
    * exact byte selection (the m04 oracle reconstructs the thumbnail from
    * the raster text and md5-matches it).
    */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0, s"bad thumbnail geometry ${tw}x$th")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        val si = (sy * img.width + sx) * 3
        val di = (y * tw + x) * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.maxVal, out)
  }

  /** Decode + feature-extract: integer-exact summary stats, padded to the
    * same 8-wide feature shape as [[Multimodal.StubDecoder.decode]] —
    * `[width, height, maxval, n_pixels, sum_r, sum_g, sum_b, max_channel]`.
    * Channel sums are exact in Float up to ~2^24 (a 2.3 MP image at
    * maxval 255); beyond that a real deployment widens the feature type.
    */
  def decode(payload: Array[Byte]): Array[Float] = {
    val img = parse(payload)
    var sr = 0L; var sg = 0L; var sb = 0L; var mx = 0L
    var i = 0
    while (i < img.pixels.length) {
      val r = img.pixels(i) & 0xff
      val g = img.pixels(i + 1) & 0xff
      val b = img.pixels(i + 2) & 0xff
      sr += r; sg += g; sb += b
      if (r > mx) mx = r
      if (g > mx) mx = g
      if (b > mx) mx = b
      i += 3
    }
    Array[Long](img.width, img.height, img.maxVal, img.pixels.length / 3,
      sr, sg, sb, mx).map(_.toFloat)
  }
}
