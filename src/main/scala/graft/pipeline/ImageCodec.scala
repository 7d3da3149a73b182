package graft.pipeline

/** Minimal pure-JVM BMP codec — the REAL decoder behind the multimodal
  * decode seam ([[Multimodal.decodeAndFeaturize]] selects it with
  * `spark.graft.mm.codec=bmp`; the FNV stub stays the default where no
  * codec library exists). Supports the uncompressed BITMAPINFOHEADER
  * layouts every generator emits: 24/32-bit, bottom-up (positive height)
  * and top-down (negative height), 4-byte-padded rows. Decode output is
  * integer luma (299·R + 587·G + 114·B) / 1000 per pixel, row-major
  * top-down — integer arithmetic end-to-end so the DuckDB oracle can
  * replay the exact values (mm_decode_bmp).
  */
object ImageCodec {

  /** Decode an uncompressed 24/32-bit BMP to (width, height, row-major
    * top-down integer luma in [0, 255]). Fails loudly on anything else —
    * a silent fallback to the stub would fake a decode.
    */
  def decodeBmpLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def i32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    require(bytes != null && bytes.length >= 54 &&
      bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP stream")
    val pixOff = i32(10)
    val hdrSize = i32(14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val w = i32(18)
    val hRaw = i32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = u16(26)
    val bpp = u16(28)
    val comp = i32(30)
    require(planes == 1 && (bpp == 24 || bpp == 32) && comp == 0,
      s"unsupported BMP: planes=$planes bpp=$bpp compression=$comp " +
        "(only uncompressed 24/32-bit)")
    require(w > 0 && h > 0, s"degenerate BMP dims ${w}x$hRaw")
    val bytesPerPx = bpp / 8
    val stride = ((w * bytesPerPx + 3) / 4) * 4
    require(bytes.length >= pixOff + stride * h,
      s"truncated BMP: need ${pixOff + stride * h} bytes, got ${bytes.length}")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcY = if (topDown) y else h - 1 - y
      val rowOff = pixOff + srcY * stride
      var x = 0
      while (x < w) {
        val p = rowOff + x * bytesPerPx
        val b = u8(p); val g = u8(p + 1); val r = u8(p + 2)
        out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Encode row-major top-down RGB triples (3 ints per pixel, 0-255) as an
    * uncompressed 24-bit BMP — bottom-up by default, top-down with
    * `topDown` (negative height). Fixture generator for the golden tests
    * and the mm_decode_bmp gate; byte-different encodings of the same
    * pixels (row order, padding) must decode identically.
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Int], topDown: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need $w*$h*3=${w * h * 3} rgb values, got ${rgb.length}")
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def p16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def p32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    p32(2, size); p32(10, 54); p32(14, 40)
    p32(18, w); p32(22, if (topDown) -h else h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, stride * h)
    var y = 0
    while (y < h) {
      val dstY = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = 54 + dstY * stride + x * 3
        out(d) = rgb(s + 2).toByte
        out(d + 1) = rgb(s + 1).toByte
        out(d + 2) = rgb(s).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** General box-mean downsample of an integer grid to dw×dh floats in
    * [0, 1]: destination (x, y) averages the source block
    * [⌊x·sw/dw⌋, ⌊(x+1)·sw/dw⌋) × [⌊y·sh/dh⌋, ⌊(y+1)·sh/dh⌋) — lets the
    * real-codec path honor decodeAndFeaturize's fixed (w, h) contract for
    * any source dims (identity when dims already match).
    */
  def boxMean(sw: Int, sh: Int, px: Array[Int], dw: Int, dh: Int): Array[Float] = {
    require(dw >= 1 && dh >= 1 && dw <= sw && dh <= sh,
      s"box mean needs 1 <= dst <= src, got ${sw}x$sh -> ${dw}x$dh")
    val out = new Array[Float](dw * dh)
    var y = 0
    while (y < dh) {
      val y0 = y * sh / dh; val y1 = (y + 1) * sh / dh
      var x = 0
      while (x < dw) {
        val x0 = x * sw / dw; val x1 = (x + 1) * sw / dw
        var sum = 0L
        var sy = y0
        while (sy < y1) {
          var sx = x0
          while (sx < x1) { sum += px(sy * sw + sx); sx += 1 }
          sy += 1
        }
        out(y * dw + x) = sum.toFloat / ((y1 - y0) * (x1 - x0)) / 255.0f
        x += 1
      }
      y += 1
    }
    out
  }
}
