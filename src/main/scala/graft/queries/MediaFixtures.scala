package graft.queries

/** Deterministic in-repo media encoders for the catalog's content-
  * feature queries (q149). The ENCODE path here and the DECODE path in
  * [[graft.ops.Multimodal]] share no code — encode applies the PNG
  * filters / builds the LZW dictionary, decode inverts the filters /
  * replays the dictionary — and the DuckDB oracle never sees either:
  * it recomputes the expected channel means straight from the
  * closed-form pixel formulas below, so a matched encode/decode bug
  * cannot cancel out of the gate.
  *
  * Pixel formulas (exact integer arithmetic, oracle-replayable):
  *  - PNG (8-bit RGB): pixel(x, y, c) = (id*(c+3) + 3x + 7y) mod 256,
  *    scanline filter type (id + y) mod 5 — every one of the five
  *    RFC 2083 filters appears in every image taller than 4 rows;
  *  - GIF: global 64-color table palette(j) = (3j, 5j, 7j) mod 256,
  *    index(x, y) = (id + 5x + 11y) mod 64, real variable-width LZW.
  */
object MediaFixtures {

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32()
    parts.foreach(p => c.update(p))
    c.getValue
  }

  private def be4(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes("ISO-8859-1")
    be4(data.length.toLong) ++ t ++ data ++ be4(crc32(t, data))
  }

  /** Encode raw 8-bit pixels (row-major, `channels` bytes per pixel)
    * as a PNG: per-row filter chosen by `filterForRow`, zlib via
    * `java.util.zip.Deflater`, CRC'd IHDR/IDAT/IEND chunks.
    * `channels` 1 → color type 0 (gray), 3 → 2 (RGB), 4 → 6 (RGBA).
    */
  def pngFromPixels(w: Int, h: Int, channels: Int, px: Array[Byte],
      filterForRow: Int => Int): Array[Byte] = {
    require(px.length == w * h * channels, "pixel buffer size")
    val colorType = channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case n => sys.error(s"unsupported channel count $n")
    }
    def p(k: Int, y: Int): Int = px(y * w * channels + k) & 0xff
    val raw = new Array[Byte](h * (1 + w * channels))
    for (y <- 0 until h) {
      val f = filterForRow(y)
      val ro = y * (1 + w * channels)
      raw(ro) = f.toByte
      for (k <- 0 until w * channels) {
        val x = p(k, y)
        val a = if (k >= channels) p(k - channels, y) else 0
        val up = if (y > 0) p(k, y - 1) else 0
        val c = if (y > 0 && k >= channels) p(k - channels, y - 1) else 0
        val filtered = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - (a + up) / 2
          case 4 =>
            val pr = a + up - c
            val pa = math.abs(pr - a); val pb = math.abs(pr - up)
            val pc = math.abs(pr - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(ro + 1 + k) = (filtered & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zout.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = be4(w.toLong) ++ be4(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** The q149 PNG: 8-bit RGB, formula pixels, filter (id+y) mod 5. */
  def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) =
        ((id * (c + 3) + 3L * x + 7L * y) % 256).toByte
    pngFromPixels(w, h, 3, px, y => ((id + y) % 5).toInt)
  }

  /** Encode palette indices as a single-frame GIF89a with the given
    * global color table, using a REAL sequence-dictionary LZW encoder:
    * code width starts at minCode+1, grows when the table size passes
    * 2^width (the encoder's table runs one entry ahead of the
    * decoder's, hence the `nextCode - 1` test), Clear resets a full
    * 4096-entry table.
    */
  def gifFromIndices(w: Int, h: Int, idx: Array[Int],
      palette: Array[Byte], minCode: Int = 6): Array[Byte] = {
    require(idx.length == w * h, "index buffer size")
    require(palette.length % 3 == 0 && palette.length <= 256 * 3)
    val clear = 1 << minCode
    val eoi = clear + 1
    // LSB-first variable-width bit packer
    val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
    var cur = 0L
    var nBits = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        bits += (cur & 0xff).toByte
        cur >>= 8
        nBits -= 8
      }
    }
    var width = minCode + 1
    var nextCode = eoi + 1
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefixCode: Int, b: Int): Long = prefixCode.toLong << 8 | b
    put(clear, width)
    var prefix = idx(0)
    var p = 1
    while (p < idx.length) {
      val b = idx(p)
      val k = key(prefix, b)
      val hit = dict.get(k)
      if (hit != null) prefix = hit.intValue()
      else {
        put(prefix, width)
        dict.put(k, nextCode)
        nextCode += 1
        if (nextCode - 1 == (1 << width) && width < 12) width += 1
        if (nextCode >= 4096) { // table full: reset, mirror the decoder
          put(clear, width)
          dict.clear()
          width = minCode + 1
          nextCode = eoi + 1
        }
        prefix = b
      }
      p += 1
    }
    put(prefix, width)
    put(eoi, width)
    if (nBits > 0) bits += (cur & 0xff).toByte
    // size field: table length rounded up to the next power of two
    var sizeField = 0
    while ((2 << sizeField) * 3 < palette.length) sizeField += 1
    val gct = palette ++
      Array.fill((2 << sizeField) * 3 - palette.length)(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    out.write(Array[Byte]((w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte,
      (0x80 | sizeField).toByte, 0, 0))
    out.write(gct)
    out.write(0x2c) // image descriptor: full logical screen
    out.write(Array[Byte](0, 0, 0, 0, (w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte, 0))
    out.write(minCode)
    val lzw = bits.toArray
    var off = 0
    while (off < lzw.length) { // 255-byte sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** The fixed q149 palette: entry j = (3j, 5j, 7j) mod 256. */
  def gifPalette(nColors: Int): Array[Byte] =
    Array.tabulate(nColors * 3) { i =>
      (((i % 3) * 2 + 3) * (i / 3) % 256).toByte
    }

  /** The q149 GIF: formula indices over the 64-color palette. */
  def gifBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val idx = Array.tabulate(w * h) { p =>
      ((id + 5L * (p % w) + 11L * (p / w)) % 64).toInt
    }
    gifFromIndices(w, h, idx, gifPalette(64))
  }

  /** The q313 WAV: canonical 44-byte header, 16-bit mono PCM square
    * wave of period `P = 4 + 2·(id mod 6)` samples and amplitude
    * `A = 1000 + 500·(id mod 7)`: sample k is +A while
    * `(k mod P)·2 < P`, else −A. Closed-form and integer-exact, so
    * the oracle recomputes every autocorrelation the engine measures.
    */
  def wavBytes(id: Long, n: Int): Array[Byte] = {
    val p = 4 + 2 * (id % 6).toInt
    val a = 1000 + 500 * (id % 7).toInt
    val out = new java.io.ByteArrayOutputStream()
    def le4(v: Long): Unit = (0 to 3).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    def le2(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("ISO-8859-1")); le4(36L + 2 * n)
    out.write("WAVEfmt ".getBytes("ISO-8859-1")); le4(16)
    le2(1); le2(1) // PCM, mono
    le4(8000); le4(16000) // sample rate, byte rate
    le2(2); le2(16) // block align, bits
    out.write("data".getBytes("ISO-8859-1")); le4(2L * n)
    for (k <- 0 until n) {
      val s = if ((k % p) * 2 < p) a else -a
      le2(s & 0xffff)
    }
    out.toByteArray
  }

  /** The q307 JPEG: a REAL baseline JPEG (JDK `javax.imageio` writer,
    * quality 1.0) whose grayscale pixels are CONSTANT per 8×8 block —
    * value(bx, by) = (id*7 + 13·bx + 29·by) mod 256. A constant block's
    * DCT is DC-only (8·(v−128), an exact float), every AC quantizes to
    * 0, and quality 1.0's all-ones tables keep the DC exact, so the
    * lossy codec round-trips these images bit-for-bit — verified
    * exhaustively over ids — and the oracle can recompute the channel
    * means from the block formula without owning a JPEG decoder.
    * `w`/`h` must be multiples of 8 so no block straddles an edge.
    */
  def jpegBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dims must be multiples of 8")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      r.setSample(x, y, 0,
        ((id * 7 + 13L * (x / 8) + 29L * (y / 8)) % 256).toInt)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }
}
