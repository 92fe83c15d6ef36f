package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL compressed-container codecs over the JDK's own zlib
  * (`java.util.zip` — Inflater/Deflater/CRC32 ship with every JVM, so
  * "no codec libraries in the environment" does not apply to the
  * DEFLATE family): PNG truecolor decode with full scanline
  * unfiltering, and gzip text round-trip. Each decoder has a paired
  * synthesizer so the whole path is oracle-checkable without any
  * external fixture: the oracle replays the deterministic PIXEL/TEXT
  * formula, never the compressed bytes (compression output may vary by
  * zlib version; the decoded content cannot).
  *
  * These are deliberately Expression-level (not UDFs): null-safe,
  * codegen'd via a static call, one compiled pass per row.
  */
object MediaExprs {

  // ------------------------------------------------------------------ PNG

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Synthesize a VALID 8-bit truecolor (colortype 2) PNG: IHDR + one
    * zlib-compressed IDAT (REAL Deflater output) + IEND, with real CRC32
    * chunk checksums — any image viewer opens it. Scanline r carries
    * filter type `(seed + r) % 5`, so a decoder must implement ALL FIVE
    * PNG filters (None/Sub/Up/Average/Paeth) to recover the pixels.
    * Pixel (x, y): R = (seed·5 + x·11 + y·3) % 256,
    * G = (seed·13 + x·7 + y·17) % 256, B = (seed·19 + x·23 + y·29) % 256
    * over a (8 + seed % 7) × (8 + seed % 6) canvas.
    */
  def pngSynth(seed: Long): Array[Byte] =
    buildPng(seed, (8 + Math.floorMod(seed, 7L)).toInt,
      (8 + Math.floorMod(seed, 6L)).toInt)

  private def buildPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val bpp = 3
    // true pixel bytes, row-major RGB
    val truePx = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        truePx(i) = Math.floorMod(seed * 5 + x * 11 + y * 3, 256L).toInt
        truePx(i + 1) = Math.floorMod(seed * 13 + x * 7 + y * 17, 256L).toInt
        truePx(i + 2) = Math.floorMod(seed * 19 + x * 23 + y * 29, 256L).toInt
        x += 1
      }
      y += 1
    }
    // filtered scanlines
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    y = 0
    while (y < h) {
      val f = Math.floorMod(seed + y, 5L).toInt
      raw(y * (1 + stride)) = f.toByte
      var c = 0
      while (c < stride) {
        val cur = truePx(y * stride + c)
        val left = if (c >= bpp) truePx(y * stride + c - bpp) else 0
        val up = if (y > 0) truePx((y - 1) * stride + c) else 0
        val ul = if (y > 0 && c >= bpp) truePx((y - 1) * stride + c - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + c) = ((cur - pred) & 0xFF).toByte
        c += 1
      }
      y += 1
    }
    // zlib-compress the filtered stream (real Deflater; end() in a
    // finally so native zlib state never waits on finalization)
    val defl = new java.util.zip.Deflater()
    val zBuf = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(raw); defl.finish()
      val tmp = new Array[Byte](4096)
      while (!defl.finished()) {
        val n = defl.deflate(tmp)
        zBuf.write(tmp, 0, n)
      }
    } finally defl.end()
    val idat = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4 + 4 + data.length + 4)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      out.write(bb.array(), 0, bb.capacity())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = Math.abs(p - a); val pb = Math.abs(p - b); val pc = Math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG DECODE: signature + chunk walk (length/type/CRC layout),
    * IHDR validation (8-bit, colortype 2 truecolor, no interlace),
    * in-order IDAT concatenation, JDK Inflater for the zlib stream, and
    * full scanline UNFILTERING (all five PNG filter types). Returns
    * `[1, w, h, n_pixels, mean_luma_milli, min_luma_milli,
    * max_luma_milli, dhash]` (exact integer BT.601 milli-luma; dhash =
    * the 56-bit difference hash over the 8×8 nearest-neighbor grid of
    * decoded lumas — identical contract to the BMP decoder) or `null`
    * for anything malformed: bad signature/IHDR, unsupported
    * bitdepth/colortype/interlace, CRC mismatch on a parsed chunk,
    * truncated/corrupt deflate stream, an inflated size that
    * disagrees with the declared dimensions, or declared dimensions
    * whose raw scanline buffer would exceed the 64 MiB decode budget
    * (the same bomb cap gzip/zip use — checked in Long arithmetic
    * BEFORE any allocation).
    */
  def pngDecode(payload: Array[Byte]): UnsafeArrayData = {
    try {
      if (payload == null || payload.length < 8 + 25) return null
      var i = 0
      while (i < 8) { if (payload(i) != PngSig(i)) return null; i += 1 }
      val bb = java.nio.ByteBuffer.wrap(payload)
      var pos = 8
      var w = -1; var h = -1
      val idat = new java.io.ByteArrayOutputStream()
      var sawEnd = false
      while (!sawEnd) {
        if (pos + 8 > payload.length) return null
        val len = bb.getInt(pos)
        if (len < 0 || pos + 12 + len > payload.length) return null
        val typ = new String(payload, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(payload, pos + 4, 4 + len)
        if (crc.getValue.toInt != bb.getInt(pos + 8 + len)) return null
        typ match {
          case "IHDR" =>
            if (len != 13) return null
            w = bb.getInt(pos + 8); h = bb.getInt(pos + 12)
            val bitDepth = payload(pos + 16); val colorType = payload(pos + 17)
            val interlace = payload(pos + 20)
            if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
            if (bitDepth != 8 || colorType != 2 || interlace != 0) return null
          case "IDAT" => idat.write(payload, pos + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunks skipped (CRC still verified)
        }
        pos += 12 + len
      }
      if (w <= 0 || idat.size() == 0) return null
      // size sanity BEFORE any allocation, in Long arithmetic: with w,h
      // allowed up to 2^20 each, h*(1+3w) overflows Int (ADVICE r16) and a
      // tiny crafted header could demand multi-GB buffers (OutOfMemoryError
      // is an Error, not caught by `case _: Exception`). Reject anything
      // over the 64 MiB decode budget shared with gzip/zip.
      val strideL = 3L * w
      val rawLenL = h.toLong * (1L + strideL)
      if (rawLenL > (64L << 20)) return null
      val stride = strideL.toInt
      val rawLen = rawLenL.toInt
      val raw = new Array[Byte](rawLen)
      val inf = new java.util.zip.Inflater()
      val complete =
        try {
          inf.setInput(idat.toByteArray)
          var off = 0
          var malformed = false
          while (off < rawLen && !inf.finished() && !malformed) {
            val n = inf.inflate(raw, off, rawLen - off)
            // n == 0 without finished() covers BOTH truncation (needsInput)
            // and a preset-dictionary stream (needsDictionary — FDICT set):
            // the latter would otherwise spin this loop forever (ADVICE r16).
            if (n == 0 && !inf.finished()) malformed = true
            off += n
          }
          !malformed && off == rawLen &&
            (inf.finished() || inf.inflate(new Array[Byte](1)) == 0)
        } finally inf.end() // also releases native zlib memory on throw
      if (!complete) return null
      // unfilter in place into an int pixel buffer
      val px = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xFF
        if (f > 4) return null
        var c = 0
        while (c < stride) {
          val x = raw(y * (1 + stride) + 1 + c) & 0xFF
          val left = if (c >= 3) px(y * stride + c - 3) else 0
          val up = if (y > 0) px((y - 1) * stride + c) else 0
          val ul = if (y > 0 && c >= 3) px((y - 1) * stride + c - 3) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          px(y * stride + c) = (x + pred) & 0xFF
          c += 1
        }
        y += 1
      }
      // luma stats + dhash (the BMP decoder's exact contract)
      statsFromRgb(px, w, h)
    } catch { case _: Exception => null }
  }

  /** The shared decoded-image tail: exact BT.601 milli-luma stats + the
    * 56-bit dHash over the 8×8 nearest-neighbor grid, from a flattened
    * RGB triplet array — `[1, w, h, n_pixels, mean_luma_milli,
    * min_luma_milli, max_luma_milli, dhash]` (the bmpFeatures contract;
    * PNG and JPEG decode through this same fold, which is what makes
    * cross-container image dedup meaningful). */
  private def statsFromRgb(px: Array[Int], w: Int, h: Int): UnsafeArrayData = {
    val n = w * h
    var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
    val lum = new Array[Long](n)
    var p = 0
    while (p < n) {
      val l = 299L * px(3 * p) + 587L * px(3 * p + 1) + 114L * px(3 * p + 2)
      lum(p) = l; sum += l
      if (l < mn) mn = l
      if (l > mx) mx = l
      p += 1
    }
    var dh = 0L
    var r = 0
    while (r < 8) {
      var c2 = 0
      while (c2 < 7) {
        val gy = r * h / 8
        def gx(cc: Int) = cc * w / 8
        if (lum(gy * w + gx(c2)) > lum(gy * w + gx(c2 + 1)))
          dh |= 1L << (7 * r + c2)
        c2 += 1
      }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(1L, w.toLong, h.toLong, n.toLong, sum / n, mn, mx, dh))
  }

  case class PngSynthExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any = pngSynth(a.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.pngSynth($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PngDecodeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      pngDecode(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.pngDecode($a);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----------------------------------------------------------------- jpeg

  /** Synthesize a REAL JPEG via the JDK's own `javax.imageio` writer
    * (the entropy-coded decoder ships in every standard JDK — the old
    * "no codec libraries" stub rationale does not bind it): a SMOOTH
    * deterministic gradient over a (8 + seed%7) × (8 + seed%6) canvas —
    * R = 255x/(w−1), G = 255y/(h−1), B = 255(x+y)/(w+h−2) — encoded at
    * quality 1.0. Gradients survive lossy DCT coding (a per-pixel noise
    * formula would not), which is what keeps the spec tier's luma band
    * and dHash stability meaningful.
    *
    * JPEG is LOSSY: unlike pngSynth, decoded pixels are NOT a replayable
    * closed formula (they depend on the encoder's DCT/quantizer), so the
    * q297 oracle pins only the EXACT relational invariants (valid, w, h,
    * n_pixels) and pixel content is pinned in the SPEC tier with a
    * documented tolerance band — a deliberately weaker-than-hash
    * contract, stated loudly where q296/q293 pin content md5s.
    */
  def jpegSynth(seed: Long): Array[Byte] = {
    val w = (8 + Math.floorMod(seed, 7L)).toInt
    val h = (8 + Math.floorMod(seed, 6L)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = 255 * x / math.max(w - 1, 1)
        val g = 255 * y / math.max(h - 1, 1)
        val b = 255 * (x + y) / math.max(w + h - 2, 1)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** JPEG pixel budget under the SHARED 64 MiB decode discipline
    * (gzip/zip/tar/WARC/PNG all bound their decompressed output at
    * 64 MiB): this decoder's per-row buffers cost ~24 bytes/pixel
    * (BufferedImage raster ≈ 3–4 B + the 3-int px array 12 B + the
    * Long luma array 8 B in statsFromRgb), so the cap is
    * 64 MiB / 24 B ≈ 2.79M pixels — a 1920×1080 frame still fits with
    * ~25% headroom, and concurrent decodes can no longer out-allocate
    * every other decoder family by 5× (the old 2^24 budget admitted
    * ~340 MB of buffers per row). */
  private val MaxJpegPixels: Long = (64L << 20) / 24

  /** REAL JPEG DECODE through the JDK's ImageIO reader: SOI magic gate,
    * HEADER-ONLY dimension gate (an `ImageReader.getWidth/getHeight(0)`
    * parses the SOF marker without entropy-decoding or allocating a
    * pixel buffer — a crafted stream declaring huge dimensions is
    * rejected BEFORE ImageIO can allocate a multi-GB BufferedImage,
    * whose OutOfMemoryError is an Error no Exception gate catches),
    * then the full entropy decode and the SHARED decoded-image fold
    * (exact BT.601 milli-luma stats + real-pixel dHash — the
    * bmpFeatures/pngFeatures contract, so JPEG renders join the
    * cross-container image-dedup family). NULL for anything malformed
    * (bad magic, truncated/corrupt stream, dimensions over
    * [[MaxJpegPixels]]). Decodes through a memory-cache stream — no
    * ImageIO temp-file cache on the executor hot path. */
  def jpegDecode(payload: Array[Byte]): UnsafeArrayData = {
    try {
      if (payload == null || payload.length < 4) return null
      if ((payload(0) & 0xFF) != 0xFF || (payload(1) & 0xFF) != 0xD8) return null
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return null
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only dims: the bomb gate runs before any pixel decode
            val hw = reader.getWidth(0); val hh = reader.getHeight(0)
            if (hw <= 0 || hh <= 0 || hw.toLong * hh > MaxJpegPixels) return null
            reader.read(0)
          } finally reader.dispose()
        } finally {
          // reader.read does NOT close the stream (unlike ImageIO.read);
          // tolerate a double-close anyway — defensive only
          try iis.close() catch { case _: java.io.IOException => () }
        }
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > MaxJpegPixels) return null
      val px = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val i = (y * w + x) * 3
          px(i) = (rgb >> 16) & 0xFF
          px(i + 1) = (rgb >> 8) & 0xFF
          px(i + 2) = rgb & 0xFF
          x += 1
        }
        y += 1
      }
      statsFromRgb(px, w, h)
    } catch { case _: Exception => null }
  }

  case class JpegSynthExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any = jpegSynth(a.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.jpegSynth($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class JpegDecodeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      jpegDecode(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.jpegDecode($a);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def jpegSynthCol(seed: Column): Column =
    ExpressionUtils.column(JpegSynthExpr(ExpressionUtils.expression(seed)))
  def jpegDecodeCol(payload: Column): Column =
    ExpressionUtils.column(JpegDecodeExpr(ExpressionUtils.expression(payload)))

  // ----------------------------------------------------------------- gzip

  /** Gzip-compress a UTF-8 string (REAL GZIPOutputStream — a valid .gz
    * member any tool decompresses). */
  def gzipBytes(s: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    try gz.write(s.getBytes) finally gz.close() // releases the Deflater
    out.toByteArray
  }

  /** Decompress a gzip stream (one member, or CONCATENATED members — the
    * JDK reader walks them transparently, which is what a .warc.gz needs)
    * to raw bytes; null on anything malformed (bad magic, truncated
    * stream, CRC mismatch — the decode-gate convention: a corrupt blob
    * is a drop reason, never a crash). Output capped at 64 MiB to bound
    * a decompression bomb. */
  def gunzipRaw(payload: Array[Byte]): Array[Byte] =
    gunzipRaw(payload, 64L << 20)

  /** [[gunzipRaw]] under an explicit decompressed-size budget (the WARC
    * walker threads its archive cap through here). */
  def gunzipRaw(payload: Array[Byte], capBytes: Long): Array[Byte] = {
    try {
      if (payload == null) return null
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) {
          total += n
          if (total > capBytes) return null
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close() // close on ALL paths incl. malformed-stream throw
    } catch { case _: Exception => null }
  }

  /** [[gunzipRaw]] decoded as UTF-8 text. */
  def gunzipText(payload: Array[Byte]): UTF8String = {
    val raw = gunzipRaw(payload)
    if (raw == null) null else UTF8String.fromBytes(raw)
  }

  case class GzipExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any = gzipBytes(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.gzipBytes($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class GunzipExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      gunzipText(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.gunzipText($a);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------------------ zip

  /** Build a VALID two-member ZIP archive (real ZipOutputStream —
    * deflated entries, real CRCs; any unzip reads it): `doc.txt` holds
    * the text's UTF-8 bytes, `meta.txt` holds `id=<id>`. The multi-
    * member container shape of batch document ingest (one archive, many
    * files) — the oracle replays member CONTENT, never archive bytes. */
  def zipSynth(id: Long, text: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    try {
      z.putNextEntry(new java.util.zip.ZipEntry("doc.txt"))
      z.write(text.getBytes)
      z.closeEntry()
      z.putNextEntry(new java.util.zip.ZipEntry("meta.txt"))
      z.write(s"id=$id".getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close() // releases the Deflater on every path
    out.toByteArray
  }

  /** Explode a ZIP archive into its members, in archive order:
    * `array<struct<name string, data binary>>`; null on malformed input
    * (bad magic, truncated member, CRC mismatch — the decode-gate
    * convention). Per-archive output capped at 64 MiB against zip
    * bombs; entry names capped at 4096 chars. */
  def zipEntries(payload: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    try {
      if (payload == null) return null
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
        var total = 0L
        var e = zin.getNextEntry
        if (e == null) return null // not a zip / empty
        while (e != null) {
          if (e.getName == null || e.getName.length > 4096) return null
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = zin.read(tmp)
          while (n >= 0) {
            total += n
            if (total > (64L << 20)) return null
            buf.write(tmp, 0, n)
            n = zin.read(tmp)
          }
          rows += org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(e.getName), buf.toByteArray)
          zin.closeEntry()
          e = zin.getNextEntry
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
      } finally zin.close() // close on ALL paths incl. malformed-stream throw
    } catch { case _: Exception => null }
  }

  // ----------------------------------------------------------------- warc

  /** Build a VALID two-record `.warc.gz` per row — the Common Crawl
    * container layout (ISO 28500): each record individually
    * gzip-compressed, members concatenated. Record 0 is a `response`
    * whose block is the caller's content (a synthesized HTML page in the
    * q296 shape); record 1 is a `metadata` record with block
    * `id=<id>`. Headers carry WARC/1.0, WARC-Type, WARC-Record-ID
    * (deterministic `<urn:graft:<id>:<n>>`), WARC-Date (fixed),
    * WARC-Target-URI (`http://crawl.test/<id>`), Content-Length; the
    * block is followed by the spec's CRLF CRLF record separator. Any
    * WARC tool reads the output; the oracle replays block CONTENT, never
    * compressed bytes. */
  def warcSynth(id: Long, content: UTF8String): Array[Byte] = {
    def member(typ: String, recNo: Int, block: Array[Byte]): Array[Byte] = {
      val header =
        s"WARC/1.0\r\n" +
          s"WARC-Type: $typ\r\n" +
          s"WARC-Record-ID: <urn:graft:$id:$recNo>\r\n" +
          s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
          s"WARC-Target-URI: http://crawl.test/$id\r\n" +
          s"Content-Length: ${block.length}\r\n\r\n"
      val raw = new java.io.ByteArrayOutputStream()
      raw.write(header.getBytes("UTF-8"))
      raw.write(block)
      raw.write("\r\n\r\n".getBytes("UTF-8"))
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      try gz.write(raw.toByteArray) finally gz.close() // releases the Deflater
      out.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(member("response", 0, content.getBytes))
    out.write(member("metadata", 1, s"id=$id".getBytes("UTF-8")))
    out.toByteArray
  }

  private val warcRecordType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("warc_type", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("target_uri", StringType, nullable = true),
    org.apache.spark.sql.types.StructField("content", BinaryType, nullable = false)))

  /** Walk a WARC file (plain or `.warc.gz` — concatenated gzip members
    * decode through the JDK reader) into its records, in file order:
    * `array<struct<warc_type string, target_uri string, content
    * binary>>`; null on malformed input (not gzip when compressed, a
    * record not starting `WARC/`, oversized/missing headers, a missing
    * or non-numeric Content-Length, a truncated block, or a missing
    * CRLF CRLF record separator — the decode-gate convention).
    * `WARC-Target-URI` is optional per spec (warcinfo records lack it)
    * and reads NULL; header names match case-insensitively. Total
    * decompressed size capped at `capBytes` (default 64 MiB — the
    * shared decode budget); per-record header lines capped at 64 of
    * ≤ 8192 chars.
    *
    * 100 TB note: this walker materializes ONE archive as one array row,
    * which is the right shape for per-document .warc.gz payloads but NOT
    * for real Common Crawl members (~1 GB each) — those want the
    * per-record STREAMING reader
    * ([[graft.operators.Multimodal.warcRecordIterator]]), which decodes
    * incrementally under a per-RECORD cap and never holds the archive.
    */
  def warcRecords(payload: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    warcRecords(payload, 64L << 20)

  def warcRecords(
      payload: Array[Byte],
      capBytes: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    try {
      if (payload == null || payload.length < 2) return null
      // gzip magic → decompress; otherwise treat as an uncompressed .warc
      val bytes =
        if ((payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B)
          gunzipRaw(payload, capBytes)
        else payload
      if (bytes == null || bytes.length > capBytes) return null
      val n = bytes.length
      var pos = 0
      def readLine(): String = {
        // CRLF-terminated header line; null = malformed/oversized
        var i = pos
        val limit = math.min(n, pos + 8192)
        while (i + 1 < limit &&
          !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
        if (i + 1 >= limit) return null
        val s = new String(bytes, pos, i - pos, "UTF-8")
        pos = i + 2
        s
      }
      val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
      while (pos < n) {
        val magic = readLine()
        if (magic == null || !magic.startsWith("WARC/")) return null
        var typ: String = null
        var uri: String = null
        var len = -1L
        var headerLines = 0
        var line = readLine()
        while (line != null && line.nonEmpty) {
          headerLines += 1
          if (headerLines > 64) return null
          val c = line.indexOf(':')
          if (c <= 0) return null
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "warc-type" => typ = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              len = try value.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
          line = readLine()
        }
        if (line == null) return null // unterminated header block
        if (typ == null || len < 0 || pos + len > n) return null
        val block = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
        pos += len.toInt
        // the spec's record separator: exactly CRLF CRLF after the block
        if (pos + 4 > n || bytes(pos) != '\r' || bytes(pos + 1) != '\n' ||
          bytes(pos + 2) != '\r' || bytes(pos + 3) != '\n') return null
        pos += 4
        rows += org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(typ),
          if (uri == null) null else UTF8String.fromString(uri),
          block)
      }
      if (rows.isEmpty) return null
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
    } catch { case _: Exception => null }
  }

  case class WarcSynthExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType, StringType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      warcSynth(a.asInstanceOf[Long], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.warcSynth($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class WarcRecordsExpr(child: Expression, capBytes: Long = 64L << 20)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(warcRecordType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      warcRecords(a.asInstanceOf[Array[Byte]], capBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.warcRecords($a, ${capBytes}L);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def warcSynthCol(id: Column, content: Column): Column =
    ExpressionUtils.column(WarcSynthExpr(
      ExpressionUtils.expression(id), ExpressionUtils.expression(content)))
  def warcRecordsCol(payload: Column): Column =
    ExpressionUtils.column(WarcRecordsExpr(ExpressionUtils.expression(payload)))
  def warcRecordsCol(payload: Column, capBytes: Long): Column =
    ExpressionUtils.column(
      WarcRecordsExpr(ExpressionUtils.expression(payload), capBytes))

  // ------------------------------------------------------------------ tar

  /** Build a VALID two-member POSIX ustar archive per row (`doc.txt` =
    * the text's UTF-8 bytes, `meta.txt` = `id=<id>` — the zipSynth
    * member shape in the other classic batch container): 512-byte
    * headers with octal size/mtime fields, the space-seeded header
    * checksum, `ustar␀00` magic, 512-padded data blocks, and the
    * spec's two terminating zero blocks — any `tar tf` lists it. The
    * JDK has no tar codec; ustar is plain byte arithmetic, built here
    * from the format spec. */
  def tarSynth(id: Long, text: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(name: String, data: Array[Byte]): Unit = {
      val hdr = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII")
        System.arraycopy(b, 0, hdr, off, b.length)
      }
      put(0, name)
      put(100, "0000644\u0000") // mode
      put(108, "0000000\u0000") // uid
      put(116, "0000000\u0000") // gid
      put(124, f"${data.length}%011o" + "\u0000") // size, octal
      put(136, "00000000000\u0000") // mtime (fixed — determinism)
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum seed
      hdr(156) = '0' // typeflag: regular file
      put(257, "ustar\u000000") // magic + version
      var sum = 0
      var i = 0
      while (i < 512) { sum += hdr(i) & 0xFF; i += 1 }
      put(148, f"$sum%06o" + "\u0000 ")
      out.write(hdr)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    member("doc.txt", text.getBytes)
    member("meta.txt", s"id=$id".getBytes("UTF-8"))
    out.write(new Array[Byte](1024)) // two terminating zero blocks
    out.toByteArray
  }

  /** Explode a tar archive — plain ustar OR `.tar.gz` (gzip magic →
    * decompress through the shared 64 MiB-capped reader) — into its
    * members, in archive order: `array<struct<name string, data
    * binary>>`; null on malformed input (short/truncated header or
    * data, a header CHECKSUM mismatch, a non-octal size — the
    * decode-gate convention). Non-regular-file entries (directories,
    * links, pax/gnu extension blocks) are SKIPPED but their data blocks
    * are honored for advancement, so real-world archives walk
    * correctly. Ends at the first zero block. */
  def tarEntries(payload: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    try {
      // the 512-byte minimum applies to the DECOMPRESSED stream — a
      // small .tar.gz is far under 512 compressed bytes
      if (payload == null || payload.length < 2) return null
      val bytes =
        if ((payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B)
          gunzipRaw(payload)
        else payload
      if (bytes == null || bytes.length < 512) return null
      val n = bytes.length
      var pos = 0
      val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
      var done = false
      while (!done && pos + 512 <= n) {
        // zero block = end of archive
        var allZero = true
        var i = 0
        while (allZero && i < 512) { allZero = bytes(pos + i) == 0; i += 1 }
        if (allZero) done = true
        else {
          def str(off: Int, len: Int): String = {
            var e = off
            val lim = off + len
            while (e < lim && bytes(pos + e) != 0) e += 1
            new String(bytes, pos + off, e - off, "US-ASCII")
          }
          def octal(off: Int, len: Int): Long = {
            val s = str(off, len).trim
            if (s.isEmpty || !s.forall(c => c >= '0' && c <= '7')) -1L
            else java.lang.Long.parseLong(s, 8)
          }
          // verify the header checksum (chksum field reads as spaces)
          var sum = 0
          i = 0
          while (i < 512) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xFF)
            i += 1
          }
          if (octal(148, 8) != sum) return null
          // POSIX magic "ustar" (GNU's "ustar  " shares the prefix)
          if (str(257, 5) != "ustar") return null
          val name = str(0, 100)
          val size = octal(124, 12)
          if (name.isEmpty || size < 0 || size > (64L << 20)) return null
          val dataStart = pos + 512
          if (dataStart + size > n) return null // truncated data
          val typeflag = bytes(pos + 156)
          if (typeflag == '0' || typeflag == 0) {
            rows += org.apache.spark.sql.catalyst.InternalRow(
              UTF8String.fromString(name),
              java.util.Arrays.copyOfRange(
                bytes, dataStart, dataStart + size.toInt))
          }
          pos = dataStart + size.toInt +
            ((512 - size.toInt % 512) % 512)
        }
      }
      if (rows.isEmpty) return null
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
    } catch { case _: Exception => null }
  }

  case class TarSynthExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType, StringType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      tarSynth(a.asInstanceOf[Long], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.tarSynth($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class TarEntriesExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(zipEntryType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      tarEntries(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.tarEntries($a);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def tarSynthCol(id: Column, text: Column): Column =
    ExpressionUtils.column(TarSynthExpr(
      ExpressionUtils.expression(id), ExpressionUtils.expression(text)))
  def tarEntriesCol(payload: Column): Column =
    ExpressionUtils.column(TarEntriesExpr(ExpressionUtils.expression(payload)))

  private val zipEntryType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("name", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("data", BinaryType, nullable = false)))

  case class ZipSynthExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType, StringType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      zipSynth(a.asInstanceOf[Long], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.zipSynth($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class ZipEntriesExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(zipEntryType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      zipEntries(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = org.apache.spark.sql.graftvec.MediaExprs.zipEntries($a);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def zipSynthCol(id: Column, text: Column): Column =
    ExpressionUtils.column(ZipSynthExpr(
      ExpressionUtils.expression(id), ExpressionUtils.expression(text)))
  def zipEntriesCol(payload: Column): Column =
    ExpressionUtils.column(ZipEntriesExpr(ExpressionUtils.expression(payload)))

  def pngSynthCol(seed: Column): Column =
    ExpressionUtils.column(PngSynthExpr(ExpressionUtils.expression(seed)))
  def pngDecodeCol(payload: Column): Column =
    ExpressionUtils.column(PngDecodeExpr(ExpressionUtils.expression(payload)))
  def gzipCol(text: Column): Column =
    ExpressionUtils.column(GzipExpr(ExpressionUtils.expression(text)))
  def gunzipCol(payload: Column): Column =
    ExpressionUtils.column(GunzipExpr(ExpressionUtils.expression(payload)))
}
