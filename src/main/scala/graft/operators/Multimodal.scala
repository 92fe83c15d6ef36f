package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video are opaque `binary`
  * payloads with a typed metadata struct riding alongside. The Spark-side
  * mechanics — schema, chunked explode for frame sampling, deterministic
  * batch shape — are real and tested; the actual media DECODE step is a
  * clearly-marked deterministic stub ([[fakeDecode]]) because no codec
  * libraries ship in this environment. Swapping in a real decoder changes
  * only that one column expression.
  */
object Multimodal {

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of the
    * text column stand in for media bytes) plus a metadata struct of the
    * kind an ingest service would carry (mime, size).
    */
  def withBinary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("payload")).cast("bigint").as("n_bytes")))

  /** STUB decode — deterministic fake in place of a real image decoder.
    * Emits (width, height, channels) derived from md5 of the payload so
    * downstream feature-extraction plumbing has realistic typed input —
    * md5 rather than xxhash so the stub's outputs are reproducible in any
    * engine (7 hex chars < 2^28: the conv result is exactly representable
    * and non-negative, so % agrees across engines). A real implementation
    * would decode `payload` via an image library; only this one column
    * expression changes.
    */
  def fakeDecode(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val hx = md5(col(payloadCol))
    df.withColumn("decoded", struct(
      (conv(substring(hx, 1, 7), 16, 10).cast("long") % 1280 + 32).cast("int").as("width"),
      (conv(substring(hx, 8, 7), 16, 10).cast("long") % 720 + 32).cast("int").as("height"),
      lit(3).as("channels")))
  }

  /** Frame sampling: explode the payload into fixed-size chunks — the
    * batch shape a video pipeline uses (doc, frame_idx, frame_bytes).
    * Pure expressions (sequence + transform + posexplode), so it scales as
    * a narrow map with no shuffle.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, payloadCol: String = "payload",
      idCol: String = "doc_id"): DataFrame = {
    val nFrames = ceil(octet_length(col(payloadCol)) / lit(frameBytes.toDouble)).cast("int")
    df
      // empty payload -> ZERO frames: guard the sequence, because
      // sequence(0, -1) yields a DESCENDING [0, -1] in Spark, which would
      // explode into two phantom frames
      .withColumn("frame_idx", explode(
        when(nFrames > 0, sequence(lit(0), nFrames - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame", expr(s"substring($payloadCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col(idCol), col("frame_idx").cast("bigint").as("frame_idx"), col("frame"))
  }

  /** PERCEPTUAL HASH (dHash) of an image payload — the standard
    * duplicate-image fingerprint: resize to an 8×8 grayscale grid, set
    * bit `7r+c` iff pixel(r,c) > pixel(r,c+1) — 56 gradient bits, robust
    * (with a real decoder) to rescaling/recompression. The PIXELS here
    * come from the documented STUB decode: a 4-link md5 chain of the
    * payload yields 64 deterministic bytes standing in for the resized
    * grid — engine-portable, so the full hash replays in SQL. With the
    * stub, only EXACT payload duplicates land at Hamming 0 (md5
    * avalanche destroys locality); with a real decoder the same
    * operator catches near-identical images at small Hamming — only the
    * pixel-source expression changes.
    *
    * 56 bits keeps the hash in a non-negative long (no sign games in
    * portable SQL). Map-only, codegen'd.
    */
  def dhashBits(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val h0 = md5(col(payloadCol))
    val chain = concat((0 until 4).map(i =>
      md5(concat(h0, lit(s":$i")))): _*)
    val withChain = df.withColumn("__ch", chain)
    val px = (j: Int) =>
      conv(substring(col("__ch"), 2 * j + 1, 2), 16, 10).cast("long")
    val bits = (for (r <- 0 until 8; c <- 0 until 7) yield {
      val k = 7 * r + c
      when(px(8 * r + c) > px(8 * r + c + 1), lit(1L << k)).otherwise(lit(0L))
    }).reduce(_ + _)
    withChain
      .select(col(idCol).cast("bigint").as("doc"), bits.as("dhash"))
  }

  /** Duplicate-image pairs by dHash Hamming distance, banded: the
    * 56-bit hash splits into `bands` equal slices and candidate pairs
    * agree on at least one slice — the [[graft.operators.Dedup]] SimHash
    * pigeonhole, EXACT for `maxHamming <= bands − 1` (a pair within that
    * distance cannot differ in every band), so the banding is a pure
    * pruning step and the oracle can be brute force. Verification is one
    * codegen'd `bit_count(xor)` per candidate.
    *
    * Scale shape: per-image fan-out = `bands` rows, band-keyed self-join
    * (identical template renders collide; unrelated images spread over
    * 2^14-value band keys), exact verify on the |candidates| set — no
    * all-pairs anywhere.
    */
  def dhashNearDups(
      df: DataFrame, idCol: String, payloadCol: String = "payload",
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    dhashNearDupsFromBits(dhashBits(df, idCol, payloadCol), maxHamming, bands)

  /** [[dhashNearDups]]' banding + verify over an ALREADY-COMPUTED
    * (doc, dhash) frame — the seam that lets the same pairing run over
    * stub-derived hashes ([[dhashBits]]) or REAL decoded pixels
    * ([[bmpDhash]]); the pigeonhole/banding contract is identical.
    */
  def dhashNearDupsFromBits(
      hashes: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands >= 1 && 56 % bands == 0, "bands must divide 56")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      "dhashNearDups: maxHamming <= bands - 1 (the pigeonhole guarantee)")
    val width = 56 / bands
    val banded = hashes.select(col("doc"), col("dhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey",
        expr(s"shiftright(dhash, band * $width) & ${(1L << width) - 1}L"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** STUB feature extraction over decoded frames: a deterministic 8-dim
    * "embedding" per frame, dimension i = (3 md5 hex chars of the frame,
    * offset 3i) mod 1000 / 1000 — md5-derived so any engine reproduces the
    * vector exactly. The frame's digest is STAGED as a column (HOF lambdas
    * re-evaluate free subexpressions per element); the real version would
    * run a vision encoder with the identical Spark batch shape.
    */
  def fakeFrameFeatures(frames: DataFrame): DataFrame =
    frames
      .withColumn("__fh", md5(col("frame")))
      .withColumn("features",
        transform(sequence(lit(0), lit(7)),
          i => (conv(substr(col("__fh"), i * 3 + 1, lit(3)), 16, 10).cast("long") % 1000) / 1000.0))
      .drop("__fh")

  // ------------------------------------------------------------------ WAV

  import org.apache.spark.sql.Column

  /** One unsigned byte of a binary column as a long (1-based position). */
  private def byteAt(payload: Column, pos: Column): Column =
    conv(hex(payload.substr(pos, lit(1))), 16, 10).cast("long")

  /** Little-endian unsigned integer read: `nBytes` bytes at 1-based `pos`. */
  private def leUint(payload: Column, pos: Column, nBytes: Int): Column =
    (0 until nBytes).map(b => shiftleft(byteAt(payload, pos + lit(b)), 8 * b))
      .reduce(_ + _)

  /** Little-endian hex rendering of the low `nBytes` bytes of a long —
    * the synthesis-side inverse of [[leUint]]. */
  private def leHex(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(b =>
      lpad(lower(hex(shiftright(v, 8 * b).bitwiseAND(lit(255L)))), 2, "0")): _*)

  /** Synthesize a VALID 16-bit mono PCM RIFF/WAV payload per row,
    * deterministic in `id` — a 44-byte canonical header plus
    * `50 + id % 50` little-endian samples `((id·6151 + i·2917) mod
    * 65536)` (two's-complement int16 — the multipliers sweep the full
    * range, so every payload carries both signs and real zero crossings)
    * at `8000 + (id % 3)·4000` Hz. Real WAV bytes (any audio tool reads
    * them), built entirely from expressions, so the [[wavFeatures]]
    * decoder can be exercised — and oracle-checked — without any media
    * library in the environment.
    */
  def wavBytes(id: Column): Column = {
    val rate = lit(8000L) + (id.cast("long") % 3) * 4000L
    val n = lit(50L) + id.cast("long") % 50
    val dataSize = n * 2
    val headerHex = concat(
      lit("52494646"), leHex(dataSize + 36L, 4), // "RIFF" + chunk size
      lit("57415645"), // "WAVE"
      lit("666d7420"), leHex(lit(16L), 4), // "fmt " + subchunk size
      leHex(lit(1L), 2), leHex(lit(1L), 2), // PCM, mono
      leHex(rate, 4), leHex(rate * 2, 4), // sample rate, byte rate
      leHex(lit(2L), 2), leHex(lit(16L), 2), // block align, bits/sample
      lit("64617461"), leHex(dataSize, 4)) // "data" + data size
    val dataHex = array_join(
      transform(sequence(lit(0L), n - 1),
        i => leHex((id.cast("long") * 6151 + i * 2917) % 65536, 2)), "")
    unhex(concat(headerHex, dataHex))
  }

  /** REAL WAV/PCM DECODE — not a stub: parse the RIFF header and the
    * 16-bit little-endian samples of a canonical-layout mono PCM WAV
    * payload with plain byte arithmetic (substr + hex + shifts — no
    * codec library), and emit the audio features an ingest pipeline
    * gates on: `(doc, valid, sample_rate, n_samples, duration_micros,
    * peak_abs, energy_mean, zero_crossings)`. Exact integers throughout
    * (energy_mean = Σ s² DIV n, duration in integer microseconds), so
    * the result is engine-portable.
    *
    * `valid` checks the RIFF/WAVE/fmt/data magics, PCM format 1, mono,
    * 16-bit, and that the declared data size fits the payload; feature
    * columns are NULL on invalid rows (the decode-gate convention — a
    * malformed blob is a drop reason, never a crash). Canonical 44-byte
    * layout only: WAVs with extra chunks before `data` read as invalid
    * rather than mis-parsed.
    *
    * Scale shape: map-only over the payload column — one narrow pass, no
    * shuffle; the per-row sample loop is array work on a staged column.
    * Compressed codecs (MP3/JPEG/H.264) remain environment-stubbed; this
    * is the uncompressed-container path a real ingest runs first.
    */
  def wavFeatures(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val staged = df
      .withColumn("__len", octet_length(p).cast("long"))
      // p.isNotNull FIRST: a NULL payload must read as valid = FALSE, not
      // NULL — NULL would escape both filter(valid) and filter(!valid),
      // defeating the "malformed blob is a drop reason" gate (false AND
      // NULL = false, so the one non-null conjunct pins the whole chain)
      .withColumn("__valid",
        p.isNotNull &&
          col("__len") >= 46 &&
          hex(p.substr(lit(1), lit(4))) === "52494646" && // RIFF
          hex(p.substr(lit(9), lit(8))) === "57415645666D7420" && // WAVEfmt_
          leUint(p, lit(17), 4) === 16 && // fmt subchunk size
          leUint(p, lit(21), 2) === 1 && // PCM
          leUint(p, lit(23), 2) === 1 && // mono
          leUint(p, lit(35), 2) === 16 && // bits per sample
          hex(p.substr(lit(37), lit(4))) === "64617461" && // data
          leUint(p, lit(41), 4) % 2 === 0 &&
          leUint(p, lit(41), 4) <= col("__len") - 44 &&
          leUint(p, lit(41), 4) >= 2 &&
          leUint(p, lit(25), 4) >= 1)
      .withColumn("__rate", when(col("__valid"), leUint(p, lit(25), 4)))
      .withColumn("__n", when(col("__valid"), shiftright(leUint(p, lit(41), 4), 1)))
      .withColumn("__s", when(col("__valid"),
        transform(sequence(lit(0L), col("__n") - 1), i => {
          val u = leUint(p, lit(45L) + i * 2, 2)
          u - when(u >= 32768L, lit(65536L)).otherwise(lit(0L))
        })))
    staged.select(
      col(idCol).as("doc"),
      col("__valid").as("valid"),
      col("__rate").as("sample_rate"),
      col("__n").as("n_samples"),
      when(col("__valid"), expr("__n * 1000000 DIV __rate"))
        .as("duration_micros"),
      when(col("__valid"),
        aggregate(col("__s"), lit(0L), (a, x) => greatest(a, abs(x))))
        .as("peak_abs"),
      when(col("__valid"), expr(
        "aggregate(__s, 0L, (a, x) -> a + x * x) DIV __n")).as("energy_mean"),
      when(col("__valid") && col("__n") > 1,
        aggregate(
          zip_with(
            slice(col("__s"), lit(1), (col("__n") - 1).cast("int")),
            slice(col("__s"), lit(2), (col("__n") - 1).cast("int")),
            (prev, cur) => when(prev * cur < 0, lit(1L)).otherwise(lit(0L))),
          lit(0L), (a, x) => a + x))
        .when(col("__valid"), lit(0L))
        .as("zero_crossings"))
  }

  // ------------------------------------------------------------------ BMP

  /** Synthesize a VALID 24-bpp bottom-up BMP payload per row,
    * deterministic in `id`: a canonical 54-byte header (BITMAPFILEHEADER
    * + BITMAPINFOHEADER) over a `(8 + id % 9) × (8 + id % 5)` image whose
    * pixel at (x, y from top) is
    * `B = (id·7 + x·13 + y·31) % 256, G = (id·11 + x·17 + y·23) % 256,
    * R = (id·3 + x·29 + y·19) % 256`, rows stored bottom-up in BGR order
    * with each row zero-padded to a 4-byte boundary (the width sweep
    * 8..16 exercises every padding residue). Real BMP bytes — any image
    * viewer opens them — built entirely from expressions, so the
    * [[bmpFeatures]] decoder is oracle-round-trippable with zero image
    * libraries (the [[wavBytes]] discipline applied to pixels).
    */
  def bmpBytes(id: Column): Column = {
    val idL = id.cast("long")
    val w = lit(8L) + idL % 9
    val h = lit(8L) + idL % 5
    val stride = (w * 3 + 3) - (w * 3 + 3) % 4 // row size padded to 4 bytes
    val dataSize = stride * h
    val headerHex = concat(
      lit("424d"), leHex(dataSize + 54L, 4), // "BM" + file size
      lit("00000000"), leHex(lit(54L), 4), // reserved + pixel-array offset
      leHex(lit(40L), 4), // BITMAPINFOHEADER size
      leHex(w, 4), leHex(h, 4), // width, height (positive = bottom-up)
      leHex(lit(1L), 2), leHex(lit(24L), 2), // planes, bits per pixel
      leHex(lit(0L), 4), leHex(dataSize, 4), // BI_RGB, image size
      leHex(lit(2835L), 4), leHex(lit(2835L), 4), // 72 dpi x/y
      leHex(lit(0L), 4), leHex(lit(0L), 4)) // palette counts
    // bottom-up rows: file row rf holds image row y = h-1-rf
    val dataHex = array_join(
      transform(sequence(lit(0L), h - 1), rf =>
        concat(
          array_join(transform(sequence(lit(0L), w - 1), x => {
            val y = h - 1 - rf
            concat(
              leHex((idL * 7 + x * 13 + y * 31) % 256, 1),
              leHex((idL * 11 + x * 17 + y * 23) % 256, 1),
              leHex((idL * 3 + x * 29 + y * 19) % 256, 1))
          }), ""),
          // row padding: 0..3 zero bytes (substr of a fixed "000000" —
          // functions.repeat takes only a literal count)
          lit("000000").substr(lit(1), ((stride - w * 3) * 2).cast("int")))), "")
    unhex(concat(headerHex, dataHex))
  }

  /** REAL BMP DECODE — not a stub: parse the BITMAPFILEHEADER /
    * BITMAPINFOHEADER and the bottom-up, 4-byte-padded BGR pixel rows of
    * a canonical 24-bpp uncompressed BMP with plain byte arithmetic
    * (substr + hex + shifts, no image library), and emit the image
    * features an ingest pipeline gates on plus the REAL-pixel dHash:
    * `(doc, valid, width, height, n_pixels, mean_luma_milli,
    * min_luma_milli, max_luma_milli, dhash)`. Luma is exact integer
    * BT.601 milli-luma (299·R + 587·G + 114·B ∈ [0, 255000]); the mean
    * is an integer DIV; `dhash` is the standard difference hash over an
    * 8×8 nearest-neighbor grid of the DECODED lumas (grid cell (r, c) =
    * pixel at row (r·h) DIV 8, col (c·w) DIV 8; bit 7r+c set iff
    * cell > right neighbor — 56 bits, non-negative), so the image-dedup
    * family operates on actual image content, not payload-hash stubs.
    *
    * `valid` checks the BM magic, a 40-byte BITMAPINFOHEADER, planes 1,
    * 24 bpp, BI_RGB compression, sane bottom-up dimensions (1..2^20 —
    * a top-down BMP's negative height reads as an enormous unsigned and
    * fails here, documented as out of the canonical contract), and that
    * the declared pixel array fits the payload; feature columns are NULL
    * on invalid rows and a NULL payload reads valid = FALSE (the
    * [[wavFeatures]] decode-gate convention).
    *
    * Scale shape: map-only over the payload column, one narrow pass; the
    * per-pixel loop is array work on staged columns (every lambda free
    * variable is a bound attribute, never a recomputed subexpression).
    */
  def bmpFeatures(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val staged = df
      .withColumn("__len", octet_length(p).cast("long"))
      .withColumn("__valid",
        p.isNotNull &&
          col("__len") >= 58 && // 54-byte header + at least one padded row
          hex(p.substr(lit(1), lit(2))) === "424D" && // "BM"
          leUint(p, lit(15), 4) === 40 && // BITMAPINFOHEADER
          leUint(p, lit(27), 2) === 1 && // planes
          leUint(p, lit(29), 2) === 24 && // bits per pixel
          leUint(p, lit(31), 4) === 0 && // BI_RGB (uncompressed)
          leUint(p, lit(19), 4).between(1L, 1L << 20) && // width
          leUint(p, lit(23), 4).between(1L, 1L << 20) && // height (bottom-up)
          leUint(p, lit(11), 4) >= 54 && // pixel-array offset
          leUint(p, lit(11), 4) +
            ((leUint(p, lit(19), 4) * 3 + 3) -
              (leUint(p, lit(19), 4) * 3 + 3) % 4) * leUint(p, lit(23), 4)
            <= col("__len"))
      .withColumn("__w", when(col("__valid"), leUint(p, lit(19), 4)))
      .withColumn("__h", when(col("__valid"), leUint(p, lit(23), 4)))
      .withColumn("__off", when(col("__valid"), leUint(p, lit(11), 4)))
      .withColumn("__stride", (col("__w") * 3 + 3) - (col("__w") * 3 + 3) % 4)
      // top-down row-major milli-lumas: element p = pixel (x = p % w,
      // y = p DIV w), read from file row h-1-y (bottom-up storage), BGR
      .withColumn("__lum", when(col("__valid"),
        transform(sequence(lit(0L), col("__w") * col("__h") - 1), px => {
          val x = px % col("__w")
          // exact integer y: (px - x) is divisible by w and far below
          // 2^53, so the double division is exact before the cast
          val y = ((px - x) / col("__w")).cast("long")
          val base = col("__off") + (col("__h") - 1 - y) * col("__stride") +
            x * 3 + 1
          byteAt(p, base) * 114 + byteAt(p, base + 1) * 587 +
            byteAt(p, base + 2) * 299
        })))
    val n = col("__w") * col("__h")
    // 8x8 nearest-neighbor grid over the staged luma array; named-column
    // expr strings give exact integer DIV
    def cell(r: Int, c: Int): Column =
      expr(s"element_at(__lum, CAST((($r * __h) DIV 8) * __w + (($c * __w) DIV 8) AS INT) + 1)")
    val bits = (for (r <- 0 until 8; c <- 0 until 7) yield {
      val k = 7 * r + c
      when(cell(r, c) > cell(r, c + 1), lit(1L << k)).otherwise(lit(0L))
    }).reduce(_ + _)
    staged.select(
      col(idCol).as("doc"),
      col("__valid").as("valid"),
      col("__w").as("width"),
      col("__h").as("height"),
      when(col("__valid"), n).as("n_pixels"),
      when(col("__valid"), expr(
        "aggregate(__lum, 0L, (a, x) -> a + x) DIV (__w * __h)"))
        .as("mean_luma_milli"),
      when(col("__valid"), array_min(col("__lum"))).as("min_luma_milli"),
      when(col("__valid"), array_max(col("__lum"))).as("max_luma_milli"),
      when(col("__valid"), bits).as("dhash"))
  }

  /** (doc, dhash) over REAL decoded BMP pixels — the [[dhashBits]]
    * drop-in whose hash actually reflects image content: feed it to
    * [[dhashNearDupsFromBits]] and near-identical IMAGES (not just
    * byte-identical payloads) pair at small Hamming distance. Invalid
    * payloads are dropped (no hash, exactly like a failed decode). */
  def bmpDhash(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame =
    bmpFeatures(df, idCol, payloadCol)
      .filter(col("valid"))
      .select(col("doc").cast("bigint").as("doc"), col("dhash"))

  // ------------------------------------------------------------------ PNG

  /** Synthesize a VALID 8-bit truecolor PNG per row, deterministic in
    * `id`: real zlib-compressed IDAT (JDK Deflater), real CRC32 chunk
    * checksums — any image viewer opens it — with scanline r carrying
    * filter type `(id + r) % 5`, so decoding exercises ALL FIVE PNG
    * filters. Pixels follow a closed formula over an
    * `(8 + id % 7) × (8 + id % 6)` canvas (see
    * [[org.apache.spark.sql.graftvec.MediaExprs.pngSynth]]), which is
    * what the oracle replays: compressed BYTES may legitimately vary by
    * zlib version, decoded CONTENT cannot. */
  def pngBytes(id: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.pngSynthCol(id.cast("long"))

  /** REAL PNG DECODE — a compressed container, decoded for real with
    * the JDK's own zlib (`java.util.zip.Inflater` — in every JVM, so
    * the "no codec libraries" environment constraint does not bind the
    * DEFLATE family): signature + chunk walk with CRC32 verification,
    * IHDR validation (8-bit truecolor, no interlace), in-order IDAT
    * concatenation, inflate, and full scanline unfiltering
    * (None/Sub/Up/Average/Paeth). Emits the [[bmpFeatures]] contract —
    * `(doc, valid, width, height, n_pixels, mean_luma_milli,
    * min_luma_milli, max_luma_milli, dhash)` with exact integer BT.601
    * milli-lumas and the real-pixel dHash — NULL features and
    * valid = false on anything malformed (bad magic/IHDR, CRC mismatch,
    * truncated or corrupt deflate stream, size disagreement). Map-only;
    * the per-row work is one compiled decode call. JPEG decodes for real
    * too ([[jpegFeatures]] — ImageIO ships in the JDK); H.264/MP3 stay
    * environment-stubbed: their codecs do not ship in the JDK.
    */
  def pngFeatures(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val staged = df.withColumn("__f",
      org.apache.spark.sql.graftvec.MediaExprs.pngDecodeCol(col(payloadCol)))
    def fld(i: Int): Column = col("__f").getItem(i)
    staged.select(
      col(idCol).as("doc"),
      col("__f").isNotNull.as("valid"),
      fld(1).as("width"), fld(2).as("height"), fld(3).as("n_pixels"),
      fld(4).as("mean_luma_milli"), fld(5).as("min_luma_milli"),
      fld(6).as("max_luma_milli"), fld(7).as("dhash"))
  }

  /** (doc, dhash) over REAL decoded PNG pixels — [[bmpDhash]]'s twin;
    * BMP and PNG renders of the SAME image land at Hamming 0 (the
    * cross-container dedup property a real ingest needs). */
  def pngDhash(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame =
    pngFeatures(df, idCol, payloadCol)
      .filter(col("valid"))
      .select(col("doc").cast("bigint").as("doc"), col("dhash"))

  // ----------------------------------------------------------------- jpeg

  /** Synthesize a REAL JPEG per row via the JDK's own `javax.imageio`
    * writer (quality 1.0, deterministic smooth gradient over an
    * `(8 + id % 7) × (8 + id % 6)` canvas — gradients survive lossy DCT
    * coding; see the MediaExprs scaladoc for the formula and why the
    * oracle contract is deliberately weaker than PNG's). */
  def jpegBytes(id: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.jpegSynthCol(id.cast("long"))

  /** REAL JPEG DECODE via the JDK's ImageIO reader (the entropy decoder
    * SHIPS in every standard JDK — this closes the last "environment-
    * stubbed" image class): full decode to pixels, then the shared
    * decoded-image fold — the exact [[bmpFeatures]]/[[pngFeatures]]
    * output contract, so JPEG renders join the cross-container
    * image-dedup family. CONTRACT NOTE, stated loudly: JPEG is LOSSY —
    * decoded pixels are not a closed formula of the input, so q297's
    * oracle pins only (valid, width, height, n_pixels) exactly;
    * luma stats and dHash are spec-pinned within a tolerance band
    * (MultimodalSpec), unlike the byte-exact PNG/BMP contracts. */
  def jpegFeatures(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val staged = df.withColumn("__f",
      org.apache.spark.sql.graftvec.MediaExprs.jpegDecodeCol(col(payloadCol)))
    def fld(i: Int): Column = col("__f").getItem(i)
    staged.select(
      col(idCol).as("doc"),
      col("__f").isNotNull.as("valid"),
      fld(1).as("width"), fld(2).as("height"), fld(3).as("n_pixels"),
      fld(4).as("mean_luma_milli"), fld(5).as("min_luma_milli"),
      fld(6).as("max_luma_milli"), fld(7).as("dhash"))
  }

  /** (doc, dhash) over REAL decoded JPEG pixels — [[bmpDhash]]'s lossy
    * sibling: a JPEG render of an image lands within a SMALL Hamming
    * distance of its BMP/PNG renders (spec-pinned band), which is
    * exactly what near-dup image matching at `maxHamming > 0` exists
    * for. */
  def jpegDhash(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame =
    jpegFeatures(df, idCol, payloadCol)
      .filter(col("valid"))
      .select(col("doc").cast("bigint").as("doc"), col("dhash"))

  // ----------------------------------------------------------------- gzip

  /** Gzip-compress a text column (real GZIPOutputStream — valid .gz
    * members) — the generator side of the web-crawl ingest shape where
    * documents arrive as compressed blobs. */
  def gzipText(text: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.gzipCol(text)

  /** Decompress a gzip member to text; NULL on malformed input (bad
    * magic, truncated stream, CRC mismatch — the decode-gate
    * convention), output capped at 64 MiB per row against
    * decompression bombs. Map-only, runs at scan speed — the first
    * transform over a compressed crawl dump. */
  def gunzipText(payload: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.gunzipCol(payload)

  // ------------------------------------------------------------------ zip

  /** Synthesize a valid two-member ZIP per row (real ZipOutputStream:
    * `doc.txt` = the text, `meta.txt` = `id=<id>`) — the multi-member
    * archive shape of batch document ingest. */
  def zipBytes(id: Column, text: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.zipSynthCol(id.cast("long"), text)

  // ------------------------------------------------------------------ tar

  /** Synthesize a valid two-member POSIX ustar archive per row
    * (`doc.txt` = the text, `meta.txt` = `id=<id>` — the [[zipBytes]]
    * member shape in the other classic batch container; GNU tar lists
    * and extracts the output). The JDK has no tar codec; ustar is plain
    * 512-byte-block arithmetic built from the format spec. */
  def tarBytes(id: Column, text: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.tarSynthCol(id.cast("long"), text)

  /** EXPLODE a tar archive — plain ustar or `.tar.gz` (gzip magic →
    * the shared capped multi-member reader) — into one row per REGULAR
    * member, in archive order: `(doc, entry_no, entry_name, n_bytes,
    * data)` (the [[zipEntries]] schema, so downstream ingest is
    * container-agnostic). Header checksums are verified; directories /
    * links / pax blocks are skipped with their data blocks honored; a
    * malformed archive yields ZERO rows. */
  def tarMembers(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame =
    df
      .select(col(idCol).as("doc"),
        posexplode(org.apache.spark.sql.graftvec.MediaExprs
          .tarEntriesCol(col(payloadCol))).as(Seq("entry_no", "e")))
      .select(col("doc"), col("entry_no").cast("bigint").as("entry_no"),
        col("e.name").as("entry_name"),
        octet_length(col("e.data")).cast("bigint").as("n_bytes"),
        col("e.data").as("data"))

  // ----------------------------------------------------------------- warc

  /** Synthesize a valid two-record `.warc.gz` per row (real ISO-28500
    * records, individually gzipped and concatenated — the Common Crawl
    * container layout): a `response` record carrying `content` (pass an
    * [[graft.operators.WebCuration.htmlWrap]] page for the full
    * crawl-dump shape) and a `metadata` record carrying `id=<id>`. */
  def warcBytes(id: Column, content: Column): Column =
    org.apache.spark.sql.graftvec.MediaExprs.warcSynthCol(id.cast("long"), content)

  /** EXPLODE a WARC file into one row per record, in file order:
    * `(doc, record_no, warc_type, target_uri, n_bytes, content)` — the
    * crawl-dump ingest operator: plain `.warc` or `.warc.gz`
    * (concatenated gzip members decode through the JDK reader), header
    * names case-insensitive, `target_uri` NULL where the spec allows it
    * (warcinfo). One narrow generate per file, no shuffle; a malformed
    * file yields ZERO rows (NULL from the decoder — the decode-gate
    * convention), and decompression is capped at 64 MiB per file.
    * Compose with [[graft.operators.WebCuration.extractMainContent]]
    * over the response records for the crawl → text ladder.
    *
    * `capBytes` bounds the DECOMPRESSED archive (default 64 MiB — the
    * shared decode budget). This walker holds one whole archive per row,
    * the right shape for per-document payloads; real Common Crawl
    * members (~1 GB .warc.gz each) should go through
    * [[warcRecordsFromFiles]], which streams records one at a time. */
  def warcRecords(
      df: DataFrame, idCol: String, payloadCol: String = "payload",
      capBytes: Long = 64L << 20): DataFrame =
    df
      .select(col(idCol).as("doc"),
        posexplode(org.apache.spark.sql.graftvec.MediaExprs
          .warcRecordsCol(col(payloadCol), capBytes)).as(Seq("record_no", "r")))
      .select(col("doc"), col("record_no").cast("bigint").as("record_no"),
        col("r.warc_type").as("warc_type"),
        col("r.target_uri").as("target_uri"),
        octet_length(col("r.content")).cast("bigint").as("n_bytes"),
        col("r.content").as("content"))

  /** One decoded WARC record from the streaming reader. */
  final case class WarcRec(
      warcType: String, targetUri: Option[String], content: Array[Byte])

  /** PER-RECORD streaming WARC reader — the real-Common-Crawl shape
    * (~1 GB .warc.gz members): decodes the gzip members incrementally
    * (the JDK reader walks concatenated members transparently) and
    * yields one record at a time under a PER-RECORD budget, so peak
    * memory is one record + the 64 KB stream buffers, never the
    * archive. The caller owns `raw` (close it when the iterator is
    * exhausted or abandoned).
    *
    * Malformed input THROWS (IllegalArgumentException) instead of the
    * expression walker's all-or-nothing NULL: a streaming reader has
    * already emitted earlier records when it hits a bad byte, so
    * null-gating the whole file is impossible without buffering it —
    * which is exactly what this variant exists to avoid. Use it for
    * validated corpus-of-record dumps; adversarial payloads belong on
    * the expression path. */
  def warcRecordIterator(
      raw: java.io.InputStream,
      perRecordCap: Long = 64L << 20): Iterator[WarcRec] = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WARC: $msg")
    val pb = new java.io.PushbackInputStream(raw, 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val in: java.io.InputStream =
      if (b0 == 0x1F && b1 == 0x8B)
        new java.util.zip.GZIPInputStream(pb, 64 << 10)
      else pb
    val buf = new java.io.BufferedInputStream(in, 64 << 10)
    // CRLF-terminated header line (≤ 8192 bytes), or null at clean EOF
    // when atBoundary — decoded UTF-8 like the expression walker
    def readLine(atBoundary: Boolean): String = {
      val acc = new java.io.ByteArrayOutputStream(128)
      var c = buf.read()
      if (c < 0) {
        if (atBoundary) return null else bad("truncated header")
      }
      var prev = -1
      while (c >= 0 && !(prev == '\r' && c == '\n')) {
        if (acc.size > 8192) bad("oversized header line")
        acc.write(c); prev = c; c = buf.read()
      }
      if (c < 0) bad("unterminated header line")
      val bytes = acc.toByteArray
      new String(bytes, 0, bytes.length - 1, "UTF-8") // drop the '\r'
    }
    new scala.collection.AbstractIterator[WarcRec] {
      private var nextRec: WarcRec = _
      private var finished = false
      private def advance(): Unit = {
        val magic = readLine(atBoundary = true)
        if (magic == null) { finished = true; return }
        if (!magic.startsWith("WARC/")) bad(s"record magic '$magic'")
        var typ: String = null
        var uri: String = null
        var len = -1L
        var headerLines = 0
        var line = readLine(atBoundary = false)
        while (line != null && line.nonEmpty) {
          headerLines += 1
          if (headerLines > 64) bad("too many header lines")
          val cpos = line.indexOf(':')
          if (cpos <= 0) bad(s"header line '$line'")
          val name =
            line.substring(0, cpos).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(cpos + 1).trim
          name match {
            case "warc-type" => typ = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              len = try value.toLong
                catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
          line = readLine(atBoundary = false)
        }
        if (typ == null || len < 0) bad("missing WARC-Type/Content-Length")
        if (len > perRecordCap || len > Int.MaxValue - 8)
          bad(s"record block $len over per-record cap")
        val block = buf.readNBytes(len.toInt)
        if (block.length != len) bad("truncated block")
        val sep = buf.readNBytes(4)
        if (!java.util.Arrays.equals(sep,
          Array[Byte]('\r', '\n', '\r', '\n'))) bad("missing CRLFCRLF")
        nextRec = WarcRec(typ, Option(uri), block)
      }
      override def hasNext: Boolean = {
        if (!finished && nextRec == null) advance()
        !finished && nextRec != null
      }
      override def next(): WarcRec = {
        if (!hasNext) throw new NoSuchElementException("WARC iterator")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** [[warcRecordIterator]] as a Dataset transform over (doc, path) rows
    * — the distributed scale path for real crawl dumps: each task opens
    * its files through Hadoop's FileSystem and streams records straight
    * off storage (HDFS/S3/file alike), so a 1 GB member costs one
    * record of memory at a time instead of one array row. Output schema
    * matches [[warcRecords]]. mapPartitions, deliberately: incremental
    * container decode over an open stream is genuinely imperative
    * per-partition work no Catalyst expression can express without
    * materializing the blob (this is the documented last-resort case).
    */
  def warcRecordsFromFiles(
      files: DataFrame, idCol: String, pathCol: String,
      perRecordCap: Long = 64L << 20): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    // ship only the serializable (k, v) pairs — Configuration itself is
    // Writable, not Serializable
    val confKv = {
      val c = spark.sessionState.newHadoopConf()
      val it = c.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    val out = files
      .select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        lazy val conf = {
          val c = new org.apache.hadoop.conf.Configuration(false)
          confKv.foreach { case (k, v) => c.set(k, v) }
          c
        }
        it.flatMap { case (doc, path) =>
          val p = new org.apache.hadoop.fs.Path(path)
          val in = p.getFileSystem(conf).open(p)
          var recNo = -1L
          val recs = Multimodal.warcRecordIterator(in, perRecordCap)
          // close on exhaustion (the task consumes each file's iterator
          // fully before the next flatMap element)
          new scala.collection.AbstractIterator[
              (Long, Long, String, Option[String], Long, Array[Byte])] {
            override def hasNext: Boolean = {
              val h = try recs.hasNext
                catch { case e: Throwable => in.close(); throw e }
              if (!h) in.close()
              h
            }
            override def next() = {
              val r = recs.next()
              recNo += 1
              (doc, recNo, r.warcType, r.targetUri,
                r.content.length.toLong, r.content)
            }
          }
        }
      }
    out.toDF("doc", "record_no", "warc_type", "target_uri", "n_bytes", "content")
  }

  /** EXPLODE a ZIP archive into one row per member, in archive order:
    * `(doc, entry_no, entry_name, n_bytes, data)` — the container
    * ingest between gzip's single member and a full crawl dump: one
    * narrow generate per archive, no shuffle; a malformed archive
    * yields ZERO rows (NULL from the decoder — compose with an
    * anti-join against the exploded ids to report drops). Per-archive
    * 64 MiB zip-bomb cap inside the decoder. */
  def zipEntries(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame =
    df
      .select(col(idCol).as("doc"),
        posexplode(org.apache.spark.sql.graftvec.MediaExprs
          .zipEntriesCol(col(payloadCol))).as(Seq("entry_no", "e")))
      .select(col("doc"), col("entry_no").cast("bigint").as("entry_no"),
        col("e.name").as("entry_name"),
        octet_length(col("e.data")).cast("bigint").as("n_bytes"),
        col("e.data").as("data"))
}
