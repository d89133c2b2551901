package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, and every decode stage runs a
  * GENUINE codec round-trip — PNG, JPEG, BMP and multi-frame TIFF
  * through javax.imageio (JDK-built-in), WAV through a byte-correct
  * RIFF/PCM16 encode + chunk-walking parse. The Spark shape is the
  * production one throughout: BinaryType columns, explicit result
  * schemas, per-partition batch iteration via `mapPartitions`, and
  * frame/feature extraction as narrow map stages.
  *
  * The `documents.text` bytes stand in for media payloads (the
  * fixtures ship no real blobs): each stage rasterizes the payload
  * bytes into genuine media content, encodes it with the real codec,
  * decodes it back, and emits scalars from the DECODED output.
  * Lossless codecs (PNG/BMP/TIFF gray-8, PCM16) make the decoded
  * values predictable from the rasterization arithmetic alone, so the
  * DuckDB oracle hash-checks the full encode→decode loop end-to-end;
  * the lossy JPEG stage constrains its content (flat DC-only blocks)
  * until the round-trip is provably exact and pins the error to 0.
  *
  * Scale notes: decode is embarrassingly parallel (narrow map over
  * partitions); at 100 TB the only knob that matters is input split
  * size (`spark.sql.files.maxPartitionBytes`) so a partition of blobs
  * fits executor memory.
  */
/** Result schema of the BMP round-trip decoder. Top-level (not
  * nested/private) so the ExpressionEncoder's generated code can reach
  * the accessors — a private nested case class makes janino reject the
  * generated class and Spark silently falls back to the interpreted
  * encoder.
  */
case class BmpDecoded(
    doc_id: Long, width: Int, height: Int, px_sum: Long, px0: Int,
    max_err: Int)

/** Result schema of the real-codec round-trip — top-level for the same
  * encoder-codegen reason as [[BmpDecoded]].
  */
case class PngDecoded(
    doc_id: Long, width: Int, height: Int, px_sum: Long, mid_px: Int)

/** Result schema of the perceptual-hash stage — top-level for the same
  * encoder-codegen reason as [[BmpDecoded]].
  */
case class PhashRow(doc_id: Long, phash: Long)

/** One keyframe fingerprint of a decoded multi-frame payload —
  * top-level for the same encoder-codegen reason as [[BmpDecoded]].
  */
case class VideoKeyframe(doc_id: Long, frame_idx: Int, phash: Long)

/** One luma-histogram bin of a decoded raster — top-level for the
  * same encoder-codegen reason as [[BmpDecoded]].
  */
case class LumaBin(doc_id: Long, bin: Int, n_px: Long, share: Double)

/** Result schema of the real box-filter resize — top-level for the
  * same encoder-codegen reason as [[BmpDecoded]].
  */
case class ResizedRealRow(doc_id: Long, y: Int, row_sum: Long)

/** Result schema of the real decoded-raster feature extraction —
  * top-level for the same encoder-codegen reason as [[BmpDecoded]].
  */
case class PngFeatures(
    doc_id: Long, px_sum: Long, px_sum_sq: Long, px_min: Int, px_max: Int,
    grad_sum: Long)

/** Result schema of the decoded-audio frame features — top-level for
  * the same encoder-codegen reason as [[BmpDecoded]].
  */
case class AudioFrame(
    doc_id: Long, frame_idx: Int, energy: Long, zero_crossings: Int,
    peak: Int)

/** Result schema of the multi-frame TIFF round-trip — top-level for
  * the same encoder-codegen reason as [[BmpDecoded]].
  */
case class TiffFrame(
    doc_id: Long, n_frames: Int, frame_idx: Int, px_sum: Long, px_max: Int)

/** Result schema of the JPEG round-trip — top-level for the same
  * encoder-codegen reason as [[BmpDecoded]].
  */
case class JpegDecoded(
    doc_id: Long, width: Int, height: Int, px_sum: Long, mid_px: Int,
    max_err: Int)

/** Result schema of the WAV round-trip — top-level for the same
  * encoder-codegen reason as [[BmpDecoded]].
  */
case class WavDecoded(
    doc_id: Long, sample_rate: Int, n_channels: Int, n_samples: Int,
    abs_sum: Long, first_sample: Int)

object Multimodal {


  /** Codec-stage precondition: every byte-sampling stage indexes the
    * payload modulo its length, so an empty payload would be a cryptic
    * ArithmeticException mid-stage. Fail loud with the contract
    * instead (fixture documents are non-empty ASCII; a production
    * ingest would filter or dead-letter empties before decode).
    */
  private def requirePayload(id: Long, blob: Array[Byte]): Unit =
    require(blob.nonEmpty,
      s"doc $id: empty payload — codec stages sample bytes modulo payload length")

  /** ImageIO's stream wrappers default to DISK caching: every
    * write/read over an in-memory byte stream creates (and fsyncs,
    * and deletes) a temp FILE — thousands of file creations per codec
    * query per pass, pure overhead when the payloads are a few KiB and
    * already in memory. Flip the JVM-global default to memory caching
    * once per executor JVM; every codec stage calls this at partition
    * start (idempotent, a plain volatile write).
    */
  private def imageIoMemoryCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) // idempotent fast path
      javax.imageio.ImageIO.setUseCache(false)

  /** Blob-level metadata: size + content hash + magic bytes. */
  private def blobMeta(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(
        col("doc_id"),
        octet_length(col("blob")).as("n_bytes"),
        sha2(col("blob"), 256).as("sha256_hex"),
        lower(hex(substring(col("blob"), 1, 4))).as("magic_hex"))
      .orderBy(col("doc_id"))
  }

  private val blobMetaSql =
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  sha256(text) AS sha256_hex,
      |  lower(hex(substring(text, 1, 4))) AS magic_hex
      |FROM documents ORDER BY doc_id""".stripMargin


  /** REAL codec round-trip #4 — BMP via javax.imageio. BMP gray-8 is
    * stored as an uncompressed palettized raster (BI_RGB, 8-bit
    * indices into a grayscale palette), so unlike PNG this also pins
    * the raw-raster container path: no filter pass, no DEFLATE — a
    * codec bug cannot hide behind entropy coding. Each document
    * rasterizes its payload bytes to a 16x16 grayscale image, encodes
    * to genuine BMP bytes, decodes back, and emits scalars from the
    * DECODED image — dimensions, pixel sum, first pixel, and the max
    * deviation from the source raster (oracle-pinned to 0: BMP is
    * lossless, so any error anywhere in either codec direction fails
    * the gate). Pixels are read back as RASTER samples, not getRGB —
    * TYPE_BYTE_GRAY's ColorModel treats its samples as LINEAR gray,
    * so getRGB runs the nonlinear gray→sRGB conversion (probed:
    * sample 16 → rgb 71) while the raster holds the stored bytes
    * exactly. Same scale contract as the other codec stages: narrow
    * CPU-bound mapPartitions, split size is the only knob.
    */
  private def decodeBmp(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[BmpDecoded]
    val side = 16
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < side * side) {
            img.getRaster.setSample(i % side, i / side, 0,
              blob(i % blob.length) & 0xff)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "bmp", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val ras = back.getRaster
          var sum = 0L
          var maxErr = 0
          var j = 0
          while (j < side * side) {
            val px = ras.getSample(j % side, j / side, 0)
            sum += px
            val err = math.abs(px - (blob(j % blob.length) & 0xff))
            if (err > maxErr) maxErr = err
            j += 1
          }
          BmpDecoded(id, back.getWidth, back.getHeight, sum,
            ras.getSample(0, 0, 0), maxErr)
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** 16-bin luma histogram over the DECODED raster — the exposure /
    * content-screening feature an image-curation pipeline computes per
    * frame (all-dark, all-bright, low-dynamic-range filters). Same
    * real-codec contract as `mm_decode_bmp`: rasterize the payload to
    * 16×16 gray-8, round-trip through the actual BMP codec, histogram
    * the pixels javax.imageio hands BACK (raster samples, not getRGB).
    * Only occupied bins are emitted; `share` is n/256 — a power-of-two
    * division, exact in binary floating point on both engines.
    *
    * Scale shape: narrow CPU-bound mapPartitions emitting ≤ 16 rows
    * per image, no shuffle before the output sort. The oracle
    * predicts the decoded pixels from the rasterization arithmetic
    * alone — valid because the BMP path is lossless, a fact
    * `mm_decode_bmp` pins with its oracle-checked max_err = 0.
    */
  private def lumaHistogram(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[LumaBin]
    val side = 16
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < side * side) {
            img.getRaster.setSample(i % side, i / side, 0,
              blob(i % blob.length) & 0xff)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "bmp", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val ras = back.getRaster
          val counts = new Array[Long](16)
          var j = 0
          while (j < side * side) {
            counts(ras.getSample(j % side, j / side, 0) / 16) += 1
            j += 1
          }
          (0 until 16).iterator.filter(counts(_) > 0)
            .map(b => LumaBin(id, b, counts(b), counts(b) / 256.0))
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"), col("bin"))
  }

  private val lumaHistogramSql =
    """WITH px AS (
      |  SELECT d.doc_id,
      |    ascii(substring(d.text, CAST(g.i % d.len AS INTEGER) + 1, 1))
      |      // 16 AS bin
      |  FROM (SELECT doc_id, text, length(text) AS len FROM documents) d
      |  CROSS JOIN (SELECT unnest(range(0, 256)) AS i) g)
      |SELECT doc_id, bin, count(*) AS n_px,
      |  CAST(count(*) AS DOUBLE) / 256 AS share
      |FROM px GROUP BY doc_id, bin
      |ORDER BY doc_id, bin""".stripMargin

  // the oracle predicts the decoded raster from the rasterization
  // arithmetic alone — valid because BMP gray-8 is lossless — and
  // pins the round-trip error to exactly 0
  private val decodeBmpSql =
    """SELECT doc_id, 16 AS width, 16 AS height,
      |  CAST(list_aggregate(list_transform(range(0, 256), i ->
      |    ascii(substring(text, i % len + 1, 1))), 'sum') AS BIGINT)
      |    AS px_sum,
      |  ascii(substring(text, 1, 1)) AS px0,
      |  0 AS max_err
      |FROM (SELECT doc_id, text, length(text) AS len FROM documents)
      |ORDER BY doc_id""".stripMargin


  /** DCT-II basis, row u = round(cos(π(2i+1)u/16) · 2²⁰) — INTEGER
    * constants, embedded literally here AND in the SQL oracle so
    * neither engine recomputes a transcendental (a 1-ulp cos() drift
    * would silently flip threshold bits). With these, the whole hash
    * is exact 64-bit integer arithmetic on both sides.
    */
  private val dctC: Array[Long] = Array(
    1048576L, 1048576L, 1048576L, 1048576L, 1048576L, 1048576L, 1048576L, 1048576L,
    1028428L, 871859L, 582558L, 204567L, -204567L, -582558L, -871859L, -1028428L,
    968758L, 401273L, -401273L, -968758L, -968758L, -401273L, 401273L, 968758L,
    871859L, -204567L, -1028428L, -582558L, 582558L, 1028428L, 204567L, -871859L,
    741455L, -741455L, -741455L, 741455L, 741455L, -741455L, -741455L, 741455L,
    582558L, -1028428L, 204567L, 871859L, -871859L, -204567L, 1028428L, -582558L,
    401273L, -968758L, 968758L, -401273L, -401273L, 968758L, -968758L, 401273L,
    204567L, -582558L, 871859L, -1028428L, 1028428L, -871859L, 582558L, -204567L)

  /** JPEG zigzag positions 1..60 of the 8×8 coefficient grid — the 60
    * lowest-frequency AC coefficients, in frequency order.
    */
  private val zigzag60: Array[Int] = Array(
    1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26,
    33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56,
    57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52, 45,
    38, 31, 39, 46, 53, 60, 61, 54, 47)

  /** 60-bit DCT perceptual hash (true pHash) over the DECODED raster:
    * each document rasterizes its payload to the same 16×16 gray-8
    * image as `mm_decode_bmp`, round-trips it through the REAL BMP
    * codec (javax.imageio encode + decode — since r10 the hash input
    * is genuinely decoded pixels, not the pre-codec synthetic raster),
    * box-filters the decoded luma to 8×8 block sums, applies an exact
    * integer 8×8 2D DCT-II (constants above, scale 2²⁰; max
    * magnitude 8·2²⁰·8·1020·2²⁰ < 2⁵⁶, no overflow), takes the 60
    * zigzag-ordered AC coefficients, and sets bit i iff coefficient i
    * exceeds the lower median (sorted[29]) — packed into one
    * sign-safe 60-bit BIGINT like SimHash60. `mm_phash_pairs` rides
    * the pairing on the same pigeonhole banding as dd_simhash_hamming.
    *
    * The SQL oracle reproduces the decode arithmetically (BMP gray-8
    * is lossless, pinned by mm_decode_bmp's max_err = 0) and then the
    * identical integer DCT/median/packing — every intermediate is an
    * exact BIGINT on both engines, so the gate needs no tolerance.
    *
    * Computed in the mapPartitions batch shape (like the codec
    * stages), NOT as nested higher-order Column functions: the
    * median-then-threshold structure needs the coefficient list inside
    * the per-bit lambda, and Catalyst's project collapsing would
    * inline it as a fresh aggregate() per element — the O(grid²)
    * interpreted blow-up that measured 280 s at sf0.1 in the r8 HOF
    * form. 100 TB shape: narrow CPU-bound per-partition map, no
    * shuffle; split size is the only knob.
    */
  /** Rasterize payload bytes at the given PHASE (pixel i = byte
    * (i+phase) mod len) and round-trip through the REAL BMP codec
    * (javax.imageio encode + decode) — the decoded raster is the hash
    * input. Shared by `mm_phash` (phase 0) and `mm_video_neardup`
    * (per-frame phases) so the stages can never disagree about what a
    * decoded frame is.
    */
  private def bmpRoundTrip(blob: Array[Byte],
      phase: Int): java.awt.image.Raster = {
    val side = 16
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < side * side) {
      img.getRaster.setSample(i % side, i / side, 0,
        blob((i + phase) % blob.length) & 0xff)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray)).getRaster
  }

  /** 60-bit integer-DCT perceptual hash of a decoded 16×16 gray
    * raster: 2×2 box sums → exact 8×8 2D DCT-II (constants above,
    * scale 2²⁰) → 60 zigzag AC coefficients → bit i set iff
    * coefficient i exceeds the lower median. One definition shared by
    * every pHash consumer.
    */
  private def rasterPhash60(ras: java.awt.image.Raster): Long = {
    // decoded 16×16 luma → 8×8 block sums (2×2 boxes, exact)
    val m = new Array[Long](64)
    var b = 0
    while (b < 64) {
      val by = (b / 8) * 2
      val bx = (b % 8) * 2
      m(b) = ras.getSample(bx, by, 0).toLong +
        ras.getSample(bx + 1, by, 0) +
        ras.getSample(bx, by + 1, 0) +
        ras.getSample(bx + 1, by + 1, 0)
      b += 1
    }
    // separable integer DCT: T = M·Cᵀ then D = C·T, all exact
    val t = new Array[Long](64)
    var row = 0
    while (row < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var j = 0
        while (j < 8) { acc += m(row * 8 + j) * dctC(v * 8 + j); j += 1 }
        t(row * 8 + v) = acc
        v += 1
      }
      row += 1
    }
    val dmat = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var k = 0
        while (k < 8) { acc += dctC(u * 8 + k) * t(k * 8 + v); k += 1 }
        dmat(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val f = zigzag60.map(dmat)
    val sorted = f.clone()
    java.util.Arrays.sort(sorted)
    val thr = sorted(29) // lower median of the 60 AC coefficients
    var phash = 0L
    var i = 0
    while (i < 60) {
      if (f(i) > thr) phash |= 1L << (59 - i)
      i += 1
    }
    phash
  }

  private def phashDf(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[PhashRow]
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          PhashRow(id, rasterPhash60(bmpRoundTrip(blob, 0)))
        }
      }(enc)
      .toDF()
  }

  /** The fingerprint table is consumed by both `mm_phash` and
    * `mm_phash_pairs` — one codec pass serves both within a session
    * (the dedup tier's cachedJaccard convention). Cached per
    * (session, dir) so repeated invocations stop accumulating one
    * orphaned `.cache()` per call (r20 advice).
    */
  private val phashCache = new graft.SessionCache[DataFrame]

  private def cachedPhash(s: SparkSession, dir: String): DataFrame =
    phashCache.getOrElseUpdate(s, dir)(phashDf(s, dir).cache())

  private def phash(s: SparkSession, dir: String): DataFrame =
    cachedPhash(s, dir).orderBy(col("doc_id"))

  /** COMPOUND two-band candidate keys for Hamming ≤ 8 on a 60-bit
    * fingerprint cut into 10 disjoint 6-bit bands: at distance ≤ 8
    * the differing bits land in at most 8 bands, so AT LEAST TWO
    * bands are identical — hence some band PAIR (i < j) matches
    * exactly, and joining on the C(10,2) = 45 twelve-bit compound
    * keys finds every qualifying pair with ZERO recall loss. The
    * volume win on near-uniform fingerprints (this fixture's worst
    * case): a single 6-bit band collides at 2⁻⁶ over 10 bands
    * (≈ 0.156·n² candidates); a 12-bit compound key collides at 2⁻¹²
    * over 45 keys (≈ 0.011·n²) — 14× fewer candidate probes for 4.5×
    * more (trivially narrow) band rows. Measured at sf1* (125k
    * keyframes): the single-band join cost ~50 s of probe time; the
    * compound join removes it (SCALING.md round-20 note).
    */
  private def compoundBandKeys: org.apache.spark.sql.Column = {
    def band(b: Int) =
      shiftright(col("phash"), b * 6).bitwiseAND(lit(0x3fL))
    val pairs = for { i <- 0 until 10; j <- (i + 1) until 10 }
      yield band(i) * 64 + band(j)
    array(pairs: _*)
  }

  /** pHash near-dup pairing: Hamming distance <= 8 on the 60-bit
    * fingerprint, paired via [[compoundBandKeys]] (two-band pigeonhole
    * — exact recall at <= 8, 14x fewer candidates than single bands on
    * near-uniform fingerprints; see the helper's proof). Band layout
    * is the candidate-volume knob: a production image corpus clusters
    * tightly and can run wider single bands (the 4x15 / distance-3
    * setting of dd_simhash_hamming), same plan shape either way.
    *
    * Since r10 the fingerprints come from genuinely DECODED rasters
    * (the real BMP codec round-trip inside phashDf), so the full
    * production path — decode, downscale, DCT, band, join, verify —
    * is exercised end to end. The rasters themselves are derived from
    * payload bytes (the fixtures ship no real image blobs), so
    * cross-document distances measure payload similarity; on a real
    * image corpus only the rasterization step changes.
    */
  private def phashPairs(s: SparkSession, dir: String): DataFrame = {
    // fingerprints pinned via the session cache (NOT localCheckpoint —
    // see the mm_video_neardup note: lineage truncation hides the stats
    // that keep the banded join broadcastable): the self-join reads
    // them twice, and an unpinned subtree re-runs the codec pass per
    // side
    val ph = cachedPhash(s, dir)
    val bands = ph.select(col("doc_id"), col("phash"),
      posexplode(compoundBandKeys).as(Seq("band_idx", "band_val")))
    val a = bands.select(col("doc_id").as("doc_a"), col("phash").as("ha"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col("doc_id").as("doc_b"), col("phash").as("hb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 8)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // fingerprint-derivation CTEs shared verbatim by phashSql and
  // phashPairsSql — one definition so the two oracles can never
  // disagree about what a fingerprint is
  // predicts the DECODED raster arithmetically (BMP gray-8 is
  // lossless), then reruns the identical integer DCT / lower-median /
  // bit-packing — every intermediate an exact BIGINT
  private val phashCtes = {
    val cList = dctC.mkString("[", ", ", "]")
    val zzList = zigzag60.mkString("[", ", ", "]")
    s"""WITH cst AS (SELECT $cList AS c, $zzList AS zz),
       |base AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |px AS (
       |  SELECT doc_id, list_transform(range(0, 256), i ->
       |    CAST(ascii(substring(text, CAST(i % len AS INT) + 1, 1)) AS BIGINT))
       |    AS p
       |  FROM base),
       |blk AS (
       |  SELECT doc_id, list_transform(range(0, 64), b ->
       |      p[CAST((b // 8) * 32 + (b % 8) * 2 AS INT) + 1]
       |    + p[CAST((b // 8) * 32 + (b % 8) * 2 + 1 AS INT) + 1]
       |    + p[CAST((b // 8) * 32 + 16 + (b % 8) * 2 AS INT) + 1]
       |    + p[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 1 AS INT) + 1]) AS m
       |  FROM px),
       |dct AS (
       |  SELECT doc_id, list_transform(range(0, 64), uv ->
       |    list_aggregate(list_transform(range(0, 64), ij ->
       |      c[CAST((uv // 8) * 8 + (ij // 8) AS INT) + 1]
       |      * m[CAST(ij AS INT) + 1]
       |      * c[CAST((uv % 8) * 8 + (ij % 8) AS INT) + 1]), 'sum')) AS dm
       |  FROM blk, cst),
       |fz AS (
       |  SELECT doc_id, list_transform(zz, z -> dm[CAST(z AS INT) + 1]) AS f
       |  FROM dct, cst),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(list_aggregate(list_transform(range(0, 60), i ->
       |      CASE WHEN f[CAST(i AS INT) + 1] > list_sort(f)[30]
       |        THEN CAST(power(2, 59 - i) AS BIGINT) ELSE 0 END), 'sum')
       |      AS BIGINT) AS phash
       |  FROM fz)""".stripMargin
  }

  // oracle re-derives the fingerprints (shared CTEs), then verifies
  // the pairing brute-force — pinning that the banded join loses no
  // pairs
  private val phashPairsSql =
    s"""$phashCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= 8
       |ORDER BY doc_a, doc_b""".stripMargin

  private val phashSql =
    s"""$phashCtes
       |SELECT doc_id, phash FROM ph ORDER BY doc_id""".stripMargin

  /** REAL codec round-trip #1 — PNG: each document's payload bytes are rasterized into a 16x16 8-bit
    * grayscale image (pixel (x,y) = payload byte (y*16+x) mod len),
    * ENCODED to genuine PNG bytes with javax.imageio (in the JDK, no
    * external libs) and DECODED back with the same codec, all inside
    * one mapPartitions pass — the exact per-partition batch shape a
    * libjpeg/ffmpeg UDF runs in. Emitted scalars (dimensions, pixel
    * sum, center pixel) come from the DECODED raster, so the query
    * fails if either codec direction corrupts a byte; PNG gray-8 is
    * lossless, which is what lets a SQL oracle predict the decoded
    * pixels without being able to parse PNG.
    *
    * Scale notes: encode+decode is CPU-bound narrow work, ~O(bytes)
    * per blob with no shuffle; at 100 TB the knob is input split size,
    * same as every codec stage. The PNG container bytes themselves are
    * deliberately NOT emitted — encoder output can vary across JDK
    * PNG writer versions; the decoded pixels cannot.
    */
  private def decodePng(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[PngDecoded]
    val side = 16
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < side * side) {
            img.getRaster.setSample(i % side, i / side, 0,
              blob(i % blob.length) & 0xff)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val png = bos.toByteArray // the real media blob

          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val raster = back.getRaster
          var sum = 0L
          var j = 0
          while (j < side * side) {
            sum += raster.getSample(j % side, j / side, 0)
            j += 1
          }
          PngDecoded(id, back.getWidth, back.getHeight, sum,
            raster.getSample(side / 2, side / 2, 0))
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"))
  }

  // the oracle predicts the decoded raster from the rasterization
  // arithmetic alone — valid because PNG gray-8 is lossless
  private val decodePngSql =
    """SELECT doc_id, 16 AS width, 16 AS height,
      |  CAST(list_aggregate(list_transform(range(0, 256), i ->
      |    ascii(substring(text, i % len + 1, 1))), 'sum') AS BIGINT)
      |    AS px_sum,
      |  ascii(substring(text, (8 * 16 + 8) % len + 1, 1)) AS mid_px
      |FROM (SELECT doc_id, text, length(text) AS len FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** REAL resize over REAL codec output: each document rasterizes to the same 16x16 gray
    * image as `mm_decode_png`, round-trips through genuine PNG
    * encode/decode, and is then downsampled 2x with an actual
    * area-average (box) filter over the DECODED raster — each output
    * pixel is floor(mean of its 2x2 source block), the arithmetic a
    * production thumbnailer runs (interpolating scalers like
    * Graphics2D are float-kernel and engine-unpredictable; the box
    * filter is the deterministic member of the family, which is what
    * makes the decoded-pixel oracle possible — PNG losslessness plus
    * integer averaging). Emitted as one checksum per output row.
    * Narrow CPU-bound mapPartitions; split size is the only knob.
    */
  private def resizeBox(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[ResizedRealRow]
    val side = 16
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < side * side) {
            img.getRaster.setSample(i % side, i / side, 0,
              blob(i % blob.length) & 0xff)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val ras = back.getRaster
          (0 until side / 2).map { y =>
            var sum = 0L
            var x = 0
            while (x < side / 2) {
              sum += (ras.getSample(2 * x, 2 * y, 0) +
                ras.getSample(2 * x + 1, 2 * y, 0) +
                ras.getSample(2 * x, 2 * y + 1, 0) +
                ras.getSample(2 * x + 1, 2 * y + 1, 0)) / 4
              x += 1
            }
            ResizedRealRow(id, y, sum)
          }
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"), col("y"))
  }

  // the oracle predicts the box-filtered raster from the rasterization
  // arithmetic alone — PNG gray-8 is lossless and floor-average is
  // integer-exact
  private val resizeBoxSql =
    """SELECT doc_id, y,
      |  CAST(sum((
      |    ascii(substring(text, ((2*y) * 16 + 2*x) % len + 1, 1)) +
      |    ascii(substring(text, ((2*y) * 16 + 2*x + 1) % len + 1, 1)) +
      |    ascii(substring(text, ((2*y + 1) * 16 + 2*x) % len + 1, 1)) +
      |    ascii(substring(text, ((2*y + 1) * 16 + 2*x + 1) % len + 1, 1))
      |    ) // 4) AS BIGINT) AS row_sum
      |FROM (SELECT doc_id, text, length(text) AS len FROM documents),
      |  (SELECT unnest(range(0, 8)) AS y),
      |  (SELECT unnest(range(0, 8)) AS x)
      |GROUP BY doc_id, y ORDER BY doc_id, y""".stripMargin

  /** REAL codec round-trip #3 — JPEG via javax.imageio (the JDK ships
    * a baseline JPEG encoder/decoder; no external libs). JPEG is
    * LOSSY, so an exact SQL oracle cannot predict arbitrary decoded
    * pixels the way it can for PNG/PCM — the image content must be
    * chosen so the round-trip is provably bit-exact. Flat 8x8 blocks
    * are that content: each block is DC-only (all AC coefficients
    * exactly zero), and at compression quality 1.0 the quantization
    * tables are all ones, so the DC coefficient survives quantization
    * and the decoded block equals the source value exactly (verified
    * empirically: 0 max error over 2000 random flat-block images; the
    * emitted `max_err` column re-asserts it per document, and the
    * oracle pins it to 0).
    *
    * Each document rasterizes to a 16x16 grayscale image of four flat
    * 8x8 blocks whose values are the first four payload bytes (mod
    * payload length), encodes to genuine JPEG bytes, decodes back, and
    * emits scalars from the DECODED raster — dimensions, pixel sum,
    * center pixel, and the max deviation from the source raster. Any
    * corruption in either codec direction fails the gate. Same scale
    * contract as the other codec stages: narrow CPU-bound
    * mapPartitions work, split size is the only knob.
    */
  private def decodeJpeg(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[JpegDecoded]
    val side = 16
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        // writer reused across the partition's rows (dispose once)
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(1.0f)
        it.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          def blockVal(k: Int): Int = blob(k % blob.length) & 0xff
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < side * side) {
            val x = i % side; val y = i / side
            img.getRaster.setSample(x, y, 0, blockVal((y / 8) * 2 + x / 8))
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
          ios.close()
          val jpeg = bos.toByteArray // the real media blob

          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jpeg))
          val raster = back.getRaster
          var sum = 0L
          var maxErr = 0
          var j = 0
          while (j < side * side) {
            val x = j % side; val y = j / side
            val px = raster.getSample(x, y, 0)
            sum += px
            val err = math.abs(px - blockVal((y / 8) * 2 + x / 8))
            if (err > maxErr) maxErr = err
            j += 1
          }
          JpegDecoded(id, back.getWidth, back.getHeight, sum,
            raster.getSample(side / 2, side / 2, 0), maxErr)
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"))
  }

  // the oracle predicts the decoded raster from the block-fill
  // arithmetic alone — valid because flat-block q=1.0 JPEG is bit-exact
  // (see decodeJpeg's scaladoc); max_err pins that claim per document
  private val decodeJpegSql =
    """SELECT doc_id, 16 AS width, 16 AS height,
      |  CAST(64 * (b0 + b1 + b2 + b3) AS BIGINT) AS px_sum,
      |  b3 AS mid_px, 0 AS max_err
      |FROM (SELECT doc_id,
      |        ascii(substring(text, 0 % len + 1, 1)) AS b0,
      |        ascii(substring(text, 1 % len + 1, 1)) AS b1,
      |        ascii(substring(text, 2 % len + 1, 1)) AS b2,
      |        ascii(substring(text, 3 % len + 1, 1)) AS b3
      |      FROM (SELECT doc_id, text, length(text) AS len FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Canonical PCM16 mono RIFF/WAVE encoder used by `mm_decode_wav` —
    * factored out so `QueriesSpec` can feed THESE bytes (not a test
    * copy) to javax.sound's independent parser. Sample k derives from
    * payload byte k mod payload length: the fixture contract is
    * non-empty ASCII text (min 47 chars — same precondition the phash
    * rasterizer documents), where byte index == character index, which
    * is what lets the character-based SQL oracle predict the samples.
    */
  /** Genuine chunk-walking RIFF/PCM16 parse (magic check, fmt/data
    * traversal tolerant of chunk order, word-aligned skips) — the
    * container reader behind `mm_decode_wav` and `mm_audio_features`.
    * Returns (channels, sampleRate, samples).
    */
  def parseWavPcm16(wav: Array[Byte], ctx: String): (Int, Int, Array[Short]) = {
    val in = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); in.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"$ctx: not a RIFF container")
    in.getInt // riff size
    require(fourcc() == "WAVE", s"$ctx: not a WAVE form")
    var channels = -1; var sampleRate = -1; var bits = -1
    var samples: Array[Short] = null
    while (in.remaining() >= 8) {
      val ck = fourcc(); val ckLen = in.getInt
      ck match {
        case "fmt " =>
          val p0 = in.position()
          require(in.getShort == 1, s"$ctx: not PCM")
          channels = in.getShort.toInt
          sampleRate = in.getInt
          in.getInt; in.getShort // byte rate, block align
          bits = in.getShort.toInt
          in.position(p0 + ckLen + (ckLen & 1)) // word-aligned skip
        case "data" =>
          samples = new Array[Short](ckLen / 2)
          var j = 0
          while (j < samples.length) { samples(j) = in.getShort; j += 1 }
          if ((ckLen & 1) == 1) in.get
        case _ =>
          in.position(in.position() + ckLen + (ckLen & 1))
      }
    }
    require(bits == 16 && samples != null, s"$ctx: malformed WAV")
    (channels, sampleRate, samples)
  }

  def encodeWavPcm16(blob: Array[Byte], nSamples: Int, rate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((blob(i % blob.length) & 0xff) - 128) * 256).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL audio-container round-trip — codec #2 alongside
    * `mm_decode_png`: each document's payload bytes become 200 16-bit
    * PCM mono samples, written as a byte-correct RIFF/WAVE container
    * (canonical 44-byte header + little-endian data chunk — any WAV
    * player parses it; see [[encodeWavPcm16]]), then parsed BACK by a
    * genuine chunk-walking RIFF reader (magic check, fmt/data chunk
    * traversal tolerant of chunk order, word-aligned skips) inside one
    * mapPartitions pass. Emitted scalars come from the PARSED stream,
    * so a corrupt byte in either direction fails the gate; PCM is
    * lossless, which is what lets the SQL oracle predict the decoded
    * samples. Same scale contract as the other codec stages: narrow,
    * CPU-bound, split-size is the only knob.
    */
  private def decodeWav(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[WavDecoded]
    val nSamples = 200
    val rate = 8000
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val wav = Multimodal.encodeWavPcm16(blob, nSamples, rate) // the real media blob
          val (channels, sampleRate, samples) =
            Multimodal.parseWavPcm16(wav, s"doc $id")
          var absSum = 0L
          var j = 0
          while (j < samples.length) {
            absSum += math.abs(samples(j).toLong); j += 1
          }
          WavDecoded(id, sampleRate, channels, samples.length, absSum,
            samples(0).toInt)
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"))
  }

  // the oracle predicts the parsed PCM stream from the sample synthesis
  // arithmetic alone — valid because PCM16 is lossless
  private val decodeWavSql =
    """SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
      |  200 AS n_samples,
      |  CAST(list_aggregate(list_transform(range(0, 200), i ->
      |    abs((ascii(substring(text, i % len + 1, 1)) - 128) * 256)),
      |    'sum') AS BIGINT) AS abs_sum,
      |  (ascii(substring(text, 1, 1)) - 128) * 256 AS first_sample
      |FROM (SELECT doc_id, text, length(text) AS len FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling: every 7th byte, first 5 frames per payload — the
    * video-frame-sample access pattern as a narrow map.
    */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(4))).as("frame_idx"))
      .filter(length(col("text")) > col("frame_idx") * 7)
      .select(col("doc_id"), col("frame_idx"),
        ascii(col("text").substr(col("frame_idx") * 7 + 1, lit(1)))
          .as("frame_byte"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameSampleSql =
    """SELECT doc_id, frame_idx,
      |  ascii(substring(text, frame_idx * 7 + 1, 1)) AS frame_byte
      |FROM documents, (SELECT unnest(range(0, 5)) AS frame_idx)
      |WHERE length(text) > frame_idx * 7
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Frame energy (the audio-style op): the payload byte stream cut
    * into 16-byte frames, RMS energy per frame. Integer squares sum
    * exactly; the final sqrt of a rational is deterministic on both
    * engines.
    */
  private def frameEnergy(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 16
    val nFrames = 8
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .filter(length(col("text")) >= (col("frame_idx") + 1) * frameLen)
      .select(col("doc_id"), col("frame_idx"),
        explode(sequence(lit(1), lit(frameLen))).as("p"), col("text"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(col("text").substr(col("frame_idx") * frameLen + col("p"),
          lit(1))).as("b"))
      .groupBy(col("doc_id"), col("frame_idx"))
      .agg(sum(col("b") * col("b")).as("sum_sq"))
      .select(col("doc_id"), col("frame_idx"),
        sqrt(col("sum_sq").cast("double") / frameLen).as("rms"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameEnergySql =
    """SELECT doc_id, frame_idx,
      |  sqrt(CAST(sum(b * b) AS DOUBLE) / 16) AS rms
      |FROM (
      |  SELECT doc_id, frame_idx,
      |    ascii(substring(text, frame_idx * 16 + p, 1)) AS b
      |  FROM documents,
      |    (SELECT unnest(range(0, 8)) AS frame_idx),
      |    (SELECT unnest(range(1, 17)) AS p)
      |  WHERE length(text) >= (frame_idx + 1) * 16)
      |GROUP BY doc_id, frame_idx
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** REAL feature extraction over REAL codec output — the
    * embedding-from-media stage: each document rasterizes to the same 16x16 gray image as
    * `mm_decode_png`, round-trips through genuine PNG encode/decode,
    * and the features come off the DECODED raster: moment sums
    * (Σp, Σp² — mean/variance numerators, integer-exact), dynamic
    * range (min/max), and horizontal gradient energy Σ|p(x+1,y)-p(x,y)|
    * (the edge-density signal an image-quality filter thresholds on).
    * All integers, so the oracle predicts them from the rasterization
    * arithmetic alone — PNG gray-8 is lossless. Narrow CPU-bound
    * mapPartitions; split size is the only scale knob.
    */
  private def featureReal(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[PngFeatures]
    val side = 16
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < side * side) {
            img.getRaster.setSample(i % side, i / side, 0,
              blob(i % blob.length) & 0xff)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val ras = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray)).getRaster
          var (sum, sumSq, gradSum) = (0L, 0L, 0L)
          var (mn, mx) = (255, 0)
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              val p = ras.getSample(x, y, 0)
              sum += p; sumSq += p.toLong * p
              if (p < mn) mn = p
              if (p > mx) mx = p
              if (x + 1 < side)
                gradSum += math.abs(ras.getSample(x + 1, y, 0) - p)
              x += 1
            }
            y += 1
          }
          PngFeatures(id, sum, sumSq, mn, mx, gradSum)
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"))
  }

  // the oracle predicts the decoded raster from the rasterization
  // arithmetic alone (PNG gray-8 is lossless); pixel (x,y) = byte
  // ((y*16+x) mod len)
  private val featureRealSql =
    """WITH px AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 256),
      |      i -> ascii(substring(text, i % len + 1, 1))) AS p
      |  FROM (SELECT doc_id, text, length(text) AS len FROM documents))
      |SELECT doc_id,
      |  CAST(list_aggregate(p, 'sum') AS BIGINT) AS px_sum,
      |  CAST(list_aggregate(list_transform(p, v -> v * v), 'sum')
      |    AS BIGINT) AS px_sum_sq,
      |  CAST(list_aggregate(p, 'min') AS INT) AS px_min,
      |  CAST(list_aggregate(p, 'max') AS INT) AS px_max,
      |  CAST(list_aggregate(list_transform(range(0, 256),
      |    i -> CASE WHEN i % 16 < 15 THEN abs(p[i + 2] - p[i + 1])
      |         ELSE 0 END), 'sum') AS BIGINT) AS grad_sum
      |FROM px ORDER BY doc_id""".stripMargin

  /** REAL multi-frame container round-trip — the video-frame analogue
    * of `mm_decode_png`, with a genuine multi-image codec in the loop:
    * each document renders NumFrames 16×16 gray frames (frame f shifts
    * the byte phase by 7f — deterministic distinct frames), encodes
    * them into ONE baseline-TIFF blob via the JDK's ImageIO sequence
    * writer, then a TIFF ImageReader re-opens the blob, reports the
    * frame COUNT from the container directory (not assumed), and
    * emits per-frame raster stats. Gray-8 baseline TIFF is lossless,
    * so the oracle predicts every stat from the rasterization
    * arithmetic alone. This is the real plumbing a frame-sampling
    * stage needs: one blob per row in, per-frame rows out, all inside
    * a narrow CPU-bound mapPartitions — split size is the only scale
    * knob, and the frame fan-out happens AFTER decode, executor-side.
    */
  private def framesReal(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[TiffFrame]
    val side = 16
    val nf = 4
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val w = javax.imageio.ImageIO
            .getImageWritersByFormatName("tiff").next()
          w.setOutput(ios)
          w.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var i = 0
            while (i < side * side) {
              img.getRaster.setSample(i % side, i / side, 0,
                blob((i + 7 * f) % blob.length) & 0xff)
              i += 1
            }
            w.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          w.endWriteSequence(); ios.flush(); w.dispose(); ios.close()
          val tiff = bos.toByteArray // the real multi-frame media blob

          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(tiff))
          val rd = javax.imageio.ImageIO
            .getImageReadersByFormatName("tiff").next()
          rd.setInput(iis)
          val n = rd.getNumImages(true) // container directory, not assumed
          val rows = (0 until n).map { fi =>
            val ras = rd.read(fi).getRaster
            var (sum, mx, j) = (0L, 0, 0)
            while (j < side * side) {
              val p = ras.getSample(j % side, j / side, 0)
              sum += p; if (p > mx) mx = p
              j += 1
            }
            TiffFrame(id, n, fi, sum, mx)
          }
          rd.dispose(); iis.close()
          rows
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // frame f, pixel linear index i → byte ((i + 7f) mod len); TIFF
  // gray-8 is lossless so the decoded raster equals the rasterization
  private val framesRealSql =
    """WITH px AS (
      |  SELECT doc_id, f AS frame_idx,
      |    list_transform(range(0, 256),
      |      i -> ascii(substring(text, (i + 7 * f) % len + 1, 1))) AS p
      |  FROM (SELECT doc_id, text, length(text) AS len FROM documents),
      |    (SELECT unnest(range(0, 4)) AS f))
      |SELECT doc_id, 4 AS n_frames, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(list_aggregate(p, 'sum') AS BIGINT) AS px_sum,
      |  CAST(list_aggregate(p, 'max') AS INT) AS px_max
      |FROM px ORDER BY doc_id, frame_idx""".stripMargin

  /** Audio feature extraction off DECODED samples — the audio
    * analogue of `mm_feature_real`: each payload round-trips through
    * the real RIFF/PCM16 container (encode, then the chunk-walking
    * parse — never a shortcut to byte offset 44), and per 50-sample
    * frame the features come off the PARSED stream: energy (Σs²,
    * integer-exact), zero-crossing count (the pitch/noisiness proxy a
    * speech/music discriminator thresholds on), and peak amplitude.
    * PCM16 is lossless so the oracle predicts every number from the
    * sample-synthesis arithmetic. Narrow CPU-bound mapPartitions;
    * frame fan-out after decode, executor-side.
    */
  private def audioFeatures(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[AudioFrame]
    val nSamples = 200
    val frameLen = 50
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val wav = Multimodal.encodeWavPcm16(blob, nSamples, 8000)
          val (_, _, samples) = Multimodal.parseWavPcm16(wav, s"doc $id")
          (0 until nSamples / frameLen).map { f =>
            var (energy, zc, peak) = (0L, 0, 0)
            var j = f * frameLen
            while (j < (f + 1) * frameLen) {
              val v = samples(j).toInt
              energy += v.toLong * v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (j > f * frameLen && ((samples(j - 1) < 0) != (v < 0)))
                zc += 1
              j += 1
            }
            AudioFrame(id, f, energy, zc, peak)
          }
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // sample i = (byte(i mod len) - 128) * 256; PCM16 is lossless so the
  // parsed stream equals the synthesis
  private val audioFeaturesSql =
    """WITH px AS (
      |  SELECT doc_id, f AS frame_idx,
      |    list_transform(range(f * 50, (f + 1) * 50),
      |      i -> (ascii(substring(text, i % len + 1, 1)) - 128) * 256)
      |      AS s
      |  FROM (SELECT doc_id, text, length(text) AS len FROM documents),
      |    (SELECT unnest(range(0, 4)) AS f))
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(list_aggregate(list_transform(s, v -> CAST(v AS BIGINT) * v),
      |    'sum') AS BIGINT) AS energy,
      |  CAST(list_aggregate(list_transform(range(2, 51),
      |    j -> CASE WHEN (s[j-1] < 0) <> (s[j] < 0) THEN 1 ELSE 0 END),
      |    'sum') AS INT) AS zero_crossings,
      |  CAST(list_aggregate(list_transform(s, v -> abs(v)), 'max') AS INT)
      |    AS peak
      |FROM px ORDER BY doc_id, frame_idx""".stripMargin

  /** Shot-boundary detection — the video-curation primitive that
    * segments a stream before per-shot sampling: consecutive frame
    * energies (the same 8×16-byte frame model as mm_frame_energy, kept
    * as INTEGER Σb² so there is no transcendental anywhere) are
    * diffed per document, a boundary fires where the jump exceeds a
    * fixed threshold, and each document reports its frame count, shot
    * count and largest jump. One explode → aggregate-after-explode →
    * one per-doc window; the shuffle carries 8 rows per document.
    */
  private def shotDetect(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 16
    val nFrames = 8
    val thresh = 20000L
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .filter(length(col("text")) >= (col("frame_idx") + 1) * frameLen)
      .select(col("doc_id"), col("frame_idx"),
        explode(sequence(lit(1), lit(frameLen))).as("p"), col("text"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(col("text").substr(col("frame_idx") * frameLen + col("p"),
          lit(1))).as("b"))
      .groupBy(col("doc_id"), col("frame_idx"))
      .agg(sum(col("b") * col("b")).as("e"))
      .withColumn("delta", abs(col("e") - lag(col("e"), 1).over(w)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        (coalesce(sum(when(col("delta") > thresh, 1L).otherwise(0L)),
          lit(0L)) + 1L).as("n_shots"),
        coalesce(max(col("delta")), lit(0L)).as("max_jump"))
      .orderBy(col("doc_id"))
  }

  private val shotDetectSql =
    """WITH fr AS (
      |  SELECT doc_id, frame_idx, sum(b * b) AS e FROM (
      |    SELECT doc_id, frame_idx,
      |      ascii(substring(text, frame_idx * 16 + p, 1)) AS b
      |    FROM documents,
      |      (SELECT unnest(range(0, 8)) AS frame_idx),
      |      (SELECT unnest(range(1, 17)) AS p)
      |    WHERE length(text) >= (frame_idx + 1) * 16)
      |  GROUP BY doc_id, frame_idx),
      |d AS (
      |  SELECT doc_id, abs(e - lag(e) OVER (PARTITION BY doc_id
      |    ORDER BY frame_idx)) AS delta
      |  FROM fr)
      |SELECT doc_id, count(*) AS n_frames,
      |  CAST(sum(CASE WHEN delta > 20000 THEN 1 ELSE 0 END) + 1
      |    AS BIGINT) AS n_shots,
      |  CAST(COALESCE(max(delta), 0) AS BIGINT) AS max_jump
      |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** END-TO-END video near-duplication — the closure of the mm tier's
    * pieces into the query a video-curation pipeline actually runs:
    * decode each payload's frames (the [[framesReal]] 4-frame model,
    * phase 7f, through the REAL BMP codec), pick KEYFRAMES by the
    * shot-energy rule (frame 0 plus every frame whose decoded-raster
    * energy jumps > 5,500 from its predecessor — the
    * [[shotDetect]] boundary semantics on the full-raster energy),
    * fingerprint each keyframe with the shared 60-bit integer DCT
    * pHash ([[rasterPhash60]] — one definition with `mm_phash`), then
    * pair VIDEOS whose keyframes collide: COMPOUND two-band pigeonhole
    * keys ([[compoundBandKeys]] — hamming ≤ 8 over 10 bands leaves
    * ≥ 2 bands identical, so some band PAIR matches exactly and the
    * 45 twelve-bit compound keys find every pair with NO recall
    * loss), popcount verify at ≤ 8, and a per-video-pair rollup
    * (matched keyframe pairs + closest distance). The oracle
    * recomputes the whole chain arithmetically (BMP gray-8 is
    * lossless) and pairs BRUTE-FORCE — pinning that the banding loses
    * nothing.
    *
    * Scale shape: decode+hash is one narrow CPU-bound mapPartitions
    * (split size is the only knob); candidates are bounded by the
    * compound-key buckets — never frames², and 14× fewer probes than
    * single bands on near-uniform fingerprints (the helper's math;
    * measured at sf1* in SCALING.md). At production scale, band
    * layout is the knob (clustered corpora can run wider single
    * bands, the dd_simhash_hamming setting).
    */
  /** Keyframe fingerprints for `mm_video_neardup`, cached per
    * (session, dir): the banded self-join consumes the frame on both
    * sides, and the per-call `.cache()` it replaces leaked one pinned
    * codec pass per invocation (r20 advice — this is the advisor's
    * SessionCache option; an eager checkpoint-and-unpersist variant
    * was measured first and cost ~0.7 s/run re-materializing the
    * sorted output the bench's count() never needs).
    */
  private val videoKfCache = new graft.SessionCache[DataFrame]

  /** Keyframe fingerprint extraction (decode → shot-energy keyframes
    * → pHash) — the codec pass behind `mm_video_neardup`, factored so
    * the session cache above can pin it once. Pinning is cache(), NOT
    * localCheckpoint: the banded self-join consumes this subtree on
    * both sides, and checkpoint pinning was measured 20x WORSE at
    * sf1* (73 s vs 3.8 s) because truncating the lineage also hides
    * the size stats that let the planner broadcast the small band
    * side (the SMJ fallback skews on 640 six-bit band keys). cache()
    * keeps stats and the session sets
    * canChangeCachedPlanOutputPartitioning, so AQE still replans
    * inside the cached subtree.
    */
  private def videoKeyframes(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[VideoKeyframe]
    val nf = 4
    val side = 16
    val thresh = 5500L
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .mapPartitions { it: Iterator[Row] =>
        imageIoMemoryCache()
        it.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          requirePayload(id, blob)
          val rasters = (0 until nf).map(f => bmpRoundTrip(blob, 7 * f))
          // keyframe rule on DECODED energy: frame 0 + shot boundaries
          val e = rasters.map { ras =>
            var acc = 0L
            var j = 0
            while (j < side * side) {
              val p = ras.getSample(j % side, j / side, 0)
              acc += p.toLong * p
              j += 1
            }
            acc
          }
          (0 until nf)
            .filter(f => f == 0 || math.abs(e(f) - e(f - 1)) > thresh)
            .map(f => VideoKeyframe(id, f, rasterPhash60(rasters(f))))
        }
      }(enc)
      .toDF()
  }

  private def videoNeardup(s: SparkSession, dir: String): DataFrame = {
    val kf = videoKfCache.getOrElseUpdate(s, dir)(
      videoKeyframes(s, dir).cache())
    val bands = kf.select(col("doc_id"), col("frame_idx"), col("phash"),
      posexplode(compoundBandKeys).as(Seq("band_idx", "band_val")))
    val a = bands.select(col("doc_id").as("doc_a"),
      col("frame_idx").as("fa"), col("phash").as("ha"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col("doc_id").as("doc_b"),
      col("frame_idx").as("fb"), col("phash").as("hb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("fa"), col("ha"),
        col("doc_b"), col("fb"), col("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 8)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_matched"),
        min(col("hamming")).as("min_hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // full-chain oracle: frame rasters + energies arithmetically (BMP
  // gray-8 is lossless), the SAME integer DCT/median/packing as the
  // phash oracle keyed by (doc, frame), then BRUTE-FORCE keyframe
  // pairing — any pair the banding dropped fails the hash
  private val videoNeardupSql = {
    val cList = dctC.mkString("[", ", ", "]")
    val zzList = zigzag60.mkString("[", ", ", "]")
    s"""WITH cst AS (SELECT $cList AS c, $zzList AS zz),
       |base AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |fpx AS (
       |  SELECT doc_id, f, list_transform(range(0, 256), i ->
       |    CAST(ascii(substring(text,
       |      CAST((i + 7 * f) % len AS INT) + 1, 1)) AS BIGINT)) AS p
       |  FROM base, (SELECT unnest(range(0, 4)) AS f)),
       |fe AS (
       |  SELECT doc_id, f, p,
       |    list_aggregate(list_transform(p, v -> v * v), 'sum') AS e
       |  FROM fpx),
       |kf AS (
       |  SELECT doc_id, f, p FROM (
       |    SELECT doc_id, f, p,
       |      abs(e - lag(e) OVER (PARTITION BY doc_id ORDER BY f)) AS delta
       |    FROM fe)
       |  WHERE f = 0 OR delta > 5500),
       |blk AS (
       |  SELECT doc_id, f, list_transform(range(0, 64), b ->
       |      p[CAST((b // 8) * 32 + (b % 8) * 2 AS INT) + 1]
       |    + p[CAST((b // 8) * 32 + (b % 8) * 2 + 1 AS INT) + 1]
       |    + p[CAST((b // 8) * 32 + 16 + (b % 8) * 2 AS INT) + 1]
       |    + p[CAST((b // 8) * 32 + 16 + (b % 8) * 2 + 1 AS INT) + 1]) AS m
       |  FROM kf),
       |dct AS (
       |  SELECT doc_id, f, list_transform(range(0, 64), uv ->
       |    list_aggregate(list_transform(range(0, 64), ij ->
       |      c[CAST((uv // 8) * 8 + (ij // 8) AS INT) + 1]
       |      * m[CAST(ij AS INT) + 1]
       |      * c[CAST((uv % 8) * 8 + (ij % 8) AS INT) + 1]), 'sum')) AS dm
       |  FROM blk, cst),
       |fz AS (
       |  SELECT doc_id, f,
       |    list_transform(zz, z -> dm[CAST(z AS INT) + 1]) AS fc
       |  FROM dct, cst),
       |ph AS (
       |  SELECT doc_id, f,
       |    CAST(list_aggregate(list_transform(range(0, 60), i ->
       |      CASE WHEN fc[CAST(i AS INT) + 1] > list_sort(fc)[30]
       |        THEN CAST(power(2, 59 - i) AS BIGINT) ELSE 0 END), 'sum')
       |      AS BIGINT) AS phash
       |  FROM fz),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.phash, b.phash)) AS ham
       |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= 8)
       |SELECT doc_a, doc_b, count(*) AS n_matched,
       |  CAST(min(ham) AS INTEGER) AS min_hamming
       |FROM pairs GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("mm_video_neardup", videoNeardup, Some(videoNeardupSql)),
    QueryDef("mm_shot_detect", shotDetect, Some(shotDetectSql)),
    QueryDef("mm_audio_features", audioFeatures, Some(audioFeaturesSql)),
    QueryDef("mm_frames_real", framesReal, Some(framesRealSql)),
    QueryDef("mm_feature_real", featureReal, Some(featureRealSql)),
    QueryDef("mm_frame_energy", frameEnergy, Some(frameEnergySql)),
    QueryDef("mm_blob_meta", blobMeta, Some(blobMetaSql)),
    QueryDef("mm_decode_bmp", decodeBmp, Some(decodeBmpSql)),
    QueryDef("mm_luma_histogram", lumaHistogram, Some(lumaHistogramSql)),
    QueryDef("mm_decode_png", decodePng, Some(decodePngSql)),
    QueryDef("mm_decode_jpeg", decodeJpeg, Some(decodeJpegSql)),
    QueryDef("mm_decode_wav", decodeWav, Some(decodeWavSql)),
    QueryDef("mm_resize_box", resizeBox, Some(resizeBoxSql)),
    QueryDef("mm_frame_sample", frameSample, Some(frameSampleSql)),
    QueryDef("mm_phash", phash, Some(phashSql)),
    QueryDef("mm_phash_pairs", phashPairs, Some(phashPairsSql)))
}
