package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batch-shaped per-partition decode.
  *
  * The decode itself is STUBBED (this container has no image/audio codecs)
  * with a deterministic fake that derives "decoded" features purely from
  * the byte length — but the Spark-side plumbing is real and tested: binary
  * column handling, typed Dataset encoders, `mapPartitions` batching (the
  * Scala analog of `mapInPandas`: one iterator per partition so a real
  * decoder would amortize model/codec init per partition, exactly like the
  * reference should have done with its per-call spaCy reload,
  * data_ingestion.py:171 / SURVEY §4).
  *
  * At 100 TB: binary payloads stay columnar in Parquet; the decode is a
  * narrow partition-local pass; feature outputs are small typed columns, so
  * downstream shuffles never move raw media bytes.
  */
object Multimodal {
  import Tables._

  /** One media row: id + raw bytes + source metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String, source: String)

  /** Fake-decoded features; every field derives deterministically from the
    * payload length so the pipeline is oracle-checkable end to end. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_patches: Long, checksum: Long)

  /** STUB decode: a real implementation would parse the codec here
    * (JPEG/PNG/WAV...). Deterministic fake: dimensions from length,
    * checksum = polynomial hash of the bytes. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.media.length.toLong
    val width = n % 64L + 1L
    val height = n / 64L + 1L
    var ck = 0L
    r.media.foreach { b => ck = (ck * 31L + (b & 0xFF)) % 1000000007L }
    MediaFeatures(r.doc_id, n, width, height, ((width * height) / 256L) + 1L, ck)
  }

  /** documents.text encoded as the stand-in binary payload (the test data
    * ships no real media; the cast is the "storage format"). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.rebalance(documents(s, d), "doc_id").select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("mime"),
      col("source"))

  /** The decode pass: typed, partition-batched. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init point for a real codec/model
        it.map(decodeStub)
      }
      .toDF()
  }

  /** Oracle-checked query: decode features over the media table. The
    * checksum doubles as a bytes-level fingerprint, so this also verifies
    * binary round-tripping (string -> utf8 bytes -> features). */
  def qMultimodalDecode(s: SparkSession, d: String): DataFrame =
    decodeFeatures(mediaTable(s, d)).orderBy("doc_id")

  /** One "frame" per FrameBytes-sized chunk of the payload. */
  case class Frame(doc_id: Long, frame_no: Int, frame_bytes: Long, frame_checksum: Long)

  val FrameBytes = 64

  /** STUB frame-sampler ("video" -> frames): chunk the payload, emit one
    * row per sampled frame (every `stride`-th chunk) with a per-frame
    * checksum — the real Spark shape of frame extraction: a typed
    * flatMap-style mapPartitions generator whose output rows are small
    * even when payloads are huge. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap { r =>
          r.media.grouped(FrameBytes).zipWithIndex
            .filter { case (_, i) => i % stride == 0 }
            .map { case (chunk, i) =>
              var ck = 0L
              chunk.foreach { b => ck = (ck * 31L + (b & 0xFF)) % 1000000007L }
              Frame(r.doc_id, i, chunk.length.toLong, ck)
            }
        }
      }
      .toDF()
  }

  /** Oracle-checked: every 2nd 64-byte frame of each payload with
    * per-frame checksums (ascii text -> bytes == char codes, so the
    * oracle can recompute the chunking on the string side). */
  def qMultimodalFrames(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaTable(s, d), 2).orderBy("doc_id", "frame_no")

  /** Aspect-preserving resize geometry + a decimated-payload fingerprint. */
  case class Resized(doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, scale_pm: Long, out_checksum: Long)

  val ResizeMaxDim = 48L

  /** STUB resize ("image" -> bounded-dimension image): compute the
    * aspect-preserving target geometry in EXACT integer milli-scale
    * (floats would round differently across engines) and fingerprint a
    * decimated byte stream (every k-th byte, k = ceil(maxDim-overshoot))
    * as the stand-in for the resampled payload. A real implementation
    * swaps the body for a codec call; the Spark shape — typed
    * mapPartitions, small typed outputs, payloads never shuffled — is
    * the part that survives the swap. */
  def resizeStub(r: MediaRecord, maxDim: Long): Resized = {
    val n = r.media.length.toLong
    val w = n % 64L + 1L
    val h = n / 64L + 1L
    val m = math.max(w, h)
    // scale floor 1: past a 1000x downscale the milli-scale would floor
    // to 0 and collapse EVERY geometry to 1x1 (payloads >= ~3 MB under
    // this stub's dims) — clamped, the long edge maps to >= maxDim/1000
    val scalePm = if (m <= maxDim) 1000L else math.max(1L, maxDim * 1000L / m)
    val outW = math.max(1L, w * scalePm / 1000L)
    val outH = math.max(1L, h * scalePm / 1000L)
    val k = math.max(1L, (m + maxDim - 1L) / maxDim).toInt
    var ck = 0L
    var i = 0
    while (i < r.media.length) {
      ck = (ck * 31L + (r.media(i) & 0xFF)) % 1000000007L
      i += k
    }
    Resized(r.doc_id, w, h, outW, outH, scalePm, ck)
  }

  def resize(media: DataFrame, maxDim: Long = ResizeMaxDim): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions(it => it.map(resizeStub(_, maxDim)))
      .toDF()
  }

  /** Oracle-checked: resize every payload's stub geometry into a
    * 48-pixel bounding box (integer milli-scale; the decimated checksum
    * recomputes on the string side like the frame sampler). */
  def qMultimodalResize(s: SparkSession, d: String): DataFrame =
    resize(mediaTable(s, d)).orderBy("doc_id")

  // --------------------------------------------- REAL image decode (PNG)

  /** Deterministic grayscale test image for `docId`: dimensions and every
    * pixel are pure functions of (x, y, docId), so the DuckDB oracle can
    * recompute the decoded geometry AND a position-weighted pixel sum in
    * closed form — any decode defect (wrong pixel, transposed axes, wrong
    * dimensions, dropped row) breaks the hash compare. PNG is lossless, so
    * the decoded values are exactly the encoded ones. */
  def imageDims(docId: Long): (Int, Int) =
    ((docId % 40 + 8).toInt, (docId % 23 + 8).toInt)

  def buildPng(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + docId) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode in pure JDK — `javax.imageio.ImageIO` ships with
    * the JRE and decodes PNG/JPEG/BMP/GIF, the same no-dependency move
    * that landed FlateDecode PDF extraction (BinaryIngest.pdfExtract).
    * Returns (width, height, Σ gray(x,y)·(y·width + x + 1)): the weight
    * makes the sum order-sensitive, so axis swaps and pixel shuffles are
    * caught, while staying a closed-form SQL expression for the oracle.
    * Null on undecodable bytes (surfaces as a red oracle row, never an
    * executor crash). */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += (img.getRGB(x, y) & 0xFF).toLong * (y.toLong * w + x + 1)
            x += 1
          }
          y += 1
        }
        Some((w, h, sum))
      }
    } catch { case _: Exception => None }

  /** Stage real PNG uploads, one file per document — executor-written
    * (mapPartitions; image bytes never pass through the driver), versioned
    * + atomically published like the PDF fixture. */
  def stagePngFixture(s: SparkSession, d: String): String = {
    import graft.sources.BinaryIngest
    val fix = BinaryIngest.fixtureRoot("png_fixture", d)
    BinaryIngest.publishFixture(fix) { tmp =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp, f"img$id%05d.png"),
              buildPng(id))
            id
          }
        }.count()
    }
    fix
  }

  /** Oracle-checked REAL-image round trip: documents staged as actual PNG
    * files -> binaryFile scan -> ImageIO decode (mapPartitions, per-
    * partition codec reuse) -> exact geometry + weighted-pixel-sum
    * equality against the oracle's closed-form recomputation. This is the
    * q_pdf_ingest pattern applied to the image modality: the decode step
    * is REAL, not the length-derived stub above (which stays as the
    * documented seam for codecs the JDK lacks — video, audio). */
  def qImageIngest(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val fix = stagePngFixture(s, d)
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(fix)
      .select(
        regexp_extract(col("path"), "img(\\d+)\\.png", 1).cast("long").as("doc_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePng(bytes) match {
            case Some((w, h, sum)) => (id, w, h, sum)
            case None => (id, -1, -1, -1L)
          }
        }
      }
      .toDF("doc_id", "width", "height", "pixel_sum")
      .orderBy("doc_id")
  }
}
