package graft.sources

import graft.engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL optical character recognition for the S2/F5 scanned-PDF path —
  * nearest-template bitmap matching, the algorithm classical OCR engines
  * (and Tesseract's original core) are built on, over a deterministic
  * 5x7 bitmap font.
  *
  * The reference's OCR branch (data_ingestion.py:135-168) renders pages
  * to images and feeds an OCR engine; this container ships none, and
  * earlier rounds carried a clearly-marked CRC stand-in behind the real
  * needs_ocr routing. This replaces the stand-in with an actual
  * image-to-text decoder:
  *
  *  - the SCANNED fixture embeds each document's normalized text as a
  *    rasterized image inside a PDF that has NO text layer (an /Image
  *    XObject drawn by the content stream — exactly what a scanner
  *    produces), with one deterministically flipped pixel per glyph cell
  *    so exact-lookup "OCR" cannot pass;
  *  - the extractor walks the PDF for the image XObject, inflates the
  *    raster, segments the glyph grid, and classifies every cell by
  *    MINIMUM HAMMING DISTANCE against the font templates — template
  *    matching, not table lookup. The font's minimum pairwise template
  *    distance is 3 (spec-pinned), so a 1-bit-noisy cell is PROVABLY
  *    nearer its true glyph than any other (d(noisy,true)=1 <
  *    d(true,other)-1 >= 2): recovery is exact by construction, and the
  *    oracle can state the recovered text in closed form.
  *
  * A trained-model engine for arbitrary fonts remains a deployment
  * swap-in through the same `ocr: Column => Column` slot; what is no
  * longer a stand-in is the image-to-text decode itself.
  *
  * Scale shape: rendering and decoding are both narrow per-document
  * mapPartitions work (raster bytes never shuffle); the font is a
  * 37-entry array in the task closure.
  */
object OcrEngine {

  /** 5x7 glyph art for A-Z, 0-9 and space (classic LED-matrix shapes;
    * zero is slashed so O/0 stay 3 bits apart). */
  private val FontArt: Seq[(Char, Seq[String])] = Seq(
    'A' -> Seq(".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    'B' -> Seq("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    'C' -> Seq(".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    'D' -> Seq("###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."),
    'E' -> Seq("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    'F' -> Seq("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    'G' -> Seq(".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    'H' -> Seq("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    'I' -> Seq(".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    'J' -> Seq("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    'K' -> Seq("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    'L' -> Seq("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    'M' -> Seq("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    'N' -> Seq("#...#", "#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#"),
    'O' -> Seq(".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    'P' -> Seq("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    'Q' -> Seq(".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    'R' -> Seq("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    'S' -> Seq(".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    'T' -> Seq("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    'U' -> Seq("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    'V' -> Seq("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    'W' -> Seq("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    'X' -> Seq("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    'Y' -> Seq("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    'Z' -> Seq("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    '0' -> Seq(".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    '1' -> Seq("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    '2' -> Seq(".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    '3' -> Seq("#####", "...#.", "..#..", "...#.", "....#", "#...#", ".###."),
    '4' -> Seq("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    '5' -> Seq("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    '6' -> Seq("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    '7' -> Seq("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    '8' -> Seq(".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    '9' -> Seq(".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    ' ' -> Seq(".....", ".....", ".....", ".....", ".....", ".....", "....."))

  /** Glyph cell geometry: 5x7 ink + 1px gap right and below. */
  val CellW = 6
  val CellH = 8
  /** Fixed page width in glyphs; normalized text wraps at this column. */
  val PageCols = 40
  /** Normalized text cap per document (3 rendered lines). */
  val OcrTextCap = 120

  /** (char, 35-bit row-major template) pairs, decode order = array order
    * (deterministic; ties are impossible under 1-bit noise given the
    * min-pairwise-distance-3 font, but the first-match rule pins the
    * behavior anyway). */
  val Templates: Array[(Char, Long)] = FontArt.map { case (ch, art) =>
    var sig = 0L
    for (y <- 0 until 7; x <- 0 until 5)
      if (art(y).charAt(x) == '#') sig |= 1L << (y * 5 + x)
    ch -> sig
  }.toArray

  /** OCR-alphabet normalization, mirrored verbatim by the oracle SQL:
    * ASCII-lowercase -> upper, ASCII whitespace -> space, anything
    * outside [A-Z0-9 ] dropped, space runs collapsed, trimmed, capped at
    * [[OcrTextCap]] chars, right-trimmed (a cap boundary landing on a
    * space must not leave a trailing blank the raster cannot represent
    * distinctly from grid padding). */
  def ocrNormalize(text: String): String = {
    val sb = new StringBuilder
    Option(text).getOrElse("").foreach {
      case c if c >= 'a' && c <= 'z' => sb += (c - 32).toChar
      case '\t' | '\n' | '\r' | '\f' => sb += ' '
      case c if (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == ' ' => sb += c
      case _ => ()
    }
    val collapsed = sb.toString.replaceAll(" +", " ").trim
    val capped = collapsed.take(OcrTextCap)
    capped.reverse.dropWhile(_ == ' ').reverse
  }

  /** Render normalized text as an 8-bit grayscale raster (0x00 ink on
    * 0xFF paper), wrapped at [[PageCols]], with ONE deterministically
    * flipped pixel per glyph cell (cell-index keyed) — the noise that
    * forces the decoder to actually template-match. */
  def renderRaster(norm: String): (Int, Int, Array[Byte]) =
    renderRasterWith(Templates.toMap)(norm)

  /** [[renderRaster]] parameterized by the font — the trained-OCR gate
    * ([[OcrTrained]]) renders its fixtures in a SECOND font through the
    * same geometry and noise model. */
  def renderRasterWith(sigOf: Map[Char, Long])(norm: String): (Int, Int, Array[Byte]) = {
    val lines = math.max(1, (norm.length + PageCols - 1) / PageCols)
    val w = PageCols * CellW
    val h = lines * CellH
    val img = Array.fill[Byte](w * h)(0xFF.toByte)
    var cell = 0
    while (cell < lines * PageCols) {
      val ch = if (cell < norm.length) norm.charAt(cell) else ' '
      val noisy = sigOf(ch) ^ (1L << ((cell * 11 + 3) % 35))
      val ox = (cell % PageCols) * CellW
      val oy = (cell / PageCols) * CellH
      var b = 0
      while (b < 35) {
        if ((noisy & (1L << b)) != 0)
          img((oy + b / 5) * w + ox + b % 5) = 0x00
        b += 1
      }
      cell += 1
    }
    (w, h, img)
  }

  /** Decode a glyph-grid raster by nearest-template classification:
    * every [[CellW]]x[[CellH]] cell's 35-bit ink signature (threshold
    * 128) is matched to the template with MINIMUM Hamming distance. */
  def decodeRaster(w: Int, h: Int, img: Array[Byte]): String =
    decodeRasterWith(Templates)(w, h, img)

  /** [[decodeRaster]] with a caller-supplied template set — the kernel a
    * TRAINED model plugs into (the learned font is just another template
    * array; see [[OcrTrained]]). */
  def decodeRasterWith(templates: Array[(Char, Long)])(
      w: Int, h: Int, img: Array[Byte]): String = {
    val cols = w / CellW
    val lines = h / CellH
    val sb = new StringBuilder
    var cell = 0
    while (cell < lines * cols) {
      val ox = (cell % cols) * CellW
      val oy = (cell / cols) * CellH
      var sig = 0L
      var b = 0
      while (b < 35) {
        if ((img((oy + b / 5) * w + ox + b % 5) & 0xFF) < 128) sig |= 1L << b
        b += 1
      }
      var bestCh = ' '
      var bestD = Integer.MAX_VALUE
      var t = 0
      while (t < templates.length) {
        val d = java.lang.Long.bitCount(sig ^ templates(t)._2)
        if (d < bestD) { bestD = d; bestCh = templates(t)._1 }
        t += 1
      }
      sb += bestCh
      cell += 1
    }
    sb.toString.reverse.dropWhile(_ == ' ').reverse
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(b); defl.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end(); out.toByteArray
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!inf.finished() && !inf.needsInput() && out.size() < (64 << 20))
      out.write(buf, 0, inf.inflate(buf))
    inf.end(); out.toByteArray
  }

  /** Build a SCANNED single-page PDF: the page draws one /DeviceGray
    * /Image XObject and carries NO text operators — exactly the layout a
    * scanner-produced PDF has, and the layout that must route to OCR. */
  def buildPdfScanned(text: String): Array[Byte] = {
    val (w, h, img) = renderRaster(ocrNormalize(text))
    buildScannedPdf(w, h, img)
  }

  /** The scanned-PDF container for any glyph-grid raster (factored out
    * so [[OcrTrained]] stages second-font fixtures through the identical
    * no-text-layer layout). */
  def buildScannedPdf(w: Int, h: Int, img: Array[Byte]): Array[Byte] = {
    val data = deflate(img)
    val content = s"q $w 0 0 $h 0 0 cm /Im1 Do Q"
    val bos = new java.io.ByteArrayOutputStream()
    def s(str: String): Unit =
      bos.write(str.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    s("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 5 0 R >> >> " +
      "/Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      s"5 0 obj << /Type /XObject /Subtype /Image /Width $w /Height $h " +
      "/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode " +
      s"/Length ${data.length} >> stream\n")
    bos.write(data)
    s("\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  /** The OCR extractor: walk the PDF bytes for the first /Image XObject,
    * inflate its raster, and template-match the glyph grid back to text.
    * Empty string on anything malformed (no image, bad deflate, geometry
    * mismatch) — a scanned page we cannot read contributes no text, it
    * never throws. */
  def ocrExtractPdf(bytes: Array[Byte]): String =
    extractScanRaster(bytes) match {
      case Some((w, h, img)) => decodeRaster(w, h, img)
      case None => ""
    }

  /** The raster walk half of [[ocrExtractPdf]]: locate the first /Image
    * XObject, inflate it, validate the glyph-grid geometry. None on
    * anything malformed — shared with the trained engine, which decodes
    * the same raster through learned templates. */
  def extractScanRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      if (bytes == null) return None
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val imgAt = raw.indexOf("/Subtype /Image")
      if (imgAt < 0) return None
      val dictStart = raw.lastIndexOf("<<", imgAt)
      val streamAt = raw.indexOf("stream", imgAt)
      if (dictStart < 0 || streamAt < 0) return None
      val dict = raw.substring(dictStart, streamAt)
      def intField(key: String): Option[Int] =
        (java.util.regex.Pattern.quote(key) + """\s+(\d+)""").r
          .findFirstMatchIn(dict).map(_.group(1).toInt)
      val (w, h, len) = (intField("/Width"), intField("/Height"), intField("/Length")) match {
        case (Some(a), Some(b), Some(c)) => (a, b, c)
        case _ => return None
      }
      // stream data begins after the EOL following the `stream` keyword
      var dataAt = streamAt + "stream".length
      if (dataAt < raw.length && raw.charAt(dataAt) == '\r') dataAt += 1
      if (dataAt < raw.length && raw.charAt(dataAt) == '\n') dataAt += 1
      if (dataAt + len > bytes.length) return None
      val img = inflate(java.util.Arrays.copyOfRange(bytes, dataAt, dataAt + len))
      if (img.length != w * h || w % CellW != 0 || h % CellH != 0) return None
      Some((w, h, img))
    } catch { case _: Exception => None }

  /** [[ocrExtractPdf]] as the `ocr` slot Column for
    * [[BinaryIngest.readWithOcrFallback]]. */
  val ocrExtractor: Column => Column = {
    val u = udf((b: Array[Byte]) => ocrExtractPdf(b))
    c => u(c)
  }

  /** Stage scanned (image-only) PDFs for doc_id < 200 — executor-written,
    * versioned + atomically published like every other fixture. */
  def stageScannedFixture(s: SparkSession, d: String): String = {
    val fix = BinaryIngest.fixtureRoot("ocr_fixture", d)
    BinaryIngest.publishFixture(fix) { tmp =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp, f"scan$id%05d.pdf"),
              buildPdfScanned(text))
            id
          }
        }.count()
    }
    fix
  }

  /** Oracle-checked OCR round trip: documents staged as scanned PDFs ->
    * binaryFile scan -> REAL text-layer extraction finds nothing ->
    * needs_ocr routing -> template-matching OCR recovers the normalized
    * text exactly (provable under the font's distance margin). The
    * oracle replays the normalization closed-form and pins needs_ocr
    * TRUE for every document — a text-layer leak, a routing slip or any
    * misclassified glyph hash-mismatches. */
  def qOcrIngest(s: SparkSession, d: String): DataFrame = {
    val fix = stageScannedFixture(s, d)
    BinaryIngest.readWithOcrFallback(s, fix,
        extractor = BinaryIngest.pdfTextExtractorFull,
        ocr = ocrExtractor, glob = "*.pdf")
      .select(
        regexp_extract(col("path"), "scan(\\d+)\\.pdf", 1).cast("long").as("doc_id"),
        col("needs_ocr"), col("text"))
      .orderBy("doc_id")
  }
}
