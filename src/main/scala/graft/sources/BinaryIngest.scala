package graft.sources

import graft.engine.Tables
import graft.operators.Ingest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: the reference's binary upload source (data_ingestion.py:110-134
  * reads the uploaded PDF's bytes and extracts per-page text via fitz).
  *
  * Engine form: `spark.read.format("binaryFile")` scans an upload
  * directory into (path, modificationTime, length, content binary) rows —
  * a distributed, split-per-file scan — and a PLUGGABLE extractor column
  * turns the bytes into text. PDF/OCR codecs are not available in this
  * container (SURVEY §2.1), so the default extractor is a UTF-8 decode
  * (pre-extracted text files); a real deployment drops in a JVM PDF
  * extractor either as a Column function or, when the library needs
  * per-partition init, as a mapPartitions batch (the Multimodal operator
  * shows that shape). Everything downstream of extraction — document
  * assembly, pagination, snippet windows — is the ordinary ingest
  * pipeline ([[graft.operators.Ingest.buildDocuments]]).
  */
object BinaryIngest {

  /** Scan a directory of binary uploads. `extractor` maps the raw bytes
    * column to text; the caller derives ids/attrs from `path`. `glob`
    * selects the upload extension (pre-extracted .txt by default; a PDF
    * deployment passes "*.pdf" with its extractor). */
  def readBinaryDocs(spark: SparkSession, dir: String,
      extractor: Column => Column = c => decode(c, "UTF-8"),
      glob: String = "*.txt"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length").as("n_bytes"),
        extractor(col("content")).as("text"))

  /** Text-layer extractor for UNCOMPRESSED PDF content streams — a REAL
    * container format through the extractor slot, proving the seam takes
    * actual PDF bytes end-to-end (the reference's fitz path, DI:110-134,
    * is this slot with a full decoder). Parses the show-text operators
    * of the page stream: every `(string) Tj` in an uncompressed stream
    * carries one text run; runs join with a space. Column functions only
    * (decode + regexp_extract_all + array_join), so it rides whole-stage
    * codegen like the default extractor. A production binding replacing
    * it handles compressed streams/encodings but changes NOTHING else —
    * same Column => Column shape, same routing, same downstream
    * pipeline. */
  def pdfTextExtractor(content: Column): Column =
    array_join(
      regexp_extract_all(
        // ISO-8859-1 maps bytes 1:1 to chars: binary-safe for the regex
        decode(content, "ISO-8859-1"),
        lit("\\(([^)]*)\\)\\s*Tj"), lit(1)),
      " ")

  /** Deterministic OCR stand-in: no OCR engine exists in this container
    * (SURVEY §2.1 S2), so the text is derived from the page bytes' CRC —
    * stable, clearly marked, and swappable for a real engine without
    * touching the routing below. */
  def ocrStub(content: Column): Column =
    concat(lit("[ocr] page "), crc32(content), lit(" end"))

  /** S2: the OCR fallback branch (reference DI:135-168 — render pages to
    * images and OCR them when the PDF has no text layer; dead in the
    * reference because the workdir is removed first, DI:167; implemented
    * here with the INTENDED semantics). Routing is real: docs whose
    * extracted text layer is empty are flagged `needs_ocr` and their
    * bytes go through the `ocr` extractor instead; everything downstream
    * sees one `text` column either way. */
  def readWithOcrFallback(spark: SparkSession, dir: String,
      extractor: Column => Column = c => decode(c, "UTF-8"),
      ocr: Column => Column = ocrStub,
      glob: String = "*.txt"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length").as("n_bytes"),
        extractor(col("content")).as("text_layer"), col("content"))
      // ALL-whitespace detection — Spark trim() strips spaces only, so a
      // newline-only text layer would dodge a trim-based check
      .withColumn("needs_ocr",
        length(regexp_replace(col("text_layer"), "\\s", "")) === 0)
      .select(col("path"), col("n_bytes"),
        when(col("needs_ocr"), ocr(col("content"))).otherwise(col("text_layer")).as("text"),
        col("needs_ocr"))

  /** Stage the pre-extracted fixture: one text FILE per document (the
    * per-upload unit the reference receives, DI:110), written DISTRIBUTED
    * through a partitioned text sink — document bytes never pass through
    * the driver. Deterministic location per sf dir; idempotent overwrite.
    * Capped at 200 docs: the point is the source plumbing, not volume. */
  def stageFixture(s: SparkSession, d: String): String = {
    val fix = "/tmp/graft_s1_fixture_" + d.replaceAll("[^A-Za-z0-9]", "_")
    // content is a deterministic function of the sf dir: stage once, reuse
    if (!new java.io.File(fix, "_SUCCESS").exists()) {
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("text"), col("doc_id"))
        .write.partitionBy("doc_id").mode("overwrite").text(fix)
    }
    fix
  }

  /** Oracle-checked S1 round trip: stage files -> binaryFile scan ->
    * UTF-8 extraction -> nested document build (broadcast dim lookup,
    * pagination, snippet windows) -> per-document rollup. Output carries
    * no path-dependent fields so DuckDB can recompute it from the
    * documents table alone. */
  def qBinaryIngest(s: SparkSession, d: String): DataFrame = {
    val fix = stageFixture(s, d)
    val bin = readBinaryDocs(s, fix)
      // the text sink terminates the file with '\n', and Spark's trim()
      // strips SPACES only — without this, split("\\s+") yields a trailing
      // empty token that inflates the window count by one
      .withColumn("text", regexp_replace(col("text"), "\\s+$", ""))
      .withColumn("doc_id", regexp_extract(col("path"), "doc_id=(\\d+)/", 1).cast("long"))
      .withColumn("lang", lit("und")) // unknown at upload time, like the reference
      .withColumn("source", col("path"))
      .select("doc_id", "lang", "source", "text")
    val cats = Tables.region(s, d).select(
      col("r_regionkey").cast("int").as("category_id"), col("r_name").as("category_name"))
    Ingest.buildDocuments(bin, cats)
      .select(
        col("document_id"),
        col("category_name"),
        size(col("pages")).cast("long").as("n_pages"),
        aggregate(col("pages"), lit(0L),
          (acc, p) => acc + size(p.getField("page_snippets"))).as("n_snippets"),
        element_at(element_at(col("pages"), 1).getField("page_snippets"), 1)
          .getField("snippet_text").as("first_snippet"))
      .orderBy("document_id")
  }
}
