package graft.sources

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-encoding detection for crawled byte payloads — the step
  * between "bytes arrived" and "text exists". A crawl corpus mixes
  * UTF-8 (with and without BOM), UTF-16 (BOM'd, both endiannesses) and
  * legacy single-byte pages; decoding everything as UTF-8 silently
  * corrupts the rest (U+FFFD confetti that poisons dedup shingles and
  * n-gram language ID downstream). Detection order, standard practice:
  *
  *   1. BOM (authoritative when present): EF BB BF / FF FE / FE FF;
  *   2. strict UTF-8 validation (CharsetDecoder REPORT — a decode that
  *      would substitute is a failed detection, never silent damage);
  *   3. ISO-8859-1 fallback (total: every byte sequence decodes).
  *
  * Spark shape: a narrow per-partition map over (id, binary) rows —
  * detection is per-payload local work, no shuffle, the same in-table
  * binary-column layout as the multimodal decodes. */
object CharsetSniff {

  /** Marker appended to every payload before encoding: non-ASCII chars
    * (all Latin-1-encodable) make the families DISTINGUISHABLE — pure
    * ASCII bytes are valid in every family, so a detector could not be
    * caught mislabeling them. */
  val Marker = " charset: café Ünïcøde"

  def familyOf(docId: Long): Int = (docId % 5).toInt

  /** Encode `text + Marker` per the doc's family. */
  def encodePayload(docId: Long, text: String): Array[Byte] = {
    val t = (if (text == null) "" else text) + Marker
    familyOf(docId) match {
      case 0 => t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case 1 => Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case 2 => Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        t.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      case 3 => Array[Byte](0xFE.toByte, 0xFF.toByte) ++
        t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
      case _ => t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  /** Detect + decode: (charset label, decoded text). Never throws — the
    * Latin-1 fallback is total. */
  def sniff(bytes: Array[Byte]): (String, String) = {
    if (bytes == null) return ("utf-8", "")
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return ("utf-8-bom", new String(bytes, 3, bytes.length - 3,
        java.nio.charset.StandardCharsets.UTF_8))
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return ("utf-16le", new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16LE))
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return ("utf-16be", new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE))
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      ("utf-8", dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        ("iso-8859-1", new String(bytes,
          java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  /** Oracle-checked detect + decode round trip over in-table byte
    * payloads: five encoding families (by doc_id) must come back with
    * the right label AND byte-exact text — a detector that misroutes a
    * family corrupts the marker's non-ASCII chars and hash-mismatches.
    * NOTE: corpus text is ASCII by construction; the appended
    * [[Marker]] supplies the non-ASCII bytes that make families
    * distinguishable (and makes Latin-1 bytes INVALID UTF-8, pinning
    * the strict-validation fallback). */
  def qCharset(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.rebalance(Tables.documents(s, d), "doc_id")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (cs, decoded) = sniff(encodePayload(id, text))
          (id, cs, decoded)
        }
      }
      .toDF("doc_id", "charset", "text")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- mojibake repair

  /** Repair UTF-8-read-as-Latin-1 MOJIBAKE (the ftfy core case): an
    * upstream stage decoded UTF-8 bytes with Latin-1, turning every
    * non-ASCII char into 2-4 high-Latin chars ("é" -> "Ã©") — endemic in
    * crawl corpora that pass through legacy feeds. The repair is the
    * EXACT inverse, applied only when it provably is one:
    *  - the text must contain a char in [0x80, 0xFF] (pure ASCII cannot
    *    be mojibake) and NO char above 0xFF (such a char cannot have come
    *    from a Latin-1 decode of anything);
    *  - its Latin-1 bytes must STRICTLY validate as UTF-8 (the same
    *    REPORT-mode decoder [[sniff]] trusts). Genuine Latin-1 prose
    *    fails strict validation with overwhelming probability, so false
    *    repairs are structurally rare and the pass-through is total.
    * One layer per call by declaration: feeds known to DOUBLE-corrupt
    * loop to a fixed point, each pass carrying the same proof. */
  def repairMojibake(text: String): (String, Boolean) = {
    if (text == null) return ("", false)
    var hasHigh = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c > 0xFF) return (text, false)
      if (c >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return (text, false)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val repaired = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (repaired == text) (text, false) else (repaired, true)
    } catch {
      case _: java.nio.charset.CharacterCodingException => (text, false)
    }
  }

  /** Non-ASCII marker appended before corruption in [[qMojibake]] — the
    * corpus text is ASCII by construction (immune to this corruption), so
    * the marker supplies the multi-byte chars the round trip must carry:
    * two Latin-1-reachable accents and one char OUTSIDE Latin-1 (π),
    * proving the repair reassembles multi-byte sequences, not just the
    * two-byte accent case. */
  val MojibakeMarker = " caf\u00e9 Z\u00fcrich \u03c0" // " café Zürich π", escaped so the source charset cannot matter

  /** Oracle-checked repair: every 3rd document is corrupted with the real
    * chain (UTF-8 bytes decoded as Latin-1) after the marker is appended;
    * the rest pass through untouched. The oracle states the expected
    * output in CLOSED FORM (original text + marker literal — it never
    * runs the corruptor or the repairer), so a repair that drops a byte,
    * fires on a clean ASCII row, or misses a planted row hash-mismatches. */
  def qMojibake(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.rebalance(Tables.documents(s, d), "doc_id")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // NULL text normalizes to "" on BOTH sides (the q_charset
          // coalesce convention): bare `text + MojibakeMarker` would
          // fabricate the literal string "null ..." for a NULL row while
          // the oracle's `text || marker` yields NULL — a latent hash
          // FAIL on any corpus with NULL texts
          val base = if (text == null) "" else text
          val seen =
            if (id % 3 == 0)
              new String((base + MojibakeMarker)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8),
                java.nio.charset.StandardCharsets.ISO_8859_1)
            else base
          val (out, repaired) = repairMojibake(seen)
          (id, repaired, out)
        }
      }
      .toDF("doc_id", "repaired", "text_out")
      .orderBy("doc_id")
  }
}
