package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text normalization + heuristic document filtering for a training-data
  * pipeline (extensions beyond the reference surface; the reference's only
  * text processing is the snippet window, data_ingestion.py:171-186).
  *
  * Both operators are NARROW — per-row regexp/arithmetic column
  * expressions, no UDF, no shuffle except the deterministic output sort —
  * so they scale linearly with input splits: the canonical "runs at any
  * corpus size" shape. The regexes are RE2-safe (no lookaround, no
  * backreferences) so they port to any engine and never backtrack
  * super-linearly on adversarial documents.
  */
object TextNormalize {
  import Tables._

  /** Canonical text form for loose matching and key-building: lowercase,
    * strip every non-letter/digit run to a single space, collapse
    * whitespace. Unicode-class based (`\p{L}\p{N}`), so accented letters
    * survive while punctuation, symbols and control chars go. */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]+", " "),
      "\\s+", " "))

  def qNormalize(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), normalized(col("text")).as("norm_text"))
      .withColumn("n_norm_tokens",
        when(col("norm_text") === "", 0L)
          .otherwise(size(split(col("norm_text"), " ")).cast("long")))
      .orderBy("doc_id")

  /** C4-style heuristic quality filters (Raffel et al. 2020, public):
    * every doc gets a keep/reject verdict plus the FIRST failing rule, so
    * the filter is auditable — a pipeline can report exactly why each
    * document was dropped. Rules, in precedence order:
    *   too_short    — fewer than `minTokens` whitespace tokens;
    *   brace        — contains '{' (code/markup leakage);
    *   lorem        — contains "lorem ipsum" (placeholder text);
    *   word_len     — mean token length outside [3, 10] (gibberish /
    *                  non-linguistic content);
    *   no_terminal  — does not end in sentence punctuation.
    * All thresholds are public C4 constants adapted to token granularity. */
  def c4Filters(df: DataFrame, minTokens: Int = 5): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val nTok = size(words).cast("long")
    val meanLen = (length(col("text")).cast("double") - (nTok - 1)) / nTok
    df.withColumn("n_tokens", nTok)
      .withColumn("mean_word_len", round(meanLen, 6))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("text").contains("{"), "brace")
          .when(lower(col("text")).contains("lorem ipsum"), "lorem")
          .when(col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0, "word_len")
          .when(!col("text").rlike("[.!?][\"')\\]]*\\s*$"), "no_terminal")
          .otherwise("kept"))
      .withColumn("kept", col("reason") === "kept")
  }

  def qC4Filters(s: SparkSession, d: String): DataFrame =
    c4Filters(documents(s, d))
      .select("doc_id", "n_tokens", "mean_word_len", "reason", "kept")
      .orderBy("doc_id")
}
