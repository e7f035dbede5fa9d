package graft.sources

/** Glyph-name -> Unicode resolution for simple-font `/Differences`
  * encoding arrays (VERDICT r10 Next #5) — the last documented fidelity
  * seam in the S1 PDF extractor (reference data_ingestion.py:116-122
  * relies on fitz for this).
  *
  * Two public resolution rules, per Adobe's published glyph-naming
  * conventions:
  *  1. a TABLE of standard glyph names (the Adobe Glyph List — public
  *     reference data, same vendoring posture as the public-suffix
  *     list; the subset here covers the full ASCII range plus the
  *     common Latin-1 accented letters, typographic punctuation and
  *     Greek — the names real simple-font /Differences arrays use);
  *  2. the algorithmic `uniXXXX` / `uXXXX[XX]` forms, which map a hex
  *     code point directly.
  * Unknown names resolve to None and the code DROPS from extraction
  * (the fitz behavior for unmapped glyphs — never garbage). */
object GlyphList {

  /** Resolve one glyph name (without the leading '/') to its text. */
  def toUnicode(name: String): Option[String] = {
    val fromTable = table.get(name)
    if (fromTable.isDefined) fromTable.map(_.toString)
    else if (name.startsWith("uni") && name.length >= 7 &&
      (name.length - 3) % 4 == 0 && name.drop(3).forall(isHex))
      // uniXXXXYYYY...: one or more concatenated WHOLE 4-digit UTF-16
      // units — a dangling partial group (uni004112) is malformed per
      // the convention and must DROP, not silently truncate to 'A'
      // (round-11 review finding)
      scala.util.Try(new String(
        name.drop(3).grouped(4)
          .map(h => Integer.parseInt(h, 16).toChar).toArray)).toOption
        .filter(_.nonEmpty)
    else if (name.startsWith("u") && name.length >= 5 && name.length <= 7 &&
      name.drop(1).forall(isHex))
      scala.util.Try(new String(
        Character.toChars(Integer.parseInt(name.drop(1), 16)))).toOption
    else None
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')

  /** AGL-subset name table. Source: the public Adobe Glyph List
    * convention; entries restated, not copied as a file. */
  private[sources] val table: Map[String, Char] = {
    val ascii = Map(
      "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
      "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
      "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
      "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "zero" -> '0', "one" -> '1', "two" -> '2', "three" -> '3',
      "four" -> '4', "five" -> '5', "six" -> '6', "seven" -> '7',
      "eight" -> '8', "nine" -> '9', "colon" -> ':', "semicolon" -> ';',
      "less" -> '<', "equal" -> '=', "greater" -> '>', "question" -> '?',
      "at" -> '@', "bracketleft" -> '[', "backslash" -> '\\',
      "bracketright" -> ']', "asciicircum" -> '^', "underscore" -> '_',
      "grave" -> '`', "braceleft" -> '{', "bar" -> '|',
      "braceright" -> '}', "asciitilde" -> '~')
    val letters =
      (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c).toMap
    val latin1 = Map(
      "exclamdown" -> '¡', "cent" -> '¢', "sterling" -> '£',
      "yen" -> '¥', "section" -> '§', "copyright" -> '©',
      "registered" -> '®', "degree" -> '°',
      "plusminus" -> '±', "mu" -> 'µ',
      "paragraph" -> '¶', "questiondown" -> '¿',
      "Agrave" -> 'À', "Aacute" -> 'Á', "Acircumflex" -> 'Â',
      "Atilde" -> 'Ã', "Adieresis" -> 'Ä', "Aring" -> 'Å',
      "AE" -> 'Æ', "Ccedilla" -> 'Ç', "Egrave" -> 'È',
      "Eacute" -> 'É', "Ecircumflex" -> 'Ê', "Edieresis" -> 'Ë',
      "Igrave" -> 'Ì', "Iacute" -> 'Í', "Icircumflex" -> 'Î',
      "Idieresis" -> 'Ï', "Eth" -> 'Ð', "Ntilde" -> 'Ñ',
      "Ograve" -> 'Ò', "Oacute" -> 'Ó', "Ocircumflex" -> 'Ô',
      "Otilde" -> 'Õ', "Odieresis" -> 'Ö', "Oslash" -> 'Ø',
      "Ugrave" -> 'Ù', "Uacute" -> 'Ú', "Ucircumflex" -> 'Û',
      "Udieresis" -> 'Ü', "Yacute" -> 'Ý', "Thorn" -> 'Þ',
      "germandbls" -> 'ß',
      "agrave" -> 'à', "aacute" -> 'á', "acircumflex" -> 'â',
      "atilde" -> 'ã', "adieresis" -> 'ä', "aring" -> 'å',
      "ae" -> 'æ', "ccedilla" -> 'ç', "egrave" -> 'è',
      "eacute" -> 'é', "ecircumflex" -> 'ê', "edieresis" -> 'ë',
      "igrave" -> 'ì', "iacute" -> 'í', "icircumflex" -> 'î',
      "idieresis" -> 'ï', "eth" -> 'ð', "ntilde" -> 'ñ',
      "ograve" -> 'ò', "oacute" -> 'ó', "ocircumflex" -> 'ô',
      "otilde" -> 'õ', "odieresis" -> 'ö', "oslash" -> 'ø',
      "ugrave" -> 'ù', "uacute" -> 'ú', "ucircumflex" -> 'û',
      "udieresis" -> 'ü', "yacute" -> 'ý', "thorn" -> 'þ',
      "ydieresis" -> 'ÿ')
    val typographic = Map(
      "endash" -> '–', "emdash" -> '—',
      "quoteleft" -> '‘', "quoteright" -> '’',
      "quotesinglbase" -> '‚', "quotedblleft" -> '“',
      "quotedblright" -> '”', "quotedblbase" -> '„',
      "dagger" -> '†', "daggerdbl" -> '‡', "bullet" -> '•',
      "ellipsis" -> '…', "perthousand" -> '‰',
      "guilsinglleft" -> '‹', "guilsinglright" -> '›',
      "fraction" -> '⁄', "Euro" -> '€', "trademark" -> '™',
      "fi" -> 'ﬁ', "fl" -> 'ﬂ',
      "florin" -> 'ƒ', "circumflex" -> 'ˆ', "caron" -> 'ˇ',
      "tilde" -> '˜', "breve" -> '˘', "dotaccent" -> '˙',
      "ring" -> '˚', "ogonek" -> '˛', "hungarumlaut" -> '˝',
      "OE" -> 'Œ', "oe" -> 'œ', "Scaron" -> 'Š',
      "scaron" -> 'š', "Ydieresis" -> 'Ÿ', "Zcaron" -> 'Ž',
      "zcaron" -> 'ž', "dotlessi" -> 'ı', "Lslash" -> 'Ł',
      "lslash" -> 'ł')
    val greek = Map(
      "Alpha" -> 'Α', "Beta" -> 'Β', "Gamma" -> 'Γ',
      "Delta" -> 'Δ', "Epsilon" -> 'Ε', "Zeta" -> 'Ζ',
      "Eta" -> 'Η', "Theta" -> 'Θ', "Iota" -> 'Ι',
      "Kappa" -> 'Κ', "Lambda" -> 'Λ', "Mu" -> 'Μ',
      "Nu" -> 'Ν', "Xi" -> 'Ξ', "Omicron" -> 'Ο',
      "Pi" -> 'Π', "Rho" -> 'Ρ', "Sigma" -> 'Σ',
      "Tau" -> 'Τ', "Upsilon" -> 'Υ', "Phi" -> 'Φ',
      "Chi" -> 'Χ', "Psi" -> 'Ψ', "Omega" -> 'Ω',
      "alpha" -> 'α', "beta" -> 'β', "gamma" -> 'γ',
      "delta" -> 'δ', "epsilon" -> 'ε', "zeta" -> 'ζ',
      "eta" -> 'η', "theta" -> 'θ', "iota" -> 'ι',
      "kappa" -> 'κ', "lambda" -> 'λ', "nu" -> 'ν',
      "xi" -> 'ξ', "omicron" -> 'ο', "pi" -> 'π',
      "rho" -> 'ρ', "sigma" -> 'σ', "sigma1" -> 'ς',
      "tau" -> 'τ', "upsilon" -> 'υ', "phi" -> 'φ',
      "chi" -> 'χ', "psi" -> 'ψ', "omega" -> 'ω')
    ascii ++ letters ++ latin1 ++ typographic ++ greek
  }

  /** Reverse lookup for fixture STAGING: the preferred standard name of
    * a character, if the table has one (ambiguity resolves to the
    * shortest, then lexicographically-first name so staging is
    * deterministic). */
  lazy val nameOf: Map[Char, String] =
    table.toSeq.groupBy(_._2)
      .map { case (c, ns) => c -> ns.map(_._1).minBy(n => (n.length, n)) }
}
