package graft
package entry

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-SQL builder helpers shared by the per-module entry
  * registries — moved verbatim from the monolithic SparkEntry
  * (round 8). Each generates DuckDB SQL from the engine's own
  * constants so oracles can never drift from the engine. */
private[graft] object OracleHelpers {

  /** DuckDB replica of the full MinHash-LSH pipeline, GENERATED from the
    * engine's own [[Dedup.hashParams]]: shingle -> polyHash code (the
    * list_reduce form already oracle-proven by q_fingerprint) -> K affine
    * mins -> band keys -> same-band candidate pairs -> exact-Jaccard
    * verification. Every constant (LCG-derived a_i/b_i, band count, prime)
    * comes from the Scala source of truth, so the oracle can never drift
    * from the engine. */
  def minhashOracleFor(pairCondition: String): String = {
    val sigTerms = Dedup.hashParams.map { case (a, b) =>
      s"list_min(list_transform(cs, x -> ($a*x + $b) % ${Dedup.Prime}))"
    }.mkString(", ")
    val rpb = Dedup.RowsPerBand
    "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "codes AS (SELECT doc_id, s, list_transform(s, sg -> list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(sg)), " +
      "i -> CAST(ascii(sg[i]) AS BIGINT))), (a, c) -> (a * 31 + c) % 1000000007)) AS cs FROM sh), " +
      s"sigs AS (SELECT doc_id, s, [$sigTerms] AS sig FROM codes), " +
      s"bands AS (SELECT doc_id, unnest(generate_series(0, ${Dedup.Bands - 1})) AS band, sig FROM sigs), " +
      s"keys AS (SELECT doc_id, band, array_to_string(sig[band*$rpb+1 : band*$rpb+$rpb], ',') AS band_key FROM bands), " +
      "cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM keys a " +
      s"JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND $pairCondition), " +
      "verified AS (SELECT doc_a, doc_b, CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) " +
      "/ (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS j FROM cands " +
      "JOIN codes sa ON cands.doc_a = sa.doc_id JOIN codes sb ON cands.doc_b = sb.doc_id) " +
      "SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM verified WHERE j >= 0.5 ORDER BY doc_a, doc_b"
  }

  lazy val minhashOracleSql: String = minhashOracleFor("a.doc_id < b.doc_id")

  /** Estimator-observability oracle (mirrors [[Dedup.qMinhashEst]]): the
    * same generated signature/band chain, but selecting BOTH sides of
    * the estimate — component-match count, match/K, exact Jaccard, and
    * the floor-form absolute error — over the unfiltered candidate set. */
  lazy val minhashEstOracleSql: String = {
    val k = Dedup.MinhashK
    val sigTerms = Dedup.hashParams.map { case (a, b) =>
      s"list_min(list_transform(cs, x -> ($a*x + $b) % ${Dedup.Prime}))"
    }.mkString(", ")
    val rpb = Dedup.RowsPerBand
    "WITH allc AS (SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 1000000, text FROM documents), " +
      "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM allc), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "codes AS (SELECT doc_id, s, list_transform(s, sg -> list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(sg)), " +
      "i -> CAST(ascii(sg[i]) AS BIGINT))), (a, c) -> (a * 31 + c) % 1000000007)) AS cs FROM sh), " +
      s"sigs AS (SELECT doc_id, s, [$sigTerms] AS sig FROM codes), " +
      s"bands AS (SELECT doc_id, unnest(generate_series(0, ${Dedup.Bands - 1})) AS band, sig FROM sigs), " +
      s"keys AS (SELECT doc_id, band, array_to_string(sig[band*$rpb+1 : band*$rpb+$rpb], ',') AS band_key FROM bands), " +
      "cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM keys a " +
      "JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id), " +
      "est AS (SELECT doc_a, doc_b, " +
      s"CAST(len(list_filter(generate_series(1, $k), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS sig_match, " +
      "CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) " +
      "/ (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS j " +
      "FROM cands JOIN sigs sa ON cands.doc_a = sa.doc_id " +
      "JOIN sigs sb ON cands.doc_b = sb.doc_id) " +
      s"SELECT doc_a, doc_b, sig_match, round(CAST(sig_match AS DOUBLE) / $k, 6) AS est, " +
      "round(j, 6) AS jaccard, " +
      s"floor(abs(round(CAST(sig_match AS DOUBLE) / $k, 6) - round(j, 6)) * 1000000 + 0.5) / 1000000 AS abs_err " +
      "FROM est ORDER BY doc_a, doc_b"
  }

  /** Incremental probe: incoming = odd ids, persisted index = even ids. */
  lazy val minhashIncrementalOracleSql: String =
    minhashOracleFor("a.doc_id % 2 = 1 AND b.doc_id % 2 = 0")

  /** DuckDB replica of the banded SimHash pipeline, generated from
    * [[Dedup.SimhashBands]]/[[Dedup.SimhashBandBits]]/[[Dedup.SimhashBucketCap]].
    * The 64-bit wrap-around token hash runs in HUGEINT mod 2^64 (DuckDB
    * BIGINT arithmetic traps overflow); fingerprints stay as 64-element
    * bit lists, so band keys and Hamming distances need no signed packing. */
  lazy val simhashOracleSql: String = {
    val nb = Dedup.SimhashBands
    val bb = Dedup.SimhashBandBits
    val cap = Dedup.SimhashBucketCap
    val m64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
    val m32 = "CAST(4294967296 AS HUGEINT)"             // 2^32
    // (x * c) mod 2^64 via 32-bit halves of c: the direct 64x64 product can
    // overflow HUGEINT (2^127), the split partials cannot (max 2^96)
    def mulmod(c: BigInt): String = {
      val lo = c & 0xFFFFFFFFL
      val hi = c >> 32
      s"((x * $lo) % $m64 + (((x * $hi) % $m32) * $m32)) % $m64"
    }
    val fmixC1 = BigInt("ff51afd7ed558ccd", 16)
    val fmixC2 = BigInt("c4ceb9fe1a85ec53", 16)
    "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "hs0 AS (SELECT doc_id, list_transform(words, t -> list_reduce(" +
      "list_prepend(CAST(1125899906842597 AS HUGEINT), " +
      "list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS HUGEINT))), " +
      s"(h, c) -> xor((h * 31) % $m64, c))) AS th FROM w), " +
      // murmur fmix64 per token hash, one avalanche step per stage so the
      // lambda variable (cheap) is re-referenced, never a subexpression
      "hs1 AS (SELECT doc_id, list_transform(th, x -> xor(x, x >> 33)) AS th FROM hs0), " +
      s"hs2 AS (SELECT doc_id, list_transform(th, x -> ${mulmod(fmixC1)}) AS th FROM hs1), " +
      "hs3 AS (SELECT doc_id, list_transform(th, x -> xor(x, x >> 33)) AS th FROM hs2), " +
      s"hs4 AS (SELECT doc_id, list_transform(th, x -> ${mulmod(fmixC2)}) AS th FROM hs3), " +
      "hs AS (SELECT doc_id, list_transform(th, x -> xor(x, x >> 33)) AS th FROM hs4), " +
      "votes AS (SELECT doc_id, list_transform(generate_series(0, 63), j -> " +
      "CASE WHEN list_sum(list_transform(th, h -> " +
      "CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) AS bits FROM hs), " +
      s"keys AS (SELECT doc_id, band, list_sum(list_transform(generate_series(0, ${bb - 1}), " +
      s"j -> bits[band*$bb + j + 1] * (1 << j))) AS band_key " +
      s"FROM (SELECT doc_id, bits, unnest(generate_series(0, ${nb - 1})) AS band FROM votes)), " +
      "occ AS (SELECT band, band_key, count(*) AS n FROM keys GROUP BY 1, 2), " +
      "small AS (SELECT k.doc_id, k.band, k.band_key FROM keys k " +
      s"JOIN occ ON k.band = occ.band AND k.band_key = occ.band_key WHERE occ.n <= $cap), " +
      "cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM small a " +
      "JOIN small b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id), " +
      "ham AS (SELECT doc_a, doc_b, CAST(len(list_filter(generate_series(1, 64), " +
      "i -> va.bits[i] != vb.bits[i])) AS INTEGER) AS hamming FROM cands " +
      "JOIN votes va ON cands.doc_a = va.doc_id JOIN votes vb ON cands.doc_b = vb.doc_id) " +
      "SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 4 ORDER BY doc_a, doc_b"
  }

  /** Shared DuckDB trainer chain for the BPE oracles: `nMerges`
    * iterations unrolled as CTEs (segmentation s_i -> weighted pair
    * counts p_i -> top merge m_i -> rewritten segmentation s_{i+1}).
    * Every s_i/m_i is MATERIALIZED: each level is referenced twice (the
    * pair count and the next rewrite), so inlined CTEs would re-evaluate
    * the whole chain exponentially (measured: >120 s inlined, 0.1 s
    * materialized at sf0.01). ONE generator feeds both q_bpe_train and
    * q_bpe_encode so the two oracles' trainers can never drift. */
  def bpeTrainerCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH v0 AS (SELECT w, count(*) AS freq FROM " +
      "(SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents) " +
      "WHERE length(w) > 0 GROUP BY w), ")
    sb.append("s1 AS MATERIALIZED (SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seg, freq FROM v0), ")
    for (i <- 1 to nMerges) {
      sb.append(s"p$i AS (SELECT z.l AS l, z.r AS r, CAST(sum(freq) AS BIGINT) AS n FROM " +
        "(SELECT freq, unnest([struct_pack(l := parts[j], r := parts[j+1]) " +
        "for j in generate_series(1, len(parts) - 1)]) AS z FROM " +
        s"(SELECT freq, string_split(trim(seg), ' ') AS parts FROM s$i) WHERE len(parts) >= 2) GROUP BY 1, 2), ")
      sb.append(s"m$i AS MATERIALIZED (SELECT $i AS step, l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1), ")
      if (i < nMerges)
        sb.append(s"s${i + 1} AS MATERIALIZED (SELECT " +
          s"coalesce(replace(seg, (SELECT ' '||l||' '||r||' ' FROM m$i), " +
          s"(SELECT ' '||l||r||' ' FROM m$i)), seg) AS seg, freq FROM s$i), ")
    }
    sb.toString
  }

  /** DuckDB replica of the ENTIRE logistic-regression training loop
    * (TextAnalysis.qLogistic), generated from the same constants:
    * hashed-bucket features, the rational surrogate sigmoid (only
    * IEEE-pinned ops — libm exp() does not round-trip engines),
    * DECIMAL(28,12) gradient sums, 6dp half-up weight updates, unrolled
    * one CTE-triple per iteration (MATERIALIZED — each level is read by
    * the next two). The q_pagerank/q_bpe_train pattern applied to a
    * trained model: the oracle cannot drift from the Scala constants. */
  lazy val logisticOracleSql: String = {
    import graft.operators.TextAnalysis.{LogitBuckets => B, LogitIters => I, LogitLr => LR}
    def f6(e: String): String = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
    val xs = (0 until B).map(j => s"x$j").mkString(", ")
    val sb = new StringBuilder("WITH ")
    sb.append("lt0 AS (SELECT doc_id, " +
      "unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), ")
    sb.append("ltj AS (SELECT doc_id, " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, length(tok)), i -> CAST(ascii(tok[i]) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % 1000000007) % $B AS j, " +
      "CASE WHEN tok IN (" +
      graft.operators.Stopwords.en.map(w => s"'$w'").mkString(",") +
      ") THEN 1 ELSE 0 END AS st FROM lt0), ")
    val xcols = (0 until B).map(j =>
      f6(s"CAST(sum(CASE WHEN j = $j THEN 1 ELSE 0 END) AS DOUBLE) / count(*)") + s" AS x$j")
      .mkString(", ")
    sb.append("ltf AS MATERIALIZED (SELECT doc_id, " +
      "CASE WHEN 15 * sum(st) >= count(*) THEN 1 ELSE 0 END AS y, " +
      s"$xcols FROM ltj GROUP BY doc_id), ")
    // standardization: decimal moment sums -> 6dp mean/sd -> centered/scaled
    sb.append("ltm AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n, " +
      (0 until B).map(j =>
        s"sum(CAST(x$j AS DECIMAL(18,6))) AS s$j, " +
        s"sum(CAST(x$j * x$j AS DECIMAL(28,12))) AS q$j").mkString(", ") +
      " FROM ltf), ")
    sb.append("ltmm AS (SELECT n, " +
      (0 until B).map(j =>
        f6(s"CAST(s$j AS DOUBLE) / n") + s" AS m$j, " +
        f6(s"CAST(q$j AS DOUBLE) / n") + s" AS v$j").mkString(", ") +
      " FROM ltm), ")
    sb.append("ltsd AS (SELECT n, " +
      (0 until B).map(j => s"m$j, greatest(" +
        f6(s"sqrt(greatest(0.0, v$j - m$j * m$j))") + s", 0.000001) AS d$j").mkString(", ") +
      " FROM ltmm), ")
    sb.append("ltsf AS MATERIALIZED (SELECT doc_id, y, " +
      (0 until B).map(j => f6(s"(x$j - m$j) / d$j") + s" AS x$j").mkString(", ") +
      " FROM ltf, ltsd), ")
    sb.append("ltn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ltsf), ")
    sb.append("ltw0 AS (SELECT " +
      (0 until B).map(j => s"0.0 AS w$j").mkString(", ") + ", 0.0 AS wb), ")
    for (i <- 1 to I) {
      val prev = s"ltw${i - 1}"
      val z = f6((0 until B).map(j => s"x$j * $prev.w$j").mkString(" + ") + s" + $prev.wb")
      sb.append(s"lte$i AS (SELECT y, $xs, " +
        f6("0.5 + z / (2.0 * (1.0 + abs(z)))") + " - y AS err FROM " +
        s"(SELECT y, $xs, $z AS z FROM ltsf, $prev)), ")
      sb.append(s"ltg$i AS MATERIALIZED (SELECT " +
        (0 until B).map(j => s"sum(CAST(err * x$j AS DECIMAL(28,12))) AS g$j").mkString(", ") +
        s", sum(CAST(err AS DECIMAL(28,12))) AS gb FROM lte$i), ")
      sb.append(s"ltw$i AS (SELECT " +
        (0 until B).map(j =>
          f6(s"$prev.w$j - $LR * CAST(ltg$i.g$j AS DOUBLE) / ltn.n") + s" AS w$j")
          .mkString(", ") +
        ", " + f6(s"$prev.wb - $LR * CAST(ltg$i.gb AS DOUBLE) / ltn.n") + " AS wb " +
        s"FROM $prev, ltg$i, ltn), ")
    }
    val zf = f6((0 until B).map(j => s"x$j * ltw$I.w$j").mkString(" + ") + s" + ltw$I.wb")
    sb.toString.stripSuffix(", ") + " " +
      "SELECT doc_id, y, score, score >= 0.5 AS pred, (score >= 0.5) = (y = 1) AS hit " +
      "FROM (SELECT doc_id, y, " + f6("0.5 + z / (2.0 * (1.0 + abs(z)))") + " AS score " +
      s"FROM (SELECT doc_id, y, $zf AS z FROM ltsf, ltw$I)) ORDER BY doc_id"
  }

  /** DuckDB replica of the TRAINED caption scorer
    * (Multimodal.qCaptionTrained), generated from the same constants:
    * features from the STAGING formulas (geometry deltas by the 7/11
    * plant rules; img_mean replayed from the pixel formula so the real
    * decode stays pinned on ids 200..399), then the full GD loop
    * unrolled over the even half (the logisticOracleSql pattern) and
    * the held-out odd half scored with the final weights. */
  lazy val captionTrainedOracleSql: String = {
    import graft.operators.Multimodal.{CaptionTrainUniverse => U, CaptionIters => I, CaptionLr => LR, CaptionFeatures => B}
    def f6(e: String): String = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
    val xs = (0 until B).map(j => s"x$j").mkString(", ")
    val sb = new StringBuilder("WITH ")
    sb.append(s"cm0 AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h " +
      s"FROM documents WHERE doc_id < $U), ")
    sb.append("cpx AS (SELECT doc_id, w, h, " +
      "unnest(generate_series(0, w * h - 1)) AS p FROM cm0), ")
    sb.append("cmm AS (SELECT doc_id, " +
      "CAST(sum(((p % w) * 7 + (p // w) * 13 + doc_id) % 256) " +
      "// (any_value(w) * any_value(h)) AS INTEGER) AS img_mean FROM cpx GROUP BY doc_id), ")
    sb.append("ctf AS MATERIALIZED (SELECT cm0.doc_id, cmm.img_mean, " +
      "CAST(CASE WHEN cm0.doc_id % 7 = 0 THEN 1 ELSE 0 END AS DOUBLE) AS x0, " +
      "CAST(0 AS DOUBLE) AS x1, " +
      "CAST(CASE WHEN cm0.doc_id % 11 = 0 THEN 2 ELSE 0 END AS DOUBLE) AS x2, " +
      "CASE WHEN cm0.doc_id % 7 <> 0 AND cm0.doc_id % 11 <> 0 THEN 1 ELSE 0 END AS y " +
      "FROM cm0 JOIN cmm USING (doc_id)), ")
    sb.append("ctt AS MATERIALIZED (SELECT * FROM ctf WHERE doc_id % 2 = 0), ")
    sb.append("ctn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ctt), ")
    sb.append("ctw0 AS (SELECT " +
      (0 until B).map(j => s"0.0 AS w$j").mkString(", ") + ", 0.0 AS wb), ")
    for (i <- 1 to I) {
      val prev = s"ctw${i - 1}"
      val z = f6((0 until B).map(j => s"x$j * $prev.w$j").mkString(" + ") + s" + $prev.wb")
      sb.append(s"cte$i AS (SELECT y, $xs, " +
        f6("0.5 + z / (2.0 * (1.0 + abs(z)))") + " - y AS err FROM " +
        s"(SELECT y, $xs, $z AS z FROM ctt, $prev)), ")
      sb.append(s"ctg$i AS MATERIALIZED (SELECT " +
        (0 until B).map(j => s"sum(CAST(err * x$j AS DECIMAL(28,12))) AS g$j").mkString(", ") +
        s", sum(CAST(err AS DECIMAL(28,12))) AS gb FROM cte$i), ")
      sb.append(s"ctw$i AS (SELECT " +
        (0 until B).map(j =>
          f6(s"$prev.w$j - $LR * CAST(ctg$i.g$j AS DOUBLE) / ctn.n") + s" AS w$j")
          .mkString(", ") +
        ", " + f6(s"$prev.wb - $LR * CAST(ctg$i.gb AS DOUBLE) / ctn.n") + " AS wb " +
        s"FROM $prev, ctg$i, ctn), ")
    }
    val zf = f6((0 until B).map(j => s"x$j * ctw$I.w$j").mkString(" + ") + s" + ctw$I.wb")
    sb.toString.stripSuffix(", ") + " " +
      "SELECT doc_id, img_mean, y, score, score >= 0.5 AS pred, geom_said_ok, " +
      "(score >= 0.5) = (y = 1) AS hit " +
      "FROM (SELECT doc_id, img_mean, y, x0 = 0 AND x1 = 0 AS geom_said_ok, " +
      f6("0.5 + z / (2.0 * (1.0 + abs(z)))") + " AS score " +
      s"FROM (SELECT doc_id, img_mean, y, x0, x1, x2, $zf AS z " +
      s"FROM ctf, ctw$I WHERE doc_id % 2 = 1)) ORDER BY doc_id"
  }

  /** DuckDB replica of the unigram-LM tokenizer (TextSearch.qUnigramLm),
    * generated from the same constants: seed substring counts, top-K +
    * alphabet vocabulary, then per hard-EM round a RECURSIVE-CTE
    * enumeration of every segmentation of every distinct word — scores
    * as left-to-right double products (bit-identical to the engine DP's
    * accumulation), ties on the larger boundary bitmask — followed by
    * the usage recount. The oracle replays TRAINING + SEGMENTATION in
    * full; it shares no code with the engine's Viterbi. */
  /** Shared seed-vocab CTE chain (corpus word table + top-K multi-char
    * substrings + all single chars) — the common prefix of the unigram
    * and WordPiece oracles, mirroring [[graft.operators.TextSearch
    * .uniSeedVocab]] exactly. */
  lazy val uniSeedCtes: String = {
    import graft.operators.TextSearch.{UniMaxPieceLen => L, UniVocabK => K, UniMaxWordLen => W}
    "uw AS MATERIALIZED (SELECT word, count(*) AS freq FROM " +
      "(SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents) " +
      // NOT contains '|': mirrors uniWordFreq's separator exclusion (the
      // segmentation path serializes '|'-joined on both sides)
      s"WHERE length(word) > 0 AND length(word) <= $W " +
      "AND NOT contains(word, '|') GROUP BY word), " +
      "us1 AS (SELECT word, freq, unnest(generate_series(1, length(word))) AS s FROM uw), " +
      s"us2 AS (SELECT word, freq, s, unnest(generate_series(1, " +
      s"least($L, length(word) - s + 1))) AS l FROM us1), " +
      "usub AS (SELECT substr(word, s, l) AS piece, sum(freq) AS c FROM us2 GROUP BY 1), " +
      s"uv0 AS MATERIALIZED (SELECT piece, c FROM " +
      s"(SELECT piece, c FROM usub WHERE length(piece) > 1 ORDER BY c DESC, piece LIMIT $K) " +
      "UNION ALL SELECT piece, c FROM usub WHERE length(piece) = 1), "
  }

  /** DuckDB replica of WordPiece greedy encoding: the longest-match
    * step function is precomputed per (word, position) with a window
    * argmax over the matching vocab pieces, then a recursive CTE just
    * FOLLOWS the chain — no window inside the recursion, no engine
    * code. '##' continuation prefixes render in the walk. */
  lazy val wordpieceOracleSql: String =
    "WITH RECURSIVE " + uniSeedCtes +
      "vp AS MATERIALIZED (SELECT DISTINCT piece FROM uv0), " +
      "poss AS (SELECT word, unnest(generate_series(1, length(word))) AS pos FROM uw), " +
      "cand AS (SELECT p.word, p.pos, v.piece FROM poss p JOIN vp v " +
      "ON length(v.piece) <= length(p.word) - p.pos + 1 " +
      "AND substr(p.word, p.pos, length(v.piece)) = v.piece), " +
      "step AS MATERIALIZED (SELECT word, pos, piece FROM " +
      "(SELECT word, pos, piece, row_number() OVER " +
      "(PARTITION BY word, pos ORDER BY length(piece) DESC) AS rn FROM cand) " +
      "WHERE rn = 1), " +
      "walk AS (SELECT word, freq, 1 AS pos, '' AS path, 0 AS np FROM uw " +
      "UNION ALL SELECT g.word, g.freq, g.pos + length(s.piece), " +
      "g.path || CASE WHEN g.pos = 1 THEN s.piece ELSE '|##' || s.piece END, " +
      "g.np + 1 FROM walk g JOIN step s ON s.word = g.word AND s.pos = g.pos " +
      "WHERE g.pos <= length(g.word)) " +
      "SELECT word, freq, path AS pieces, CAST(np AS BIGINT) AS n_pieces " +
      "FROM walk WHERE pos = length(word) + 1 ORDER BY word"

  lazy val unigramOracleSql: String = {
    import graft.operators.TextSearch.{UniMaxPieceLen => L, UniVocabK => K, UniMaxWordLen => W}
    def recur(segName: String, probName: String): String =
      s"$segName AS (" +
        "SELECT word, freq, 0 AS pos, CAST(1.0 AS DOUBLE) AS score, " +
        "CAST(0 AS BIGINT) AS mask, '' AS path FROM uw " +
        "UNION ALL " +
        "SELECT g.word, g.freq, g.pos + length(v.piece), g.score * v.p, " +
        "g.mask + CASE WHEN g.pos = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE (CAST(1 AS BIGINT) << g.pos) END, " +
        "CASE WHEN g.pos = 0 THEN v.piece ELSE g.path || '|' || v.piece END " +
        s"FROM $segName g JOIN $probName v " +
        "ON substr(g.word, g.pos + 1, length(v.piece)) = v.piece " +
        "WHERE g.pos < length(g.word) AND length(v.piece) <= length(g.word) - g.pos), "
    def best(bestName: String, segName: String): String =
      s"$bestName AS MATERIALIZED (SELECT word, freq, path, score, " +
        "row_number() OVER (PARTITION BY word ORDER BY score DESC, mask DESC) AS rn " +
        s"FROM $segName WHERE pos = length(word)), "
    "WITH RECURSIVE " + uniSeedCtes +
      "ut0 AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uv0), " +
      "up0 AS MATERIALIZED (SELECT piece, CAST(c AS DOUBLE) / t AS p FROM uv0, ut0), " +
      recur("useg0", "up0") +
      best("ubest0", "useg0") +
      "uuse0 AS (SELECT unnest(string_split(path, '|')) AS piece, freq " +
      "FROM ubest0 WHERE rn = 1), " +
      "uv1 AS MATERIALIZED (SELECT piece, sum(freq) AS c FROM uuse0 GROUP BY piece), " +
      "ut1 AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uv1), " +
      "up1 AS MATERIALIZED (SELECT piece, CAST(c AS DOUBLE) / t AS p FROM uv1, ut1), " +
      recur("useg1", "up1") +
      best("ubest1", "useg1").stripSuffix(", ") + " " +
      "SELECT word, freq, path AS pieces, " +
      "CAST(len(string_split(path, '|')) AS BIGINT) AS n_pieces, score " +
      "FROM ubest1 WHERE rn = 1 ORDER BY word"
  }

  def bpeTrainOracleSql(nMerges: Int): String =
    bpeTrainerCtes(nMerges).stripSuffix(", ") + " " + (1 to nMerges)
      .map(i => s"SELECT CAST(step AS BIGINT) AS step, l AS l_tok, r AS r_tok, n FROM m$i")
      .mkString(" UNION ALL ") + " ORDER BY step"

  /** DuckDB replica of train + ENCODE: the shared trainer chain followed
    * by the apply chain — each learned merge applied to the corpus
    * segmentation in step order, word boundaries marked chr(1) exactly
    * as the engine builds them ([[TextSearch.BpeBoundary]]). The
    * coalesce(...) on every rewrite keeps an EXHAUSTED trainer (empty
    * m_i) from NULLing the segmentation — the engine just stops early,
    * and the oracle must pass the text through unchanged the same way. */
  def bpeEncodeOracleSql(nMerges: Int): String = {
    val apply = new StringBuilder
    apply.append("e0 AS (SELECT doc_id, ' ' || array_to_string(" +
      "list_transform(string_split_regex(trim(text), '\\s+'), " +
      "w -> regexp_replace(w, '(.)', '\\1 ', 'g')), chr(1) || ' ') AS seg FROM documents), ")
    for (i <- 1 to nMerges)
      apply.append(s"e$i AS MATERIALIZED (SELECT doc_id, " +
        s"coalesce(replace(seg, (SELECT ' '||l||' '||r||' ' FROM m$i), " +
        s"(SELECT ' '||l||r||' ' FROM m$i)), seg) AS seg FROM e${i - 1}), ")
    bpeTrainerCtes(nMerges) + apply.toString.stripSuffix(", ") +
      s" SELECT doc_id, CAST(len(list_filter(string_split(trim(seg), ' '), t -> t <> chr(1))) AS BIGINT) " +
      s"AS n_bpe_tokens FROM e$nMerges ORDER BY doc_id"
  }

  /** Shared CTE chain of the exact n-gram pair oracle, reused by the
    * connected-components clustering oracle (which wraps the same pairs in
    * a recursive reachability CTE). */
  val ngramOracleCtes: String =
    "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh), " +
      "postings AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
      "cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common " +
      "FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2)"

  val ngramOraclePairs: String =
    "SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard " +
      "FROM cm JOIN sizes sa ON cm.doc_a = sa.doc_id JOIN sizes sb ON cm.doc_b = sb.doc_id " +
      "WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5"

  /** Shared CTE chain of the exact containment pair oracle (the planted
    * half-length-truncation corpus), reused verbatim by the routed
    * q_containment_auto entry, which wraps the same pairs with a pinned
    * strategy literal (the q_dedup_auto design). */
  val containmentOracleCtes: String =
    "all_docs AS (SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 4000000 AS doc_id, " +
      "array_to_string((string_split_regex(trim(text), '\\s+'))[1:len(string_split_regex(trim(text), '\\s+'))//2], ' ') AS text " +
      "FROM documents WHERE doc_id % 17 = 0), " +
      "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM all_docs), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh), " +
      "postings AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
      "cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common " +
      "FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2)"

  val containmentOraclePairs: String =
    "SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) AS containment " +
      "FROM cm JOIN sizes sa ON cm.doc_a = sa.doc_id JOIN sizes sb ON cm.doc_b = sb.doc_id " +
      "WHERE CAST(common AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.9"

  /** Oracle for the streaming dedup gate: replay both waves' four
    * rejection stages (exact-in-batch, exact-vs-corpus, near-dup-vs-corpus,
    * near-dup-in-batch with recursive-CTE connected components) over the
    * same planted corpus the Spark side builds. */
  val dedupGateOracleSql: String =
    "WITH RECURSIVE " +
      "docs0 AS (SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0 " +
      "UNION ALL SELECT doc_id + 1000001, text FROM documents WHERE doc_id % 30 = 0), " +
      "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM docs0), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh), " +
      "postings AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
      "cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common " +
      "FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2), " +
      "jp AS (SELECT doc_a, doc_b FROM cm " +
      "JOIN sizes sa ON cm.doc_a = sa.doc_id JOIN sizes sb ON cm.doc_b = sb.doc_id " +
      "WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5), " +
      "sym AS (SELECT doc_a AS x, doc_b AS y FROM jp UNION ALL SELECT doc_b, doc_a FROM jp), " +
      // wave 0
      "b0 AS (SELECT doc_id, text FROM docs0 WHERE doc_id % 2 = 0), " +
      "e0 AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS wmin FROM b0), " +
      "r0e AS (SELECT doc_id, 'exact_batch' AS status, wmin AS witness FROM e0 WHERE doc_id <> wmin), " +
      "s0 AS (SELECT doc_id FROM e0 WHERE doc_id = wmin), " +
      "ed0 AS (SELECT x, y FROM sym WHERE x IN (SELECT doc_id FROM s0) AND y IN (SELECT doc_id FROM s0)), " +
      "rc0 AS (SELECT x AS id, x AS lbl FROM (SELECT DISTINCT x FROM ed0) " +
      "UNION SELECT e.x, r.lbl FROM ed0 e JOIN rc0 r ON e.y = r.id), " +
      "l0 AS (SELECT id, min(lbl) AS lbl FROM rc0 GROUP BY id), " +
      "r0n AS (SELECT id AS doc_id, 'near_dup_batch' AS status, lbl AS witness FROM l0 WHERE id <> lbl), " +
      "a0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN (SELECT doc_id FROM r0n)), " +
      // wave 1
      "b1 AS (SELECT doc_id, text FROM docs0 WHERE doc_id % 2 = 1), " +
      "e1 AS (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS wmin FROM b1), " +
      "r1e AS (SELECT doc_id, 'exact_batch' AS status, wmin AS witness FROM e1 WHERE doc_id <> wmin), " +
      "s1 AS (SELECT doc_id, text FROM e1 WHERE doc_id = wmin), " +
      "a0t AS (SELECT d.doc_id, d.text FROM docs0 d JOIN a0 ON d.doc_id = a0.doc_id), " +
      "r1ec AS (SELECT s1.doc_id, 'exact_corpus' AS status, min(a0t.doc_id) AS witness " +
      "FROM s1 JOIN a0t ON s1.text = a0t.text GROUP BY s1.doc_id), " +
      "s1c AS (SELECT doc_id FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM r1ec)), " +
      "r1nc AS (SELECT x AS doc_id, 'near_dup_corpus' AS status, min(y) AS witness FROM sym " +
      "WHERE x IN (SELECT doc_id FROM s1c) AND y IN (SELECT doc_id FROM a0) GROUP BY x), " +
      "s1n AS (SELECT doc_id FROM s1c WHERE doc_id NOT IN (SELECT doc_id FROM r1nc)), " +
      "ed1 AS (SELECT x, y FROM sym WHERE x IN (SELECT doc_id FROM s1n) AND y IN (SELECT doc_id FROM s1n)), " +
      "rc1 AS (SELECT x AS id, x AS lbl FROM (SELECT DISTINCT x FROM ed1) " +
      "UNION SELECT e.x, r.lbl FROM ed1 e JOIN rc1 r ON e.y = r.id), " +
      "l1 AS (SELECT id, min(lbl) AS lbl FROM rc1 GROUP BY id), " +
      "r1n AS (SELECT id AS doc_id, 'near_dup_batch' AS status, lbl AS witness FROM l1 WHERE id <> lbl), " +
      "a1 AS (SELECT doc_id FROM s1n WHERE doc_id NOT IN (SELECT doc_id FROM r1n)) " +
      "SELECT doc_id, status, witness, CAST(batch_id AS BIGINT) AS batch_id FROM (" +
      "SELECT doc_id, 'accepted' AS status, CAST(NULL AS BIGINT) AS witness, doc_id % 2 AS batch_id FROM a0 " +
      "UNION ALL SELECT doc_id, 'accepted', CAST(NULL AS BIGINT), doc_id % 2 FROM a1 " +
      "UNION ALL SELECT doc_id, status, witness, 0 FROM r0e " +
      "UNION ALL SELECT doc_id, status, witness, 0 FROM r0n " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1e " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1ec " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1nc " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1n" +
      ") ORDER BY doc_id, status"

  /** PageRank oracle: the iteration chain unrolled into CTEs — each
    * round's per-edge contribution is rounded to 6dp, summed as
    * DECIMAL(18,6) and the damped update re-rounded, replaying the
    * engine's order-independent iteration discipline exactly. */
  /** HITS oracle: every half-step (authority update, L1 normalize, hub
    * update, L1 normalize) unrolled as materialized CTEs with the same
    * decimal-sum/rounded-division recipe as [[pagerankOracle]]. */
  def hitsOracle(iterations: Int): String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    // half-step references its predecessor twice (the total + the join),
    // so inlining re-expands the lineitem join ~2^(2k) times — the exact
    // plan blowup the engine's per-iteration localCheckpoint prevents
    val head =
      "WITH e0 AS MATERIALIZED (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "e AS MATERIALIZED (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM e0), " +
        "nodes AS MATERIALIZED (SELECT src AS node FROM e0 UNION SELECT dst FROM e0), " +
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)"
    val iters = (1 to iterations).map { k =>
      s"sa$k AS MATERIALIZED (SELECT e.dst, sum(CAST(round(h.h * e.w, 6) AS DECIMAL(18,6))) AS sa " +
        s"FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY 1), " +
        s"ta$k AS MATERIALIZED (SELECT sum(sa) AS t FROM sa$k), " +
        s"a$k AS MATERIALIZED (SELECT nodes.node, round(CAST(coalesce(sa$k.sa, 0) AS DOUBLE) / " +
        s"CAST(ta$k.t AS DOUBLE), 6) AS a " +
        s"FROM nodes CROSS JOIN ta$k LEFT JOIN sa$k ON nodes.node = sa$k.dst), " +
        s"sh$k AS MATERIALIZED (SELECT e.src, sum(CAST(round(a.a * e.w, 6) AS DECIMAL(18,6))) AS sh " +
        s"FROM e JOIN a$k a ON e.dst = a.node GROUP BY 1), " +
        s"th$k AS MATERIALIZED (SELECT sum(sh) AS t FROM sh$k), " +
        s"h$k AS MATERIALIZED (SELECT nodes.node, round(CAST(coalesce(sh$k.sh, 0) AS DOUBLE) / " +
        s"CAST(th$k.t AS DOUBLE), 6) AS h " +
        s"FROM nodes CROSS JOIN th$k LEFT JOIN sh$k ON nodes.node = sh$k.src)"
    }.mkString(", ")
    s"$head, $iters SELECT CAST(a.node AS BIGINT) AS node, a.a AS authority, h.h AS hub " +
      s"FROM a$iterations a JOIN h$iterations h ON a.node = h.node ORDER BY node"
  }

  def pagerankOracle(iterations: Int): String = {
    val head =
      "WITH e0 AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "e AS (SELECT e0.src, e0.dst, CAST(e0.w AS DOUBLE) AS w, ow.wout FROM e0 " +
        "JOIN (SELECT src, CAST(sum(w) AS DOUBLE) AS wout FROM e0 GROUP BY 1) ow ON e0.src = ow.src), " +
        "nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0), " +
        "nn AS (SELECT count(*) AS n FROM nodes), " +
        "r0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn)"
    val iters = (1 to iterations).map { k =>
      s"c$k AS (SELECT e.dst, sum(CAST(round(r.pr * e.w / e.wout, 6) AS DECIMAL(18,6))) AS sc " +
        s"FROM e JOIN r${k - 1} r ON e.src = r.node GROUP BY 1), " +
        s"r$k AS (SELECT nodes.node, round((1 - 0.85) / nn.n + 0.85 * CAST(coalesce(c$k.sc, 0) AS DOUBLE), 6) AS pr " +
        s"FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.node = c$k.dst)"
    }.mkString(", ")
    s"$head, $iters SELECT CAST(node AS BIGINT) AS node, pr FROM r$iterations ORDER BY node"
  }

  /** TextRank oracle: the pagerankOracle iteration protocol verbatim
    * (6dp-rounded contributions summed as DECIMAL(18,6), damped update
    * rounded at 6dp), re-headed with the word co-occurrence edge build
    * (window-1 adjacency, both directions, self-loops dropped) and a
    * final (pr desc, word) top-k. */
  def textrankOracle(iterations: Int, k: Int): String = {
    val head =
      "WITH wd AS (SELECT string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "pos AS (SELECT words, unnest(generate_series(1, len(words) - 1)) AS i FROM wd WHERE len(words) >= 2), " +
        "pp AS (SELECT words[i] AS a, words[i+1] AS b FROM pos WHERE words[i] <> words[i+1]), " +
        "e0 AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM " +
        "(SELECT a AS src, b AS dst FROM pp UNION ALL SELECT b, a FROM pp) GROUP BY 1, 2), " +
        "e AS (SELECT e0.src, e0.dst, e0.w, ow.wout FROM e0 " +
        "JOIN (SELECT src, CAST(sum(w) AS DOUBLE) AS wout FROM e0 GROUP BY 1) ow ON e0.src = ow.src), " +
        "nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0), " +
        "nn AS (SELECT count(*) AS n FROM nodes), " +
        "r0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn)"
    val iters = (1 to iterations).map { j =>
      s"c$j AS (SELECT e.dst, sum(CAST(round(r.pr * e.w / e.wout, 6) AS DECIMAL(18,6))) AS sc " +
        s"FROM e JOIN r${j - 1} r ON e.src = r.node GROUP BY 1), " +
        s"r$j AS (SELECT nodes.node, round((1 - 0.85) / nn.n + 0.85 * CAST(coalesce(c$j.sc, 0) AS DOUBLE), 6) AS pr " +
        s"FROM nodes CROSS JOIN nn LEFT JOIN c$j ON nodes.node = c$j.dst)"
    }.mkString(", ")
    s"$head, $iters SELECT CAST(row_number() OVER (ORDER BY pr DESC, node) AS BIGINT) AS rank, " +
      s"node AS word, pr FROM r$iterations QUALIFY rank <= $k ORDER BY rank"
  }

  /** Greedy k-center oracle: selection rounds unrolled into CTEs — each
    * round's running min-distance chain replays the engine's 6dp-rounded
    * cosine + exact IEEE least, and top-1 uses the same (d DESC, vec_id)
    * tiebreak. */
  def coresetOracle(k: Int): String = {
    val head =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1), " +
        "d1 AS (SELECT e.vec_id, e.v, 1.0 - round(list_cosine_similarity(e.v, (SELECT v FROM c0)), 6) AS d FROM e), " +
        "c1 AS (SELECT vec_id, v, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1)"
    val mid = (2 until k).map { i =>
      s"d$i AS (SELECT d${i - 1}.vec_id, d${i - 1}.v, least(d${i - 1}.d, " +
        s"1.0 - round(list_cosine_similarity(d${i - 1}.v, (SELECT v FROM c${i - 1})), 6)) AS d FROM d${i - 1}), " +
        s"c$i AS (SELECT vec_id, v, d FROM d$i ORDER BY d DESC, vec_id LIMIT 1)"
    }.mkString(", ")
    val sel = (1 until k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS sel_rank, vec_id, d AS d_min FROM c$i")
      .mkString(" UNION ALL ")
    s"$head, $mid SELECT sel_rank, vec_id, d_min FROM (" +
      "SELECT CAST(0 AS BIGINT) AS sel_rank, (SELECT vec_id FROM c0) AS vec_id, " +
      "CAST(2.0 AS DOUBLE) AS d_min " +
      s"UNION ALL $sel) ORDER BY sel_rank"
  }

  /** MMR oracle: the greedy diversity rerank unrolled into CTEs per
    * q_id (the coresetOracle pattern, partitioned): candidates are the
    * exact top-`m` cosine ranking, each step's MMR replays the
    * two-literal formula round(0.7·rel − 0.3·maxsim, 6) with the n_id
    * tiebreak, and maxsim accumulates as greatest() of 6dp-rounded
    * pairwise sims — the engine's exact arithmetic, independently
    * restated. */
  def mmrOracle(k: Int, m: Int): String = {
    val mmr1 = "round(CAST(0.7 AS DOUBLE) * score, 6)"
    def mmrI = "round(CAST(0.7 AS DOUBLE) * score - CAST(0.3 AS DOUBLE) * ms, 6)"
    val head =
      "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "s AS (SELECT q.q_id, e.vec_id AS n_id, CAST(e.embedding AS DOUBLE[]) AS v, " +
        "round(list_cosine_similarity(q.q_emb, CAST(e.embedding AS DOUBLE[])), 6) AS score " +
        "FROM embeddings e, q WHERE e.vec_id <> q.q_id), " +
        s"cand AS (SELECT q_id, n_id, v, score, " +
        s"row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rn FROM s QUALIFY rn <= $m), " +
        s"c1 AS (SELECT q_id, n_id AS sel_id, v AS sel_v, $mmr1 AS mmr FROM cand " +
        s"QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY $mmr1 DESC, n_id) = 1), " +
        "m1 AS (SELECT cand.q_id, cand.n_id, cand.v, cand.score, " +
        "round(list_cosine_similarity(cand.v, c.sel_v), 6) AS ms " +
        "FROM cand JOIN c1 c USING (q_id) WHERE cand.n_id <> c.sel_id)"
    val mids = (2 to k).map { i =>
      val cte =
        s"c$i AS (SELECT q_id, n_id AS sel_id, v AS sel_v, $mmrI AS mmr FROM m${i - 1} " +
          s"QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY $mmrI DESC, n_id) = 1)"
      if (i == k) cte
      else cte + ", " +
        s"m$i AS (SELECT m.q_id, m.n_id, m.v, m.score, " +
        "greatest(m.ms, round(list_cosine_similarity(m.v, c.sel_v), 6)) AS ms " +
        s"FROM m${i - 1} m JOIN c$i c USING (q_id) WHERE m.n_id <> c.sel_id)"
    }.mkString(", ")
    val sel = (1 to k)
      .map(i => s"SELECT q_id, CAST($i AS BIGINT) AS rank, sel_id AS n_id, mmr FROM c$i")
      .mkString(" UNION ALL ")
    s"$head, $mids SELECT q_id, rank, n_id, mmr FROM ($sel) ORDER BY q_id, rank"
  }

  /** Power-iteration PCA oracle: quantize embeddings to HUGEINT micros,
    * exact integer mean/centering (sign-symmetric half-away division),
    * the exact 64x64 scatter, then every power step unrolled — u = S·v
    * in exact HUGEINT, the L2 norm as an ORDERED fold of the squared
    * doubles (list_reduce over list(... ORDER BY dim) — bit-identical
    * to the engine's foldLeft), renormalization as floor(u/‖u‖·1e6+0.5).
    * Final Rayleigh quotient in exact integers with one rounded
    * division. */
  /** Sign-symmetric round-half-away-from-zero integer division as a SQL
    * fragment (b > 0) — mirrors Spectral.halfDiv. */
  private def sqlHalfDiv(a: String, b: String): String =
    s"CASE WHEN ($a) >= 0 THEN (2 * ($a) + ($b)) // (2 * ($b)) " +
      s"ELSE -((2 * -($a) + ($b)) // (2 * ($b))) END"

  def pcaOracle(iterations: Int): String =
    s"${pcaChain(iterations)} " +
      s"${scTimesV("uf", "sc", s"v$iterations")}, " +
      s"${rayleigh("ray", "uf", s"v$iterations")} " +
      "SELECT v.dim, CAST(v.v AS BIGINT) AS loading_micros, " +
      // den = 0 (empty/constant corpus) mirrors the engine's norm==0
      // early return: eigenvalue 0, not NaN
      "CASE WHEN (SELECT den FROM ray) = 0 THEN CAST(0 AS BIGINT) " +
      "ELSE CAST(floor(CAST((SELECT num FROM ray) AS DOUBLE) / " +
      "CAST((SELECT den FROM ray) AS DOUBLE) + 0.5) AS BIGINT) END AS scatter_eig " +
      s"FROM v$iterations v ORDER BY v.dim"

  /** u = S·v, completed over the dims frame so an empty/degenerate
    * scatter still yields all 64 dims (with u = 0) — the engine's
    * short-circuit paths emit full-width zero vectors. */
  private def scTimesV(name: String, sc: String, v: String): String =
    s"$name AS MATERIALIZED (SELECT d.dim, CAST(coalesce(sum(q.p), 0) AS HUGEINT) AS u " +
      s"FROM dims d LEFT JOIN (SELECT s.j AS dim, s.sv * v.v AS p " +
      s"FROM $sc s JOIN $v v ON s.k = v.dim) q ON q.dim = d.dim GROUP BY d.dim)"

  /** Exact integer Rayleigh pieces num = vᵀ(Sv), den = vᵀv. */
  private def rayleigh(name: String, u: String, v: String): String =
    s"$name AS (SELECT CAST(coalesce(sum(v.v * u.u), 0) AS HUGEINT) AS num, " +
      s"CAST(coalesce(sum(v.v * v.v), 0) AS HUGEINT) AS den " +
      s"FROM $v v JOIN $u u ON v.dim = u.dim)"

  /** All-but-the-Top oracle: the shared PCA chain, then per-vector
    * projection (exact HUGEINT), component-wise residual through the
    * sign-symmetric half-away division, ordered-fold residual norm. */
  def abttOracle(iterations: Int): String = {
    val vf = s"v$iterations"
    // den = 0 (zero component: empty/constant corpus) mirrors the
    // engine's den.signum == 0 branches — nothing is removed (proj 0,
    // residual = the centered vector), never a division by zero
    val guardedResid = "CASE WHEN (SELECT den FROM dn) = 0 THEN 0 ELSE " +
      sqlHalfDiv("pr.num * v.v", "(SELECT den FROM dn)") + " END"
    val guardedProj = "CASE WHEN (SELECT den FROM dn) = 0 THEN 0 ELSE " +
      sqlHalfDiv("pr.num * 1000000", "(SELECT den FROM dn)") + " END"
    s"${pcaChain(iterations)} " +
      s"dn AS (SELECT CAST(coalesce(sum(v * v), 0) AS HUGEINT) AS den FROM $vf), " +
      s"pr AS MATERIALIZED (SELECT c.vec_id, CAST(sum(c.cv * v.v) AS HUGEINT) AS num " +
      s"FROM c JOIN $vf v ON c.dim = v.dim GROUP BY c.vec_id), " +
      "resid AS (SELECT c.vec_id, c.dim, " +
      s"c.cv - $guardedResid AS r " +
      s"FROM c JOIN $vf v ON c.dim = v.dim JOIN pr ON c.vec_id = pr.vec_id), " +
      "rn AS (SELECT vec_id, sqrt(list_reduce(list(CAST(r AS DOUBLE) * CAST(r AS DOUBLE) " +
      "ORDER BY dim), (a, b) -> a + b)) AS nrm FROM resid GROUP BY vec_id) " +
      s"SELECT pr.vec_id, CAST($guardedProj AS BIGINT) AS proj_micros, " +
      "CAST(floor(rn.nrm + 0.5) AS BIGINT) AS resid_norm_micros " +
      "FROM pr JOIN rn ON pr.vec_id = rn.vec_id ORDER BY pr.vec_id"
  }

  /** Top-k deflated PCA oracle (mirrors [[Spectral.deflatedComponents]]):
    * component 0 runs the shared power chain on sc; each next component
    * runs on scD{c} = previous − round(λ·v·vᵀ/1e12) with λ the INTEGER
    * Rayleigh quotient (sign-symmetric half-away divisions both sides).
    * All k·iterations power steps and k−1 deflation joins unroll as
    * MATERIALIZED HUGEINT CTEs. */
  /** The shared k-component deflation CTE chain: per component c, the
    * power steps on scD{c} (sc for c=0), the integer Rayleigh eig, and
    * the rounded rank-1 deflation feeding the next component. */
  private def pcaKParts(iterations: Int, k: Int): String =
    (0 until k).map { c =>
      val scName = if (c == 0) "sc" else s"scD$c"
      val pfx = s"d${c}_"
      val vf = s"${pfx}v$iterations"
      val steps = s"${pfx}v0 AS (SELECT dim, CAST(1000000 AS HUGEINT) AS v FROM dims), " +
        powerSteps(scName, pfx, iterations)
      val ray = s"${scTimesV(s"${pfx}uf", scName, vf)}, " +
        s"${rayleigh(s"${pfx}ray", s"${pfx}uf", vf)}, " +
        s"${pfx}eig AS (SELECT CASE WHEN den = 0 THEN CAST(0 AS HUGEINT) " +
        s"ELSE ${sqlHalfDiv("num", "den")} END AS e FROM ${pfx}ray)"
      val deflate = if (c == k - 1) "" else {
        s", scD${c + 1} AS MATERIALIZED (SELECT s.j, s.k, " +
          s"CAST(s.sv - ${sqlHalfDiv(s"(SELECT e FROM ${pfx}eig) * va.v * vb.v", "1000000000000")} AS HUGEINT) AS sv " +
          s"FROM $scName s JOIN $vf va ON s.j = va.dim JOIN $vf vb ON s.k = vb.dim)"
      }
      s"$steps, $ray$deflate"
    }.mkString(", ")

  def pcaKOracle(iterations: Int, k: Int): String = {
    val sel = (0 until k).map { c =>
      s"SELECT CAST($c AS INTEGER) AS component, v.dim, CAST(v.v AS BIGINT) AS loading_micros, " +
        s"CAST((SELECT e FROM d${c}_eig) AS BIGINT) AS scatter_eig FROM d${c}_v$iterations v"
    }.mkString(" UNION ALL ")
    s"${pcaHead()}, ${pcaKParts(iterations, k)} SELECT * FROM ($sel) ORDER BY component, dim"
  }

  /** Full ABTT oracle (mirrors [[Spectral.qAbttK]]): the shared
    * k-component chain, then per vector the SEQUENTIAL removal — for
    * each component in order, the exact HUGEINT projection on the
    * CURRENT residual and the half-away-divided coordinate update —
    * and the ordered-fold residual norm at the end. */
  def abttKOracle(iterations: Int, k: Int): String = {
    val removal = (0 until k).map { i =>
      val vf = s"d${i}_v$iterations"
      s"adn$i AS (SELECT CAST(coalesce(sum(v * v), 0) AS HUGEINT) AS den FROM $vf), " +
        s"ap$i AS MATERIALIZED (SELECT c.vec_id, CAST(sum(c.cv * v.v) AS HUGEINT) AS num " +
        s"FROM ac$i c JOIN $vf v ON c.dim = v.dim GROUP BY c.vec_id), " +
        s"ac${i + 1} AS MATERIALIZED (SELECT c.vec_id, c.dim, " +
        s"CAST(c.cv - CASE WHEN (SELECT den FROM adn$i) = 0 THEN 0 " +
        s"ELSE ${sqlHalfDiv(s"ap$i.num * v.v", s"(SELECT den FROM adn$i)")} END AS HUGEINT) AS cv " +
        s"FROM ac$i c JOIN $vf v ON c.dim = v.dim JOIN ap$i ON c.vec_id = ap$i.vec_id)"
    }.mkString(", ")
    val projCols = (0 until k).map { i =>
      s"CAST(CASE WHEN (SELECT den FROM adn$i) = 0 THEN 0 " +
        s"ELSE ${sqlHalfDiv(s"ap$i.num * 1000000", s"(SELECT den FROM adn$i)")} END AS BIGINT) AS proj${i}_micros"
    }.mkString(", ")
    val joins = (1 until k).map(i => s"JOIN ap$i USING (vec_id) ").mkString
    s"${pcaHead()}, ${pcaKParts(iterations, k)}, " +
      "ac0 AS (SELECT vec_id, dim, cv FROM c), " +
      s"$removal, " +
      s"rn AS (SELECT vec_id, sqrt(list_reduce(list(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE) " +
      s"ORDER BY dim), (a, b) -> a + b)) AS nrm FROM ac$k GROUP BY vec_id) " +
      s"SELECT ap0.vec_id, $projCols, " +
      "CAST(floor(rn.nrm + 0.5) AS BIGINT) AS resid_norm_micros " +
      s"FROM ap0 ${joins}JOIN rn USING (vec_id) ORDER BY ap0.vec_id"
  }

  /** Shared quantize/center/scatter head: dims (the 0..63 frame every
    * degenerate path completes over — an empty corpus must still emit
    * 64 zero rows like the engine's n==0 short-circuit), integer-micros
    * e, half-away mean, centered c, exact HUGEINT scatter sc. */
  private def pcaHead(): String =
    "WITH dims AS (SELECT CAST(t.r AS INTEGER) AS dim FROM range(64) t(r)), " +
      "e AS (SELECT vec_id, " +
      "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS x6, " +
      "CAST(unnest(generate_series(0, len(embedding) - 1)) AS INTEGER) AS dim FROM embeddings), " +
      "m AS (SELECT dim, CASE WHEN sum(x6) >= 0 " +
      "THEN (2 * sum(x6) + count(*)) // (2 * count(*)) " +
      "ELSE -((2 * -sum(x6) + count(*)) // (2 * count(*))) END AS m6 FROM e GROUP BY dim), " +
      "c AS MATERIALIZED (SELECT vec_id, e.dim, x6 - m6 AS cv FROM e JOIN m ON e.dim = m.dim), " +
      "sc AS MATERIALIZED (SELECT a.dim AS j, b.dim AS k, CAST(sum(a.cv * b.cv) AS HUGEINT) AS sv " +
      "FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2)"

  /** Power steps t = 1..n on scatter `sc`, CTE names prefixed: u = S·v
    * (dims-completed), ordered-fold norm, renormalize with an nrm = 0
    * guard mirroring the engine's zero-vector early return. */
  private def powerSteps(sc: String, pfx: String, iterations: Int): String =
    (1 to iterations).map { t =>
      s"${scTimesV(s"${pfx}u$t", sc, s"${pfx}v${t - 1}")}, " +
        s"${pfx}n$t AS (SELECT sqrt(list_reduce(list(CAST(u AS DOUBLE) * CAST(u AS DOUBLE) ORDER BY dim), " +
        s"(a, b) -> a + b)) AS nrm FROM ${pfx}u$t), " +
        s"${pfx}v$t AS MATERIALIZED (SELECT dim, " +
        s"CASE WHEN (SELECT nrm FROM ${pfx}n$t) = 0 THEN CAST(0 AS HUGEINT) " +
        s"ELSE CAST(floor(CAST(u AS DOUBLE) / (SELECT nrm FROM ${pfx}n$t) " +
        s"* 1000000 + 0.5) AS HUGEINT) END AS v FROM ${pfx}u$t)"
    }.mkString(", ")

  private def pcaChain(iterations: Int): String =
    s"${pcaHead()}, v0 AS (SELECT dim, CAST(1000000 AS HUGEINT) AS v FROM dims), " +
      s"${powerSteps("sc", "", iterations)},"

  /** DoReMi mixture-reweighting oracle: the per-domain proxy loss and
    * every multiplicative-weights iteration unrolled as MATERIALIZED
    * CTEs in HUGEINT (scaled-integer arithmetic end to end — micros for
    * weights/losses, 10^12 mixture scale, 10^13 factor scale with the
    * same positive greatest() clamp as [[Doremi.FactorFloor]],
    * round-half-up integer division; mirrors Doremi.reweight step for
    * step). */
  def doremiOracle(iterations: Int): String =
    doremiMwChain(
      "l AS (SELECT source, CAST((2 * coalesce(sum(len(string_split_regex(trim(text), '\\s+'))), 0) * 1000000 " +
        "+ 500 * count(*)) // (1000 * count(*)) AS HUGEINT) AS loss6 FROM documents GROUP BY source)",
      iterations)

  /** DoReMi with the REAL KN proxy loss (mirrors [[Doremi.domainLossKn]]):
    * the full q_kn_score chain down to per-distinct-bigram DECIMAL lp,
    * per-doc −Σlp/n_bigrams in micros (CASE half-away division), the
    * per-source mean (same division), then the shared MW chain. */
  def doremiKnOracle(iterations: Int): String =
    doremiMwChain(
      "t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "bg AS (SELECT doc_id, unnest([struct_pack(w1 := w[i], w2 := w[i+1]) " +
        "for i in generate_series(1, len(w) - 1)]) AS z FROM t WHERE len(w) >= 2), " +
        "p AS (SELECT doc_id, z.w1 AS w1, z.w2 AS w2 FROM bg), " +
        "c12 AS (SELECT w1, w2, count(*) AS n FROM p GROUP BY 1, 2), " +
        "st AS (SELECT w1, w2, n, sum(n) OVER (PARTITION BY w1) AS n1, " +
        "count(*) OVER (PARTITION BY w1) AS d1, " +
        "count(*) OVER (PARTITION BY w2) AS c2, count(*) OVER () AS db FROM c12), " +
        "lp AS (SELECT w1, w2, CAST(round(ln(CAST((4 * n - 3) * db + 3 * d1 * c2 AS DOUBLE) / " +
        "CAST(4 * n1 * db AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp FROM st), " +
        "pd AS (SELECT p.doc_id, count(*) AS nb, " +
        "CAST(sum(lp.lp) * 1000000 AS HUGEINT) AS slm FROM p JOIN lp USING (w1, w2) GROUP BY p.doc_id), " +
        "pl AS (SELECT doc_id, CASE WHEN -slm >= 0 THEN (2 * -slm + nb) // (2 * nb) " +
        "ELSE -((2 * slm + nb) // (2 * nb)) END AS loss6 FROM pd), " +
        "dj AS (SELECT d.source, pl.loss6 FROM pl JOIN documents d USING (doc_id)), " +
        "l AS (SELECT source, CAST(CASE WHEN sum(loss6) >= 0 " +
        "THEN (2 * sum(loss6) + count(*)) // (2 * count(*)) " +
        "ELSE -((2 * -sum(loss6) + count(*)) // (2 * count(*))) END AS HUGEINT) AS loss6 " +
        "FROM dj GROUP BY source)",
      iterations)

  /** The shared multiplicative-weights chain over any `l(source, loss6)`
    * CTE set — every iteration unrolled MATERIALIZED in HUGEINT with the
    * engine-constant η and positive factor clamp. */
  private def doremiMwChain(lossCtes: String, iterations: Int): String = {
    val head =
      s"WITH $lossCtes, " +
        "w0 AS MATERIALIZED (SELECT source, loss6, " +
        "CAST(1000000 // (SELECT count(*) FROM l) AS HUGEINT) AS w6 FROM l)"
    val iters = (1 to iterations).map { t =>
      val p = s"w${t - 1}"
      s"mix$t AS (SELECT CAST(sum(w6 * loss6) AS HUGEINT) AS m FROM $p), " +
        s"r$t AS MATERIALIZED (SELECT source, loss6, CAST(w6 * greatest(10000000000000 + " +
        s"${Doremi.Eta5x} * (loss6 * 1000000 - (SELECT m FROM mix$t)), ${Doremi.FactorFloor}) AS HUGEINT) AS raw FROM $p), " +
        s"z$t AS (SELECT CAST(sum(raw) AS HUGEINT) AS z FROM r$t), " +
        s"w$t AS MATERIALIZED (SELECT source, loss6, CAST((2 * raw * 1000000 + " +
        s"(SELECT z FROM z$t)) // (2 * (SELECT z FROM z$t)) AS HUGEINT) AS w6 FROM r$t)"
    }.mkString(", ")
    s"$head, $iters SELECT source, CAST(loss6 AS BIGINT) AS loss_micros, " +
      s"CAST(w6 AS BIGINT) AS weight_micros FROM w$iterations ORDER BY source"
  }
}
