package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all
  * expressed as native Catalyst columns (whole-stage-codegen'd, no UDFs):
  * tokenization, token counting, language ID, quality scoring,
  * fingerprinting. Input: a `documents`-shaped table with a `text` column.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (matches the DuckDB oracle
    * formulation: list_filter(string_split_regex(text,'\s+'), ...)).
    */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Non-printing C0 control characters (except tab/LF/CR, which carry
    * layout meaning in text corpora) plus DEL — the characters
    * [[normalizeText]] strips. Kept as a plain character class so the
    * DuckDB oracle can state the identical RE2 class.
    */
  val ControlCharClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Canonical text normalization for hash-keyed pipelines: Unicode NFC
    * (the codegen'd `nfc_normalize` expression — composed and decomposed
    * renderings of the same visible text must agree BEFORE any dedup
    * hash, sample draw or shingle is computed, or "café" deduplicates
    * against itself but not its decomposed twin) followed by stripping
    * non-printing C0 controls + DEL (PDF/OCR and mojibake leftovers that
    * survive charset decoding; tab/LF/CR stay). Appends `text_norm`;
    * the original column is kept so audits can diff.
    *
    * Scale shape: one codegen'd projection over the columnar scan — zero
    * shuffle, and already-NFC text (the overwhelming case) returns the
    * input buffer without copying.
    */
  def normalizeText(df: DataFrame, textCol: String = "text",
      stripControls: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val nfc = call_function("nfc_normalize", col(textCol))
    df.withColumn("text_norm",
      if (stripControls) regexp_replace(nfc, ControlCharClass, "") else nfc)
  }

  /** Word-bigram array (the zip_with/slice formulation) — THE shared
    * definition: repetitionMetrics, Corpus.gopherRules and the q21/q24
    * oracles must all agree on it character for character.
    */
  def wordBigrams(toks: Column): Column = {
    val n = size(toks)
    zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Hits against the union of all per-language stopword lists (counts
    * multiplicity) — shared by qualityScore and Corpus.gopherRules.
    */
  def allStopwordHits(lowerTokens: Column): Column = {
    val words = Stopwords.values.flatten.toSeq.distinct
    // isin over the union list: same per-token decision as the
    // equality-OR chain (null in => null => filtered out), but the
    // optimizer turns it into one InSet hash probe instead of a
    // 40-comparison tree — smaller plan, faster codegen and eval
    size(filter(lowerTokens, t => t.isin(words: _*)))
  }

  /** Repetition metrics (Gopher-style quality rules): fraction of
    * duplicate words and duplicate word-2-grams per document. Pure Column
    * expressions — whole-stage codegen, zero shuffle, linear per row —
    * the shape that survives 100 TB (an explode+groupBy formulation would
    * shuffle every token).
    */
  def repetitionMetrics(df: DataFrame): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    val n = size(toks)
    val grams = wordBigrams(toks)
    Partitioning.spreadSmall(df.select(col("doc_id"), col("text"))).select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      round(when(n > 0, (n - size(array_distinct(toks))).cast("double") / n)
        .otherwise(0.0), 6).as("dup_word_ratio"),
      round(when(n > 1,
        (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
        .otherwise(0.0), 6).as("dup_2gram_ratio"))
  }

  /** BPE-ish pre-tokenization: letter runs, digit runs, single other
    * non-space chars — the usual byte-pair pre-split shape. ASCII classes
    * so the regex means the same thing in Spark (Java regex) and DuckDB
    * (RE2) for the oracle.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCounts(df: DataFrame): DataFrame =
    Partitioning.spreadSmall(df.select(col("doc_id"), col("text"))).select(
      col("doc_id"),
      size(wsTokens(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeTokenPattern), lit(0)))
        .as("bpe_tokens"),
      length(col("text")).as("chars"))

  /** Per-language stopword lists (tiny embedded sets — the heuristic only
    * needs relative counts).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "mit", "für", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "est", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "es", "por"))

  /** stopword hit count for one language over a token array column —
    * keeps multiplicity (array_intersect would dedup).
    */
  def stopwordHits(tokens: Column, lang: String): Column = {
    val words = Stopwords(lang)
    size(filter(tokens, t => t.isin(words: _*)))
  }

  /** n-gram-free language ID heuristic: language with the most stopword
    * hits; "und" for undetermined (no hits).
    */
  def langId(df: DataFrame): DataFrame = {
    val toks = lower(col("text"))
    val tokens = wsTokens(toks)
    val langs = Stopwords.keys.toSeq.sorted
    val scored = Partitioning.spreadSmall(
      df.select(col("doc_id"), col("text"))).select(
      (Seq(col("doc_id"), col("text")) ++
        langs.map(l => stopwordHits(tokens, l).as(s"hits_$l"))): _*)
    val best = langs.map(l =>
      struct(col(s"hits_$l").as("hits"), lit(l).as("lang")))
    scored.select(
      col("doc_id"),
      greatest(best: _*).getField("lang").as("lang_pred"),
      greatest(best: _*).getField("hits").as("lang_hits"))
      .withColumn("lang_pred",
        when(col("lang_hits") === 0, lit("und")).otherwise(col("lang_pred")))
  }

  /** Quality signals + a composite score in [0,1] — length band, alpha
    * ratio, punct/digit ratios, stopword ratio, mean word length band.
    * Each signal is a plain Column expression (pushdown/codegen friendly).
    */
  def qualityScore(df: DataFrame): DataFrame = {
    val text = col("text")
    val tokens = wsTokens(text)
    val nTok = size(tokens).cast("double")
    val nChar = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-zÀ-ÿ]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double")
    val digit = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val stopHits = allStopwordHits(transform(tokens, t => lower(t))).cast("double")

    val safeTok = greatest(nTok, lit(1.0))
    val safeChar = greatest(nChar, lit(1.0))
    val meanWordLen = (nChar - (nTok - 1)) / safeTok

    val lenBand = when(nTok.between(5, 100000), 1.0).otherwise(0.0)
    val alphaRatio = alpha / safeChar
    val punctRatio = punct / safeChar
    val digitRatio = digit / safeChar
    val stopRatio = stopHits / safeTok
    val wordLenBand = when(meanWordLen.between(2.0, 14.0), 1.0).otherwise(0.0)

    Partitioning.spreadSmall(df.select(col("doc_id"), col("text"))).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      round(alphaRatio, 6).as("alpha_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round((lenBand * lit(0.2)
        + least(alphaRatio * lit(1.25), lit(1.0)) * lit(0.3)
        + least(stopRatio * lit(2.5), lit(1.0)) * lit(0.3)
        + (lit(1.0) - least(punctRatio * lit(5.0), lit(1.0))) * lit(0.1)
        + wordLenBand * lit(0.1)), 6).as("quality"))
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercased text
    * — the exact-dedup key, portable to the DuckDB oracle verbatim.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Winnowing fingerprint (Schleimer et al. 2003, MOSS): k-gram hashes,
    * minimum over every SLIDING window of `window` hashes, consecutive
    * duplicate minima collapsed. Sliding windows (not tiles) are what
    * carry the winnowing guarantee: any shared substring of
    * window + k - 1 chars fully contains some window, whose minimum is a
    * function of content alone — so it appears in BOTH documents'
    * signatures regardless of alignment offset. (A tiled variant cuts
    * the two documents' windows at different phases and can share zero
    * fingerprints on a genuinely quoted passage.) Expected signature
    * density is 2/(window+1) of positions — bounded, like the tiles.
    *
    * O(n) via a monotonic deque; per-row in a typed map. The k-gram hash
    * is Hashing.md5Long so the whole signature is recomputable inside the
    * DuckDB gate oracle (md5_number_upper + sliding list window mins).
    */
  def winnowSignature(text: String, k: Int = 8, window: Int = 16): Vector[Long] = {
    val norm = text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
    if (norm.length < k) return Vector(Hashing.md5Long(norm))
    val hashes = new Array[Long](norm.length - k + 1)
    // hash each k-char window as a slice of the ONE UTF-8 encoding of
    // norm instead of substring+getBytes per position (two allocations
    // per window on the hottest loop of the winnow family). Identical
    // digests: a BMP char's UTF-8 bytes don't depend on its neighbours,
    // so byte-range [off(i), off(i+k)) == norm.substring(i, i+k) bytes.
    // Surrogate pairs break that equivalence (a split pair encodes as
    // '?' under String.getBytes) — fall back to the substring path.
    var hasSurrogate = false
    var ci = 0
    while (ci < norm.length && !hasSurrogate) {
      if (Character.isSurrogate(norm.charAt(ci))) hasSurrogate = true
      ci += 1
    }
    if (!hasSurrogate) {
      val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val off = new Array[Int](norm.length + 1)
      var bi = 0
      var j = 0
      while (j < norm.length) {
        off(j) = bi
        val c = norm.charAt(j)
        bi += (if (c < 0x80) 1 else if (c < 0x800) 2 else 3)
        j += 1
      }
      off(norm.length) = bi
      var i = 0
      while (i + k <= norm.length) {
        hashes(i) = Hashing.md5Long(bytes, off(i), off(i + k) - off(i))
        i += 1
      }
    } else {
      var i = 0
      while (i + k <= norm.length) {
        hashes(i) = Hashing.md5Long(norm.substring(i, i + k))
        i += 1
      }
    }
    val out = Vector.newBuilder[Long]
    var last = Long.MinValue
    val n = hashes.length
    if (n <= window) {
      var m = Long.MaxValue
      var x = 0
      while (x < n) { if (hashes(x) < m) m = hashes(x); x += 1 }
      out += m
    } else {
      // monotonic deque of indices; head = index of current window min
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var j = 0
      while (j < n) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - window) head += 1
        if (j >= window - 1) {
          val m = hashes(dq(head))
          if (m != last) { out += m; last = m }
        }
        j += 1
      }
    }
    out.result()
  }
}
