package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer TRAINING and ENCODING — the
  * tokenizer-faithful token counter the budget/packing operators
  * ([[Corpus.tokenBudgetTake]], [[Corpus.packSequences]],
  * [[Corpus.chunkByTokens]]) upgrade to when whitespace counts aren't
  * close enough to what the training run will actually see. The
  * algorithm is the published one (Sennrich et al. 2016; the GPT-2
  * tokenizer is the same greedy ranked-merge encode): training merges
  * the most frequent adjacent symbol pair, encoding replays merges in
  * rank order.
  *
  * Scale shape, stated up front because it's the whole design:
  *  - **fit** collapses the corpus DISTRIBUTED to a (pre-token, count)
  *    frequency table — one map-side-combinable aggregation, the only
  *    pass over the data — then runs the merge loop on the DRIVER over
  *    that table. This is how every published BPE trainer works
  *    (Sennrich's learn_bpe, SentencePiece): the merge loop needs the
  *    global pair histogram every round, and the word-frequency dict IS
  *    the sufficient statistic. The dict is bounded by `minCount` +
  *    `maxWords` (deterministic (count DESC, token ASC) cut), so driver
  *    memory is capped regardless of corpus size — at 100 TB the top
  *    2^20 pre-tokens by count carry essentially all the pair mass the
  *    merges care about.
  *  - **encode** broadcasts the merge ranks and runs mapPartitions with
  *    a per-partition pre-token cache (the GPT-2 trick: natural text
  *    re-uses pre-tokens constantly, so amortized cost per token is the
  *    cache hit) — zero shuffle, bytes never leave the scan task.
  *
  * Determinism contract (what makes the x32 golden sound): the
  * frequency cut orders (count DESC, token ASC); each round's best pair
  * maximizes (count, then LEXICOGRAPHICALLY SMALLEST pair) so histogram
  * ties cannot flip with partitioning; merges stop early when the best
  * pair count drops below 2 (a count-1 merge memorizes one word).
  * Everything downstream is a pure function of the merge list.
  */
object Bpe {

  /** Pre-tokenization: [[TextAnalysis.BpeTokenPattern]] — letter runs,
    * digit runs, single other — shared with the q08 counting convention
    * so the cheap counter and the faithful one segment identically.
    */
  val PreTokenPattern: String = TextAnalysis.BpeTokenPattern

  // compiled once — encodeText runs per ROW in the distributed encode,
  // and Pattern.compile per row is pure wasted CPU on the hot path
  private val PreTokenRegex: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(PreTokenPattern)

  /** End-of-word marker appended to each pre-token's final symbol
    * (Sennrich's `</w>` convention) so merges distinguish word-final
    * from word-internal contexts. U+2581 LOWER ONE EIGHTH BLOCK, the
    * SentencePiece marker — it cannot appear in pre-tokens (the pattern
    * never matches it into a letter/digit run... it matches as a single
    * "other" symbol, which is fine: a lone marker is its own symbol and
    * never merges wrongly because real markers only occur appended).
    */
  val EndOfWord = "▁"

  /** Train `numMerges` merges. One distributed aggregation (pre-token
    * frequencies), then the driver merge loop over the bounded dict.
    */
  def fit(docs: DataFrame, numMerges: Int, minCount: Long = 2L,
      maxWords: Int = 1 << 20, textCol: String = "text")
      : Vector[(String, String)] = {
    require(numMerges >= 0 && minCount >= 1 && maxWords >= 1,
      s"numMerges=$numMerges minCount=$minCount maxWords=$maxWords")
    val freqs: Array[(String, Long)] = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(PreTokenPattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitFromFrequencies(freqs, numMerges)
  }

  /** The driver merge loop, exposed for tests: deterministic greedy
    * merging over a (word, count) table.
    */
  def fitFromFrequencies(freqs: Seq[(String, Long)], numMerges: Int)
      : Vector[(String, String)] = {
    // each word as its symbol sequence; the marker rides on the last char
    var words: Array[(Array[String], Long)] = freqs.map { case (w, n) =>
      val syms = codePointSymbols(w)
      syms(syms.length - 1) = syms(syms.length - 1) + EndOfWord
      (syms, n)
    }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      // max by count, ties -> lexicographically smallest pair: a stable
      // total order, so the merge list is a pure function of the dict
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, n)) => acc match {
          case Some((bp, bn)) if bn > n => acc
          case Some((bp, bn)) if bn == n &&
            (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
          case _ => Some((p, n))
        }
      }
      best match {
        case Some((pair, n)) if n >= 2 =>
          merges += pair
          val joined = pair._1 + pair._2
          words = words.map { case (syms, cnt) =>
            if (syms.length < 2) (syms, cnt)
            else {
              val out = new mutable.ArrayBuffer[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == pair._1 &&
                    syms(i + 1) == pair._2) {
                  out += joined
                  i += 2
                } else {
                  out += syms(i)
                  i += 1
                }
              }
              (out.toArray, cnt)
            }
          }
          round += 1
        case _ => exhausted = true // best pair count < 2: stop, don't memorize
      }
    }
    merges.result()
  }

  /** Encode one pre-token (marker NOT yet appended) with ranked merges:
    * repeatedly merge the adjacent pair with the LOWEST rank until no
    * adjacent pair has one — the GPT-2 `bpe()` loop. Exposed for tests.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int])
      : Vector[String] = {
    // unreachable through the pre-token regex, but this is a public
    // method: an empty word has no symbols (ADVICE r7 — `s.last` threw)
    if (word.isEmpty) return Vector.empty
    var syms: Vector[String] = {
      val s = codePointSymbols(word).toVector
      s.init :+ (s.last + EndOfWord)
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of the best pair left-to-right (matches
        // training, which rewrites all occurrences in one round)
        val (a, b) = (syms(bestAt), syms(bestAt + 1))
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Encode a whole text: pre-tokenize, encode each pre-token through a
    * cache, concatenate. Exposed for tests and the encode kernel.
    */
  def encodeText(text: String, ranks: Map[(String, String), Int],
      cache: mutable.Map[String, Vector[String]]): Vector[String] = {
    val m = PreTokenRegex.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) {
      val w = m.group()
      out ++= cache.getOrElseUpdate(w, encodeWord(w, ranks))
    }
    out.result()
  }

  /** Distributed encode: (id, n_tokens, tokens joined by single spaces —
    * pre-tokens never contain whitespace, so the join is lossless).
    * Broadcast ranks, mapPartitions with a per-partition cache, zero
    * shuffle. Null text encodes to 0 tokens and an empty string (the
    * row survives — the filter-as-flag family convention).
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    // the cache lives in the udf closure: each task deserializes its own
    // copy, so it persists across the task's rows (the GPT-2 cache) and
    // is never shared between threads; the cap bounds adversarial
    // all-distinct-pre-token partitions
    val enc = udf {
      val cache = mutable.HashMap.empty[String, Vector[String]]
      (text: String) =>
        if (text == null) Array.empty[String]
        else {
          if (cache.size > 65536) cache.clear()
          encodeText(text, bc.value, cache).toArray
        }
    }
    docs.select(col(idCol), enc(col(textCol)).as("toks"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        array_join(col("toks"), " ").as("bpe_text"))
  }

  /** Split on CODE POINTS, not chars: an astral character must be one
    * symbol, never a lone-surrogate pair the downstream join would
    * mangle into replacement characters.
    */
  private def codePointSymbols(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }
}
