package graft.lm

import graft.text.PyText

/** Decision kernels replacing the reference's `dehyphen` entry points
  * (dehyphen_wrapper.py:34-69). The *decision structure* — call shapes,
  * special cases, tie-breaks — is replicated exactly; the Flair perplexity
  * underneath is replaced by the sanctioned deterministic
  * dictionary + char-n-gram LM (BASELINE.json north_star; FIXTURES.md §6).
  *
  * Caching mirrors the reference (joblib disk cache + lru_cache,
  * dehyphen_wrapper.py:13-15, 63): one bounded in-JVM LRU per executor.
  */
object Scorer {

  /** Per-executor LRU (stands in for lru_cache + the 100 MB joblib disk
    * cache; our scorer is cheap enough that one memory tier suffices).
    */
  private final class Lru(max: Int)
      extends java.util.LinkedHashMap[String, java.lang.Double](1024, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, java.lang.Double]): Boolean = size() > max
  }
  // Thread-local LRUs: no lock contention across the 32 executor threads
  // (the model itself is immutable after lazy init, so scoring is lock-free).
  // 8192 entries x ~1KB worst-case entry x 32 threads caps aggregate
  // retention near 250MB (65536 would pin ~2.5GB of ThreadLocal state on a
  // mostly-distinct-lines corpus where every miss inserts); dehyphenation
  // repetition is local, so the hit rate survives the smaller bound.
  private val cache = ThreadLocal.withInitial[Lru](() => new Lru(8192))
  /** Texts longer than this bypass the LRU. The cache exists for the
    * dehyphenation workload (short lines, heavy repetition); corpus-level
    * `lm_score(text)` over full documents would otherwise retain
    * thousands of entire document bodies PER THREAD (up to the Lru entry
    * cap above) — an unbounded-bytes cache masquerading as a
    * bounded-entries one. Long texts repeat rarely, so skipping the
    * cache costs nothing there.
    */
  val MaxCachedTextLen = 512
  private val lmCalls = new java.util.concurrent.atomic.LongAdder
  // per-THREAD count: a Spark task runs single-threaded, so snapshotting
  // this at partition start/end gives an exact per-partition delta (the
  // JVM-global LongAdder can't — concurrent tasks interleave into it)
  private val threadLmCalls =
    ThreadLocal.withInitial[Array[Long]](() => Array(0L))

  def lmCallCount: Long = lmCalls.sum()
  def resetLmCallCount(): Unit = lmCalls.reset()

  /** LM calls made by the CURRENT thread (monotonic; diff two snapshots
    * for a per-task count).
    */
  def threadLmCallCount: Long = threadLmCalls.get()(0)

  /** Raw LM score with LRU; lower = better. The `lang` selects the model
    * (CharLm.canonicalLang), mirroring the reference's per-lang Flair
    * model choice (dehyphen_wrapper.py:18-31); the LRU key carries the
    * canonical lang so models never cross-contaminate.
    */
  def score(text: String, lang: String = "multi"): Double = {
    if (text.length > MaxCachedTextLen) {
      lmCalls.increment()
      threadLmCalls.get()(0) += 1
      return CharLm.score(text, lang)
    }
    val c = cache.get()
    val key = CharLm.canonicalLang(lang) + "\u0000" + text
    val hit = c.get(key)
    if (hit != null) hit.doubleValue()
    else {
      lmCalls.increment()
      threadLmCalls.get()(0) += 1
      val v = CharLm.score(text, lang)
      c.put(key, v)
      v
    }
  }

  /** `single_score` (dehyphen_wrapper.py:63-69): +inf for single-char
    * text, otherwise LM score.
    */
  def singleScore(text: String, lang: String = "multi"): Double =
    if (text.length == 1) Double.PositiveInfinity else score(text, lang)

  /** `newline_or_not(l1, l2, lang)` (dehyphen_wrapper.py:46-60): score
    * [l1, l2, l1 + " " + l2]; newline iff the concatenation is NOT the
    * (first) minimum. Single-char special cases preserved.
    */
  def newlineOrNot(l1: String, l2: String, lang: String = "multi"): Boolean = {
    if (l1.length == 1) return true
    if (l2.length == 1) return false
    val scores = Seq(score(l1, lang), score(l2, lang), score(l1 + " " + l2, lang))
    PyText.argminFirst(scores) != 2
  }

  /** Strip the single glue token (" " or "\n") the reflow stage appended to
    * a line's last word (export.py:476, 485).
    */
  private def splitGlue(w: String): (String, String) =
    if (w.endsWith("\n")) (w.dropRight(1), "\n")
    else if (w.endsWith(" ")) (w.dropRight(1), " ")
    else (w, "")

  private def lettersLower(w: String): String =
    w.filter(Character.isLetter).toLowerCase(java.util.Locale.ROOT)

  /** Decide how to merge a hyphenated line break: returns the merged word.
    *
    * Semantics per the reference's published behavior
    * (development/notes/06_blogpost.md, "Zeilenumbrüche entfernen" /
    * "Texte reparieren mit 'dehyphen'"): "finan-"/"ziellen" -> the joined
    * form drops the hyphen when it yields a known word; "EU-"/"Staaten"
    * keeps the hyphen when both halves are themselves words (a compound).
    * Unknown cases fall back to the char-LM: first minimum of
    * [drop-hyphen, keep-hyphen] wins (drop on tie).
    */
  def mergeHyphenated(lastWordCore: String, nextWord: String,
      lang: String = "multi"): String = {
    val (nextCore, nextGlue) = splitGlue(nextWord)
    val stem = lastWordCore.dropRight(1) // without trailing '-'
    val dropped = stem + nextCore
    val kept = lastWordCore + nextCore
    val merged =
      if (Dictionary.contains(lettersLower(dropped))) dropped
      else if (Dictionary.contains(lettersLower(stem)) &&
        Dictionary.contains(lettersLower(nextCore))) kept
      else if (score(dropped, lang) <= score(kept, lang)) dropped
      else kept
    merged + nextGlue
  }

  /** `dehyphen_paragraph(lines)` (dehyphen_wrapper.py:34-37, called at
    * export.py:490-491): lines whose last word ends with '-' (modulo the
    * glue token appended by the reflow stage) are merged with the next
    * line; the merge drops or keeps the hyphen per `mergeHyphenated`.
    * Merging joins the two lines into one (fewer lines out); the glue token
    * of the hyphenated word is dropped with the line break it encoded.
    * A merged line can itself end with '-' again, so the scan does not
    * advance past a merge.
    */
  def dehyphenParagraph(lines: List[List[String]],
      lang: String = "multi"): List[List[String]] = {
    val buf = scala.collection.mutable.ArrayBuffer.from(lines.map(_.toVector))
    var i = 0
    while (i < buf.length - 1) {
      val cur = buf(i)
      val nxt = buf(i + 1)
      val (core, _) = splitGlue(cur.last)
      if (core.length > 1 && core.endsWith("-") && nxt.nonEmpty) {
        val merged = mergeHyphenated(core, nxt.head, lang)
        buf(i) = (cur.init :+ merged) ++ nxt.tail
        buf.remove(i + 1)
        // stay at i: the merged line may end hyphenated again
      } else {
        i += 1
      }
    }
    buf.iterator.map(_.toList).toList
  }

  /** `is_split_paragraph(p1, p2)` decision (dehyphen_wrapper.py:40-43,
    * consumed at doc_output.py:84-95): should the last line of p1 be joined
    * with the first line of p2? Decision: score [a, b, a + " " + b] where
    * a/b are the rendered boundary lines; join iff the concatenation is the
    * first minimum — the same shape as `newline_or_not` inverted. Returns
    * the joined boundary line (hyphen-repaired when a ends with '-') or
    * None.
    */
  def joinSplitLines(a: List[String], b: List[String],
      lang: String = "multi"): Option[List[String]] = {
    if (a.isEmpty || b.isEmpty) return None
    val ta = a.mkString(" ")
    val tb = b.mkString(" ")
    // one-char guard sees through reflow glue (' '/'\n' appended to the
    // line's last word): "1 " is still a one-char line for the LM's
    // can't-score-single-char special case
    if (ta.trim.length <= 1 || tb.trim.length <= 1) return None
    val scores = Seq(score(ta, lang), score(tb, lang), score(ta + " " + tb, lang))
    if (PyText.argminFirst(scores) != 2) None
    else {
      val (core, _) = splitGlue(a.last)
      if (core.length > 1 && core.endsWith("-"))
        Some((a.init :+ Scorer.mergeHyphenated(core, b.head, lang)) ++ b.tail)
      else Some(a ++ b)
    }
  }
}

/** Embedded wordlist for the dehyphenation fast path (the "dictionary" half
  * of BASELINE.json's "dictionary + character-n-gram language-model
  * scoring"). Lowercased; lookups strip non-letters. Original list written
  * for this project.
  */
object Dictionary {
  private val words: Set[String] = Set(
    // German (administrative-domain) vocabulary incl. fixture words
    "finanziellen", "finanziell", "finanzielle", "interessen", "union",
    "staaten", "eu", "bedeutung", "vergangenen", "jahren", "gewachsen",
    "andere", "auch", "wie", "polen", "haben", "regelungen", "getroffen",
    "entwurf", "gesetzes", "gesetz", "verbänden", "verbaende", "verbände",
    "stellungnahme", "bundesregierung", "länder", "laender", "kommunalen",
    "spitzenverbände", "beratung", "verfahren", "verfahrens", "kosten",
    "verwaltung", "zahl", "vereinbarung", "zwischen", "zusammenarbeit",
    "behörden", "verfolgung", "kommission", "bericht", "anwendung",
    "verordnung", "ansicht", "klärung", "fragen", "erforderlich",
    "regelung", "tritt", "kraft", "gilt", "alle", "mitgliedstaaten",
    "jährlich", "durchführung", "maßnahmen", "massnahmen", "ausschuss",
    "annahme", "entwurfs", "fassung", "seite", "seiten", "von", "zehn",
    "der", "die", "das", "den", "dem", "des", "ein", "eine", "einen",
    "und", "oder", "mit", "für", "fuer", "über", "ueber", "nach", "bei",
    "aus", "ist", "sind", "wird", "werden", "wurde", "wurden", "hat",
    "nicht", "sich", "auf", "als", "wenn", "durch", "zur", "zum",
    "beteiligten", "angemessen", "berücksichtigt", "stärkung", "aufsicht",
    "unterlagen", "dokument", "dokumente", "absatz", "artikel", "nummer",
    "buchstabe", "satz", "anlage", "begründung", "textabschnitt",
    // English
    "the", "and", "for", "with", "this", "that", "are", "was", "were",
    "committee", "proposal", "adoption", "amended", "draft", "financial",
    "interests", "member", "states", "protected", "common", "rules",
    "procedures", "report", "describes", "implementation", "regulation",
    "during", "past", "year", "further", "information", "provided",
    "annex", "document", "working", "group", "continue", "examination",
    "remaining", "questions", "footnote", "context", "reader", "text")

  def contains(w: String): Boolean = w.nonEmpty && words.contains(w)
}
