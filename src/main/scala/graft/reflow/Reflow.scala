package graft.reflow

import graft.model._
import graft.stats.DocInfo
import graft.text.{LinkedCounter, PyText}
import scala.collection.mutable.ArrayBuffer

/** `LinesWithNone` (export.py:106-151): an indexed container of lines
  * where invalid lines are null. Iteration yields the INDICES of valid
  * lines between the first and last valid index; `valid` is cached once
  * (cached_property) and aliases the same mutable word buffers, so
  * in-place token appends are visible through it — replicated exactly
  * (SURVEY.md §7.4 #1).
  */
final class LinesWithNone(val lines: ArrayBuffer[ArrayBuffer[String]]) {

  val firstLine: Int = lines.indexWhere(_ != null) match {
    case -1 => lines.length // all None: first==len, last==-? (no iteration)
    case i => i
  }
  val lastLine: Int = lines.lastIndexWhere(_ != null)

  /** cached_property `valid`: the non-null buffers, aliased not copied. */
  lazy val valid: Vector[ArrayBuffer[String]] = lines.iterator.filter(_ != null).toVector

  /** `list(lines)`: indices of valid lines (export.py:135-148). */
  def validIndices: Vector[Int] =
    (firstLine to lastLine).iterator.filter(i => i >= 0 && i < lines.length && lines(i) != null).toVector

  def apply(i: Int): ArrayBuffer[String] = lines(i)
  def length: Int = valid.length
}

/** Per-document reflow configuration — the Export flags
  * (export.py:159-212). Defaults = the reference's tested profile
  * `fast=True, experimental=True` (tests/test_pdfs.py:16-22):
  * seperate_header_footer / footnotes_last / remove_page_number all on,
  * remove_hyphens & remove_punct_paragraph & remove_duplicate_header_footer
  * on by default.
  */
final case class ExtractConfig(
    removePunctParagraph: Boolean = true,
    seperateHeaderFooter: Boolean = true,
    removeDuplicateHeaderFooter: Boolean = true,
    removePageNumber: Boolean = true,
    removeHeader: Boolean = false,
    removeFooter: Boolean = false,
    removeHyphens: Boolean = true,
    footnotesLast: Boolean = true,
    fast: Boolean = true,
    /** replicate the reference's remove_page_number type bug (see
      * Classify.removePageNumberElements). */
    pageNumberTypeBugCompat: Boolean = true,
    /** carry media/table spans through to the output (extension; the
      * reference drops them from the text flow). */
    keepMedia: Boolean = true,
    /** disabled in the reference (export.py:199-201). */
    considerFontSizeLinebreak: Boolean = false,
    /** LM/model selection, mirroring the reference's per-lang Flair model
      * choice incl. "-fast" suffix (dehyphen_wrapper.py:18-31; lang is
      * carried on DocumentOutput, doc_output.py:14-27). "de"/"en" pick the
      * monolingual char-LM corpus, anything else the combined one.
      */
    lang: String = "multi") {
  require(
    !(seperateHeaderFooter && (removeHeader || removeFooter)),
    "if seperate_header_footer=True cannot remove header/footer (export.py:194-197)")
}

object Reflow {

  /** line_to_words (export.py:387-395): word contents unicode-fixed and
    * stripped, plus their fonts.
    */
  def lineToWords(line: Line): (ArrayBuffer[String], ArrayBuffer[String]) = {
    val words = new ArrayBuffer[String](line.words.length)
    val fonts = new ArrayBuffer[String](line.words.length)
    line.words.foreach { w =>
      words += PyText.pyStrip(PyText.fixBadUnicode(w.content))
      fonts += w.font
    }
    (words, fonts)
  }

  /** no_alphanum_char (export.py:398-402) — despite the name, returns true
    * when the cleaned text HAS an alphanumeric char. Fast path: an ASCII
    * letter/digit survives cleaning (lowercase/translit/punct-strip)
    * unchanged, so its presence decides without allocating — UNLESS the
    * text contains a construct whose cleaning CONSUMES ascii alnum:
    * HTML entities ('&#33;' -> '!') and ANSI escapes (ESC + '[3m' -> '')
    * both eat letters/digits that are part of their own syntax, so any
    * '&' or ESC forces the full clean.
    */
  def hasAlnumAfterClean(text: String): Boolean = {
    if (text.indexOf('&') < 0 && text.indexOf('\u001b') < 0) {
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9')) return true
        i += 1
      }
    }
    PyText.cleanNoPunct(text).exists(PyText.isAlnumChar)
  }

  /** add_linebreak (export.py:328-385): the hand-ordered heuristic cascade
    * deciding newline vs space between consecutive lines. Rule order and
    * inequalities preserved exactly (SURVEY.md §4); the LM is consulted
    * last (M1).
    */
  def addLinebreak(
      info: DocInfo,
      cfg: ExtractConfig,
      line: Line,
      nextLine: Option[Line],
      textLine: ArrayBuffer[String],
      textNextLine: Option[ArrayBuffer[String]],
      paragraph: Elem,
      numLines: Int): Boolean = {

    if (cfg.considerFontSizeLinebreak) {
      (for {
        lf <- info.fontInfo.get(DocInfo.mostUsedFont(Seq(line)))
        nl <- nextLine
        nf <- info.fontInfo.get(DocInfo.mostUsedFont(Seq(nl)))
      } yield !DocInfo.roughlySameFont(lf, nf)) match {
        case Some(true) => return true
        case _ =>
      }
    }

    val avgSpace = DocInfo.avgWordSpace(line)
    val spaceParaLine = line.box.l - paragraph.box.l
    val availableSpace = paragraph.box.w - line.box.w - avgSpace - spaceParaLine

    // if there is no next line (export.py:348-361)
    if (nextLine.isEmpty || textNextLine.isEmpty) {
      if (availableSpace > avgSpace) return true
      if (numLines == 1) return true
      return false
    }

    // next word fits on this line (export.py:363-366); the reference
    // indexes next_line["content"][0] unconditionally — lenient on a
    // word-less line (skip the rule) where the reference would raise.
    nextLine.get.words.headOption match {
      case Some(first) if availableSpace >= first.box.w => return true
      case _ =>
    }

    // same page + separated lines (export.py:369-373)
    if (info.onSamePage(line, nextLine.get) &&
      info.seperateLines(line, nextLine.get)) return true

    // more than 5 words (export.py:376-377; len(text_line) counts WORDS)
    if (textLine.length > 5) return false

    // trailing punctuation (export.py:380-381); lenient on empty last word
    val lastStripped = PyText.pyStrip(textLine.last)
    if (lastStripped.nonEmpty && PyText.Punctuation(lastStripped.last)) return false

    // LM fallback (export.py:385, M1)
    graft.lm.Scorer.newlineOrNot(
      textLine.mkString(" "),
      textNextLine.get.mkString(" "),
      cfg.lang)
  }

  /** is_footnotes_paragraph (export.py:514-554). */
  def isFootnotesParagraph(
      info: DocInfo,
      paragraph: Elem,
      counter: LinkedCounter[String],
      idxPage: Int,
      lines: LinesWithNone): Boolean = {

    val paraFont = counter.mostCommon1

    // footnote font has to differ from + be <= the body font
    if (paraFont == info.bodyFont) return false
    val pf = info.fontInfo.get(paraFont)
    val bf = info.fontInfo.get(info.bodyFont)
    if (pf.isEmpty || bf.isEmpty) return false // reference: KeyError
    if (pf.get.size > bf.get.size) return false

    if (idxPage < 0 || idxPage >= info.orderPage.length) return false
    val order = info.orderPage(idxPage)
    if (order.isEmpty) return false
    if (order.last != paragraph.id) return false

    // previous element must not end with ':' (export.py:540-548)
    if (order.length > 1) {
      info.idToElem.get(order(order.length - 2)).foreach { prevElem =>
        if (prevElem.lines.nonEmpty) {
          val (prevWords, _) = lineToWords(prevElem.lines.last)
          if (prevWords.nonEmpty && prevWords.last.endsWith(":")) return false
        }
      }
    }

    // first line has to start with a numeral (export.py:551)
    val firstWord = PyText.pyStrip(lines.valid.head.head)
    if (firstWord.isEmpty || !PyText.isNumericChar(firstWord.charAt(0))) return false

    true
  }
}
