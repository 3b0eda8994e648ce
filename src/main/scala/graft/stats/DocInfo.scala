package graft.stats

import graft.model._
import graft.text.{LinkedCounter, PyText}

/** Per-document "corpus of one" statistics — the reference's
  * `DocumentInfo` (doc_info.py:184-321). Pure Scala over one `DocTree`
  * row; nothing here ever crosses a shuffle (SURVEY.md §1.3).
  */
final class DocInfo(doc: DocTree) {

  /** element_order_page (doc_info.py:283-303): per-page ordered element
    * ids, excluding non-paragraph/heading elements and elements flagged
    * header/footer AT THIS POINT (i.e. before fix_headers_footers demotion
    * — the reference builds DocumentInfo first, export.py:210-211, so a
    * later-demoted element is absent from order_page; replicated).
    */
  val orderPage: Vector[Vector[String]] = doc.pages.map { p =>
    p.elements.iterator
      .filter(e => e.typ == "paragraph" || e.typ == "heading")
      .filterNot(_.isHeader)
      .filterNot(_.isFooter)
      .map(_.id)
      .toVector
  }

  /** id -> element map over ALL elements (doc_info.py:292-293). */
  val idToElem: Map[String, Elem] = {
    val b = Map.newBuilder[String, Elem]
    doc.pages.foreach(_.elements.foreach(e => b += (e.id -> e)))
    b.result()
  }

  /** id -> page index for elements AND lines (the reference injects
    * idx_page into both dicts: doc_info.py:209-210, 292-293).
    */
  val idToPage: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    doc.pages.zipWithIndex.foreach { case (p, i) =>
      p.elements.foreach { e =>
        b += (e.id -> i)
        e.lines.foreach(l => b += (l.id -> i))
      }
    }
    b.result()
  }

  // ---- document_font_stats (doc_info.py:248-266) ----

  val fontCounter: LinkedCounter[String] = {
    val c = new LinkedCounter[String]
    doc.pages.foreach(_.elements.foreach(_.lines.foreach(_.words.foreach(w =>
      c.add(w.font, 1)))))
    c
  }

  if (fontCounter.isEmpty)
    throw new ExtractionException(
      "Something is wrong with the document: no words/fonts (doc_info.py:256-259)")

  /** Most common font; CPython Counter tie-break = first inserted. */
  val bodyFont: String = fontCounter.mostCommon1

  val fontInfo: Map[String, FontDef] = doc.fonts.map(f => f.id -> f).toMap

  // ---- document_paragraph_stats (doc_info.py:196-246) ----

  private val widths = Vector.newBuilder[Double]
  private val heights = Vector.newBuilder[Double]
  private val lineSpaces = Vector.newBuilder[Double]
  private val lefts = Vector.newBuilder[Double]

  doc.pages.foreach { p =>
    p.elements.foreach { e =>
      val lis = e.lines // extract_elements(e, "line") — all elements' lines
      lis.foreach { x =>
        widths += x.box.w
        heights += x.box.h
        lefts += x.box.l
      }
      DocInfo.calcLineSpace(lis).foreach(lineSpaces += _)
    }
  }

  private val wv = widths.result()
  private val hv = heights.result()
  private val sv = lineSpaces.result()
  private val lv = lefts.result()

  if (wv.isEmpty || hv.isEmpty || sv.isEmpty || lv.isEmpty)
    throw new ExtractionException(
      "Something is wrong with the document: empty line statistics (doc_info.py:217-234)")

  val medianLineWidth: Double = PyText.median(wv)
  val medianLineHeight: Double = PyText.median(hv)
  val medianLineSpace: Double = PyText.median(sv)
  val medianLineLeft: Double = PyText.median(lv)

  /** seperate_lines (doc_info.py:268-273): gap > (1+factor) * median. */
  def seperateLines(l1: Line, l2: Line, factor: Double = 0.5): Boolean =
    DocInfo.getLineheight(l1, l2) match {
      case None => false
      case Some(lh) => ((lh - medianLineSpace) / medianLineSpace) > factor
    }

  /** on_same_page for lines (doc_info.py:275-281). */
  def onSamePage(l1: Line, l2: Line): Boolean =
    idToPage.get(l1.id) == idToPage.get(l2.id)

  /** is_body_paragrah (doc_info.py:305-321). Lenient divergence: the
    * reference raises on a line-less element (max of empty seq); such
    * elements are simply "not body" here (fixtures never flag them).
    */
  def isBodyParagraph(para: Elem): Boolean = {
    val lines = para.lines
    if (lines.isEmpty) return false
    val wLines = lines.map(_.box.w)
    val hLines = lines.map(_.box.h)
    val lLines = lines.map(_.box.l)
    if (math.abs(medianLineWidth - wLines.max) > 5) return false
    if (math.abs(medianLineHeight - PyText.median(hLines)) > 2) return false
    if (math.abs(medianLineLeft - PyText.median(lLines)) > 5) return false
    true
  }
}

object DocInfo {

  /** avg_word_space (doc_info.py:18-33; ported by the reference from
    * Parsr): mean inter-word left gap, first margin counted as 0.
    */
  def avgWordSpace(line: Line): Double = {
    val ws = line.words
    if (ws.isEmpty) return 0.0
    var sum = 0.0
    var i = 1
    while (i < ws.length) {
      sum += ws(i).box.l - (ws(i - 1).box.l + ws(i - 1).box.w)
      i += 1
    }
    sum / ws.length // first margin is 0 but still counted in the mean
  }

  /** roughly_same_font (doc_info.py:36-40). */
  def roughlySameFont(f1: FontDef, f2: FontDef): Boolean =
    math.abs(f1.size - f2.size) < math.max(f1.size, f2.size) * 0.2

  /** get_lineheight (doc_info.py:67-73): vertical gap, order-normalized;
    * None when overlapping / same baseline.
    */
  def getLineheight(a: Line, b: Line): Option[Double] = {
    val (l1, l2) = if (b.box.t < a.box.t) (b, a) else (a, b)
    val dif = l2.box.t - l1.box.t - l1.box.h
    if (dif > 0) Some(dif) else None
  }

  /** calc_line_space (doc_info.py:174-181): consecutive-pair gaps. */
  def calcLineSpace(lines: Seq[Line]): Seq[Double] =
    if (lines.length <= 1) Nil
    else lines.sliding(2).flatMap {
      case Seq(a, b) => getLineheight(a, b)
      case _ => None
    }.toSeq

  /** most_used_font (doc_info.py:59-64): first-seen mode over word fonts. */
  def mostUsedFont(lines: Iterable[Line]): String = {
    val c = new LinkedCounter[String]
    lines.foreach(_.words.foreach(w => c.add(w.font, 1)))
    c.mostCommon1
  }
}
