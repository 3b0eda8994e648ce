package graft.classify

import graft.assemble.OutElement
import graft.lm.Scorer
import graft.model._
import graft.stats.DocInfo
import graft.text.PyText

/** Block-classification helpers: header/footer dedup (J1), page-number
  * strip (P5), header/footer flag demotion (P4).
  */
object Classify {

  /** only_text (doc_info.py:83-88) over raw elements: all word contents,
    * stripped, space-joined, unicode-fixed.
    */
  def onlyText(es: Seq[Elem]): String = {
    val r = es.flatMap(_.lines.flatMap(_.words.map(w => PyText.pyStrip(w.content))))
    PyText.fixBadUnicode(r.mkString(" "))
  }

  /** only_points (doc_info.py:91-99): the four corners of each element
    * box as (t, l) tuples.
    */
  def onlyPoints(es: Seq[Elem]): Seq[(Double, Double)] =
    es.flatMap { e =>
      val b = e.box
      Seq(
        (b.t, b.l),
        (b.t + b.h, b.l),
        (b.t, b.l + b.w),
        (b.t + b.h, b.l + b.w))
    }

  /** super_similiar (doc_info.py:102-123): char-multiset Jaccard > 0.8 AND
    * bbox overlap > 0.6; needs >= 4 points (>= 1 element) on each side.
    */
  def superSimiliar(
      es1: Seq[Elem],
      es2: Seq[Elem],
      simFactor: Double = 0.8,
      simBox: Double = 0.6): Boolean = {
    val points1 = onlyPoints(es1)
    val points2 = onlyPoints(es2)
    if (math.min(points1.length, points2.length) < 4) return false
    val jSim = PyText.jaccardChars(onlyText(es1), onlyText(es2))
    val bSim = Geometry.simBbox(points1, points2)
    jSim > simFactor && bSim > simBox
  }

  /** remove_duplicates (doc_info.py:126-152) — the header/footer
    * similarity self-join across pages. Faithful to the reference's
    * mutate-while-scanning semantics: when a later page's element-set
    * scores better, the earlier entry is REMOVED from the results list
    * (shortening it — the caller's zip then misaligns pages, a reference
    * quirk we replicate, SURVEY.md §7.4); when the earlier one wins, the
    * later page contributes an empty list.
    */
  def removeDuplicates(pageItems: Vector[Seq[Elem]],
      lang: String = "multi"): Vector[Seq[Elem]] = {
    if (pageItems.isEmpty) return pageItems
    val results = scala.collection.mutable.ArrayBuffer[Seq[Elem]](pageItems.head)
    pageItems.tail.foreach { elements =>
      var cool = true
      var i = 0
      var break = false
      while (i < results.length && !break) {
        val r = results(i)
        if (r.nonEmpty && superSimiliar(r, elements)) {
          if (Scorer.singleScore(onlyText(r), lang) <=
            Scorer.singleScore(onlyText(elements), lang)) {
            // previous got a better/equal score -> skip this one
            cool = false
            break = true
          } else {
            // this one is better -> remove previous (list shrinks).
            // CPython `for r in results: ... results.remove(r)` skips the
            // element that shifts into the removed slot — replicated by
            // NOT re-examining index i after the removal.
            results.remove(i)
          }
        }
        i += 1
      }
      if (cool) results.append(elements) else results.append(Seq.empty)
    }
    results.toVector
  }

  /** remove_page_number_header_footer (doc_info.py:155-171) — INTENDED
    * semantics, applied to raw element sets: drop sets whose text is empty
    * after removing numbers, punctuation, "seite" and "von".
    */
  def isPageNumberText(text: String): Boolean =
    PyText.pyStrip(
      PyText.cleanNoPunctNoNumber(text)
        .replace("seite", "")
        .replace("von", "")) == ""

  /** The reference call site (export.py:312-314) passes rendered
    * `Element` OBJECTS into only_text, whose dict-typed traversal yields ""
    * for every element — so with `remove_page_number=True` ALL separated
    * headers/footers are dropped (SURVEY.md §7.4 class of quirks; traced:
    * doc_info.py:43-56 traverse returns None for str/Element ->
    * extract_elements yields [] -> only_text "" -> texts all "" -> results
    * []). `typeBugCompat=true` (the default, matching the reference's
    * tested fast+experimental profile) replicates that; `false` gives the
    * intended per-element page-number check on the rendered text.
    */
  def removePageNumberElements(
      items: List[OutElement],
      typeBugCompat: Boolean): List[OutElement] =
    if (typeBugCompat) Nil
    else items.filterNot(e => isPageNumberText(e.lines.flatten.mkString(" ")))

  /** fix_headers_footers (export.py:260-274): demote isHeader/isFooter
    * flags when the element statistically looks like body text. Returns a
    * new tree (the reference mutates in place).
    */
  def fixHeadersFooters(doc: DocTree, info: DocInfo): DocTree = {
    val pages = doc.pages.map { p =>
      Page(p.elements.map { e =>
        var out = e
        if (e.isHeader && info.isBodyParagraph(e)) out = out.copy(isHeader = false)
        if (e.isFooter && info.isBodyParagraph(out)) out = out.copy(isFooter = false)
        out
      })
    }
    DocTree(doc.fonts, pages)
  }
}
