package graft.extract

import graft.assemble.{DocumentOutput, OutElement}
import graft.classify.Classify
import graft.codec.SpanCodec
import graft.lm.Scorer
import graft.model._
import graft.reflow.{ExtractConfig, LinesWithNone, Reflow}
import graft.stats.DocInfo
import graft.text.LinkedCounter
import scala.collection.mutable.ArrayBuffer

/** The per-document extraction pipeline — the reference's `Export` class
  * (export.py:154-512) re-expressed as one pure function
  * `DocRow => ExtractedDoc`. Spark applies it in batched `mapPartitions`
  * passes (SURVEY.md §2.9): the document tree never crosses a shuffle.
  */
object Extractor {

  /** extract one document row (entry point used by the Spark job).
    *
    * Contract: valid ExtractedDoc or ExtractionException, never any other
    * throwable — at 10^12 rows every malformed span stream WILL occur, and
    * a raw NumberFormatException from a bad `box=`/`size=` attribute must
    * fail the DOCUMENT (routed to the metrics table), not the task.
    */
  def extractRow(row: DocRow, cfg: ExtractConfig): ExtractedDoc =
    try {
      val doc = SpanCodec.decode(row.spans, cfg.fast)
      val out = extractTree(doc, cfg)
      val spans = emitSpans(out)
      ExtractedDoc(row.doc_id, spans, out.text())
    } catch {
      case e: ExtractionException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new ExtractionException(
          s"malformed document: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** The Export.__init__ / export() flow (export.py:203-326). */
  def extractTree(doc0: DocTree, cfg: ExtractConfig): DocumentOutput = {
    // DocumentInfo is built BEFORE header/footer demotion (export.py:210-211)
    // so order_page reflects the original flags — replicated.
    val info = new DocInfo(doc0)
    val doc = Classify.fixHeadersFooters(doc0, info)

    // --- export_header_footer (export.py:218-258) ---
    var cleanedHeader: List[OutElement] = Nil
    var cleanedFooter: List[OutElement] = Nil
    var newFootnotes: List[OutElement] = Nil

    if (cfg.seperateHeaderFooter) {
      var headers: Vector[Seq[Elem]] = doc.pages.map(_.elements.filter(_.isHeader))
      var footers: Vector[Seq[Elem]] = doc.pages.map(_.elements.filter(_.isFooter))
      if (cfg.removeDuplicateHeaderFooter) {
        headers = Classify.removeDuplicates(headers, cfg.lang)
        footers = Classify.removeDuplicates(footers, cfg.lang)
      }
      // zip truncates to the shorter list when removeDuplicates shrank one
      // side — the reference quirk (export.py:243-245) replicated; idx_page
      // is the zip position, which may misalign with the real page.
      val hBuf = List.newBuilder[OutElement]
      val fBuf = List.newBuilder[OutElement]
      val fnBuf = List.newBuilder[OutElement]
      headers.zip(footers).zipWithIndex.foreach {
        case ((headerPerPage, footerPerPage), idxPage) =>
          headerPerPage.foreach { e =>
            linesToParagraph(info, cfg, e, idxPage, testFootnote = false)
              .foreach(hBuf += _)
          }
          footerPerPage.foreach { e =>
            linesToParagraph(info, cfg, e, idxPage, testFootnote = true).foreach {
              p => if (p.typ == "footnotes") fnBuf += p else fBuf += p
            }
          }
      }
      cleanedHeader = hBuf.result()
      cleanedFooter = fBuf.result()
      newFootnotes = fnBuf.result()
    }

    // --- main pass (export.py:282-310) ---
    val cleanedData = List.newBuilder[OutElement]
    doc.pages.zipWithIndex.foreach { case (page, idxPage) =>
      page.elements.foreach { element =>
        val skipHeader =
          (cfg.seperateHeaderFooter || cfg.removeHeader) && element.isHeader
        val skipFooter =
          (cfg.seperateHeaderFooter || cfg.removeFooter) && element.isFooter
        if (!skipHeader && !skipFooter) {
          element.typ match {
            case "heading" =>
              cleanedData += exportHeading(element)
            case "paragraph" =>
              linesToParagraph(info, cfg, element, idxPage, testFootnote = true)
                .foreach(cleanedData += _)
            case "image" | "drawing" =>
              // extension: pass-through media span (reference drops these
              // from the text flow, doc_info.py:295-301)
              if (cfg.keepMedia && !cfg.fast)
                cleanedData += new OutElement(
                  element.typ, Nil, element.id, idxPage, mediaRef = element.mediaRef)
            case "table" =>
              // table CSV pass-through (parsr_wrapper.py:112-114)
              if (cfg.keepMedia)
                cleanedData += new OutElement(
                  "table", Nil, element.id, idxPage,
                  mediaRef = element.mediaRef, payload = element.payload)
            case _ =>
          }
        }
      }
      // append footer-derived footnotes for this page (export.py:306-310;
      // structurally dead in the reference — footers are excluded from
      // order_page so they never classify as footnotes — kept for shape)
      if (cfg.seperateHeaderFooter)
        cleanedData ++= newFootnotes.filter(_.idxPage == idxPage)
    }

    if (cfg.removePageNumber) {
      cleanedHeader = Classify.removePageNumberElements(
        cleanedHeader, cfg.pageNumberTypeBugCompat)
      cleanedFooter = Classify.removePageNumberElements(
        cleanedFooter, cfg.pageNumberTypeBugCompat)
    }

    val docOut = new DocumentOutput(
      cleanedData.result(), cleanedHeader, cleanedFooter, info.orderPage,
      cfg.lang)
    if (cfg.footnotesLast) docOut.reorderFootnotes()
    // only if footnotes are reordered (export.py:325-326)
    if (cfg.footnotesLast && cfg.removeHyphens) docOut.reversePageBreak()
    docOut
  }

  /** lines_to_paragraph (export.py:397-500). */
  def linesToParagraph(
      info: DocInfo,
      cfg: ExtractConfig,
      paragraph: Elem,
      idxPage: Int,
      testFootnote: Boolean): Option[OutElement] = {

    val rawLines = paragraph.lines
    val fontCounter = new LinkedCounter[String]
    val buf = new ArrayBuffer[ArrayBuffer[String]](rawLines.length)

    rawLines.foreach { l =>
      val (rl, rf) = Reflow.lineToWords(l)
      if (rl.isEmpty) buf += null
      else if (!cfg.removePunctParagraph || rl.exists(Reflow.hasAlnumAfterClean)) {
        buf += rl
        fontCounter.update(rf)
      } else buf += null
    }

    val lines = new LinesWithNone(buf)
    if (lines.valid.isEmpty) return None

    if (testFootnote &&
      Reflow.isFootnotesParagraph(info, paragraph, fontCounter, idxPage, lines)) {
      // footnote branch (export.py:430-460): the "\n"/" " is appended as a
      // SEPARATE token; render repairs the space-before-newline later
      // (doc_output.py:158)
      val idxs = lines.validIndices
      idxs.init.foreach { i =>
        val doBreak = Reflow.addLinebreak(
          info, cfg,
          rawLines(i),
          Some(rawLines(i + 1)),
          lines(i),
          Option(buf(i + 1)), // null (invalid line) -> None, as in the reference
          paragraph,
          lines.length)
        if (doBreak) lines(i) += "\n"
        else if (i + 1 >= buf.length || buf(i + 1) == null) lines(i) += "\n"
        else {
          // numeric-start + font-differs inner rule (export.py:448-458)
          val curFirst = lines(i).head
          val nextFirst = buf(i + 1).head
          val fontsDiffer =
            rawLines(i + 1).words.headOption.map(_.font) !=
              rawLines(i).words.lastOption.map(_.font)
          if (graft.text.PyText.isNumeric(curFirst) &&
            graft.text.PyText.isNumeric(nextFirst) && fontsDiffer)
            lines(i) += "\n"
          else lines(i) += " "
        }
      }
      Some(new OutElement(
        "footnotes", lines.valid.map(_.toList).toList, paragraph.id, idxPage))
    } else {
      // body branch (export.py:462-500): token glued onto the last word
      var numNewlines = 0
      var endsNewline = false
      val idxs = lines.validIndices
      idxs.foreach { i =>
        val isLast = i == lines.lastLine
        val nextLine = if (isLast) None else Some(rawLines(i + 1))
        val textNextLine =
          if (isLast) None else Option(buf(i + 1)) // may be null -> None
        val doBreak = Reflow.addLinebreak(
          info, cfg, rawLines(i), nextLine, lines(i), textNextLine,
          paragraph, lines.length)
        if (doBreak) {
          lines(i)(lines(i).length - 1) = lines(i).last + "\n"
          numNewlines += 1
          if (isLast) endsNewline = true
        } else if (!isLast) {
          lines(i)(lines(i).length - 1) = lines(i).last + " "
        }
      }
      var validLines: List[List[String]] = lines.valid.map(_.toList).toList
      if (cfg.removeHyphens)
        validLines = Scorer.dehyphenParagraph(validLines, cfg.lang)
      Some(new OutElement(
        "body", validLines, paragraph.id, idxPage, numNewlines,
        endsNewline = endsNewline))
    }
  }

  /** export_heading (export.py:503-509). Replicates the positional-arg
    * quirk: the heading's level lands in the idx_page slot, level stays
    * unset (see OutElement scaladoc). Lenient on a word-less heading line
    * (kept as an empty token list) where the reference's Element
    * constructor raises AssertionError (doc_output.py:148-149) — the
    * standard lenient-where-reference-crashes choice.
    */
  def exportHeading(e: Elem): OutElement = {
    val lines = e.lines.map(l => Reflow.lineToWords(l)._1.toList).toList
    new OutElement("heading", lines, e.id, idxPage = e.level)
  }

  /** Emit the output span sequence (FIXTURES.md §3): header spans, data
    * elements in emission order (body/heading/footnotes plus media/table
    * pass-throughs), footer spans; offset = emission index.
    */
  def emitSpans(out: DocumentOutput): Seq[Span] = {
    val b = Seq.newBuilder[Span]
    var off = 0
    def emit(kind: String, text: String, ref: String): Unit = {
      b += Span(kind, text, ref, off); off += 1
    }
    out.header.foreach(e => emit("header", e.render, ""))
    out.data.foreach { e =>
      e.typ match {
        case "image" | "drawing" => emit(e.typ, "", e.mediaRef)
        case "table" => emit("table", e.payload, e.mediaRef)
        case "heading" =>
          // carry the heading LEVEL in media_ref as "hN" — the HTML
          // kernel's convention, which SpanMarkdown already renders;
          // export_heading parks the level in the idxPage slot (the
          // reference's positional-arg quirk, export.py:503-509), and
          // levels outside 1..6 render at the minimal level like before
          emit("heading", e.render,
            if (e.idxPage >= 1 && e.idxPage <= 6) s"h${e.idxPage}" else "")
        case t => emit(t, e.render, "")
      }
    }
    out.footer.foreach(e => emit("footer", e.render, ""))
    b.result()
  }
}
