package graft.codec

import graft.model._
import scala.collection.mutable.ArrayBuffer

/** Streaming document-tree builder — the shared state machine behind both
  * span decoders (object Span stream and the InternalRow fast path,
  * graft.job.FastScan). Spans MUST be fed in offset order.
  */
final class TreeBuilder(fast: Boolean) {
  private val fonts = Vector.newBuilder[FontDef]
  private val pages = Vector.newBuilder[Page]

  private var curPage: ArrayBuffer[Elem] = null
  private var elemId: String = null
  private var elemTyp: String = null
  private var elemBox: Box = TreeBuilder.EmptyBox
  private var elemLevel: Int = 0
  private var elemHdr = false
  private var elemFtr = false
  private var elemLines: ArrayBuffer[Line] = null
  private var lineId: String = null
  private var lineBox: Box = TreeBuilder.EmptyBox
  private var lineWords: ArrayBuffer[Word] = null
  private var autoId = 0

  private def flushLine(): Unit = {
    if (lineId != null) {
      elemLines += Line(lineId, lineBox, lineWords.toVector)
      lineId = null; lineWords = null
    }
  }
  private def flushElem(): Unit = {
    flushLine()
    if (elemId != null) {
      curPage += Elem(elemId, elemTyp, elemBox, elemLevel, elemHdr, elemFtr,
        elemLines.toVector, "", "")
      elemId = null; elemLines = null
    }
  }
  private def flushPage(): Unit = {
    flushElem()
    if (curPage != null) {
      pages += Page(curPage.toVector)
      curPage = null
    }
  }
  private def ensurePage(): Unit =
    if (curPage == null) curPage = ArrayBuffer.empty[Elem]

  def onFont(text: String, ref: String): Unit =
    fonts += FontDef(ref, TreeBuilder.kv(text, "size").fold(0.0)(_.toDouble))

  def onPage(): Unit = { flushPage(); curPage = ArrayBuffer.empty[Elem] }

  def onElem(isHeading: Boolean, text: String, ref: String): Unit = {
    flushElem(); ensurePage()
    elemId = ref
    elemTyp = if (isHeading) "heading" else "paragraph"
    elemBox = TreeBuilder.kv(text, "box").fold(TreeBuilder.EmptyBox)(SpanCodec.parseBox)
    elemLevel = TreeBuilder.kv(text, "level").fold(0)(_.toInt)
    elemHdr = false; elemFtr = false
    elemLines = ArrayBuffer.empty[Line]
  }

  def onHdr(): Unit = if (elemId != null) elemHdr = true
  def onFtr(): Unit = if (elemId != null) elemFtr = true

  def onLine(text: String, ref: String): Unit = {
    flushLine()
    if (elemLines == null) { // tolerate stray line outside element
      ensurePage()
      autoId += 1
      elemId = "auto-line-" + autoId; elemTyp = "paragraph"
      elemBox = TreeBuilder.EmptyBox; elemLevel = 0
      elemHdr = false; elemFtr = false
      elemLines = ArrayBuffer.empty[Line]
    }
    lineId = ref
    lineBox = TreeBuilder.kv(text, "box").fold(TreeBuilder.EmptyBox)(SpanCodec.parseBox)
    lineWords = ArrayBuffer.empty[Word]
  }

  def onWord(text: String, ref: String): Unit = {
    if (lineWords == null) {
      // a word with no open line is a malformed stream: synthesize the
      // line (the same tolerance onLine applies to a stray line outside
      // an element) rather than silently dropping text — at 10^12 rows
      // silent data loss is the one unacceptable failure mode. Unique id
      // per synthesized line: line ids become span refs on re-encode.
      autoId += 1
      onLine("", "auto-word-line-" + autoId)
    }
    val font = TreeBuilder.kv(ref, "font").getOrElse("")
    val box = TreeBuilder.kv(ref, "box").fold(TreeBuilder.EmptyBox)(SpanCodec.parseBox)
    lineWords += Word(text, font, box)
  }

  def onMedia(kind: String, ref: String, offset: Int): Unit = {
    // fast mode drops the media element WITHOUT flushing the open element.
    // For codec-produced streams the two modes are equivalent anyway
    // (SpanCodec.encode only emits media at element boundaries, always
    // followed by a fresh para/heading span before any line); for a
    // hand-built stream interleaving media MID-element, fast mode keeps
    // the paragraph whole — the faithful reading of the reference's fast
    // mode, where Parsr never produced the media element and explicit
    // para spans alone define segmentation.
    if (!fast) {
      flushElem(); ensurePage()
      curPage += Elem("media-" + offset, kind, TreeBuilder.EmptyBox, 0,
        isHeader = false, isFooter = false, Vector.empty, ref, "")
    }
  }

  def onTable(text: String, ref: String): Unit = {
    flushElem(); ensurePage()
    curPage += Elem(ref, "table", TreeBuilder.EmptyBox, 0,
      isHeader = false, isFooter = false, Vector.empty, ref, text)
  }

  def result(): DocTree = {
    flushPage()
    DocTree(fonts.result(), pages.result())
  }
}

object TreeBuilder {
  val EmptyBox: Box = Box(0, 0, 0, 0)

  /** extract `key=value` from a `;`-separated kv string without regex or
    * split allocation.
    */
  def kv(s: String, key: String): Option[String] = {
    var from = 0
    while (from <= s.length) {
      val end0 = s.indexOf(';', from)
      val end = if (end0 < 0) s.length else end0
      val eq = s.indexOf('=', from)
      if (eq >= from && eq < end &&
        eq - from == key.length && s.regionMatches(from, key, 0, key.length))
        return Some(s.substring(eq + 1, end))
      if (end0 < 0) return None
      from = end + 1
    }
    None
  }
}
