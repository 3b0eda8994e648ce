package graft.codec

import graft.model._
import scala.collection.mutable.ArrayBuffer

/** Codec between the flat `spans` column (FIXTURES.md §2) and the
  * per-document tree. The span stream is a pre-order serialization of the
  * reference document model (pages -> elements -> lines -> words,
  * export.py:283-303); `offset` is the only ordering authority
  * (SURVEY.md §2.6 T1).
  *
  * Kinds:
  *  - `font`   text="size=<px>"          media_ref=<font id>
  *  - `page`   (empty)                   page start
  *  - `para` / `heading` text="box=l,t,w,h[;level=k]" media_ref=<elem id>
  *  - `hdr` / `ftr`  flags the innermost open element (isHeader/isFooter)
  *  - `line`   text="box=l,t,w,h"        media_ref=<line id>
  *  - `word`   text=<word>               media_ref="font=<id>;box=l,t,w,h"
  *  - `image` / `drawing`  media_ref=<media uri>   (dropped in fast mode,
  *    mirroring Parsr's fast config, parsr_wrapper.py:44-49)
  *  - `table`  text=<csv>                media_ref=<table id>
  */
object SpanCodec {

  private val EmptyBox = Box(0, 0, 0, 0)

  def parseBox(s: String): Box = {
    val p = s.split(",")
    Box(p(0).toDouble, p(1).toDouble, p(2).toDouble, p(3).toDouble)
  }

  def fmt(d: Double): String = {
    // fixed-point, one fractional digit (FIXTURES.md §2) — locale-free
    val scaled = math.rint(d * 10.0).toLong
    val whole = scaled / 10
    val frac = math.abs(scaled % 10)
    s"$whole.$frac"
  }

  def fmtBox(b: Box): String = s"${fmt(b.l)},${fmt(b.t)},${fmt(b.w)},${fmt(b.h)}"

  /** Decode a span stream into the document tree.
    *
    * @param fast drop media (image/drawing) spans, the analog of Parsr fast
    *             mode module pruning (parsr_wrapper.py:44-49) + the
    *             fast-mode null-element filter (export.py:203-216, S4 —
    *             unclassified elements simply never materialize here).
    */
  def decode(spans: Seq[Span], fast: Boolean): DocTree = {
    val sorted = spans.sortBy(_.offset)
    val fonts = Vector.newBuilder[FontDef]
    val pages = Vector.newBuilder[Page]

    var curPage: ArrayBuffer[Elem] = null
    // open element state
    var elemId: String = null
    var elemTyp: String = null
    var elemBox: Box = EmptyBox
    var elemLevel: Int = 0
    var elemHdr = false
    var elemFtr = false
    var elemLines: ArrayBuffer[Line] = null
    // open line state
    var lineId: String = null
    var lineBox: Box = EmptyBox
    var lineWords: ArrayBuffer[Word] = null

    def flushLine(): Unit = {
      if (lineId != null) {
        elemLines += Line(lineId, lineBox, lineWords.toVector)
        lineId = null; lineWords = null
      }
    }
    def flushElem(): Unit = {
      flushLine()
      if (elemId != null) {
        curPage += Elem(elemId, elemTyp, elemBox, elemLevel, elemHdr, elemFtr,
          elemLines.toVector, "", "")
        elemId = null; elemLines = null
      }
    }
    def flushPage(): Unit = {
      flushElem()
      if (curPage != null) {
        pages += Page(curPage.toVector)
        curPage = null
      }
    }

    def parseKv(s: String): Map[String, String] =
      s.split(";").iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
      }.toMap

    sorted.foreach { sp =>
      sp.kind match {
        case "font" =>
          val size = parseKv(sp.text).getOrElse("size", "0").toDouble
          fonts += FontDef(sp.media_ref, size)
        case "page" =>
          flushPage()
          curPage = ArrayBuffer.empty[Elem]
        case "para" | "heading" =>
          flushElem()
          if (curPage == null) curPage = ArrayBuffer.empty[Elem]
          val kv = parseKv(sp.text)
          elemId = sp.media_ref
          elemTyp = if (sp.kind == "para") "paragraph" else "heading"
          elemBox = kv.get("box").map(parseBox).getOrElse(EmptyBox)
          elemLevel = kv.get("level").map(_.toInt).getOrElse(0)
          elemHdr = false; elemFtr = false
          elemLines = ArrayBuffer.empty[Line]
        case "hdr" =>
          if (elemId != null) elemHdr = true
        case "ftr" =>
          if (elemId != null) elemFtr = true
        case "line" =>
          flushLine()
          if (elemLines == null) { // tolerate stray line outside element
            elemId = "auto-" + sp.offset; elemTyp = "paragraph"
            elemBox = EmptyBox; elemLevel = 0; elemHdr = false; elemFtr = false
            elemLines = ArrayBuffer.empty[Line]
            if (curPage == null) curPage = ArrayBuffer.empty[Elem]
          }
          lineId = sp.media_ref
          lineBox = parseKv(sp.text).get("box").map(parseBox).getOrElse(EmptyBox)
          lineWords = ArrayBuffer.empty[Word]
        case "word" =>
          if (lineWords != null) {
            val kv = parseKv(sp.media_ref)
            val font = kv.getOrElse("font", "")
            val box = kv.get("box").map(parseBox).getOrElse(EmptyBox)
            lineWords += Word(sp.text, font, box)
          }
        case "image" | "drawing" =>
          if (!fast) {
            flushElem()
            if (curPage == null) curPage = ArrayBuffer.empty[Elem]
            curPage += Elem("media-" + sp.offset, sp.kind, EmptyBox, 0,
              isHeader = false, isFooter = false, Vector.empty, sp.media_ref, "")
          }
        case "table" =>
          flushElem()
          if (curPage == null) curPage = ArrayBuffer.empty[Elem]
          curPage += Elem(sp.media_ref, "table", EmptyBox, 0,
            isHeader = false, isFooter = false, Vector.empty, sp.media_ref, sp.text)
        case _ => // unknown kinds ignored (forward compat)
      }
    }
    flushPage()
    DocTree(fonts.result(), pages.result())
  }

  /** Encode a tree back to a span stream (fixture builder + round-trip
    * property tests).
    */
  def encode(doc: DocTree): Vector[Span] = {
    val out = Vector.newBuilder[Span]
    var off = 0
    def emit(kind: String, text: String, ref: String): Unit = {
      out += Span(kind, text, ref, off); off += 1
    }
    doc.fonts.foreach(f => emit("font", s"size=${fmt(f.size)}", f.id))
    doc.pages.foreach { page =>
      emit("page", "", "")
      page.elements.foreach { e =>
        e.typ match {
          case "paragraph" | "heading" =>
            val kind = if (e.typ == "paragraph") "para" else "heading"
            val lvl = if (e.typ == "heading") s";level=${e.level}" else ""
            emit(kind, s"box=${fmtBox(e.box)}$lvl", e.id)
            if (e.isHeader) emit("hdr", "", "")
            if (e.isFooter) emit("ftr", "", "")
            e.lines.foreach { l =>
              emit("line", s"box=${fmtBox(l.box)}", l.id)
              l.words.foreach { w =>
                emit("word", w.content, s"font=${w.font};box=${fmtBox(w.box)}")
              }
            }
          case "image" | "drawing" =>
            emit(e.typ, "", e.mediaRef)
          case "table" =>
            emit("table", e.payload, e.id)
          case other =>
            throw new IllegalArgumentException(s"unknown element type $other")
        }
      }
    }
    out.result()
  }
}
