package graft.fixtures

import graft.codec.SpanCodec
import graft.model._

/** Deterministic synthetic document builder (FIXTURES.md §4-5).
  *
  * All inputs are synthesized with a fixed seed — the reference's golden
  * artifacts are git-lfs pointers in this sandbox, so document-level
  * expectations are derived by hand-executing the reference semantics on
  * inputs we control (FIXTURES.md preamble). The builder produces trees in
  * the shape of the reference corpus (German administrative documents,
  * development/notes/04_data.md): repeated header, page-number footer,
  * body paragraphs with hyphenated breaks, a footnote block per page,
  * interleaved media.
  */
object Fixtures {

  /** A tiny splitmix64 PRNG — deterministic across JVMs (java.util.Random
    * would also be stable, but this keeps the stream explicit).
    */
  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = {
      val r = nextLong() & Long.MaxValue
      (r % bound).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private[fixtures] val bodyVocab: Vector[String] =
    ("die bedeutung der finanziellen interessen union ist in den " +
      "vergangenen jahren stetig gewachsen auch andere staaten wie " +
      "beispielsweise polen haben entsprechende regelungen getroffen " +
      "entwurf eines gesetzes zur wurde verbänden stellungnahme und mit " +
      "kommission bericht anwendung verordnung verfahren kosten verwaltung")
      .split(" ").toVector

  // geometry constants: body lines are 500 wide, 12 high, left margin 50,
  // line spacing 3 — these set the document medians.
  private val BodyW = 500.0
  private val BodyH = 12.0
  private val BodyL = 50.0
  private val Gap = 3.0

  /** Lay out one line of words. When `justifyTo` is set the inter-word
    * gaps are stretched so the line spans exactly that width — like
    * justified print text, so a document's line-width distribution has a
    * tight mode at the paragraph width (what the reference's
    * is_body_paragrah median tests assume, doc_info.py:305-321).
    */
  private def mkWords(lineId: String, text: Seq[String], font: String,
      l: Double, t: Double, h: Double, justifyTo: Option[Double]): Line = {
    val wws = text.map(_.length * 6.0)
    val gap = justifyTo match {
      case Some(target) if text.length > 1 =>
        math.max(1.0, (target - wws.sum) / (text.length - 1))
      case _ => 4.0
    }
    var x = l
    val ws = text.zip(wws).map { case (w, ww) =>
      val wBox = Box(math.rint(x * 10) / 10, t, ww, h)
      x += ww + gap
      Word(w, font, wBox)
    }.toVector
    val width = if (ws.isEmpty) 0.0 else (ws.last.box.l + ws.last.box.w) - l
    Line(lineId, Box(l, t, math.rint(width * 10) / 10, h), ws)
  }

  /** Public line builder for specs that need explicit layout control. */
  def justifiedLine(lineId: String, text: Seq[String], font: String,
      l: Double, t: Double, h: Double, width: Double): Line =
    mkWords(lineId, text, font, l, t, h, Some(width))

  /** Build a paragraph element of `texts` lines starting at top `t0`.
    * All lines except the last are justified to the paragraph width.
    */
  def paragraph(id: String, texts: Seq[Seq[String]], font: String,
      l: Double = BodyL, t0: Double = 100.0, w: Double = BodyW,
      h: Double = BodyH, gap: Double = Gap,
      isHeader: Boolean = false, isFooter: Boolean = false,
      justify: Boolean = true): Elem = {
    val lines = texts.zipWithIndex.map { case (txt, i) =>
      val justifyTo =
        if (justify && i < texts.length - 1) Some(w) else None
      mkWords(s"$id-l$i", txt, font, l, t0 + i * (h + gap), h, justifyTo)
    }.toVector
    // element box = bounds of line boxes (full body width so reflow
    // geometry rules behave like a justified paragraph)
    val box = Box(l, t0, w, texts.length * (h + gap) - gap)
    Elem(id, "paragraph", box, 0, isHeader, isFooter, lines, "", "")
  }

  /** Standard font table: font1 = body 12px, font2 = footnote 9px,
    * font3 = header 10px.
    */
  val fonts: Vector[FontDef] =
    Vector(FontDef("font1", 12.0), FontDef("font2", 9.0), FontDef("font3", 10.0))

  /** A multi-page composite document (fx-doc family): per page a repeated
    * header, several body paragraphs (some with hyphenated line breaks),
    * a smaller-font numeric-start footnote block last, a page-number
    * footer; one image on page 0 when `withMedia`.
    */
  def compositeDoc(docId: String, nPages: Int, rng: Rng,
      parasPerPage: Int = 3, withMedia: Boolean = true,
      hyphenEvery: Int = 3,
      extraFooter: Option[Seq[String]] = None): DocRow = {
    val pages = (0 until nPages).map { p =>
      val elems = Vector.newBuilder[Elem]
      // repeated header (same text + box on every page -> J1 dedup)
      elems += paragraph(s"$docId-p$p-hdr", Seq(Seq("Stellungnahme", "zum", "Entwurf")),
        "font3", l = BodyL, t0 = 20.0, w = 200.0, h = 10.0, isHeader = true)
      var t = 100.0
      var nextElem = 0
      (0 until parasPerPage).foreach { k =>
        val nLines = 2 + rng.nextInt(3)
        val lines = (0 until nLines).map { li =>
          val nWords = 6 + rng.nextInt(4)
          (0 until nWords).map(_ => bodyVocab(rng.nextInt(bodyVocab.length)))
        }
        // hyphenate: replace the junction of lines 0/1 with a known split
        val lines2 =
          if (k % hyphenEvery == 0 && nLines >= 2)
            lines.updated(0, lines(0).init :+ "finan-")
              .updated(1, "ziellen" +: lines(1).tail)
          else lines
        elems += paragraph(s"$docId-p$p-e$nextElem", lines2, "font1", t0 = t)
        nextElem += 1
        t += lines2.length * (BodyH + Gap) + 10.0
      }
      if (withMedia && p == 0) {
        elems += Elem(s"$docId-img", "image", Box(0, 0, 0, 0), 0,
          isHeader = false, isFooter = false, Vector.empty, s"blob://$docId/img0", "")
      }
      // footnote: smaller font, numeric start, LAST paragraph on the page
      elems += paragraph(s"$docId-p$p-fn", Seq(Seq("1", "Vgl.", "Begründung", "Seite", "2")),
        "font2", t0 = t + 5.0, w = 300.0, h = 9.0)
      // page-number footer
      elems += paragraph(s"$docId-p$p-ftr",
        Seq(Seq("Seite", s"${p + 1}", "von", s"$nPages")),
        "font3", t0 = 800.0, w = 120.0, h = 10.0, isFooter = true)
      // optional persistent footer (x07 differential: must SURVIVE the
      // page-number strip while the "Seite N von M" one is removed)
      extraFooter.foreach { txt =>
        elems += paragraph(s"$docId-p$p-ftr2", Seq(txt),
          "font3", t0 = 815.0, w = 180.0, h = 10.0, isFooter = true)
      }
      Page(elems.result())
    }.toVector
    DocRow(docId, SpanCodec.encode(DocTree(fonts, pages)))
  }

  /** Deterministic bench corpus: `n` docs, page counts lognormal-ish with
    * a long tail (`skewPct` of docs get `tailPages` pages) to exercise
    * skew salting (FIXTURES.md §5).
    */
  def corpus(n: Int, seed: Long = 42L, tailPermille: Int = 1,
      tailPages: Int = 40): IndexedSeq[DocRow] = {
    (0 until n).map { i =>
      val rng = new Rng(seed + i)
      val pages =
        if (tailPermille > 0 && i % 1000 < tailPermille) tailPages
        else 1 + rng.nextInt(3)
      compositeDoc(f"doc-$i%08d", pages, rng, withMedia = i % 5 == 0)
    }
  }

  /** Leveled-heading corpus (x16's PDF face): per doc, headings of level
    * 1..3 each followed by a body paragraph — pins the `hN` media_ref
    * convention (the HTML kernel's) on PDF-side heading spans through to
    * SpanMarkdown's `#`-leveled rendering. Heading elements ride the
    * standard paragraph geometry with `typ`/`level` overridden (the
    * codec carries `level=` on heading spans; export_heading parks it in
    * the idx_page slot downstream — the reference's quirk).
    */
  def headingCorpus(n: Int, seed: Long = 99L): IndexedSeq[DocRow] =
    (0 until n).map { i =>
      val rng = new Rng(seed + i)
      val elems = Vector.newBuilder[graft.model.Elem]
      var t0 = 40.0
      (1 to 3).foreach { lvl =>
        val htxt = (0 until 2 + rng.nextInt(2))
          .map(_ => bodyVocab(rng.nextInt(bodyVocab.length)))
        elems += paragraph(s"hd$i-h$lvl", Seq(htxt), "font3",
          t0 = t0, w = 180.0, h = 12.0, justify = false)
          .copy(typ = "heading", level = lvl)
        t0 += 30.0
        // multi-line bodies: the doc-info line statistics need line
        // pairs (doc_info.py:217-234 medians), a single-line doc fails
        // extraction with "empty line statistics"
        val ptxt = (0 until 2).map(_ => (0 until 6 + rng.nextInt(4))
          .map(_ => bodyVocab(rng.nextInt(bodyVocab.length))))
        elems += paragraph(s"hd$i-p$lvl", ptxt, "font1", t0 = t0)
        t0 += 50.0
      }
      DocRow(f"hdoc-$i%05d",
        SpanCodec.encode(DocTree(fonts, Vector(Page(elems.result())))))
    }

  /** Footer-differential corpus (x07): every doc has page-number footers;
    * every second doc additionally carries a real footer that must survive
    * the page-number strip.
    */
  def footerCorpus(n: Int, seed: Long = 7L): IndexedSeq[DocRow] =
    (0 until n).map { i =>
      val rng = new Rng(seed + i)
      compositeDoc(f"fdoc-$i%05d", 1 + rng.nextInt(3), rng, withMedia = false,
        extraFooter =
          if (i % 2 == 0) Some(Seq("Alle", "Rechte", "vorbehalten")) else None)
    }

  /** The flagship single document used by SparkEntry.entry (SURVEY.md
    * §7.2 minimum slice): 2 pages, repeated header, one hyphen-drop break
    * (finan-/ziellen), one keep-hyphen break (EU-/Staaten), a footnote
    * paragraph, a page-number footer.
    */
  def flagshipDoc: DocRow = {
    val p0 = Vector(
      paragraph("d0-p0-hdr", Seq(Seq("Stellungnahme", "zum", "Entwurf")),
        "font3", t0 = 20.0, w = 200.0, h = 10.0, isHeader = true),
      paragraph("d0-p0-e0", Seq(
        Seq("die", "bedeutung", "der", "finan-"),
        Seq("ziellen", "interessen", "der", "union", "ist", "gewachsen")),
        "font1", t0 = 100.0),
      paragraph("d0-p0-e1", Seq(
        Seq("auch", "andere", "EU-"),
        Seq("Staaten", "wie", "beispielsweise", "polen", "haben", "regelungen")),
        "font1", t0 = 160.0),
      paragraph("d0-p0-fn", Seq(Seq("1", "Vgl.", "Begründung", "Seite", "2")),
        "font2", t0 = 700.0, w = 300.0, h = 9.0),
      paragraph("d0-p0-ftr", Seq(Seq("Seite", "1", "von", "2")),
        "font3", t0 = 800.0, w = 120.0, h = 10.0, isFooter = true))
    val p1 = Vector(
      paragraph("d0-p1-hdr", Seq(Seq("Stellungnahme", "zum", "Entwurf")),
        "font3", t0 = 20.0, w = 200.0, h = 10.0, isHeader = true),
      paragraph("d0-p1-e0", Seq(
        Seq("die", "kommission", "hat", "einen", "bericht", "vorgelegt"),
        Seq("nach", "ansicht", "der", "verbände", "ist", "eine", "klärung", "erforderlich")),
        "font1", t0 = 100.0),
      paragraph("d0-p1-ftr", Seq(Seq("Seite", "2", "von", "2")),
        "font3", t0 = 800.0, w = 120.0, h = 10.0, isFooter = true))
    DocRow("d0", SpanCodec.encode(DocTree(fonts, Vector(Page(p0), Page(p1)))))
  }
}
