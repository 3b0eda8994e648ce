package graft

import graft.html.HtmlExtract
import org.scalatest.funsuite.AnyFunSuite

/** HTML main-content extraction: boilerplate anatomy stripped, article
  * kept, tokenizer tolerant of real-web malformations.
  */
class HtmlSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-htmlspec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private var sparkUsed = false

  override def afterAll(): Unit = if (sparkUsed) spark.stop()

  private val article =
    "die kommission hat den entwurf des gesetzes zur anwendung der " +
      "finanziellen interessen in den staaten stetig beraten und bewertet"

  private val page =
    s"""<!DOCTYPE html><html><head><title>t</title>
       |<style>.a { color: red; }</style>
       |<script>if (1 < 2) { nav("</div>"); }</script>
       |</head><body>
       |<nav><ul><li><a href="/a">Start</a></li><li><a href="/b">Themen</a></li>
       |<li><a href="/c">Archiv</a></li></ul></nav>
       |<article>
       |<h1>Bericht &uuml;ber die Lage</h1>
       |<p>$article</p>
       |<p>Auch <b>mit</b> inline&nbsp;markup bleibt der lange inhalt erhalten
       |denn die regel z&auml;hlt die worte des blocks und seiner nachbarn.</p>
       |<p><a href="/1">mehr</a> <a href="/2">noch mehr</a> <a href="/3">links</a></p>
       |</article>
       |<footer><a href="/imp">Impressum</a> &middot; <a href="/ds">Datenschutz</a></footer>
       |</body></html>""".stripMargin

  test("boilerplate stripped, article kept, heading attached and leveled") {
    val doc = HtmlExtract.extractRow("d1", page)
    val kinds = doc.spans.map(_.kind)
    assert(kinds.head == "heading" && doc.spans.head.media_ref == "h1")
    assert(doc.spans.head.text == "Bericht über die Lage") // entity decoded
    assert(doc.text.contains("kommission"))
    assert(doc.text.contains("inline markup") ||
      doc.text.contains("inline markup"))
    // nav, footer, and the pure-link paragraph are gone
    assert(!doc.text.contains("Impressum"))
    assert(!doc.text.contains("Archiv"))
    assert(!doc.text.contains("noch mehr"))
    // offsets are the emission order
    assert(doc.spans.map(_.offset) == doc.spans.indices.map(identity))
  }

  test("script/style raw content skipped even with embedded tags and '<'") {
    val b = HtmlExtract.blocks(page)
    assert(!b.exists(_.text.contains("color")))
    assert(!b.exists(_.text.contains("nav(")))
  }

  test("tokenizer tolerance: unclosed tags, stray '<', quoted '>', junk") {
    val messy =
      """<div><p>ein langer absatz mit mehr als sechzehn worten damit die
        |regel ihn sicher als inhalt behandelt und niemals verwirft obwohl
        |die seite kaputt ist <b>fett ohne ende
        |<p>zweiter absatz mit a < b vergleich und <a href="x>y.html">link</a>
        |der ebenfalls genug worte hat um die schwelle zu erreichen ja""".stripMargin
    val doc = HtmlExtract.extractRow("d2", messy)
    assert(doc.text.contains("sechzehn worten"))
    assert(doc.text.contains("a < b vergleich"))
    assert(doc.spans.nonEmpty)
    // determinism
    assert(HtmlExtract.extractRow("d2", messy) == doc)
  }

  test("link-density rule: a link farm is boilerplate even when long") {
    val farm = (1 to 30)
      .map(i => s"""<a href="/$i">eintrag nummer $i</a>""")
      .mkString("<div>", " ", "</div>")
    val b = HtmlExtract.classify(HtmlExtract.blocks(farm))
    assert(b.nonEmpty && b.forall(!_._2))
  }

  test("omitted </head> (legal HTML5) must not eat the document; title text excluded") {
    val noHeadClose =
      """<html><head><title>seitentitel</title><body>
        |<p>ein ausreichend langer absatz mit deutlich mehr als sechzehn
        |worten damit der klassifikator ihn sicher als inhalt behandelt und
        |die seite nicht leer herauskommt</p>""".stripMargin
    val doc = HtmlExtract.extractRow("d", noHeadClose)
    assert(doc.text.contains("sechzehn"), doc.text)
    assert(!doc.text.contains("seitentitel"))
    // '</header>' must not terminate a raw-text scan for a 'head'-like tag:
    // script content ends only at a DELIMITED close tag
    val tricky = "<script>x('</scripty>')</script><p>" +
      ("wort " * 20) + "</p>"
    val d2 = HtmlExtract.extractRow("d2", tricky)
    assert(!d2.text.contains("scripty") && d2.text.contains("wort"))
  }

  test("unquoted href ending in '/' is NOT self-closing: link farms stay link farms") {
    val farm = (1 to 25)
      .map(i => s"<a href=/sektion/$i/>rubrik nummer $i</a>")
      .mkString("<div>", " ", "</div>")
    val b = HtmlExtract.classify(HtmlExtract.blocks(farm))
    assert(b.nonEmpty && b.forall(!_._2), b.map(x => (x._1.linkDensity, x._2)))
  }

  test("inline tags join words like a browser renders them") {
    val doc = HtmlExtract.blocks("<p>Te<em>il</em>wort und H<sub>2</sub>O hier</p>")
    assert(doc.length == 1)
    assert(doc.head.text == "Teilwort und H2O hier", doc.head.text)
    assert(doc.head.words == 4)
  }

  test("heading level does not leak past its flush (malformed h-in-div)") {
    val messy = "<div><h3>Titel</div>" +
      ("zwanzig lange worte des eigentlichen absatzes " * 4) + "</div>"
    val doc = HtmlExtract.extractRow("d", messy)
    val byText = doc.spans.map(s => (s.kind, s.text.take(10)))
    assert(doc.spans.exists(s => s.kind == "body" && s.text.startsWith("zwanzig")),
      byText.mkString(","))
    assert(!doc.spans.exists(s => s.kind == "heading" && s.text.startsWith("zwanzig")),
      byText.mkString(","))
  }

  test("extract(): null html rows drop, the job survives, the loss is counted") {
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val pages = Seq(("ok", page), ("broken", null: String)).toDF("doc_id", "html")
    val out = HtmlExtract.extract(pages).collect()
    assert(out.map(_.doc_id).toSeq == Seq("ok"))
    // poisoned row increments the failure accumulator and the job survives
    val acc = sp.sparkContext.longAccumulator("html_failed")
    val out2 = HtmlExtract.extract(pages, failedAcc = Some(acc)).collect()
    assert(out2.map(_.doc_id).toSeq == Seq("ok"))
    assert(acc.value == 1L, s"acc=${acc.value}")
  }

  test("omitted </head> AND <body> (both legal HTML5): content still extracts") {
    val noBoth =
      """<html><head><meta charset="utf-8"><title>seitentitel</title>
        |<p>ein ausreichend langer absatz mit deutlich mehr als sechzehn
        |worten damit der klassifikator ihn sicher als inhalt behandelt und
        |die seite nicht leer herauskommt</p>""".stripMargin
    val doc = HtmlExtract.extractRow("d", noBoth)
    assert(doc.text.contains("sechzehn"), doc.text)
    assert(!doc.text.contains("seitentitel"))
    // bare text after head tags (no tag at all) also starts the body
    val bareText = "<head><meta charset=\"utf-8\"><title>t</title>" +
      ("inhalt wort lauf satz text zeile absatz block seite dokument " * 3)
    val d2 = HtmlExtract.extractRow("d2", bareText)
    assert(d2.text.contains("inhalt wort"), d2.text)
  }

  test("content table becomes ONE kind=table span with CSV-ish text") {
    val ctx = "<p>" + ("einleitungssatz mit vielen worten " * 5) + "</p>"
    val page = ctx + """<table><caption>Haushalt 2025</caption>
      |<tr><th>Jahr</th><th>Posten</th></tr>
      |<tr><td>2024</td><td>Bildung, Forschung</td></tr>
      |<tr><td>2025</td><td>Ein "Zitat"</td></tr>
      |</table>""".stripMargin + ctx
    val doc = HtmlExtract.extractRow("d", page)
    val tables = doc.spans.filter(_.kind == "table")
    assert(tables.length == 1, doc.spans.map(s => (s.kind, s.text)))
    val csv = tables.head.text.split("\n").toSeq
    assert(csv == Seq(
      "Haushalt 2025",
      "Jahr,Posten",
      "2024,\"Bildung, Forschung\"",      // comma-bearing cell quoted
      "2025,\"Ein \"\"Zitat\"\"\""),      // quote-bearing cell escaped
      csv)
    // an unclosed table at EOF still emits its capture
    val doc2 = HtmlExtract.extractRow("d2", ctx + "<table><tr><td>2024</td><td>offen</td>")
    assert(doc2.spans.exists(s => s.kind == "table" && s.text == "2024,offen"),
      doc2.spans)
  }

  test("layout/nav tables full of links are still boilerplate") {
    val navTable = "<table>" + (1 to 12).map(i =>
      s"""<tr><td><a href="/s$i">rubrik nummer $i</a></td></tr>""").mkString +
      "</table>"
    val b = HtmlExtract.classify(HtmlExtract.blocks(navTable))
    assert(b.length == 1 && b.head._1.kind == "table" && !b.head._2,
      b.map(x => (x._1.kind, x._1.linkDensity, x._2)))
  }

  test("links(): hrefs + anchors in order; script/head/skip links excluded") {
    val page =
      """<head><title>t</title><script>x("<a href='/fake'>no</a>")</script></head>
        |<body><p>Siehe <a href="/a?x=1&amp;y=2">ersten  Link</a> und
        |<a href='/b'>zweiten</a> sowie <a href=/unquoted/3>dritten</a>.
        |<svg><a href="/svg-link">vector</a></svg>
        |<a name="target-only">kein href</a>
        |<a href="/nested">außen <a href="/inner">innen</a></p>
        |<a href="/eof">offen am ende""".stripMargin
    val l = HtmlExtract.links(page)
    assert(l == Vector(
      ("/a?x=1&y=2", "ersten Link"),   // entity-decoded href, ws-normalized
      ("/b", "zweiten"),
      ("/unquoted/3", "dritten"),
      ("/nested", "außen"),             // implicit close at nested <a>
      ("/inner", "innen"),
      ("/eof", "offen am ende")), l)    // unclosed at EOF still emits
  }

  test("pageMeta: title/lang/canonical/description/robots; first wins; absent = empty") {
    val page =
      """<!DOCTYPE html><html lang="de-AT"><head>
        |<title>Bericht &uuml;ber
        |   die Lage</title>
        |<link rel="stylesheet" href="/css"><link rel="canonical" href="https://ex.org/a?x=1&amp;y=2">
        |<meta name="description" content="Eine   kurze &amp; gute Zusammenfassung">
        |<meta name="ROBOTS" content="NOINDEX, nofollow">
        |<title>zweiter titel</title>
        |</head><body><p>inhalt</p></body></html>""".stripMargin
    val m = HtmlExtract.pageMeta(page)
    assert(m.title == "Bericht über die Lage", m) // entities + ws-collapse
    assert(m.lang == "de-AT")
    assert(m.canonical == "https://ex.org/a?x=1&y=2") // entity-decoded href
    assert(m.description == "Eine kurze & gute Zusammenfassung")
    assert(m.robots == "noindex, nofollow") // value lowercased
    // absent everything -> empty strings, never nulls
    assert(HtmlExtract.pageMeta("<p>nur text</p>") ==
      HtmlExtract.PageMeta("", "", "", "", "", ""))
    // <base href> captured (first wins)
    assert(HtmlExtract.pageMeta(
      """<head><base href="/v1/"><base href="/v2/"></head>""").base == "/v1/")
    // a <title> inside an svg/template is NOT the page title
    val m2 = HtmlExtract.pageMeta(
      "<svg><title>svg label</title></svg><head><title>echte seite</title></head>")
    assert(m2.title == "echte seite", m2)
  }

  test("extractPageMeta: operator shape + null seam + canonical resolution") {
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val pages = Seq(
      ("d1", """<html lang="en"><head><title>T1</title></head><body></body></html>"""),
      ("d2", null: String)).toDF("doc_id", "html")
    val acc = sp.sparkContext.longAccumulator("meta_failed")
    val out = HtmlExtract.extractPageMeta(pages, failedAcc = Some(acc)).collect()
    assert(out.length == 1 && out.head.getString(1) == "T1" &&
      out.head.getString(2) == "en")
    assert(acc.value == 1L)
    // a RELATIVE rel=canonical resolves against the page URL: without
    // this, two sites declaring canonical "/index" would merge in
    // urlDedup; multi-token rel ("canonical alternate") still matches
    val rel = Seq(
      ("s1", """<head><link rel="canonical alternate" href="/index"></head>""",
        "https://site-one.example/a"),
      ("s2", """<head><link rel="canonical" href="/index"></head>""",
        "https://site-two.example/b")).toDF("doc_id", "html", "url")
    val canon = HtmlExtract.extractPageMeta(rel, pageUrlCol = Some("url"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(canon == Map(
      "s1" -> "https://site-one.example/index",
      "s2" -> "https://site-two.example/index"), canon)
  }

  test("resolveRef + extractLinks(pageUrlCol): RFC 3986 resolution with base-href priority") {
    import HtmlExtract.resolveRef
    assert(resolveRef("https://ex.org/a/b", "c") == "https://ex.org/a/c")
    assert(resolveRef("https://ex.org/a/b", "/c?x=1") == "https://ex.org/c?x=1")
    assert(resolveRef("https://ex.org/a/b", "../d") == "https://ex.org/d")
    assert(resolveRef("https://ex.org/a", "//other.net/p") == "https://other.net/p")
    assert(resolveRef("https://ex.org/a", "http://abs.example/z") == "http://abs.example/z")
    // RFC 3986 (not java.net.URI's RFC 2396): a query-only ref KEEPS the
    // base path — the pagination-link case
    assert(resolveRef("https://ex.org/a/b", "?page=2") == "https://ex.org/a/b?page=2")
    // above-root dot segments collapse instead of surviving as /../
    assert(resolveRef("https://ex.org/a/", "../../x") == "https://ex.org/x")
    // fragment-only ref: base path + query kept
    assert(resolveRef("https://ex.org/a?q=1", "#sec") == "https://ex.org/a?q=1#sec")
    // an href with raw spaces resolves WITH the spaces (total function —
    // the frontier keeps the row rather than losing it)
    assert(resolveRef("https://ex.org/d/", "mit leerzeichen") ==
      "https://ex.org/d/mit leerzeichen")
    // a schemeless base cannot anchor resolution
    assert(resolveRef("nur/pfad", "x") == "x")

    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val withBase =
      """<head><base href="/basis/"></head><body>
        |<p><a href="rel">eins</a> <a href="/root">zwei</a>
        |<a href="https://abs.example/x">drei</a></p>""".stripMargin
    val noBase = """<p><a href="rel2">vier</a></p>"""
    val pages = Seq(
      ("d1", withBase, "https://ex.org/artikel/seite"),
      ("d2", noBase, "https://ex.org/artikel/seite2")).toDF("doc_id", "html", "url")
    val out = HtmlExtract.extractLinks(pages, pageUrlCol = Some("url")).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSeq
    assert(out == Seq(
      // base /basis/ itself resolves against the page URL first
      ("d1", "rel", "https://ex.org/basis/rel"),
      ("d1", "/root", "https://ex.org/root"),
      ("d1", "https://abs.example/x", "https://abs.example/x"),
      ("d2", "rel2", "https://ex.org/artikel/rel2")), out)
  }

  test("resolveRef matches the reference RFC 3986 resolver on 280 generated vectors") {
    // vectors generated from urllib.parse.urljoin (a faithful RFC 3986
    // §5 implementation incl. the reference resolution examples of
    // §5.4): 10 bases x 28 refs covering dot segments, query/fragment
    // -only refs, protocol-relative, userinfo/port bases. (The empty
    // ref is excluded: urljoin special-cases it to return the base
    // VERBATIM incl. its fragment, while RFC 5.2.2 takes the ref's
    // absent fragment — and links() never emits empty hrefs anyway.)
    val in = getClass.getResourceAsStream("/urljoin_vectors.tsv")
    assert(in != null)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    assert(lines.length == 280)
    val bad = lines.flatMap { l =>
      val parts = l.split("\t", -1)
      val (base, ref, expected) = (parts(0), parts(1), parts(2))
      val got = HtmlExtract.resolveRef(base, ref)
      if (got != expected) Some(s"base=$base ref=$ref expected=$expected got=$got")
      else None
    }
    assert(bad.isEmpty, bad.take(10).mkString("\n"))
  }

  test("links(): an SVG <a> never implicitly closes the outer HTML anchor") {
    val l = HtmlExtract.links(
      """<p><a href="/x">Start <svg><a href="/s">icon</a></svg> End</a></p>""")
    assert(l == Vector(("/x", "Start End")), l)
  }

  test("markup inside a head-level skip container does not pop the head") {
    // tags/text INSIDE a head-level <template>/<noscript> stay out of
    // the head insertion-mode decision (skipDepth guard on both
    // auto-closes): the container's markup and images never leak, and
    // the head state survives to keep suppressing what follows it.
    // (A non-head-legal tag or non-whitespace text AFTER the container
    // still pops the head, like a browser — covered elsewhere.)
    val page =
      """<head><template><img src="/tpl.png" alt=""><p>tpl text</p>
        |nackter template text</template><title>seitentitel</title>
        |</head><body>
        |<p>ein ausreichend langer absatz mit deutlich mehr als sechzehn
        |worten damit der klassifikator ihn sicher als inhalt behandelt
        |und die seite nicht leer herauskommt</p>""".stripMargin
    val doc = HtmlExtract.extractRow("d", page)
    assert(doc.text.contains("sechzehn"), doc.text)
    assert(!doc.text.contains("tpl text"), doc.text)
    assert(!doc.text.contains("template text"), doc.text)
    assert(!doc.text.contains("seitentitel"))
    assert(doc.spans.forall(_.kind != "image"), doc.spans)
    // literal <head>/<body> tags inside a skip container must not flip
    // the head state either (same guard as the auto-close paths): a
    // body-level template containing <head> leaves body extraction
    // untouched, and its content never leaks
    val literal = "<p>" + ("erster absatz worte laufen weiter hier " * 4) +
      "</p><template><head>geister text</head></template><p>" +
      ("zweiter absatz worte laufen wieder weiter " * 4) + "</p>"
    val d2 = HtmlExtract.extractRow("d2", literal)
    assert(d2.text.contains("erster absatz") && d2.text.contains("zweiter absatz"),
      d2.text)
    assert(!d2.text.contains("geister"), d2.text)
  }

  test("attrValue: quoted/unquoted/absent, delimiter-checked, case-insensitive") {
    import HtmlExtract.attrValue
    assert(attrValue(""" class="x" HREF='/y' """, "href").contains("/y"))
    assert(attrValue(" href=/z/ ", "href").contains("/z/"))
    assert(attrValue(" data-href=\"/no\" ", "href").isEmpty)
    assert(attrValue(" href ", "href").isEmpty) // bare attribute, no value
    assert(attrValue(""" title="href=/t" href="/real" """, "href").contains("/real"))
  }

  test("extractLinks(): map-only operator shape + null-row seam") {
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val pages = Seq(
      ("d1", """<p><a href="/x">eins</a> <a href="/y">zwei</a></p>"""),
      ("d2", null: String)).toDF("doc_id", "html")
    val acc = sp.sparkContext.longAccumulator("links_failed")
    val out = HtmlExtract.extractLinks(pages, failedAcc = Some(acc)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(("d1", 0, "/x", "eins"), ("d1", 1, "/y", "zwei")))
    assert(acc.value == 1L)
  }

  test("inline images interleave as media spans; boilerplate images drop") {
    val ctx = "<p>" + ("inhaltsworte des langen absatzes hier weiter " * 5) + "</p>"
    val page =
      """<nav><img src="/logo.png" alt="Logo"><ul>""" +
        (1 to 8).map(i => s"""<li><a href="/$i">rubrik $i</a></li>""").mkString +
        "</ul></nav>" +
        ctx +
        """<img src="/media/fig1.jpg" alt="Abbildung &uuml;ber die Lage">""" +
        ctx +
        """<img src="/media/fig2.jpg" alt="">"""  // trailing, kept block before
    val doc = HtmlExtract.extractRow("d", page)
    val imgs = doc.spans.filter(_.kind == "image")
    assert(imgs.map(_.media_ref) == Vector("/media/fig1.jpg", "/media/fig2.jpg"),
      doc.spans.map(s => (s.kind, s.media_ref)))
    assert(imgs.head.text == "Abbildung über die Lage") // alt entity-decoded
    // interleaved order: body, image, body, trailing image
    assert(doc.spans.map(_.kind) == Vector("body", "image", "body", "image"))
    // offsets stay the emission order across kinds
    assert(doc.spans.map(_.offset) == doc.spans.indices.map(identity))
    // images are NOT part of the text flow (reference drops media there)
    assert(!doc.text.contains("Abbildung"))
    // the nav logo anchored to a boilerplate block is gone
    assert(!doc.spans.exists(_.media_ref == "/logo.png"))
  }

  test("ul/ol items carry kind=list; headings inside lists stay headings") {
    val page = "<p>" + ("kontext worte des absatzes immer weiter " * 4) +
      "</p><ul>" +
      "<li>erster punkt mit genug worten um die regel zu halten</li>" +
      "<li>zweiter punkt ebenfalls mit ausreichend vielen langen worten</li>" +
      "</ul>"
    val doc = HtmlExtract.extractRow("d", page)
    assert(doc.spans.count(_.kind == "list") == 2,
      doc.spans.map(s => (s.kind, s.text.take(15))))
    assert(doc.spans.head.kind == "body")
    // an UNCLOSED <ul> inside a captured table (common in real markup)
    // must not leak list depth past the table: the following paragraph
    // is body, not list
    val leaky = "<table><tr><td><ul><li>punkt im feld</li></td></tr></table>" +
      "<p>" + ("danach laufen die worte des textes ganz normal weiter " * 4) + "</p>"
    val doc2 = HtmlExtract.extractRow("d2", leaky)
    assert(doc2.spans.exists(_.kind == "body"),
      doc2.spans.map(s => (s.kind, s.text.take(15))))
    assert(!doc2.spans.exists(_.kind == "list"),
      doc2.spans.map(s => (s.kind, s.text.take(15))))
  }

  test("byte-level ingest: charset sniffing ladder (BOM > transport > meta > content sniff)") {
    import graft.html.HtmlCharset
    val s = "früh 5 m² – ok" // umlaut + superscript + en-dash (all in 1252)
    // BOM beats a wrong transport label
    val bomd = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ s.getBytes("UTF-8")
    assert(HtmlCharset.decodeWithCharset(bomd, "text/html; charset=iso-8859-1")
      == ((s, "utf-8")))
    // transport iso-8859-1 is an ALIAS of windows-1252 (WHATWG label
    // table): 1252-encoded bytes labeled latin1 decode correctly,
    // including a 0x80-0x9F byte latin1 itself cannot mean
    val b1252 = HtmlCharset.encodeW1252(s)
    assert(HtmlCharset.decodeWithCharset(b1252, "Text/HTML; Charset=\"ISO-8859-1\"")
      == ((s, "windows-1252")))
    // meta prescan (first KB) when transport is silent; both meta forms
    val metaA = HtmlCharset.encodeW1252("<html><head><meta charset=windows-1252>" + s)
    assert(HtmlCharset.decodeWithCharset(metaA, null)._1.endsWith(s))
    val metaB = HtmlCharset.encodeW1252("<head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\">" + s)
    assert(HtmlCharset.decodeWithCharset(metaB, "text/html")._1.endsWith(s))
    // meta-declared utf-16 reads as utf-8 (spec: the prescan saw ASCII
    // tags, the stream is not 16-bit)
    val meta16 = ("<head><meta charset=utf-16>" + s).getBytes("UTF-8")
    assert(HtmlCharset.decodeWithCharset(meta16, null)._1.endsWith(s))
    // no declaration: valid UTF-8 sniffs as UTF-8...
    assert(HtmlCharset.decodeWithCharset(s.getBytes("UTF-8"), "text/html")
      == ((s, "utf-8")))
    // ...and invalid UTF-8 falls back to windows-1252
    assert(HtmlCharset.decodeWithCharset(b1252, null) == ((s, "windows-1252")))
    // the five 1252-undefined bytes decode to C1 controls (WHATWG), and
    // EVERY byte sequence decodes totally — never throws
    assert(HtmlCharset.decodeWithCharset(Array(0x81.toByte), null)._1 == "\u0081")
    val junk = Array(0xC3.toByte, 0x28.toByte, 0xFF.toByte, 0x00.toByte)
    assert(HtmlCharset.decodeWithCharset(junk, "charset=utf-8")._1.nonEmpty)
    // unknown label: ladder continues, not fatal
    assert(HtmlCharset.decodeWithCharset(s.getBytes("UTF-8"),
      "text/html; charset=klingon-8")._2 == "utf-8")
    // UTF-16 BOMs
    assert(HtmlCharset.decodeWithCharset(
      Array(0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE"), null)
      == ((s, "utf-16le")))
    assert(HtmlCharset.decodeWithCharset(
      Array(0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE"), null)
      == ((s, "utf-16be")))
    // a REAL other charset via the JDK registry tail (iso-8859-15: € at 0xA4)
    assert(HtmlCharset.decodeWithCharset("€uro".getBytes("ISO-8859-15"),
      "text/html; charset=iso-8859-15")._1 == "€uro")
  }

  test("binary-magic sniff: compressed/mislabeled payloads refuse to decode, never 1252 noise") {
    import graft.html.HtmlCharset
    val html = "<p>echter text</p>".getBytes("UTF-8")
    // a gzip'd body whose transport header lies text/html: the old path
    // decoded it as windows-1252 mojibake with no failure signal
    val gz = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(html); g.close()
      out.toByteArray
    }
    assert(HtmlCharset.decodeWithCharset(gz, "text/html; charset=utf-8")
      == ((null, "binary")))
    // other unmistakable containers refuse too
    for (magic <- Seq("PKrest", "GIF89a...", "%PDF-1.7", "OggS..",
        "RIFF....WEBP"))
      assert(HtmlCharset.decodeWithCharset(
        magic.getBytes("ISO-8859-1"), "text/html") == ((null, "binary")), magic)
    assert(HtmlCharset.decodeWithCharset(
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte), "text/html")
      == ((null, "binary")))
    assert(HtmlCharset.decodeWithCharset(
      "xxxxftypisom".getBytes("US-ASCII"), "text/html") == ((null, "binary")))
    // near-misses stay text: a page STARTING with 'PK' but not the zip
    // magic, or mentioning RIFF mid-text
    assert(HtmlCharset.decodeWithCharset("PK ist ok".getBytes("UTF-8"),
      "text/html")._1 == "PK ist ok")
    assert(HtmlCharset.decodeWithCharset("<p>RIFF</p>".getBytes("UTF-8"),
      "text/html")._1 == "<p>RIFF</p>")
    // the byte-level extract path counts a refused decode on its seam
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val acc = sp.sparkContext.longAccumulator("binary_refused")
    val df = sp.createDataset(Seq(
      ("doc-bin", gz, "text/html"),
      ("doc-ok", "<p>Inhalt gut hier.</p>".getBytes("UTF-8"), "text/html")))
      .toDF("doc_id", "html_bytes", "content_type")
    val out = graft.html.HtmlExtract.extractBytes(df, failedAcc = Some(acc))
      .collect()
    assert(out.map(_.doc_id).toSeq == Seq("doc-ok"))
    assert(acc.value == 1L)
  }

  test("meta prescan: charset= inside an unrelated attribute VALUE no longer selects; comments skipped") {
    import graft.html.HtmlCharset
    val s = "früh 5 m² – ok"
    // the ADVICE case: a description mentioning charset=euc-jp must NOT
    // drive the decode (the real declaration follows)
    val tricky = HtmlCharset.encodeW1252(
      "<head><meta name=description content=\"wie man charset=euc-jp setzt\">" +
      "<meta charset=windows-1252>" + s)
    val decTricky = HtmlCharset.decodeWithCharset(tricky, null)
    assert(decTricky._2 == "windows-1252" && decTricky._1.endsWith(s))
    // no real declaration at all: the description mention alone selects
    // nothing and the ladder falls through to the content sniff
    val onlyMention = ("<head><meta name=description " +
      "content=\"charset=euc-jp erklärt\"><body>" + s).getBytes("UTF-8")
    assert(HtmlCharset.decodeWithCharset(onlyMention, null)._2 == "utf-8")
    // a commented-out declaration is skipped (spec prescan behavior)
    val commented = ("<head><!-- <meta charset=shift_jis> -->" +
      "<meta charset=utf-8>" + s).getBytes("UTF-8")
    assert(HtmlCharset.decodeWithCharset(commented, null)._2 == "utf-8")
    // http-equiv only counts when it IS content-type
    val wrongEquiv = ("<head><meta http-equiv=refresh " +
      "content=\"0; url=x?charset=koi8-r\">" + s).getBytes("UTF-8")
    assert(HtmlCharset.decodeWithCharset(wrongEquiv, null)._2 == "utf-8")
    // single-quoted and unquoted attribute values both parse
    val quoted = HtmlCharset.encodeW1252(
      "<meta charset='windows-1252'>" + s)
    assert(HtmlCharset.decodeWithCharset(quoted, null)._2 == "windows-1252")
  }

  test("meta prescan: an unresolvable declaration does not end the scan (continue-on-failed-get-an-encoding)") {
    import graft.html.HtmlCharset
    // unquoted self-closing `<meta charset=utf-8/>` captures 'utf-8/'
    // (unresolvable); the spec's prescan CONTINUES to the next <meta> —
    // pre-fix the scan gave up and fell to the content sniff. The body
    // bytes are crafted UTF-8-valid so the sniff would pick utf-8: only
    // the continued scan reaches the real windows-1252 declaration.
    val eAcute = Array[Byte](0xC3.toByte, 0xA9.toByte) // UTF-8 'é'
    val head = ("<head><meta charset=utf-8/>" +
      "<meta charset=windows-1252><body>").getBytes("US-ASCII")
    val page = head ++ eAcute
    val (text, label) = HtmlCharset.decodeWithCharset(page, null)
    assert(label == "windows-1252", label)
    assert(text.endsWith("Ã©"), text) // 1252 view of C3 A9
    // same continuation past a bogus http-equiv content charset
    val bogusFirst = ("<head><meta http-equiv=content-type " +
      "content=\"text/html; charset=no-such-enc\">" +
      "<meta charset=windows-1252><body>").getBytes("US-ASCII") ++ eAcute
    assert(HtmlCharset.decodeWithCharset(bogusFirst, null)._2 ==
      "windows-1252")
    // and with NO later declaration the ladder still falls through
    val onlyBroken = ("<head><meta charset=utf-8/><body>")
      .getBytes("US-ASCII") ++ eAcute
    assert(HtmlCharset.decodeWithCharset(onlyBroken, null)._2 == "utf-8")
    // a charset ATTRIBUTE claims the whole tag (spec prescan): an
    // unresolvable one must NOT fall through to the SAME tag's
    // http-equiv/content declaration — the scan abandons the tag
    val sameTag = ("<head><meta charset=bogus-enc " +
      "http-equiv=content-type " +
      "content=\"text/html; charset=windows-1252\"><body>")
      .getBytes("US-ASCII") ++ eAcute
    assert(HtmlCharset.decodeWithCharset(sameTag, null)._2 == "utf-8")
    // ...while the same pragma on the NEXT tag is still honored
    val nextTag = ("<head><meta charset=bogus-enc>" +
      "<meta http-equiv=content-type " +
      "content=\"text/html; charset=windows-1252\"><body>")
      .getBytes("US-ASCII") ++ eAcute
    assert(HtmlCharset.decodeWithCharset(nextTag, null)._2 ==
      "windows-1252")
  }

  test("byte-level ingest: mixed-encoding corpus extracts identically to the string path") {
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val n = 10
    val strPages = sp.createDataset(graft.fixtures.HtmlFixtures.corpus(n))
      .toDF("doc_id", "html")
    val bytePages = sp.createDataset(graft.fixtures.HtmlFixtures.bytesCorpus(n))
      .toDF("doc_id", "html_bytes", "content_type")
    def norm(docs: Seq[graft.model.ExtractedDoc]) =
      docs.sortBy(_.doc_id).map(d => (d.doc_id, d.spans, d.text))
    val viaString = norm(HtmlExtract.extract(strPages).collect().toSeq)
    val viaBytes = norm(graft.html.HtmlExtract.extractBytes(bytePages,
      htmlCol = "html_bytes", contentTypeCol = Some("content_type"))
      .collect().toSeq)
    assert(viaBytes == viaString)
    // null bytes row: failure seam counts it, row drops, job survives
    val acc = sp.sparkContext.longAccumulator("failed")
    val withNull = bytePages.unionByName(Seq(
      ("broken", null.asInstanceOf[Array[Byte]], "text/html"))
      .toDF("doc_id", "html_bytes", "content_type"))
    assert(graft.html.HtmlExtract.extractBytes(withNull, htmlCol = "html_bytes",
      contentTypeCol = Some("content_type"), failedAcc = Some(acc))
      .count() == n)
    assert(acc.value == 1L)
  }

  test("extractAll: one tokenize pass == the three single-surface operators, field for field") {
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val pages = sp.createDataset(graft.fixtures.HtmlFixtures.corpus(6))
      .toDF("doc_id", "html")
      .withColumn("url", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("https://ex.org/seite/"),
        org.apache.spark.sql.functions.col("doc_id")))
    val all = HtmlExtract.extractAll(pages, pageUrlCol = Some("url"))
      .collect().map(w => w.doc_id -> w).toMap
    // spans + text == extract()
    HtmlExtract.extract(pages).collect().foreach { d =>
      assert(all(d.doc_id).spans == d.spans, d.doc_id)
      assert(all(d.doc_id).text == d.text, d.doc_id)
    }
    // links == extractLinks(pageUrlCol)
    val links = HtmlExtract.extractLinks(pages, pageUrlCol = Some("url"))
      .collect().groupBy(_.getString(0))
    links.foreach { case (id, rows) =>
      assert(all(id).links == rows.sortBy(_.getInt(1)).toSeq.map(r =>
        HtmlExtract.LinkRow(r.getInt(1), r.getString(2), r.getString(3),
          r.getString(4))), id)
    }
    // metadata == extractPageMeta() (same pageUrl, so same resolved canonical)
    HtmlExtract.extractPageMeta(pages, pageUrlCol = Some("url")).collect().foreach { r =>
      val w = all(r.getString(0))
      assert((w.title, w.lang, w.canonical, w.description, w.robots, w.base) ==
        ((r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          r.getString(5), r.getString(6))), r.getString(0))
    }
  }

  test("web image spans compose with the media pipeline (syntheticMediaFor -> features)") {
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    // extracted HTML docs carry kind=image spans with media_ref — exactly
    // the shape syntheticMediaFor keys on, so the whole multimodal stack
    // (payloads -> meta -> features -> ANN) runs on a web corpus unchanged
    val pages = sp.createDataset(graft.fixtures.HtmlFixtures.corpus(4))
      .toDF("doc_id", "html")
    val docs = HtmlExtract.extract(pages).toDF()
    val media = graft.ops.Multimodal.syntheticMediaFor(docs)
    val feats = graft.ops.Multimodal.extractFeatures(media, 16).collect()
    // 4 pages x 1 article figure x (bmp + anim + mjpg + mp4 siblings)
    assert(feats.length == 16, feats.length)
    assert(feats.forall(_.getSeq[Float](2).length == 16))
    val meta = graft.ops.Multimodal.extractMeta(media).collect()
    assert(meta.map(_.getAs[String]("format")).distinct.sorted.toSeq ==
      Seq("avi", "bmp", "mp4"))
  }

  test("SpanMarkdown: unified span stream renders to training-shape markdown") {
    import graft.assemble.SpanMarkdown
    // CSV line parse is the exact inverse of the table-cell quoting
    assert(SpanMarkdown.parseCsvLine("2025,\"Ein \"\"Zitat\"\"\",\"a,b\"") ==
      Vector("2025", "Ein \"Zitat\"", "a,b"))
    assert(SpanMarkdown.parseCsvLine("nur") == Vector("nur"))
    assert(SpanMarkdown.parseCsvLine("a,,c") == Vector("a", "", "c"))
    // external (non-RFC-4180) CSV — PDF-side Parsr pass-through tables:
    // a bare quote mid-cell is literal, it must NOT open a quoted run
    // and swallow the delimiter
    assert(SpanMarkdown.parseCsvLine("5\" nagel,x") == Vector("5\" nagel", "x"))
    assert(SpanMarkdown.parseCsv("a\"b\nc,d") ==
      Vector(Vector("a\"b"), Vector("c", "d")))
    // quote-aware at the ROW level too: a quoted cell may contain
    // newlines (legal in the PDF side's Parsr pass-through tables)
    assert(SpanMarkdown.parseCsv("a,\"x\ny\"\nb,c") ==
      Vector(Vector("a", "x\ny"), Vector("b", "c")))
    // full fixture page: headings leveled, lists dashed, tables piped,
    // images as interleaved placeholders
    val (id, html) = graft.fixtures.HtmlFixtures.corpus(1).head
    val md = SpanMarkdown.render(HtmlExtract.extractRow(id, html).spans)
    assert(md.contains("# "), md.take(200))      // h1
    assert(md.contains("## "), md)               // h2
    assert(md.split("\n").count(_.startsWith("- ")) == 3, md)
    assert(md.contains("| Jahr | "), md)         // the REAL header row
    assert(md.contains("| --- | --- | --- |"), md)
    // the single-cell <caption> row renders as an italic caption line
    // ABOVE the table, not as a bogus header
    assert("\\*[^*\n]+\\*\n\n\\| Jahr \\|".r.findFirstIn(md).isDefined, md)
    assert(md.contains("![") && md.contains("](/media/"), md)
    assert(!md.contains("\n\n\n"))
    // cell round-trip through capture + render: a '|' in a cell is escaped
    val tricky = "<p>" + ("kontext worte hier laufen weiter immer " * 4) +
      "</p><table><tr><td>a|b</td><td>c</td></tr></table>"
    val md2 = SpanMarkdown.render(HtmlExtract.extractRow("t", tricky).spans)
    assert(md2.contains("| a\\|b | c |"), md2)
    // the operator face runs distributed and matches the kernel per doc
    val sp = spark
    sparkUsed = true
    import sp.implicits._
    val pages = sp.createDataset(graft.fixtures.HtmlFixtures.corpus(3))
      .toDF("doc_id", "html")
    val docs = HtmlExtract.extract(pages).toDF()
    val viaOp = SpanMarkdown.renderDocs(docs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    HtmlExtract.extract(pages).collect().foreach { d =>
      assert(viaOp(d.doc_id) == SpanMarkdown.render(d.spans), d.doc_id)
    }
    // the PDF kernel's span stream renders through the same function:
    // its heading spans carry no hN level (level-1 '#', matching
    // DocumentOutput.text(markdown=true)'s minimalism), bodies verbatim
    val pdfDoc = graft.extract.Extractor.extractRow(
      graft.fixtures.Fixtures.flagshipDoc, graft.reflow.ExtractConfig())
    val md3 = SpanMarkdown.render(pdfDoc.spans)
    assert(md3.nonEmpty)
    // null cells from external span tables render empty, never NPE
    import graft.model.Span
    assert(SpanMarkdown.render(Seq(
      Span("table", null, null, 0), Span("heading", null, null, 1),
      Span("image", null, null, 2))) == "# \n\n![]()")
    assert(pdfDoc.spans.forall(s => s.kind != "heading") ||
      md3.linesIterator.exists(_.startsWith("# ")), md3.take(200))
    assert(!md3.contains("\n\n\n"))
  }

  test("fixture corpus: every page keeps its article, drops its chrome") {
    graft.fixtures.HtmlFixtures.corpus(10).foreach { case (id, html) =>
      val doc = HtmlExtract.extractRow(id, html)
      assert(doc.spans.exists(s => s.kind == "heading" && s.media_ref == "h1"), id)
      assert(doc.spans.count(_.kind == "body") >= 3, id)
      // the article's data table and bullet list survive with their kinds
      val table = doc.spans.filter(_.kind == "table")
      assert(table.length == 1 && table.head.text.split("\n").length == 4, id)
      assert(table.head.text.contains("Jahr,"), id)
      assert(doc.spans.count(_.kind == "list") == 3, id)
      // the article figure survives as a media span; logo + pixel do not
      val media = doc.spans.filter(_.kind == "image")
      assert(media.length == 1 && media.head.media_ref.endsWith("/fig1.jpg"), id)
      assert(!doc.text.contains("Impressum"), id)
      assert(!doc.text.contains("Rubrik"), id)
      assert(!doc.text.contains("Cookies"), id)
    }
  }
}
