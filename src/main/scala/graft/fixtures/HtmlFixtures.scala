package graft.fixtures

/** Deterministic synthetic web pages for the HTML main-content extractor:
  * realistic boilerplate anatomy (nav bar, sidebar link list, cookie
  * banner, related-links, footer) around a seeded article (h1 + h2 +
  * body paragraphs from the shared fixture vocabulary). Pure function of
  * the seed — the x11 gate golden freezes the extraction of this corpus.
  */
object HtmlFixtures {

  private val vocab = Fixtures.bodyVocab

  private def para(rng: Fixtures.Rng, nWords: Int): String =
    (0 until nWords).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")

  def page(docId: String, seed: Long): String = {
    val rng = new Fixtures.Rng(seed)
    val navItems = (1 to 6)
      .map(i => s"""<li><a href="/section$i">Rubrik $i</a></li>""")
      .mkString
    val sidebar = (1 to 8)
      .map(i => s"""<li><a href="/artikel/$i">${para(rng, 3)}</a></li>""")
      .mkString
    val paras = (0 until 3 + rng.nextInt(3)).map { k =>
      // RELATIVE href (no leading slash): resolves against the declared
      // <base href> on base-bearing pages, against the fetch URL's
      // directory otherwise — the x13 golden pins both resolutions
      val link =
        if (k == 1) s"""<a href="ref/$docId">${para(rng, 2)}</a> """ else ""
      s"<p>$link${para(rng, 18 + rng.nextInt(18))}</p>"
    }.mkString("\n")
    // content structure inside the article: a small data table (CSV-ish
    // table-span capture) and a bullet list (list-span kind) — x11 pins
    // that both SURVIVE classification and carry their span kinds
    val dataTable =
      s"""<table><caption>${para(rng, 3)}</caption>
         |<tr><th>Jahr</th><th>${para(rng, 1)}</th><th>Wert</th></tr>
         |<tr><td>2024</td><td>${para(rng, 2)}</td><td>${rng.nextInt(100)}</td></tr>
         |<tr><td>2025</td><td>${para(rng, 2)}, ${para(rng, 1)}</td><td>${rng.nextInt(100)}</td></tr>
         |</table>""".stripMargin
    val bullets = (0 until 3)
      .map(_ => s"<li>${para(rng, 7 + rng.nextInt(3))}</li>")
      .mkString("<ul>", "", "</ul>")
    // interleaved media: an article figure (kept, media_ref span) vs the
    // nav logo + tracking pixel below (boilerplate anchors -> dropped)
    val figure =
      s"""<img src="/media/$docId/fig1.jpg" alt="${para(rng, 4)}">"""
    val related = (1 to 5)
      .map(i => s"""<li><a href="/mehr/$i">${para(rng, 4)}</a></li>""")
      .mkString
    s"""<!DOCTYPE html>
       |<html lang="de"><head><title>$docId &ndash; Beispielportal</title>
       |${
          // a seed subset declares its canonical RELATIVE (host comes
          // from the fetch URL via RFC 3986 resolution — x14 pins it) and
          // another subset uses a multi-token rel, both common in the wild
          if (seed % 3 == 0)
            s"""<link rel="canonical alternate" href="/artikel/$docId">"""
          else
            s"""<link rel="canonical" href="https://Example.org/artikel/$docId?utm_source=feed">"""
        }
       |${if (seed % 7 == 0) "<base href=\"/verzeichnis/\">" else ""}
       |<meta name="description" content="${para(rng, 8)}">
       |${if (seed % 5 == 0) "<meta name=\"robots\" content=\"noindex,nofollow\">" else ""}
       |<style>.x{color:red}</style>
       |<script>if (1 < 2) { track("$docId"); }</script>
       |</head>
       |<body>
       |<header><img src="/static/logo.svg" alt="Logo"><nav><ul>$navItems</ul></nav></header>
       |<img src="/t/pixel.gif" alt="">
       |<div class="cookie">Diese Seite verwendet <a href="/cookies">Cookies</a></div>
       |<div class="layout">
       |<aside><ul>$sidebar</ul></aside>
       |<article>
       |<h1>${para(rng, 5)}</h1>
       |$paras
       |$figure
       |$dataTable
       |$bullets
       |<h2>${para(rng, 4)}</h2>
       |<p>${para(rng, 20 + rng.nextInt(12))}</p>
       |</article>
       |</div>
       |<section class="related"><h3>Mehr zum Thema</h3><ul>$related</ul></section>
       |<footer><p><a href="/impressum">Impressum</a> &middot;
       |<a href="/datenschutz">Datenschutz</a> &copy; 2026</p></footer>
       |</body></html>""".stripMargin
  }

  /** (doc_id, html) rows, seeded. */
  def corpus(n: Int, seed: Long = 42L): Seq[(String, String)] =
    (0 until n).map(i => (f"web-$i%05d", page(f"web-$i%05d", seed + i)))

  /** Mixed-encoding BYTE corpus for the byte-level ingest gate: the same
    * synthetic pages, shipped the way a crawl delivers them — bytes plus
    * an (often wrong) Content-Type. Variant = i % 5:
    *
    *  0. UTF-8 bytes, correct transport charset;
    *  1. windows-1252 bytes MISLABELED as iso-8859-1 in transport (the
    *     canonical web mess — the WHATWG label table maps it to 1252);
    *  2. UTF-8 bytes WITH BOM and a wrong transport label (BOM wins);
    *  3. windows-1252 bytes, no transport charset, `<meta
    *     charset=windows-1252>` injected in the first KB (meta prescan);
    *  4. UTF-8 bytes, no declaration anywhere (valid-UTF-8 sniff).
    *
    * Variants 0/1/2/4 decode back to the exact page string; variant 3's
    * decoded page differs only by its injected meta tag (invisible to
    * extraction — head metas emit no spans), so byte-path extraction
    * must equal the string path for EVERY row. The pages are non-ASCII
    * (the fixture vocabulary carries umlauts), so a wrong ladder step is
    * visible, not masked by ASCII-only content.
    * Returns (doc_id, bytes, content_type-or-null).
    */
  def bytesCorpus(n: Int, seed: Long = 42L)
      : Seq[(String, Array[Byte], String)] =
    corpus(n, seed).zipWithIndex.map { case ((id, html), i) =>
      i % 5 match {
        case 0 => (id, html.getBytes("UTF-8"), "text/html; charset=utf-8")
        case 1 => (id, graft.html.HtmlCharset.encodeW1252(html),
          "text/html; charset=iso-8859-1")
        case 2 => (id, Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          html.getBytes("UTF-8"), "text/html; charset=iso-8859-1")
        case 3 => (id, graft.html.HtmlCharset.encodeW1252(html.replaceFirst(
          "<head>", "<head><meta charset=\"windows-1252\">")), null)
        case _ => (id, html.getBytes("UTF-8"), "text/html")
      }
    }

  /** A deterministic crawlable mini-web on one host — (url, html) rows
    * for the [[graft.pipeline.CrawlLoop]] surface. BFS layout:
    *
    *   /start  ->  /hop1/0 .. /hop1/{fanout-1}  ->  /hop2/… (depth layers)
    *
    * with the traps a crawl loop must absorb:
    *  - EVERY page links back to /start and to /impressum (refetch
    *    pressure — the fetched-set diff must suppress both forever);
    *  - every page links into /geheim/<i>, a subtree the companion
    *    robots.txt disallows; /geheim/0 EXISTS in the web, so a broken
    *    robots gate shows up as a fetched document, not a silent no-op;
    *  - /hop1/0 declares meta robots `noindex` (dropped from the corpus,
    *    its links still feed the frontier);
    *  - /hop1/1 declares rel=canonical to /hop1/0's url (canonical-
    *    priority dedup collapses the pair in-loop);
    *  - every page links to /tot/<i> — dead URLs with no page behind
    *    them (a simulated fetch resolves them to nothing).
    *
    * Leaf pages link only to the traps, so a loop given enough cycles
    * exhausts at depth+2 (layers, then impressum/geheim remainder).
    */
  def site(depth: Int, fanout: Int, host: String = "crawl.example",
      seed: Long = 99L): Seq[(String, String)] = {
    def url(path: String) = s"https://$host$path"
    def pageAt(path: String, title: String, links: Seq[(String, String)],
        noindex: Boolean, canonical: String, salt: Long): String = {
      val rng = new Fixtures.Rng(seed + salt)
      val body = links.map { case (h, a) =>
        s"""<p><a href="$h">$a</a> ${para(rng, 10 + rng.nextInt(6))}</p>"""
      }.mkString("\n")
      s"""<!DOCTYPE html>
         |<html lang="de"><head><title>$title</title>
         |${if (noindex) "<meta name=\"robots\" content=\"noindex\">" else ""}
         |${if (canonical != null) s"""<link rel="canonical" href="$canonical">""" else ""}
         |</head>
         |<body>
         |<article><h1>$title</h1>
         |<p>${para(rng, 20 + rng.nextInt(8))}</p>
         |$body
         |<p>${para(rng, 16 + rng.nextInt(8))}</p>
         |</article>
         |<footer><p><a href="/impressum">Impressum</a></p></footer>
         |</body></html>""".stripMargin
    }
    def traps(i: Int): Seq[(String, String)] =
      Seq(("/start", "Zur Startseite"), (s"/geheim/${i % 3}", "Intern"),
        (s"/tot/$i", "Archiv"))
    val layers = (1 to depth).map { h =>
      (0 until math.pow(fanout, h).toInt).map { i =>
        val children =
          if (h == depth) Seq.empty
          else (0 until fanout).map(j =>
            (s"/hop${h + 1}/${i * fanout + j}", s"Weiter $j"))
        val path = s"/hop$h/$i"
        (url(path), pageAt(path, s"Seite $h-$i", children ++ traps(i),
          noindex = h == 1 && i == 0,
          canonical = if (h == 1 && i == 1) url("/hop1/0") else null,
          salt = h * 1000L + i))
      }
    }.flatten
    val root = (url("/start"), pageAt("/start", "Start",
      (0 until fanout).map(j => (s"/hop1/$j", s"Einstieg $j")) ++ traps(0),
      noindex = false, canonical = null, salt = 1L))
    val impressum = (url("/impressum"), pageAt("/impressum", "Impressum",
      traps(1), noindex = false, canonical = null, salt = 2L))
    val geheim = (url("/geheim/0"), pageAt("/geheim/0", "Geheim",
      Seq.empty, noindex = false, canonical = null, salt = 3L))
    Seq(root, impressum, geheim) ++ layers
  }

  /** The companion robots.txt for [[site]]'s host: the /geheim subtree
    * is closed and a Crawl-delay paces the host.
    */
  def siteRobots(host: String = "crawl.example",
      crawlDelay: Double = 2.0): (String, String) =
    (host, s"User-Agent: *\nDisallow: /geheim/\nCrawl-delay: $crawlDelay\n")
}
