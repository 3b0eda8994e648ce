package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sitemap ingest (sitemaps.org protocol 0.9) — the crawl-frontier SEED
  * source. robots.txt advertises per-site sitemaps (`Sitemap:` lines,
  * extracted by [[graft.ops.RobotsTxt.sitemaps]]); each sitemap lists
  * the URLs the site WANTS crawled, with optional freshness hints. The
  * composed path:
  *
  *   robots.txt -> RobotsTxt.sitemaps -> fetch -> Sitemap.entries
  *     -> WebPrep.frontierFromSitemaps (canonicalize + dedup)
  *       -> WebPrep.frontierGated (robots rules) / frontierNew (minus
  *          the fetched set)
  *
  * Format notes (all from the public sitemaps.org spec):
  *  - XML `<urlset>`: `<url>` entries with required `<loc>` and optional
  *    `<lastmod>` (W3C datetime), `<changefreq>` (enumerated token),
  *    `<priority>` (0.0–1.0, default 0.5). Entity-escaped values
  *    (`&amp;` etc.) — XML's five predefined entities plus numeric
  *    character references, NOT the HTML5 long tail;
  *  - XML `<sitemapindex>`: `<sitemap><loc>` child-sitemap references —
  *    an index never carries page URLs directly;
  *  - plain-text sitemaps: one absolute http(s) URL per line;
  *  - `.gz` variants of both; files are UTF-8 (BOM tolerated);
  *  - spec caps: 50,000 entries / 50 MB uncompressed per file — parse
  *    enforces both, so one hostile/buggy sitemap cannot balloon a task
  *    (a capped file keeps its first `maxEntries` rows; the truncation
  *    is surfaced in `Parsed.truncated` and on `failedAcc`).
  *
  * Scale shape: same as [[Warc]] — one streaming task per file via
  * `binaryFiles`, map-only, memory bounded by the 50 MB spec cap, not
  * the file count. Millions of sitemap files (the Common Crawl case)
  * spread as ordinary file partitions.
  *
  * The parser is a hand-rolled tag scanner, NOT a general XML parser:
  * sitemap files are machine-generated element-text-element documents,
  * and the scanner needs exactly open-tag / text / close-tag with
  * namespace-prefix tolerance. (Reference analogue: none — pd3f owns no
  * crawl side; the builder's web mandate is the source.)
  */
object Sitemap {

  /** One `<url>` entry. `priority` keeps the raw string form so the
    * frozen-gate representation is exact (no double round-trip).
    */
  final case class Entry(
      loc: String, lastmod: String, changefreq: String, priority: String)

  /** One parsed sitemap file. `kind` ∈ urlset | sitemapindex | text;
    * `children` holds a sitemapindex's child-sitemap locations (empty
    * for the other kinds).
    */
  final case class Parsed(
      kind: String, entries: Vector[Entry], children: Vector[String],
      truncated: Boolean)

  /** Spec cap: URLs per sitemap file. */
  val MaxEntries = 50000
  /** Spec cap: uncompressed octets per sitemap file. */
  val MaxBytes = 50L * 1024 * 1024

  /** XML entity decode: the five predefined entities + numeric character
    * references — the complete set XML guarantees (sitemaps are XML, so
    * the HTML5 name table does NOT apply). Unknown/unterminated
    * references stay verbatim, mirroring the HTML kernel's convention.
    */
  private[graft] def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded: String =
          if (semi < 0 || semi - i > 12) null
          else {
            val name = s.substring(i + 1, semi)
            name match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case _ if name.startsWith("#") =>
                val cp =
                  if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
                    try Integer.parseInt(name.substring(2), 16) catch { case _: Exception => -1 }
                  else
                    try Integer.parseInt(name.substring(1)) catch { case _: Exception => -1 }
                if (cp >= 0 && cp <= 0x10FFFF &&
                    !(cp >= 0xD800 && cp <= 0xDFFF) && cp != 0)
                  new String(Character.toChars(cp))
                else null
              case _ => null
            }
          }
        if (decoded != null) { sb.append(decoded); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Decompress-if-gzip + cap + UTF-8 decode (BOM stripped). */
  private def decode(bytes: Array[Byte]): String = {
    val raw: Array[Byte] =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1f && (bytes(1) & 0xFF) == 0x8b) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 1 << 16)
        val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          require(out.size() <= MaxBytes,
            s"sitemap exceeds the spec's $MaxBytes-byte uncompressed cap")
          n = in.read(buf)
        }
        out.toByteArray
      } else bytes
    require(raw.length <= MaxBytes,
      s"sitemap exceeds the spec's $MaxBytes-byte uncompressed cap")
    val off = if (raw.length >= 3 && (raw(0) & 0xFF) == 0xEF &&
      (raw(1) & 0xFF) == 0xBB && (raw(2) & 0xFF) == 0xBF) 3 else 0
    new String(raw, off, raw.length - off, "UTF-8")
  }

  /** Local name of a tag token (prefix dropped, attrs dropped). */
  private def localName(tagBody: String): String = {
    val name = tagBody.takeWhile(ch => !ch.isWhitespace && ch != '/' && ch != '>')
    val colon = name.indexOf(':')
    (if (colon >= 0) name.substring(colon + 1) else name)
      .toLowerCase(java.util.Locale.ROOT)
  }

  /** Parse one sitemap file (bytes as fetched; `.gz` autodetected).
    * `maxEntries` is parameterized for tests; production uses the spec
    * cap.
    */
  def parse(bytes: Array[Byte], maxEntries: Int = MaxEntries): Parsed = {
    val text = decode(bytes)
    // XML iff the first non-whitespace char opens a tag; else text sitemap
    val firstNonWs = text.indexWhere(!_.isWhitespace)
    if (firstNonWs < 0) return Parsed("text", Vector.empty, Vector.empty, truncated = false)
    if (text.charAt(firstNonWs) != '<') {
      // text sitemap: one absolute http(s) URL per line; other lines
      // are ignored per spec (no comments defined — be conservative)
      val urls = Vector.newBuilder[Entry]
      var count = 0
      var truncated = false
      text.split("\r\n|\r|\n").foreach { raw =>
        val line = raw.trim
        if (line.startsWith("http://") || line.startsWith("https://")) {
          if (count < maxEntries) { urls += Entry(line, "", "", ""); count += 1 }
          else truncated = true
        }
      }
      return Parsed("text", urls.result(), Vector.empty, truncated)
    }

    // tag scan: walk <...> tokens, tracking the element path we care
    // about; text between a field tag and its close tag is the value
    var i = firstNonWs
    var rootKind: String = null // urlset | sitemapindex
    var inRecord = false        // inside <url> / <sitemap>
    var field: String = null    // loc | lastmod | changefreq | priority
    val textBuf = new java.lang.StringBuilder
    var loc = ""; var lastmod = ""; var changefreq = ""; var priority = ""
    val entries = Vector.newBuilder[Entry]
    val children = Vector.newBuilder[String]
    var count = 0
    var truncated = false

    def endRecord(): Unit = {
      if (loc.nonEmpty) {
        if (count < maxEntries) {
          if (rootKind == "sitemapindex") children += loc
          else entries += Entry(loc, lastmod, changefreq, priority)
          count += 1
        } else truncated = true
      }
      loc = ""; lastmod = ""; changefreq = ""; priority = ""
    }

    while (i < text.length) {
      val lt = text.indexOf('<', i)
      if (lt < 0) { i = text.length }
      else {
        if (field != null) textBuf.append(text, i, lt)
        val gt = text.indexOf('>', lt + 1)
        if (gt < 0) { i = text.length } // truncated tag: stop cleanly
        else {
          val body = text.substring(lt + 1, gt)
          if (body.startsWith("!--")) {
            // comment: skip to -->
            val end = text.indexOf("-->", lt + 4)
            i = if (end < 0) text.length else end + 3
          } else if (body.startsWith("?") || body.startsWith("!")) {
            i = gt + 1 // prolog / doctype
          } else if (body.startsWith("/")) {
            val name = localName(body.substring(1))
            name match {
              case "loc" | "lastmod" | "changefreq" | "priority" if field == name =>
                val v = xmlUnescape(textBuf.toString.trim)
                name match {
                  case "loc" => loc = v
                  case "lastmod" => lastmod = v
                  case "changefreq" => changefreq = v
                  case "priority" => priority = v
                }
                field = null; textBuf.setLength(0)
              case "url" | "sitemap" if inRecord =>
                inRecord = false; endRecord()
              case _ => ()
            }
            i = gt + 1
          } else {
            val name = localName(body)
            val selfClosing = body.endsWith("/")
            name match {
              case "urlset" | "sitemapindex" if rootKind == null =>
                rootKind = name
              case "url" | "sitemap" if rootKind != null && !inRecord =>
                inRecord = true
                loc = ""; lastmod = ""; changefreq = ""; priority = ""
              case "loc" | "lastmod" | "changefreq" | "priority"
                  if inRecord && !selfClosing =>
                field = name; textBuf.setLength(0)
              case _ => ()
            }
            i = gt + 1
          }
        }
      }
    }
    if (inRecord) endRecord() // tolerate a truncated trailing record
    Parsed(if (rootKind == null) "text" else rootKind,
      entries.result(), children.result(), truncated)
  }

  /** The distributed face: every entry of every sitemap file under
    * `path` (glob ok; `.xml`, `.txt`, `.gz`) as frontier-seed rows:
    *
    *   (sitemap = file path, kind, loc, lastmod, changefreq, priority)
    *
    * `kind` is "url" for page entries and "sitemap" for a sitemapindex's
    * child references (which a crawl loop fetches and feeds back through
    * this same operator — the index expansion is a FETCH, so it cannot
    * happen inside one pass). A malformed/oversized file contributes no
    * rows and counts once on `failedAcc`; a spec-cap truncation keeps
    * the parsed prefix and also counts. `minPartitions` 0 = auto (6x
    * total cores — see the straggler note on [[Warc.responses]]).
    */
  def entries(spark: SparkSession, path: String, minPartitions: Int = 0,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path, Warc.autoParts(spark, minPartitions))
      .flatMap { case (file, pds) =>
        try {
          val p = parse(pds.toArray())
          if (p.truncated) failedAcc.foreach(_.add(1L))
          p.entries.map(e =>
            (file, "url", e.loc, e.lastmod, e.changefreq, e.priority)) ++
            p.children.map(c => (file, "sitemap", c, "", "", ""))
        } catch {
          case scala.util.control.NonFatal(_) =>
            failedAcc.foreach(_.add(1L)); Nil
        }
      }
      .toDF("sitemap", "kind", "loc", "lastmod", "changefreq", "priority")
  }
}
