package graft.ops

/** RFC 9309 robots.txt engine: the fetch-side companion of WebPrep's
  * meta-robots gate. A compliant crawl pipeline must gate its frontier
  * against per-host robots.txt BEFORE fetching (meta robots can only
  * gate what was already fetched).
  *
  * Parsing (RFC 9309 §2.2):
  *  - lines are `field: value` records; `#` starts a comment; unknown
  *    fields are ignored (§2.2.4 allows extensions — we skip them);
  *  - consecutive `user-agent` lines open ONE group served by all the
  *    named agents; `allow` / `disallow` lines attach to the open group;
  *    a `user-agent` line after rules starts a new group;
  *  - rules before any user-agent line are ignored (no group to attach
  *    to, per the ABNF);
  *  - an empty-value `disallow:` allows everything (historic idiom).
  *
  * Group selection (§2.2.1): case-insensitive product-token match; ALL
  * groups matching the token merge; when none match, the `*` groups
  * apply; a crawler token like "ExampleBot/1.2" matches the group token
  * "examplebot" (token = up to the first `/`).
  *
  * Rule matching (§2.2.2): longest-match wins, measured in pattern
  * octets; an `allow` beats a `disallow` of equal length; no matching
  * rule means allowed (including: no robots.txt at all). Patterns are
  * path prefixes with `*` (any octet run) and a trailing `$` (end
  * anchor); matching starts at the first path octet.
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** RFC 9309 §2.4 parse cap: crawlers must parse at least 500 KiB and
    * MAY ignore the rest — the scale guard that keeps a hostile
    * multi-megabyte robots.txt from ballooning the per-host compile on
    * the broadcast side. Applied at the CHARACTER level before line
    * splitting (the partial last line is dropped so a rule is never
    * half-read); content past the cap reads as absent, the same
    * more-permissive direction the large crawlers take.
    */
  val MaxParseChars: Int = 500 * 1024

  private def capped(content: String): String = {
    if (content == null || content.length <= MaxParseChars) return content
    val cut = content.substring(0, MaxParseChars)
    // parse()/sitemaps() split on \r\n|\r|\n — the cut must respect the
    // SAME line alphabet, or a CR-only (old-Mac) file over the cap is
    // severed mid-line and a rule half-reads as a shorter wrong pattern
    val nl = math.max(cut.lastIndexOf('\n'), cut.lastIndexOf('\r'))
    if (nl >= 0) cut.substring(0, nl) else cut
  }

  /** `delay` carries the group's `Crawl-delay:` seconds when present —
    * an RFC 9309 §2.2.4 extension field honored by the large non-Google
    * crawlers (Bing/Yandex semantics: a group RULE line, like allow/
    * disallow — so it ENDS a run of consecutive user-agent lines; in
    * `ua: slowbot / crawl-delay: 60 / ua: *` the `*` opens a NEW group
    * and slowbot's delay does not leak onto every other crawler). Kept
    * OUT of rule matching entirely. Last valid value in a group wins; a
    * negative or non-numeric value is ignored. Other extension fields
    * (sitemap, …) remain fully transparent to grouping.
    */
  final case class Group(agents: Vector[String], rules: Vector[Rule],
      delay: Option[Double] = None)

  /** Raw group structure (spec vectors + diagnostics). */
  def parse(content0: String): Vector[Group] = {
    if (content0 == null) return Vector.empty
    val content = capped(content0)
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inAgents = false // consecutive user-agent lines accumulate
    def flush(): Unit =
      if (agents.nonEmpty) { groups += Group(agents, rules, delay) }
    content.split("\r\n|\r|\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) {
              flush(); agents = Vector.empty; rules = Vector.empty
              delay = None
            }
            inAgents = true
            agents :+= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if agents.nonEmpty =>
            inAgents = false
            // empty disallow = allow all: a no-op rule, recorded as an
            // empty-pattern allow so the group stays non-vacuous
            if (value.nonEmpty || field == "disallow")
              rules :+= Rule(field == "allow" || value.isEmpty, value)
          case "crawl-delay" if agents.nonEmpty =>
            // a group rule line (Bing/Yandex semantics): ends the agent
            // run like allow/disallow, so a following user-agent line
            // starts a NEW group (see the Group scaladoc)
            inAgents = false
            value.toDoubleOption.filter(d => d >= 0 && !d.isInfinite)
              .foreach(d => delay = Some(d))
          // unknown fields (sitemap, other extensions) are fully
          // transparent: they neither attach to the group nor split a
          // run of consecutive user-agent lines (the de-facto parser
          // behavior of the large crawlers)
          case _ => ()
        }
      }
    }
    flush()
    groups.result()
  }

  /** The `Sitemap:` advertisements of a robots.txt — sitemaps.org's
    * discovery mechanism, carried as an RFC 9309 extension field.
    * Global, not group-scoped (the spec places them outside any group);
    * values are absolute URLs, kept verbatim (they key a FETCH, so
    * canonicalization happens frontier-side). Field name matching is
    * case-insensitive like every robots field; relative values are
    * dropped (the spec requires absolute).
    */
  def sitemaps(content0: String): Vector[String] = {
    if (content0 == null) return Vector.empty
    val content = capped(content0)
    val out = Vector.newBuilder[String]
    content.split("\r\n|\r|\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim
            .equalsIgnoreCase("sitemap")) {
        val value = line.substring(colon + 1).trim
        if (value.startsWith("http://") || value.startsWith("https://"))
          out += value
      }
    }
    out.result()
  }

  private def tokenOf(userAgent: String): String = {
    val ua = if (userAgent == null) "*" else userAgent
    ua.takeWhile(_ != '/').trim.toLowerCase(java.util.Locale.ROOT)
  }

  /** §2.2.1 group selection: ALL groups naming the token merge; the `*`
    * groups apply only when none do.
    */
  private def groupsFor(content: String, userAgent: String): Vector[Group] = {
    val groups = parse(content)
    val tok = tokenOf(userAgent)
    val specific = groups.filter(_.agents.contains(tok))
    if (specific.nonEmpty && tok != "*") specific
    else groups.filter(_.agents.contains("*"))
  }

  /** The merged rule set governing `userAgent` (§2.2.1 group selection). */
  def rulesFor(content: String, userAgent: String): Vector[Rule] =
    groupsFor(content, userAgent).flatMap(_.rules)

  /** The `Crawl-delay:` seconds governing `userAgent`, under the same
    * group selection as [[rulesFor]]. When several matching groups carry
    * delays the MAXIMUM wins — the conservative merge for a politeness
    * bound (fetch no faster than any applicable group asks). None when
    * no matching group declares one (including: no robots.txt).
    */
  def crawlDelay(content: String, userAgent: String): Option[Double] = {
    val ds = groupsFor(content, userAgent).flatMap(_.delay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** RFC 9309 §2.2.2 percent-encoding equivalence: a rule `/foo%3Cbar`
    * must match a fetch of `/foo<bar` and vice versa, so BOTH sides are
    * normalized to one form before octet comparison — every `%XX`
    * decodes to its octet EXCEPT `%2F` (a decoded '/' would conflate an
    * encoded-slash path segment with a real separator) and, because on
    * the pattern side a decoded '$'/'*' would become a metacharacter,
    * `%24` and `%2A`; those three keep their encoded form, hex
    * uppercased so the two sides still compare equal. Idempotence
    * caveat handled: a decoded '%' (from `%25`) is re-escaped so a
    * second pass cannot re-decode what the first produced. Non-ASCII
    * octets decode to their single-byte char — both sides identically,
    * so comparisons stay octet-faithful.
    */
  private[graft] def normPercent(s: String): String = {
    if (s == null || s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val v = (hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2))
        if (v == 0x2F || v == 0x24 || v == 0x2A || v == 0x25)
          // kept encoded (separator/metachar/escape), one canonical case
          sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
        else sb.append(v.toChar)
        i += 3
      } else if (c == '%') {
        // a bare '%' (no valid hex pair) canonicalizes to its encoded
        // form so `/100%` and a rule's `/100%25` land on one spelling
        sb.append("%25"); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One robots pattern against a path (+query) — `*` wildcard, `$`
    * anchor, otherwise prefix semantics. Both sides are expected in
    * [[normPercent]] form (the public eval faces normalize once).
    */
  private[graft] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    // greedy wildcard prefix match, hand-rolled (no regex compile per
    // call): segments between '*' must appear in order; the first
    // segment must sit at offset 0; anchored ⇒ the last segment must
    // END the path
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment under $: must match at the very end, at/after pos
        if (!(path.length - seg.length >= pos && path.endsWith(seg)))
          return false
        pos = path.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored && segs.length == 1) pos == path.length else true
  }

  /** One rule pattern into compare form: an absolute-URL pattern
    * (`Disallow: http://ex.com/x` — a common authoring mistake the
    * reference parsers tolerate by extracting the path) reduces to its
    * path+query, then percent-normalizes like the path side.
    */
  private def normPattern(pattern: String): String =
    normPercent(
      if (pattern != null &&
          pattern.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")) pathOf(pattern)
      else pattern)

  /** §2.2.2 evaluation over a merged rule set. Pattern and path are
    * percent-normalized ([[normPercent]]) before octet comparison
    * (absolute-URL patterns reduce to their path first); longest-match
    * precedence is measured on the normalized pattern — consistently on
    * both eval faces, and identically for the allow and disallow rule
    * it arbitrates between.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val p = normPercent(path)
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      val pat = normPattern(r.pattern)
      if (patternMatches(pat, p)) {
        val len = pat.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Convenience: full decision from raw robots.txt + crawler UA + URL. */
  def allowed(content: String, userAgent: String, url: String): Boolean =
    allowed(rulesFor(content, userAgent), pathOf(url))

  /** The path (+query) robots matching runs on; a URL with no path reads
    * as "/". Fragments never reach a crawler.
    */
  private[graft] def pathOf(url: String): String = {
    if (url == null) return "/"
    val afterScheme = {
      val i = url.indexOf("://")
      if (i >= 0) i + 3 else 0
    }
    val slash = url.indexOf('/', afterScheme)
    val raw = if (slash < 0) "/" else url.substring(slash)
    val frag = raw.indexOf('#')
    if (frag >= 0) { val p = raw.substring(0, frag); if (p.isEmpty) "/" else p }
    else raw
  }

  // ---------- distributed faces (WebPrep.frontierGated plumbing) ----------
  // The heavy parse runs ONCE per host on the small rules side; per-URL
  // evaluation sees only the pre-compiled flat form. Compiled encoding:
  // one string per rule, "A<pattern>" / "D<pattern>" — flat so it
  // crosses the broadcast as a plain array<string> column.

  /** robots.txt -> the compiled per-UA rule array (small-side UDF).
    * Patterns are stored percent-NORMALIZED so the per-URL hot path
    * never re-normalizes the rule side.
    */
  def compiledRules(content: String, userAgent: String): Array[String] =
    rulesFor(content, userAgent)
      .map(r => (if (r.allow) "A" else "D") + normPattern(r.pattern)).toArray

  /** Per-URL decision over the compiled form (frontier-side UDF). */
  def allowedCompiled(compiled: Seq[String], url: String): Boolean = {
    if (compiled == null) return true
    val path = normPercent(pathOf(url))
    var bestLen = -1
    var bestAllow = true
    compiled.foreach { c =>
      val allow = c.charAt(0) == 'A'
      val pattern = c.substring(1)
      if (patternMatches(pattern, path)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow
        }
      }
    }
    bestAllow
  }
}
