package graft.html

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Byte-level HTML ingest: charset detection + decode, so the web kernel
  * can take pages the way a crawl actually delivers them — bytes plus an
  * (often wrong) Content-Type — instead of silently pushing the decode
  * burden onto the caller. The ladder is the browsers' (WHATWG Encoding +
  * HTML "determine the character encoding"), bounded to the cases crawl
  * corpora hit:
  *
  *  1. BOM sniff (UTF-8 / UTF-16LE / UTF-16BE) — a BOM beats every
  *     declaration, including the transport header;
  *  2. Content-Type `charset=` parameter (transport layer);
  *  3. bounded prefix scan (first 1024 bytes, like browsers) for a
  *     `<meta charset>` / `<meta http-equiv=content-type>` declaration;
  *  4. content sniff: bytes that validate as UTF-8 are UTF-8, anything
  *     else decodes as windows-1252 (the de-facto fallback of the web).
  *
  * Label resolution follows the WHATWG label table where it matters most:
  * `iso-8859-1` / `latin1` / `us-ascii` are ALIASES OF windows-1252 (the
  * canonical mislabeling mess — a page labeled latin1 that uses 0x80-0x9F
  * means the 1252 glyphs), a `<meta>`-declared UTF-16 is read as UTF-8
  * (per spec: the byte stream obviously wasn't 16-bit if ASCII scanning
  * found the tag), and `x-user-defined` maps to windows-1252. Labels
  * outside the table fall through to the JDK charset registry; unknown
  * labels are ignored (the ladder continues), never fatal.
  *
  * windows-1252 is decoded by our own WHATWG-faithful table — the JDK
  * decoder turns the five undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) into
  * U+FFFD, where the spec maps them to the C1 controls — so a decode is
  * total and deterministic for every possible byte. Malformed input under
  * a DECLARED multi-byte encoding decodes with U+FFFD replacement
  * (browser behavior), never throws.
  */
object HtmlCharset {

  /** WHATWG windows-1252, 0x80–0x9F row (the rest is ISO-8859-1 identity). */
  private val W1252High: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)
    .map(_.toChar)

  private[html] def decodeW1252(b: Array[Byte], from: Int): String =
    decodeW1252(b, from, b.length)

  private def decodeW1252(b: Array[Byte], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val v = b(i) & 0xFF
      sb.append(if (v >= 0x80 && v <= 0x9F) W1252High(v - 0x80) else v.toChar)
      i += 1
    }
    sb.toString
  }

  /** The WHATWG encoding for 1252's inverse (fixture/test use): chars the
    * table covers encode to their 1252 byte, everything else to '?'.
    */
  private[graft] def encodeW1252(s: String): Array[Byte] = {
    val rev = new java.util.HashMap[Char, Int]
    var i = 0
    while (i < 32) { rev.put(W1252High(i), 0x80 + i); i += 1 }
    val out = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out(i) =
        if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) c.toByte
        else if (rev.containsKey(c)) rev.get(c).toByte
        else '?'.toByte
      i += 1
    }
    out
  }

  // encodings the ladder can select; Java(cs) covers the long tail of
  // labels the JDK registry knows (ISO-8859-2..15, windows-125x, koi8,
  // shift_jis, ...), always decoded with U+FFFD replacement
  private sealed trait Enc { def label: String }
  private case object Utf8 extends Enc { val label = "utf-8" }
  private case object Utf16LE extends Enc { val label = "utf-16le" }
  private case object Utf16BE extends Enc { val label = "utf-16be" }
  private case object W1252 extends Enc { val label = "windows-1252" }
  private final case class Java(cs: Charset) extends Enc {
    def label: String = cs.name().toLowerCase(java.util.Locale.ROOT)
  }

  // WHATWG label groups (the subset crawl corpora hit; everything else
  // falls through to the JDK registry)
  private val Utf8Labels = Set(
    "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8", "utf8",
    "x-unicode20utf8")
  private val W1252Labels = Set(
    "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1", "ibm819",
    "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1",
    "iso_8859-1:1987", "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252")
  private val Utf16BELabels = Set("unicodefffe", "utf-16be")
  private val Utf16LELabels = Set(
    "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode", "unicodefeff",
    "utf-16", "utf-16le")

  /** `inMeta`: a UTF-16 label inside the document itself reads as UTF-8
    * (the prescan found ASCII tags, so the stream is not 16-bit), and
    * `x-user-defined` reads as windows-1252 — both per spec.
    */
  private def resolveLabel(raw: String, inMeta: Boolean): Option[Enc] = {
    if (raw == null) return None
    val l = raw.trim.toLowerCase(java.util.Locale.ROOT)
    if (l.isEmpty) None
    else if (Utf8Labels(l)) Some(Utf8)
    else if (W1252Labels(l)) Some(W1252)
    else if (Utf16LELabels(l)) Some(if (inMeta) Utf8 else Utf16LE)
    else if (Utf16BELabels(l)) Some(if (inMeta) Utf8 else Utf16BE)
    else if (l == "x-user-defined") Some(W1252)
    else
      try { if (Charset.isSupported(l)) Some(Java(Charset.forName(l))) else None }
      catch { case _: Exception => None }
  }

  private val CtCharset =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?'?\\s*([^;,\\s\"']+)")

  // ---------- binary-magic sniff ----------
  // A payload that is unmistakably a binary container (a gzip'd body the
  // transport lied about, a mislabeled image/PDF/archive) must FAIL the
  // decode, not quietly become windows-1252 noise in the corpus. The
  // set is conservative: only magics that cannot open a text document.
  private def looksBinary(b: Array[Byte]): Boolean = {
    def at(i: Int, v: Int): Boolean = i < b.length && (b(i) & 0xFF) == v
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)
    (at(0, 0x1f) && at(1, 0x8b)) ||                      // gzip
    ascii(0, "PK\u0003\u0004") ||                        // zip/ooxml/jar
    (at(0, 0x89) && ascii(1, "PNG")) ||                  // png
    (at(0, 0xFF) && at(1, 0xD8) && at(2, 0xFF)) ||       // jpeg
    ascii(0, "GIF87a") || ascii(0, "GIF89a") ||          // gif
    ascii(0, "RIFF") ||                                  // webp/wav/avi
    ascii(0, "%PDF-") ||                                 // pdf
    ascii(0, "OggS") ||                                  // ogg
    ascii(4, "ftyp")                                     // mp4/iso-bmff
  }

  // ---------- WHATWG-style meta prescan ----------
  // A bounded attribute-level scanner over the first KB (replacing the
  // old regex, which matched `charset=` anywhere within 512 chars of
  // `<meta` — including inside an unrelated attribute VALUE like
  // <meta name=description content="...charset=euc-jp...">). Comments
  // are skipped like the spec's prescan. Returns the first RESOLVABLE
  // declaration: like the spec's prescan (which loops when "get an
  // encoding" fails), an unresolvable label — e.g. unquoted
  // `<meta charset=utf-8/>` capturing 'utf-8/', or a bogus declaration
  // preceding a valid one — does NOT end the scan; later <meta> tags
  // are still considered. Remaining bounded-accept deviations: tags
  // other than <meta> are skipped to their first '>' (a quoted '>'
  // inside another tag's attribute ends that skip early), and
  // <script>/<style> bodies are not special-cased.
  private def metaCharsetScan(p: String): Option[Enc] = {
    val lower = p.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < p.length) {
      val lt = lower.indexOf('<', i)
      if (lt < 0) return None
      if (lower.startsWith("<!--", lt)) {
        val end = lower.indexOf("-->", lt + 4)
        if (end < 0) return None
        i = end + 3
      } else if (lower.startsWith("<meta", lt) && lt + 5 < p.length &&
          (p.charAt(lt + 5).isWhitespace || p.charAt(lt + 5) == '/')) {
        // attribute walk (the spec's "get an attribute" loop, bounded)
        var j = lt + 5
        var charsetAttr: String = null
        var httpEquiv: String = null
        var content: String = null
        var inTag = true
        while (inTag && j < p.length) {
          while (j < p.length &&
            (p.charAt(j).isWhitespace || p.charAt(j) == '/')) j += 1
          if (j >= p.length || p.charAt(j) == '>') inTag = false
          else {
            val nameStart = j
            while (j < p.length && !p.charAt(j).isWhitespace &&
              p.charAt(j) != '=' && p.charAt(j) != '/' &&
              p.charAt(j) != '>') j += 1
            val name = lower.substring(nameStart, j)
            while (j < p.length && p.charAt(j).isWhitespace) j += 1
            var value = ""
            if (j < p.length && p.charAt(j) == '=') {
              j += 1
              while (j < p.length && p.charAt(j).isWhitespace) j += 1
              if (j < p.length && (p.charAt(j) == '"' || p.charAt(j) == '\'')) {
                val q = p.charAt(j)
                val close = p.indexOf(q, j + 1)
                if (close < 0) { value = p.substring(j + 1); j = p.length }
                else { value = p.substring(j + 1, close); j = close + 1 }
              } else {
                val vs = j
                while (j < p.length && !p.charAt(j).isWhitespace &&
                  p.charAt(j) != '>') j += 1
                value = p.substring(vs, j)
              }
            }
            // first occurrence wins, like attribute parsing everywhere
            name match {
              case "charset" if charsetAttr == null => charsetAttr = value
              case "http-equiv" if httpEquiv == null => httpEquiv = value
              case "content" if content == null => content = value
              case _ => ()
            }
          }
        }
        // resolve HERE and keep scanning on failure (the spec's
        // continue-on-failed-get-an-encoding behavior). A charset
        // ATTRIBUTE — even an unresolvable or empty one — claims the
        // whole tag: the spec's prescan never falls through to the
        // same tag's http-equiv/content declaration, it abandons the
        // tag and continues to the NEXT one
        if (charsetAttr != null) {
          val enc = resolveLabel(charsetAttr, inMeta = true)
          if (enc.isDefined) return enc
        } else if (httpEquiv != null && content != null &&
            httpEquiv.equalsIgnoreCase("content-type")) {
          val m = CtCharset.matcher(content)
          if (m.find()) {
            val enc = resolveLabel(m.group(1), inMeta = true)
            if (enc.isDefined) return enc
          }
        }
        i = if (j > lt) j else lt + 5
      } else i = lt + 1
    }
    None
  }

  private def strictUtf8Valid(b: Array[Byte], from: Int): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(ByteBuffer.wrap(b, from, b.length - from)); true }
    catch { case _: Exception => false }
  }

  private def decodeWith(enc: Enc, b: Array[Byte], from: Int): String =
    enc match {
      case W1252 => decodeW1252(b, from)
      case other =>
        val cs = other match {
          case Utf8 => StandardCharsets.UTF_8
          case Utf16LE => StandardCharsets.UTF_16LE
          case Utf16BE => StandardCharsets.UTF_16BE
          case Java(c) => c
          case W1252 => throw new IllegalStateException("unreachable")
        }
        val dec = cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        dec.decode(ByteBuffer.wrap(b, from, b.length - from)).toString
    }

  /** The sniffing ladder. Returns (decoded text, chosen charset label);
    * null bytes yield (null, null); a payload opening with an
    * unmistakable binary magic (gzip, zip, png/jpeg/gif, RIFF, PDF,
    * ogg, ISO-BMFF) yields (null, "binary") — the defensive guard
    * against compressed/mislabeled bodies decoding as windows-1252
    * noise (the caller's failure seam counts them). Total: never throws
    * on any byte sequence.
    */
  def decodeWithCharset(bytes: Array[Byte], contentType: String)
      : (String, String) = {
    if (bytes == null) return (null, null)
    // 0. binary magic — a certain NON-text, before any declaration
    if (looksBinary(bytes)) return (null, "binary")
    // 1. BOM — certain, beats all declarations
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return (decodeWith(Utf8, bytes, 3), "utf-8")
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return (decodeWith(Utf16BE, bytes, 2), "utf-16be")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return (decodeWith(Utf16LE, bytes, 2), "utf-16le")
    // 2. transport charset
    if (contentType != null) {
      val m = CtCharset.matcher(contentType)
      if (m.find()) resolveLabel(m.group(1), inMeta = false).foreach { enc =>
        return (decodeWith(enc, bytes, 0), enc.label)
      }
    }
    // 3. bounded meta prescan over an ASCII-superset view of the prefix
    // (the scan resolves labels itself, continuing past unresolvable
    // declarations — the WHATWG prescan loop)
    val prefix = decodeW1252(bytes, 0, math.min(1024, bytes.length))
    metaCharsetScan(prefix).foreach { enc =>
      return (decodeWith(enc, bytes, 0), enc.label)
    }
    // 4. content sniff: valid UTF-8 or the 1252 fallback
    if (strictUtf8Valid(bytes, 0)) (decodeWith(Utf8, bytes, 0), "utf-8")
    else (decodeWith(W1252, bytes, 0), "windows-1252")
  }

  /** Decoded text only (the common call). */
  def decode(bytes: Array[Byte], contentType: String): String =
    decodeWithCharset(bytes, contentType)._1

  /** The label the ladder chooses (observability / corpus diagnostics). */
  def sniffCharset(bytes: Array[Byte], contentType: String): String =
    decodeWithCharset(bytes, contentType)._2
}
