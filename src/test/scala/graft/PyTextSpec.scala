package graft

import graft.text.{LinkedCounter, PyText}
import org.scalatest.funsuite.AnyFunSuite

class PyTextSpec extends AnyFunSuite {

  test("string.punctuation is the exact CPython 32-char set") {
    assert(PyText.Punctuation.size == 32)
    assert("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".forall(PyText.Punctuation))
    assert(!PyText.Punctuation(' ') && !PyText.Punctuation('a') && !PyText.Punctuation('§'))
  }

  test("pyStrip strips unicode whitespace incl NBSP like Python str.strip") {
    assert(PyText.pyStrip("  a b\t\n") == "a b")
    assert(PyText.pyStrip(" x ") == "x")
    assert(PyText.pyStrip("") == "")
    assert(PyText.pyStrip("\n\n") == "")
  }

  test("isNumeric matches Python str.isnumeric on the classes we use") {
    assert(PyText.isNumeric("123"))
    assert(PyText.isNumeric("²")) // superscript: Python isnumeric True
    assert(!PyText.isNumeric("12a"))
    assert(!PyText.isNumeric(""))
    assert(!PyText.isNumeric("1.2")) // dot not numeric
  }

  test("stripSpacesLineEnd mirrors the recursive reference semantics") {
    // string_utils.py docstring cases
    // CPython-exact: recursion drops the " \n" pair and re-appends "\n"
    // AFTER returning, so a double space keeps its first space
    assert(PyText.stripSpacesLineEnd("the text  \n") == "the text \n")
    assert(PyText.stripSpacesLineEnd("a \n \n") == "a\n\n") // chain strips
    assert(PyText.stripSpacesLineEnd("b   \n") == "b  \n")
    assert(PyText.stripSpacesLineEnd("the text\n") == "the text\n")
    assert(PyText.stripSpacesLineEnd("x") == "x")
    assert(PyText.stripSpacesLineEnd(" \n") == "\n")
    assert(PyText.stripSpacesLineEnd("a \n") == "a\n")
    // only strips before a FINAL newline, one space per recursion step
    assert(PyText.stripSpacesLineEnd("a \nb") == "a \nb")
  }

  test("jaccardChars is multiset char jaccard (textdistance default)") {
    assert(PyText.jaccardChars("abc", "abc") == 1.0)
    assert(PyText.jaccardChars("aab", "ab") == 2.0 / 3.0)
    assert(PyText.jaccardChars("abc", "xyz") == 0.0)
    // the footer case that drives fx dedup behavior
    assert(PyText.jaccardChars("Seite 1 von 2", "Seite 2 von 2") > 0.8)
  }

  test("median matches Python statistics.median") {
    assert(PyText.median(Seq(1, 3, 2)) == 2.0)
    assert(PyText.median(Seq(1, 2, 3, 4)) == 2.5)
    assert(PyText.median(Seq(5)) == 5.0)
    assert(PyText.medianFromCounter(Seq(1.0 -> 2, 10.0 -> 1)) == 1.0)
  }

  test("argminFirst takes the first minimum (scores.index(min(scores)))") {
    assert(PyText.argminFirst(Seq(2.0, 1.0, 1.0)) == 1)
    assert(PyText.argminFirst(Seq(1.0, 1.0, 1.0)) == 0)
  }

  test("LinkedCounter.mostCommon1 breaks ties by insertion order") {
    val c = new LinkedCounter[String]
    c.update(Seq("b", "a", "a", "b"))
    assert(c.mostCommon1 == "b") // both count 2, b first inserted
    c.add("a", 1)
    assert(c.mostCommon1 == "a")
  }

  test("cleanNoPunct lowers, transliterates, strips punctuation") {
    assert(PyText.cleanNoPunct("Hällo, Wörld!") == "hallo world")
    assert(PyText.cleanNoPunct("...") == "")
    assert(PyText.cleanNoPunct("§12a") == "12a")
  }

  test("cleanNoPunctNoNumber removes digit runs (page-number predicate)") {
    assert(PyText.cleanNoPunctNoNumber("Seite 3 von 10") == "seite von")
    val cleaned = PyText.cleanNoPunctNoNumber("Seite 3 von 10")
      .replace("seite", "").replace("von", "")
    assert(PyText.pyStrip(cleaned) == "")
  }

  test("fixBadUnicode repairs latin1-read utf8 mojibake and NFC-normalizes") {
    assert(PyText.fixBadUnicode("fÃ¼r") == "für")
    assert(PyText.fixBadUnicode("plain ascii") == "plain ascii")
    // NFC: combining umlaut composed
    assert(PyText.fixBadUnicode("ü") == "ü")
  }

  test("fixBadUnicode repairs cp1252-read mojibake (ftfy's common case)") {
    // UTF-8 bytes E2 80 99 (right single quote) read as cp1252 ->
    // \u00e2\u20ac\u2122; repaired to the curly quote, then uncurled
    // (ftfy fix_text default uncurl_quotes=True)
    assert(PyText.fixBadUnicode("it\u00e2\u20ac\u2122s") == "it's")
    // E2 80 9C / E2 80 9D curly double quotes -> straight after uncurl
    assert(PyText.fixBadUnicode("\u00e2\u20ac\u0153quo\u00e2\u20ac\u009d")
      == "\"quo\"")
    // E2 82 AC euro sign read as cp1252 -> \u00e2\u201a\u00ac
    assert(PyText.fixBadUnicode("5\u00e2\u201a\u00ac") == "5\u20ac")
  }

  test("fixBadUnicode: html entities (named subset + numeric), unknown kept") {
    assert(PyText.fixBadUnicode("a &amp; b &lt;3") == "a & b <3")
    assert(PyText.fixBadUnicode("K&#228;se &#x20AC;5") == "K\u00e4se \u20ac5")
    assert(PyText.fixBadUnicode("&bogusentity; stays") == "&bogusentity; stays")
    assert(PyText.fixBadUnicode("AT&T; no entity") == "AT&T; no entity")
  }

  test("unescapeHtml: semicolon-less legacy forms + longest-match backtrack (html.unescape semantics)") {
    // the 106-name WHATWG legacy list decodes WITHOUT the semicolon
    assert(PyText.fixBadUnicode("a &amp b") == "a & b")
    assert(PyText.fixBadUnicode("&copy 2026 &reg") == "© 2026 ®")
    assert(PyText.fixBadUnicode("&AMP &LT x") == "& < x")
    assert(PyText.fixBadUnicode("Caf&eacute au lait") == "Café au lait")
    // CPython's longest-match-then-backtrack: an unknown body is retried
    // against its legacy-name prefixes — &ampx is NOT an entity, but its
    // 'amp' prefix is
    assert(PyText.fixBadUnicode("&ampx") == "&x")
    assert(PyText.fixBadUnicode("&notit; stays-not") == "¬it; stays-not")
    assert(PyText.fixBadUnicode("&notin") == "¬in") // no ';': not ∉
    assert(PyText.fixBadUnicode("&notin;") == "∉")  // with ';': ∉
    // non-legacy names still need the semicolon; no prefix rescues them
    assert(PyText.fixBadUnicode("&alpha stays") == "&alpha stays")
    assert(PyText.fixBadUnicode("&zz12 stays") == "&zz12 stays")
    // ATTRIBUTE rules (WHATWG tokenizer): a legacy match followed by '='
    // or an alphanumeric is unconsumed — query strings survive
    assert(PyText.unescapeHtmlAttr("/p?a=1&copy=2") == "/p?a=1&copy=2")
    assert(PyText.unescapeHtmlAttr("/p?x&ampy") == "/p?x&ampy")
    assert(PyText.unescapeHtmlAttr("/p?a=1&amp;b=2") == "/p?a=1&b=2")
    assert(PyText.unescapeHtmlAttr("say &amp again") == "say & again")
    assert(PyText.unescapeHtmlAttr("end &amp") == "end &")
    // ...while TEXT decodes the same inputs aggressively, like a browser
    assert(PyText.fixBadUnicode("a=1&copy=2") == "a=1©=2")
  }

  test("fixBadUnicode: full HTML4 entity table (ftfy unescape_html vectors)") {
    // vector from ftfy's own test corpus (test_entities): named entity +
    // already-decoded text left alone on the re-pass
    assert(PyText.fixBadUnicode("&lt;HTML&gt;") == "<HTML>")
    assert(PyText.fixBadUnicode("l&#39;humanit&eacute;") == "l'humanit\u00e9")
    // note: uncurl_quotes runs after unescape_html in fix_text, so curly
    // quote entities decode and then straighten \u2014 same as ftfy's default
    assert(PyText.fixBadUnicode("&ldquo;x&rdquo;") == "\"x\"")
    // one probe per table section: Latin-1 / extended / Greek /
    // punctuation / letterlike / arrows / math / misc symbols
    assert(PyText.fixBadUnicode("&frac12; cup") == "\u00bd cup")
    assert(PyText.fixBadUnicode("&iquest;Qu\u00e9?") == "\u00bfQu\u00e9?")
    assert(PyText.fixBadUnicode("&oelig;uvre &Scaron;") == "\u0153uvre \u0160")
    assert(PyText.fixBadUnicode("&Omega; &sigmaf; &piv;") == "\u03a9 \u03c2 \u03d6")
    assert(PyText.fixBadUnicode("a&thinsp;b&permil;") == "a\u2009b\u2030")
    assert(PyText.fixBadUnicode("&real; &alefsym;") == "\u211c \u2135")
    assert(PyText.fixBadUnicode("x &rarr; y &hArr; z") == "x \u2192 y \u21d4 z")
    assert(PyText.fixBadUnicode("&forall;x &isin; S, x &le; &infin;")
      == "\u2200x \u2208 S, x \u2264 \u221e")
    // lang/rang carry HTML5 values (U+27E8/9), like html.unescape
    assert(PyText.fixBadUnicode("&lang;v&rang; &spades;") == "\u27e8v\u27e9 \u2660")
    // case-sensitive lookup: &Sigma; vs &sigma;, &Prime; vs &prime;
    assert(PyText.fixBadUnicode("&Sigma;&sigma; &Prime;&prime;")
      == "\u03a3\u03c3 \u2033\u2032")
  }

  test("fixBadUnicode: HTML5 entity long tail (math alphanumerics, long names, multi-codepoint)") {
    import graft.text.PyText.{fixBadUnicode => fix}
    // math-alphanumeric families: Letterlike exceptions stay in the BMP...
    assert(fix("&Zopf; &Ropf; &Copf;") == "\u2124 \u211d \u2102")
    assert(fix("&Hscr; &Rfr; &Ifr;") == "\u210b \u211c \u2111")
    // ...while regular letters land in the astral Mathematical block
    // (surrogate pairs on the JVM)
    assert(fix("&Aopf;") == new String(Character.toChars(0x1D538)))
    assert(fix("&zscr;") == new String(Character.toChars(0x1D4CF)))
    assert(fix("&afr;") == new String(Character.toChars(0x1D51E)))
    // script-family lowercase exceptions
    assert(fix("&escr;&gscr;&oscr;") == "\u212f\u210a\u2134")
    // ASCII punctuation names
    assert(fix("&lpar;x&comma;y&rpar;&semi;") == "(x,y);")
    assert(fix("&lsqb;a&sol;b&rsqb;") == "[a/b]")
    // long names (the HTML4 regex cap of 30 chars is not exceeded)
    assert(fix("&CloseCurlyDoubleQuote;") == "\"") // decoded, then uncurled
    assert(fix("&DoubleRightArrow; &ZeroWidthSpace;x") == "\u21d2 \u200bx")
    // HTML5 remaps: ohm is GREEK OMEGA, angst is LATIN A WITH RING
    assert(fix("5&ohm; 2&angst;") == "5\u03a9 2\u00c5")
    // multi-codepoint entities
    assert(fix("&fjlig;ord") == "fjord")
    assert(fix("a&ThickSpace;b") == "a\u205f\u200ab")
    // vulgar fractions and operators
    assert(fix("&frac13;&frac78;") == "\u2153\u215e")
    assert(fix("A &setminus; B &because; x &nleq; y")
      == "A \u2216 B \u2235 x \u2270 y")
    // ligature block
    assert(fix("o&fflig;en e&ffilig;zient") == "o\ufb00en e\ufb03zient")
    // the rare negated-relation tail is covered too (complete WHATWG list)
    assert(fix("&NotSquareSubsetEqual;") == "\u22e2")
    // combining-mark multi-codepoint entry from the full table
    assert(fix("&bnequiv;") == "\u2261\u20e5")
    // truly unknown names still stay verbatim (conservative contract)
    assert(fix("&NoSuchEntityZz;") == "&NoSuchEntityZz;")
    // semicolon-less LEGACY forms decode too (html.unescape parity —
    // the r04 contract exclusion is closed)
    assert(fix("a &amp b") == "a & b")
  }

  test("width table equals per-char NFKC over the whole FF01-FFEF block") {
    (0xFF01 to 0xFFEF).foreach { cp =>
      val c = cp.toChar.toString
      val viaTable = PyText.fixBadUnicode(s"x$c")
      val naive = java.text.Normalizer.normalize(
        "x" + java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFKC),
        java.text.Normalizer.Form.NFC)
      assert(viaTable == naive, f"U+$cp%04X: '$viaTable' != '$naive'")
    }
  }

  test("fixBadUnicode: character width (fullwidth + halfwidth katakana) and surrogates") {
    // ftfy's own vector: fix_text('ＬＯＵＤ　ＮＯＩＳＥＳ') == 'LOUD NOISES'
    // (fullwidth ASCII narrowed, ideographic space -> space)
    assert(PyText.fixBadUnicode("ＬＯＵＤ　ＮＯＩＳＥＳ") == "LOUD NOISES")
    // halfwidth katakana widens; the voiced mark composes under final NFC
    assert(PyText.fixBadUnicode("ｶﾞ") == "ガ")
    assert(PyText.fixBadUnicode("ﾊﾟﾝ") == "パン")
    // lone surrogates -> U+FFFD; valid astral pairs untouched
    assert(PyText.fixBadUnicode("a\uD800b") == "a�b")
    assert(PyText.fixBadUnicode("x\uDC00") == "x�")
    assert(PyText.fixBadUnicode("ok 😀") == "ok 😀")
  }

  test("fixBadUnicode: terminal escapes, control chars, BOM removed; \\n and \\t kept") {
    assert(PyText.fixBadUnicode("\u001b[31mred\u001b[0m") == "red")
    assert(PyText.fixBadUnicode("a\u0000b\u0007c") == "abc")
    assert(PyText.fixBadUnicode("\ufeffbom") == "bom")
    assert(PyText.fixBadUnicode("keep\tthis\nboth") == "keep\tthis\nboth")
  }

  test("fixBadUnicode: fullwidth forms narrowed, line breaks normalized") {
    assert(PyText.fixBadUnicode("\uff26\uff35\uff2c\uff2c\uff01") == "FULL!")
    assert(PyText.fixBadUnicode("a\r\nb\rc\u2028d\u0085e") == "a\nb\nc\nd\ne")
  }

  test("fixBadUnicode: straight quotes from curly input; idempotent") {
    assert(PyText.fixBadUnicode("don\u2019t \u201cquote\u201d") == "don't \"quote\"")
    // idempotence on a mixed repair (mojibake + entity + CRLF). Note the
    // whole-string-redecode subset boundary: unlike ftfy (which segments
    // text), mojibake mixed with legitimate non-Latin-1 chars in the SAME
    // string is left unrepaired rather than risk making it worse.
    val once = PyText.fixBadUnicode("f\u00c3\u0192\u00c2\u00bcr &amp; x\r\n")
    assert(once == "f\u00fcr & x\n")
    assert(PyText.fixBadUnicode(once) == once)
  }

  test("fixBadUnicode repairs double-encoded mojibake to fixpoint") {
    // "\u00fc" double-encoded: UTF-8 C3 BC -> misread cp1252 "\u00c3\u00bc" ->
    // re-encoded C3 83 C2 BC -> misread again "\u00c3\u0192\u00c2\u00bc"
    assert(PyText.fixBadUnicode("f\u00c3\u0192\u00c2\u00bcr") == "f\u00fcr")
  }

  test("fixBadUnicode leaves legitimate non-mojibake text untouched") {
    // real German with ordinary non-ASCII but no lead+continuation pattern
    assert(PyText.fixBadUnicode("\u00dcberpr\u00fcfung l\u00e4uft") == "\u00dcberpr\u00fcfung l\u00e4uft")
    // a string that LOOKS like a lead byte but does not strictly re-decode
    // as UTF-8 must be returned unchanged (ftfy: don't make it worse)
    assert(PyText.fixBadUnicode("\u00e2\u00b7 broken x") == "\u00e2\u00b7 broken x")
  }

  test("hasAlnumAfterClean: entity/ANSI alnum consumed by cleaning does not fast-path to true") {
    import graft.reflow.Reflow.hasAlnumAfterClean
    assert(hasAlnumAfterClean("plain x"))
    assert(hasAlnumAfterClean("7"))
    assert(!hasAlnumAfterClean("...!?"))
    // ascii digit '3' exists but cleaning consumes it entirely
    assert(!hasAlnumAfterClean("&#33;"))      // HTML entity -> "!"
    assert(!hasAlnumAfterClean("\u001b[3m.")) // ANSI escape stripped
    // mixed: a surviving letter still wins through the slow path
    assert(hasAlnumAfterClean("&#33; ok"))
  }
}
