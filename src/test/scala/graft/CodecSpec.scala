package graft

import graft.codec.SpanCodec
import graft.fixtures.Fixtures
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  test("encode/decode round-trips the flagship fixture") {
    val row = Fixtures.flagshipDoc
    val tree = SpanCodec.decode(row.spans, fast = false)
    val re = SpanCodec.encode(tree)
    assert(re == row.spans.toVector)
  }

  test("fast mode drops image/drawing spans but keeps tables") {
    val spans = Vector(
      Span("page", "", "", 0),
      Span("para", "box=0.0,0.0,10.0,5.0", "e1", 1),
      Span("line", "box=0.0,0.0,10.0,5.0", "l1", 2),
      Span("word", "hi", "font=f1;box=0.0,0.0,4.0,5.0", 3),
      Span("image", "", "blob://x", 4),
      Span("table", "a,b\n1,2", "t1", 5))
    val fast = SpanCodec.decode(spans, fast = true)
    assert(fast.pages.head.elements.map(_.typ) == Vector("paragraph", "table"))
    val full = SpanCodec.decode(spans, fast = false)
    assert(full.pages.head.elements.map(_.typ) == Vector("paragraph", "image", "table"))
    assert(full.pages.head.elements(1).mediaRef == "blob://x")
    assert(full.pages.head.elements(2).payload == "a,b\n1,2")
  }

  test("hdr/ftr spans flag the innermost open element") {
    val spans = Vector(
      Span("page", "", "", 0),
      Span("para", "box=0.0,0.0,10.0,5.0", "h1", 1),
      Span("hdr", "", "", 2),
      Span("line", "box=0.0,0.0,10.0,5.0", "l1", 3),
      Span("word", "top", "font=f1;box=0.0,0.0,4.0,5.0", 4),
      Span("para", "box=0.0,20.0,10.0,5.0", "b1", 5),
      Span("line", "box=0.0,20.0,10.0,5.0", "l2", 6),
      Span("word", "body", "font=f1;box=0.0,20.0,4.0,5.0", 7))
    val t = SpanCodec.decode(spans, fast = false)
    val es = t.pages.head.elements
    assert(es(0).isHeader && !es(1).isHeader)
  }

  test("stray word without an open line is preserved in a synthesized line, not dropped") {
    val spans = Vector(
      Span("page", "", "", 0),
      Span("para", "box=0.0,0.0,10.0,5.0", "p1", 1),
      Span("word", "orphan", "font=f1;box=0.0,0.0,4.0,5.0", 2), // no line span
      Span("line", "box=0.0,0.0,10.0,5.0", "l1", 3),
      Span("word", "normal", "font=f1;box=0.0,0.0,4.0,5.0", 4))
    val t = SpanCodec.decode(spans, fast = false)
    val words = t.pages.head.elements.flatMap(_.lines).flatMap(_.words).map(_.content)
    assert(words.contains("orphan"), words.mkString(",")) // silent loss forbidden
    assert(words.contains("normal"))
  }

  test("offset is the ordering authority (shuffled input decodes the same)") {
    val row = Fixtures.flagshipDoc
    val shuffled = new scala.util.Random(7).shuffle(row.spans.toVector)
    assert(SpanCodec.decode(shuffled, fast = true) ==
      SpanCodec.decode(row.spans, fast = true))
  }

  test("property: random fixture trees round-trip through the codec") {
    (0L until 50L).foreach { seed =>
      val rng = new Fixtures.Rng(seed)
      val row = Fixtures.compositeDoc(s"g-$seed", 1 + rng.nextInt(4), rng,
        1 + rng.nextInt(4), withMedia = seed % 2 == 0)
      val tree = SpanCodec.decode(row.spans, fast = false)
      assert(SpanCodec.encode(tree) == row.spans.toVector, s"seed=$seed")
    }
  }

  test("fmt renders one fractional digit, locale-free") {
    assert(SpanCodec.fmt(1.0) == "1.0")
    assert(SpanCodec.fmt(1.25) == "1.2") // rint: banker's rounding
    assert(SpanCodec.fmt(123.456) == "123.5")
    assert(SpanCodec.fmt(0.05) == "0.0")
    // sign survives magnitudes below 1 (integer division used to truncate
    // -0.3 to whole part 0 and silently drop the minus)
    assert(SpanCodec.fmt(-0.3) == "-0.3")
    assert(SpanCodec.fmt(-1.25) == "-1.2")
    assert(SpanCodec.parseBox(SpanCodec.fmtBox(Box(-0.3, 2.5, -12.7, 0.0))) ==
      Box(-0.3, 2.5, -12.7, 0.0))
  }

  test("encode rejects font ids that would corrupt the kv syntax") {
    val base = Fixtures.flagshipDoc
    val tree = SpanCodec.decode(base.spans, fast = true)
    val poisoned = tree.copy(pages = tree.pages.map(p => p.copy(elements =
      p.elements.map(e => e.copy(lines = e.lines.map(l => l.copy(words =
        l.words.map(w => w.copy(font = "f1;box=9,9,9,9")))))))))
    val e = intercept[IllegalArgumentException](SpanCodec.encode(poisoned))
    assert(e.getMessage.contains("kv-encodable"))
  }
}
