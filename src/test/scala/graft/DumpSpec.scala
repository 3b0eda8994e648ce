package graft

import org.scalatest.funsuite.AnyFunSuite

/** S7 (SURVEY §2): the debug dump tool. Pins that the dev tool actually
  * renders the flagship extraction — spans in page order with kind +
  * offset, then the document text — and doesn't crash, so it stays a
  * trustworthy first diagnostic when a corpus misbehaves.
  */
class DumpSpec extends AnyFunSuite {

  test("Dump renders flagship spans and text to stdout") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      tools.Dump.main(Array.empty)
    }
    val out = buf.toString("UTF-8")
    assert(out.contains("=== spans ==="), out.take(400))
    assert(out.contains("=== text ==="), out.take(400))
    // span lines carry [offset] kind — offsets ascending from 0
    val spanLines = out.linesIterator.filter(_.startsWith("[")).toVector
    assert(spanLines.nonEmpty)
    val offsets = spanLines.map(_.drop(1).takeWhile(_ != ']').toInt)
    assert(offsets == offsets.sorted && offsets.head == 0, offsets)
    // the flagship fixture's dehyphenated body made it into the rendering
    assert(out.contains("finanziellen"), out.take(2000))
  }
}
