package graft.tools

import graft.extract.Extractor
import graft.fixtures.Fixtures
import graft.reflow.ExtractConfig

/** Dev tool: dump the flagship fixture's extraction (no Spark). */
object Dump {
  def main(args: Array[String]): Unit = {
    val row = Fixtures.flagshipDoc
    println(s"spans in: ${row.spans.length}")
    val out = Extractor.extractRow(row, ExtractConfig())
    println("=== spans ===")
    out.spans.foreach(s => println(s"[${s.offset}] ${s.kind} ref=${s.media_ref} text=${s.text.replace("\n", "\\n")}"))
    println("=== text ===")
    println(out.text.replace("\n", "\\n\n"))
  }
}
