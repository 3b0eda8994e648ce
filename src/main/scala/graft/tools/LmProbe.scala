package graft.tools

import graft.lm.Scorer

/** Dev tool: probe scorer decisions for fixture design. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    def probe(a: String, b: String): Unit = {
      val sa = Scorer.score(a)
      val sb = Scorer.score(b)
      val sj = Scorer.score(a + " " + b)
      println(f"a=$sa%.4f b=$sb%.4f join=$sj%.4f -> ${if (sj < math.min(sa, sb)) "JOIN" else "SEP"}  [$a | $b]")
    }
    probe("die bedeutung der finanziellen", "interessen der union ist gewachsen")
    probe("die kommission hat einen", "bericht über die anwendung vorgelegt")
    probe("Seite 3 von 10", "Die Kommission hat einen Bericht vorgelegt")
    probe("eins zwei drei", "vier fünf sechs")
    probe("nach ansicht der", "verbände ist eine klärung erforderlich")
    println("newlineOrNot short a: " + Scorer.newlineOrNot("x", "whatever"))
    println("newlineOrNot short b: " + Scorer.newlineOrNot("whatever", "x"))
    println("single_score 1ch: " + Scorer.singleScore("x"))
    println("score('Seite 1 von 2') = " + Scorer.score("Seite 1 von 2"))
    println("score('Seite 2 von 2') = " + Scorer.score("Seite 2 von 2"))
    println("dehyph drop: " + Scorer.dehyphenParagraph(List(List("der", "finan- "), List("ziellen", "betrag"))))
    println("dehyph keep: " + Scorer.dehyphenParagraph(List(List("auch", "EU- "), List("Staaten", "wie"))))
    println("dehyph chain: " + Scorer.dehyphenParagraph(List(List("finan-"), List("ziel-"), List("len", "x"))))
  }
}
