package graft.assemble

import graft.model.Span
import org.apache.spark.sql.{DataFrame, Dataset}

/** Markdown rendering of the unified span stream — the text shape an LLM
  * training pipeline actually feeds. Works on BOTH kernels' output
  * (`ExtractedDoc.spans` from the PDF and the HTML side):
  *
  *  - heading  -> `#` * level + text (level from media_ref "hN"; the PDF
  *    side's heading spans carry no level there — they render at level 1,
  *    matching DocumentOutput.text(markdown = true)'s minimalism);
  *  - list     -> `- ` + text;
  *  - table    -> a markdown pipe table from the CSV-ish capture (first
  *    row becomes the header, `|` in cells escaped);
  *  - image    -> `![alt](media_ref)` — the interleaved-media
  *    placeholder convention of multimodal training corpora;
  *  - body / footnotes / anything else -> the text verbatim.
  *
  * Blocks join with blank lines; 3+ newlines collapse like the
  * reference's text() hotfix (doc_output.py:124).
  */
object SpanMarkdown {

  /** RFC-4180-subset line parse — the exact inverse of the HTML kernel's
    * table-cell quoting (quote-wrapped cells, doubled inner quotes).
    */
  private[graft] def parseCsvLine(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            sb.append('"'); i += 1
          } else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.setLength(0)
        case _ => sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.result()
  }

  private def tableMarkdown(csv: String): String = {
    val rows = csv.split("\n", -1).toVector.map(parseCsvLine)
    if (rows.isEmpty) return ""
    val width = rows.map(_.length).max
    def line(cells: Vector[String]): String =
      (cells ++ Vector.fill(width - cells.length)(""))
        .map(_.replace("|", "\\|"))
        .mkString("| ", " | ", " |")
    val sep = Vector.fill(width)("---").mkString("| ", " | ", " |")
    (line(rows.head) +: sep +: rows.tail.map(line)).mkString("\n")
  }

  private def headingLevel(mediaRef: String): Int =
    if (mediaRef != null && mediaRef.length == 2 && mediaRef.charAt(0) == 'h' &&
        mediaRef.charAt(1) >= '1' && mediaRef.charAt(1) <= '6')
      mediaRef.charAt(1) - '0'
    else 1

  /** One document's spans (emission order) -> markdown. Null cells from
    * EXTERNAL span tables (our kernels never emit them) render as empty
    * rather than NPE-ing the pass.
    */
  def render(spans: Seq[Span]): String = {
    val blocks = spans.map { s =>
      val text = if (s.text == null) "" else s.text
      val ref = if (s.media_ref == null) "" else s.media_ref
      s.kind match {
        case "heading" => "#" * headingLevel(s.media_ref) + " " + text
        case "list" => "- " + text
        case "table" => if (text.isEmpty) "" else tableMarkdown(text)
        case "image" => s"![$text]($ref)"
        case _ => text
      }
    }
    // empty blocks (null/empty external cells) drop rather than leaving
    // stray blank paragraphs
    blocks.filter(_.nonEmpty).mkString("\n\n").replaceAll("\n{3,}", "\n\n")
  }

  /** Operator face: (doc_id, markdown) from any extracted-doc frame with
    * (doc_id, spans) columns. Map-only, zero shuffle.
    */
  def renderDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds: Dataset[(String, Seq[Span])] =
      docs.selectExpr("doc_id", "spans").as[(String, Seq[Span])]
    ds.map { case (id, spans) => (id, render(spans)) }
      .toDF("doc_id", "markdown")
  }
}
