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

  /** RFC-4180-subset parse of a whole CSV text into rows — the exact
    * inverse of the HTML kernel's table-cell quoting, and quote-aware at
    * the ROW level too: a quoted cell may contain newlines (legal in the
    * PDF side's Parsr pass-through tables), so rows split only at
    * newlines OUTSIDE quotes.
    */
  private[graft] def parseCsv(text: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val row = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    // a quote OPENS a quoted cell only at cell start — external (non-RFC-
    // 4180) CSV like `5" nail,x` keeps its bare mid-cell quote literal
    // instead of silently swallowing the delimiter and merging cells
    var cellStarted = false
    def endCell(): Unit = { row += sb.toString; sb.setLength(0); cellStarted = false }
    def endRow(): Unit = { endCell(); rows += row.result(); row.clear() }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            sb.append('"'); i += 1
          } else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' if !cellStarted => inQ = true; cellStarted = true
        case ',' => endCell()
        case '\n' => endRow()
        case _ => sb.append(c); cellStarted = true
      }
      i += 1
    }
    endRow()
    rows.result()
  }

  /** One CSV line -> cells (no embedded newlines; kept for spec vectors). */
  private[graft] def parseCsvLine(line: String): Vector[String] = {
    val rows = parseCsv(line)
    if (rows.isEmpty) Vector("") else rows.head
  }

  private def tableMarkdown(csv: String): String = {
    var rows = parseCsv(csv)
    if (rows.isEmpty) return ""
    // the HTML kernel captures a <caption> as a single-cell row 0; a
    // multi-column table starting with a lone cell renders it as an
    // italic caption line, with the first REAL row as the pipe header
    val caption =
      if (rows.length > 1 && rows.head.length == 1 &&
          rows.exists(_.length > 1)) {
        val c = rows.head.head
        rows = rows.tail
        if (c.isEmpty) "" else s"*$c*\n\n"
      } else ""
    val width = rows.map(_.length).max
    def line(cells: Vector[String]): String =
      (cells ++ Vector.fill(width - cells.length)(""))
        .map(_.replace("|", "\\|").replace("\n", " "))
        .mkString("| ", " | ", " |")
    val sep = Vector.fill(width)("---").mkString("| ", " | ", " |")
    caption + (line(rows.head) +: sep +: rows.tail.map(line)).mkString("\n")
  }

  private def headingLevel(mediaRef: String): Int =
    if (mediaRef != null && mediaRef.length == 2 && mediaRef.charAt(0) == 'h' &&
        mediaRef.charAt(1) >= '1' && mediaRef.charAt(1) <= '6')
      mediaRef.charAt(1) - '0'
    else 1

  /** One document's spans (emission order) -> markdown. Null rows/cells
    * from EXTERNAL span tables (our kernels never emit them) render as
    * empty rather than NPE-ing the pass.
    */
  def render(spans: Seq[Span]): String = {
    if (spans == null) return ""
    val blocks = spans.map { s =>
      val text = if (s.text == null) "" else s.text
      val ref = if (s.media_ref == null) "" else s.media_ref
      s.kind match {
        case "heading" => "#" * headingLevel(s.media_ref) + " " + text
        case "list" => "- " + text
        case "table" => if (text.isEmpty) "" else tableMarkdown(text)
        // PDF drawings carry empty text + a media_ref — the same
        // interleaved-media placeholder as images
        case "image" | "drawing" => s"![${mdEscapeAlt(text)}](${mdEscapeRef(ref)})"
        case _ => text
      }
    }
    // empty blocks (null/empty external cells) drop rather than leaving
    // stray blank paragraphs
    blocks.filter(_.nonEmpty).mkString("\n\n").replaceAll("\n{3,}", "\n\n")
  }

  /** ']' in alt text and '('/')'/' ' in the ref would break the
    * ![alt](ref) placeholder for downstream markdown consumers.
    */
  private def mdEscapeAlt(s: String): String =
    s.replace("[", "\\[").replace("]", "\\]")
  private def mdEscapeRef(s: String): String =
    s.replace("(", "%28").replace(")", "%29").replace(" ", "%20")

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
