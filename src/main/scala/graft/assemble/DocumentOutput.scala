package graft.assemble

import graft.lm.Scorer
import graft.text.PyText
import scala.collection.mutable.ArrayBuffer

/** The reference's internal output `Element` (doc_output.py:128-169).
  *
  * `typ` in {body, heading, footnotes} for rendered elements; additionally
  * {image, drawing, table} for pass-through media spans our engine carries
  * to the output (an extension over the reference, which drops media from
  * the text flow — doc_info.py:295-301; FIXTURES.md fx-media-interleave).
  *
  * A heading replicates the reference's positional-argument quirk at
  * export.py:509: `Element("heading", lines, id, e["level"])` passes the
  * level into the idx_page slot, so `level` stays None — mirrored here
  * (idxPage = level, level = -1).
  */
final class OutElement(
    val typ: String,
    var lines: List[List[String]],
    val id: String,
    val idxPage: Int = -1,
    val numNewlines: Int = 0,
    val level: Int = -1,
    val endsNewline: Boolean = false,
    val mediaRef: String = "",
    val payload: String = "") {

  require(
    Set("body", "heading", "footnotes", "image", "drawing", "table")(typ),
    s"bad element type $typ")

  /** Element.__str__ (doc_output.py:154-161). Media/table pass-throughs
    * render as "" (absent from the reference's flat text).
    */
  def render: String = typ match {
    case "footnotes" =>
      lines.map(l => PyText.stripSpacesLineEnd(l.mkString(" "))).mkString + "\n"
    case "body" | "heading" =>
      lines.map(_.mkString(" ")).mkString + "\n\n"
    case _ => ""
  }
}

/** DocumentOutput (doc_output.py:14-125): holds the rendered element
  * stream + header/footer, applies footnote reordering and reverse page
  * break, renders the flat text.
  */
final class DocumentOutput(
    data0: List[OutElement],
    val header: List[OutElement],
    val footer: List[OutElement],
    val order: Vector[Vector[String]],
    /** carried like the reference's DocumentOutput.lang (doc_output.py:
      * 14-27); selects the LM for reverse_page_break decisions. */
    val lang: String = "multi") {

  val data: ArrayBuffer[OutElement] = ArrayBuffer.from(data0)
  /** merged_elements redirect map (doc_output.py:21, 95). */
  val mergedElements = scala.collection.mutable.Map.empty[String, String]

  /** get_element (doc_output.py:29-39): redirect through merged_elements;
    * None unless EXACTLY one element matches (replicated).
    */
  def getElement(elemId0: String): Option[OutElement] = {
    val elemId = mergedElements.getOrElse(elemId0, elemId0)
    val res = data.filter(_.id == elemId)
    if (res.length == 1) Some(res.head) else None
  }

  private def firstOfTypeOnPage(types: Set[String], idxPage: Int): Option[OutElement] =
    order(idxPage).iterator.flatMap(getElement).find(e => types(e.typ))

  private def lastOfTypeOnPage(types: Set[String], idxPage: Int): Option[OutElement] =
    order(idxPage).reverseIterator.flatMap(getElement).find(e => types(e.typ))

  /** reverse_page_break (doc_output.py:59-95): join paragraphs split
    * across a page boundary. The split test + join is the deterministic
    * `is_split_paragraph` kernel (Scorer.joinSplitLines — scores the two
    * boundary lines vs their concatenation, hyphen-repairing the junction;
    * see Scorer scaladoc for the sanctioned re-specification).
    */
  def reversePageBreak(): Unit = {
    var idx = 0
    while (idx < order.length - 1) {
      val lastOpt = lastOfTypeOnPage(Set("body", "heading"), idx)
      val nextOpt = firstOfTypeOnPage(Set("body", "heading"), idx + 1)
      (lastOpt, nextOpt) match {
        case (Some(last), Some(next))
            if last.typ != "heading" && next.typ != "heading" &&
              !last.endsNewline && (last ne next) =>
          Scorer.joinSplitLines(last.lines.last, next.lines.head, lang) match {
            case None => // not a split paragraph
            case Some(junction) =>
              val merged = new OutElement(
                last.typ,
                last.lines.init ++ (junction :: next.lines.tail),
                last.id,
                last.idxPage,
                last.numNewlines + next.numNewlines,
                last.level,
                next.endsNewline)
              val i = data.indexWhere(_ eq last)
              data(i) = merged
              val j = data.indexWhere(_ eq next)
              if (j >= 0) data.remove(j)
              mergedElements(next.id) = last.id
          }
        case _ => // some element missing / heading / ends with newline
      }
      idx += 1
    }
  }

  /** reorder_footnotes (doc_output.py:97-105): stable two-way partition. */
  def reorderFootnotes(): Unit = {
    val (fns, rest) = data.partition(_.typ == "footnotes")
    data.clear()
    data ++= rest
    data ++= fns
  }

  /** text() (doc_output.py:110-125). `markdown` prefixes '#' * level on
    * headings; with the reference's heading-level quirk the level is
    * unset (None -> crash in the reference; here: no prefix).
    */
  def text(markdown: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append(header.map(_.render).mkString("\n\n"))
    data.foreach { e =>
      if (markdown && e.typ == "heading" && e.level > 0)
        sb.append("#" * e.level).append(" ")
      sb.append(e.render)
    }
    sb.append(footer.map(_.render).mkString("\n\n"))
    // hotfix for too many newlines (doc_output.py:124)
    sb.toString.replaceAll("\n{3,}", "\n\n")
  }
}
