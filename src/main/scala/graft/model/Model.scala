package graft.model

/** Data model of the Spark-native extraction engine.
  *
  * Input rows follow BASELINE.json `input_hint`:
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset:int>>)`.
  * The flat `spans` array is a pre-order serialization of the reference
  * document tree (pages -> elements -> lines -> words; see
  * reference doc model at /root/reference/pd3f/export.py:283-303 and
  * /root/reference/pd3f/doc_info.py:185-266). The tree is rebuilt per row
  * inside `mapPartitions` and never crosses a shuffle.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class DocRow(doc_id: String, spans: Seq[Span])

/** Output row: one span per rendered element in emission order, plus the
  * flat rendered text (reference: doc_output.py:110-125).
  */
final case class ExtractedDoc(doc_id: String, spans: Seq[Span], text: String)

/** Per-partition lineage + metrics row (north_rule: checkpointed resume). */
final case class PartitionMetric(
    run_id: String,
    chunk_id: Int,
    partition_id: Int,
    n_docs: Long,
    n_failed: Long,
    n_spans_in: Long,
    n_spans_out: Long,
    n_lm_calls: Long,
    wall_ms: Long,
    status: String,
    error: String,
    ts: Long)

/** Axis-aligned bounding box in px (reference: doc_info.py:25-29, 69-73). */
final case class Box(l: Double, t: Double, w: Double, h: Double)

/** A word token (reference "word" element, export.py:389-395). */
final case class Word(content: String, font: String, box: Box)

/** A text line (reference line element, doc_info.py:208-215). */
final case class Line(id: String, box: Box, words: Vector[Word])

/** A page-level layout element.
  *
  * `typ` in {paragraph, heading, image, drawing, table}; header/footer flags
  * mirror Parsr `properties.isHeader/isFooter` (export.py:224-234).
  * `payload` carries the CSV text for `table` pass-through spans
  * (parsr_wrapper.py:112-114); `mediaRef` the media URI for image/drawing.
  */
final case class Elem(
    id: String,
    typ: String,
    box: Box,
    level: Int,
    isHeader: Boolean,
    isFooter: Boolean,
    lines: Vector[Line],
    mediaRef: String,
    payload: String) {
  def isFlaggedHeader: Boolean = isHeader
  def isFlaggedFooter: Boolean = isFooter
}

final case class Page(elements: Vector[Elem])

/** Document-level font table entry (doc_info.py:263-266; sizeUnit is always
  * px — the reference asserts it; our codec only encodes the size).
  */
final case class FontDef(id: String, size: Double)

/** The per-document tree rebuilt from the span stream. */
final case class DocTree(fonts: Vector[FontDef], pages: Vector[Page])

/** Raised when a document is structurally broken — mirrors the reference's
  * ValueError on empty stats (doc_info.py:217-234, 256-259). Such documents
  * become `failed` rows in the metrics table, not output rows.
  */
final class ExtractionException(msg: String) extends RuntimeException(msg)
