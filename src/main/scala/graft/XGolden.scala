package graft

/** Literal-VALUES DuckDB oracles for the deterministic fixture-driven
  * queries (x01–x08 extraction facets, q17/q18 multimodal meta/frames,
  * q27 media near-dup) — round-2 verdict items 1+2.
  *
  * Mechanism: `graft.tools.XOracleGen` runs each query once and freezes
  * its rows as a TSV resource under `src/main/resources/xgoldens/`; the
  * frozen files are committed and reviewed like any golden (mirroring the
  * reference's exact-equality golden contract, tests/test_pdfs.py:6-24 —
  * the same kernels are independently pinned by the fixture/golden test
  * suite). At Verify time `oracleFor` re-expresses a frozen file as a
  * self-contained DuckDB `SELECT ... FROM (VALUES ...)`, which the
  * driver's gate executes and compares against the freshly-computed Spark
  * output: any kernel regression versus the frozen, reviewed expectation
  * flips the row red. These queries read ONLY in-code fixtures (never the
  * driver's sf tables), so the frozen rows cannot rot when test data is
  * regenerated.
  *
  * TSV format: line 1 = `name:type` per column (Spark simpleString);
  * value escaping: `\\`, `\t`, `\n`, `\r`; null = `\N` (exactly the
  * escaping XOracleGen writes).
  */
object XGolden {

  /** Query names with a frozen golden (present iff the resource exists). */
  val names: Seq[String] = Seq(
    "x01_extract_spans", "x02_doc_stats", "x03_header_dedup",
    "x04_footnotes", "x05_dehyphen_bodies", "x06_media_passthrough",
    "x07_page_number_strip", "x08_failed_docs",
    "x09_rendered_output", "x10_corpus_metrics", "x11_html_main_content",
    "x12_lm_scores", "x13_html_links", "x14_html_meta", "x15_web_prep",
    "x16_markdown", "x17_bytes_ingest", "x18_robots_frontier",
    "x19_warc_ingest", "x20_sitemap_frontier", "x21_wet_roundtrip",
    "x22_fetch_schedule", "x23_crawl_loop", "x24_redirect_edges",
    "x25_http_payload", "x26_revisit_stale", "x27_sitemap_index",
    "x28_conditional_fetch", "x29_revalidation", "x30_brotli_contract",
    "x31_crawl_priority", "x32_bpe_tokens", "x33_optout_ingest",
    "q17_multimodal_meta", "q18_multimodal_frames", "q27_media_neardup",
    "q70_image_ahash_dedup")

  private def duckType(sparkType: String): String = sparkType match {
    case "string" => "VARCHAR"
    case "int" | "integer" => "INTEGER"
    case "bigint" | "long" => "BIGINT"
    case "double" => "DOUBLE"
    case "float" => "FLOAT"
    case "boolean" => "BOOLEAN"
    case t => throw new IllegalArgumentException(
      s"xgolden: no DuckDB mapping for Spark type '$t' — extend duckType")
  }

  /** Inverse of `unescape` (the writer side, used by XOracleGen); kept
    * next to its inverse so the pair stays in sync — FuzzSpec round-trips
    * them property-based.
    */
  private[graft] def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private[graft] def unescape(v: String): Option[String] = {
    if (v == "\\N") return None
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case '\\' => sb.append('\\')
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case o => sb.append('\\').append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  /** SQL literal for one value of the given DuckDB type. */
  private def sqlLit(v: Option[String], dt: String): String = v match {
    case None => "NULL"
    case Some(s) =>
      if (dt == "VARCHAR") "'" + s.replace("'", "''") + "'"
      else s // numeric / boolean: frozen repr is already a valid literal
  }

  /** The frozen golden as a self-contained DuckDB query, or None when no
    * golden resource has been generated for `name`.
    */
  def oracleFor(name: String): Option[String] = {
    val in = getClass.getResourceAsStream(s"/xgoldens/$name.tsv")
    if (in == null) return None
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    require(lines.length >= 2, s"xgolden $name: frozen file has no rows")
    val cols = lines.head.split("\t").map { h =>
      val Array(n, t) = h.split(":", 2)
      (n, duckType(t))
    }
    val rows = lines.tail.map { line =>
      // -1: trailing empty fields (empty-string last column) must survive
      val fields = line.split("\t", -1)
      require(fields.length == cols.length,
        s"xgolden $name: row has ${fields.length} fields, header ${cols.length}")
      fields.zip(cols).map { case (f, (_, dt)) => sqlLit(unescape(f), dt) }
        .mkString("(", ",", ")")
    }
    val sel = cols.zipWithIndex
      .map { case ((n, dt), i) => s"CAST(c$i AS $dt) AS $n" }
      .mkString(", ")
    val tdef = cols.indices.map(i => s"c$i").mkString("(", ",", ")")
    // ORDER BY ALL: the driver's compare canon-sorts rows, but every
    // handwritten oracle in SparkEntry carries an explicit ORDER BY —
    // don't let these 13 rows be the only ones depending on DuckDB
    // preserving VALUES insertion order (preserve_insertion_order=false
    // is a common memory-pressure setting)
    Some(s"SELECT $sel FROM (VALUES\n${rows.mkString(",\n")}) AS t$tdef " +
      "ORDER BY ALL")
  }

  /** All frozen oracles keyed by query name (for SparkEntry.oracleSql). */
  def all: Map[String, String] =
    names.flatMap(n => oracleFor(n).map(n -> _)).toMap
}
