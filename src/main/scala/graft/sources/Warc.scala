package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC ingest (ISO 28500) — the container format web crawls actually
  * arrive in (Common Crawl, Heritrix, wget --warc). Completes the
  * crawl-native path end to end:
  *
  *   WARC file -> response records (url, bytes, Content-Type)
  *     -> HtmlExtract.extractAllBytes (charset ladder)
  *       -> WebPrep (robots gate + canonical URL dedup)
  *         -> CorpusPrep (content dedup + quality)
  *
  * Format notes (all from the public ISO 28500 spec + the Common Crawl
  * convention):
  *  - a WARC file is a sequence of records; each record is a version
  *    line (`WARC/1.0` / `WARC/1.1`), CRLF-separated named header
  *    fields, a blank line, exactly `Content-Length` octets of block,
  *    then CRLF CRLF;
  *  - `response` records hold a full HTTP response in the block: status
  *    line + headers + CRLF CRLF + payload. The PAYLOAD is the page
  *    bytes; the HTTP `Content-Type` header feeds the charset ladder;
  *  - `.warc.gz` files are per-record gzip MEMBERS concatenated —
  *    `GZIPInputStream` consumes multi-member streams, so one streaming
  *    decompressor covers the whole file;
  *  - header names are case-insensitive; block bytes are binary (the
  *    Content-Length framing, never delimiters, bounds them).
  *
  * Scale shape: files are read via `sparkContext.binaryFiles`
  * (PortableDataStream — each task STREAMS its file; memory is bounded
  * by the largest single record, not the file), one task per WARC file
  * — the standard WARC-on-Spark layout, map-only. A truncated or
  * malformed record ends that file's iteration and counts on
  * `failedAcc` (the per-row failure convention); records already parsed
  * are kept.
  */
object Warc {

  /** One parsed record (response records carry the HTTP split;
    * `httpLocation` is the raw Location header of a redirect response,
    * "" otherwise; `refersTo` is a `revisit` record's
    * WARC-Refers-To-Target-URI — or its WARC-Refers-To record id when
    * the URI form is absent — "" for other types; `payloadError` names
    * the HTTP transfer/content coding that could not be decoded, "" when
    * the payload is clean — the per-RECORD failure seam: a bad payload
    * must not end the file's iteration the way a torn WARC frame does,
    * because the Content-Length framing around it is intact).
    */
  final case class WarcRecord(
      recordId: String, warcType: String, targetUri: String,
      warcDate: String, httpStatus: Int, httpContentType: String,
      body: Array[Byte], httpLocation: String = "",
      refersTo: String = "", payloadError: String = "",
      httpEtag: String = "", httpLastModified: String = "",
      // opt-in extra HTTP response headers (see records(extraHeaders)):
      // lowercase name -> newline-joined values (one line per header
      // instance — the shape Web.optOutSignals' per-line scope reset
      // expects); absent headers are absent keys
      extra: Map[String, String] = Map.empty)

  private val CRLF = "\r\n"

  /** Absolute cap on one record's DECODED payload: a hostile gzip bomb
    * inside a single response record must not balloon a task (the WARC
    * Content-Length bounds only the compressed form). 1 GiB — far above
    * any real page, same spirit as the Sitemap spec caps.
    */
  val MaxDecodedPayload: Long = 1L << 30

  /** Read one CRLF-terminated ASCII line from the stream; null at EOF
    * before any byte. WARC header lines are ASCII by spec.
    */
  private def readLine(in: java.io.InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0) {
      if (c == '\n') {
        val s = sb.toString
        return if (s.nonEmpty && s.charAt(s.length - 1) == '\r')
          s.substring(0, s.length - 1) else s
      }
      sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      require(r >= 0, s"WARC truncated: wanted $n block bytes, got $off")
      off += r
    }
    buf
  }

  /** Parse `name: value` header lines up to the blank separator into a
    * lowercased-name map (first occurrence wins, like the crawlers).
    */
  private def readHeaders(in: java.io.InputStream): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    val seen = scala.collection.mutable.Set.empty[String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) {
        val k = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        if (seen.add(k)) m += k -> line.substring(i + 1).trim
      }
      line = readLine(in)
    }
    m.result()
  }

  // ---------- HTTP payload decoding (RFC 9112 §7.1 + RFC 9110 §8.4) ----------
  // Real crawl WARCs (Heritrix, wget --warc) store the raw HTTP message:
  // a `Transfer-Encoding: chunked` body carries hex chunk-size lines and
  // a `Content-Encoding: gzip` body is binary — both must be decoded
  // BEFORE the charset ladder or the page text is silently mojibake.
  // Codings are applied by the sender in list order, so the receiver
  // decodes each list in REVERSE; Transfer-Encoding is undone before
  // Content-Encoding. Unknown codings (br, ...) are a per-record
  // payload failure, never a guess; zstd decodes via the zstd-jni
  // Spark already ships.

  /** A chunked framing that ran off the END of the available bytes —
    * the mid-stream-cut shape (size line cut, chunk data shorter than
    * its declared size, trailer cut). DISTINCT from malformed framing
    * (non-hex size line, negative size) so `tolerateTruncation` can
    * never excuse actual framing damage: a marked-truncated record is a
    * record whose TAIL is missing, not one whose framing is garbage.
    */
  private final class ChunkTruncated(msg: String)
    extends RuntimeException(msg)

  /** RFC 9112 §7.1 chunked de-framing: hex size line (`;ext` tolerated),
    * CRLF, exactly `size` octets, CRLF, repeat; terminal 0-size chunk
    * then trailer lines until a blank. Bare-LF line endings tolerated
    * (real servers emit them). Malformed/truncated framing throws — the
    * caller maps it onto the record's `payloadError` seam, or, when the
    * record is MARKED truncated (`tolerateTruncation`, see
    * [[decodeHttpPayload]]), keeps the de-framed prefix for a framing
    * that merely ran off the end (including a partial final chunk's
    * available bytes — a browser renders them). Genuinely malformed
    * framing (non-hex size line) throws EVEN under tolerance: a cut
    * removes the tail, it cannot corrupt the bytes before it.
    */
  private[graft] def deChunk(b: Array[Byte]): Array[Byte] =
    deChunk(b, tolerateTruncation = false)

  private def deChunk(b: Array[Byte], tolerateTruncation: Boolean)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    def line(): String = {
      val nl = {
        var j = i
        while (j < b.length && b(j) != '\n') j += 1
        if (j >= b.length)
          throw new ChunkTruncated("chunked payload cut inside a line")
        j
      }
      val end = if (nl > i && b(nl - 1) == '\r') nl - 1 else nl
      val s = new String(b, i, end - i, "US-ASCII")
      i = nl + 1
      s
    }
    var more = true
    try {
      while (more) {
        val sizeTok = line().takeWhile(c => c != ';' && !c.isWhitespace)
        // a non-hex size line is DAMAGE, not truncation (NumberFormat
        // propagates). parseLong accepts a leading '-' sign, which RFC
        // 9112 chunk-size grammar does not — reject it EXPLICITLY
        // (malformed, never tolerated) rather than relying on the
        // downstream array-bounds check to happen to throw
        val size = java.lang.Long.parseLong(sizeTok, 16)
        if (size < 0)
          throw new NumberFormatException(s"negative chunk size '$sizeTok'")
        if (size > b.length - i) {
          // the declared chunk extends past the cut: keep the partial
          // final chunk's available bytes, then report truncation
          val avail = b.length - i
          out.write(b, i, avail)
          i = b.length
          throw new ChunkTruncated(
            s"chunk of $size octets cut after $avail available")
        }
        if (size == 0L) {
          // trailer section: header lines until the blank terminator (a
          // cut inside the trailer is a truncation — the data itself is
          // already whole)
          var t = if (i < b.length) line() else ""
          while (t.nonEmpty && i < b.length) t = line()
          more = false
        } else {
          out.write(b, i, size.toInt)
          i += size.toInt
          // the CRLF after the chunk data
          if (i < b.length) line()
        }
      }
    } catch {
      // ONLY a ran-off-the-end cut is tolerable; malformed framing
      // (NumberFormatException and anything else) always propagates
      case e: ChunkTruncated =>
        if (!tolerateTruncation) throw e // else: keep the prefix
    }
    out.toByteArray
  }

  /** A [[MaxDecodedPayload]] violation — distinct from a truncation so
    * the tolerance catch can NEVER swallow it: a marked-truncated record
    * carrying a decompression bomb must still fail the record.
    */
  private final class PayloadCapExceeded
    extends RuntimeException("decoded payload exceeds cap")

  /** THE shared drain for every content-coding decoder: construct the
    * decoding stream (`mkIn`, BY NAME — some decoders read their header
    * in the constructor, e.g. GZIPInputStream, and a header cut must
    * fall under the same tolerance as a mid-stream cut) and read it
    * fully under the cap. Cap violations always throw
    * ([[PayloadCapExceeded]]); any other decode error under
    * `tolerateTruncation` returns the prefix read so far (possibly
    * empty — a record cut inside the coding header still lands, as an
    * empty body, per the marked-truncation contract).
    */
  private def drainCapped(mkIn: => java.io.InputStream, sizeHint: Int,
      tolerateTruncation: Boolean, maxDecoded: Long): Array[Byte] = {
    var in: java.io.InputStream = null
    try {
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(sizeHint, 64), 1 << 20))
      val buf = new Array[Byte](1 << 16)
      try {
        in = mkIn
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size() > maxDecoded) throw new PayloadCapExceeded
          n = in.read(buf)
        }
      } catch {
        case e: PayloadCapExceeded => throw e
        case scala.util.control.NonFatal(e) =>
          if (!tolerateTruncation) throw e
      }
      out.toByteArray
    } finally if (in != null) in.close()
  }

  /** Fully inflate one gzip payload (multi-member tolerated), capped.
    * With `tolerateTruncation` a mid-stream (or in-header) EOF returns
    * the inflated prefix instead of throwing.
    */
  private def gunzipAll(b: Array[Byte], tolerateTruncation: Boolean,
      maxDecoded: Long): Array[Byte] =
    drainCapped(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 1 << 16),
      b.length * 4, tolerateTruncation, maxDecoded)

  /** Inflate one `deflate` payload. The web's deflate mess: RFC 9110
    * says zlib-wrapped, but a long tail of servers send RAW deflate —
    * try zlib first, retry nowrap on a header error (the standard
    * browser fallback). Inflaters are `end()`ed deterministically.
    */
  private def inflateAll(b: Array[Byte], nowrap: Boolean,
      tolerateTruncation: Boolean, maxDecoded: Long): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      val out = drainCapped(new java.util.zip.InflaterInputStream(
        new java.io.ByteArrayInputStream(b), inf, 1 << 16),
        b.length * 4, tolerateTruncation, maxDecoded)
      // InflaterInputStream reads EOF when the inflater wants a preset
      // dictionary (zlib FDICT) — that is UNDECODABLE, not truncated,
      // and must fail even under tolerance (the pre-refactor guard)
      if (inf.needsDictionary)
        throw new java.util.zip.ZipException("deflate needs preset dictionary")
      out
    } finally inf.end()
  }

  private def deflateDecode(b: Array[Byte], tolerateTruncation: Boolean,
      maxDecoded: Long): Array[Byte] = {
    val zlib =
      try Some(inflateAll(b, nowrap = false, tolerateTruncation, maxDecoded))
      catch {
        // a cap violation is final — the raw retry of a BOMB must not
        // downgrade it to a tolerated empty prefix
        case e: PayloadCapExceeded => throw e
        case scala.util.control.NonFatal(_) => None
      }
    // under TOLERANCE an empty zlib result is ambiguous — the tolerant
    // pass may have swallowed a raw-deflate wrap error with no output —
    // so retry raw; without tolerance an empty zlib result is a genuine
    // empty body (the wrap error would have thrown) and stands
    zlib.filter(r => r.nonEmpty || !tolerateTruncation)
      .getOrElse(inflateAll(b, nowrap = true, tolerateTruncation, maxDecoded))
  }

  /** RFC 8878 zstd (nginx/Cloudflare emit `Content-Encoding: zstd`),
    * via the zstd-jni Spark itself ships for shuffle compression —
    * already on every executor classpath, no new dependency. Same cap
    * and truncation-tolerance shape as gzip. Default (non-continuous)
    * mode measured: concatenated frames all decode AND a mid-frame EOF
    * throws — exactly the gzip contract; continuous mode would swallow
    * truncation silently (probed and rejected).
    */
  private def zstdDecode(b: Array[Byte], tolerateTruncation: Boolean,
      maxDecoded: Long): Array[Byte] =
    drainCapped(new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(b)),
      b.length * 4, tolerateTruncation, maxDecoded)

  /** Decode one HTTP payload under its Transfer-Encoding and
    * Content-Encoding header values (either may be a comma-separated
    * coding list; "" = absent). Returns Right(decoded bytes) or
    * Left(the coding token that failed / was unknown).
    *
    * PERMANENT CONTRACT — brotli (`Content-Encoding: br`, RFC 7932):
    * NOT decoded, by design, the same class of contract as the H.26x
    * video stub (graft.ops.Multimodal). A correct brotli decoder
    * requires the spec's static dictionary — ~120 KB of opaque binary
    * data (RFC 7932 appendix A) that neither the JVM nor Spark ships,
    * and this build has no external dependencies to pull it from; a
    * dictionary-LESS decoder would mis-decode nearly every real-world
    * br stream (servers emit dictionary back-references on typical
    * HTML), which is strictly worse than failing loudly. So `br` (and
    * any other unknown token) takes the counted per-record failure
    * seam: `Left("br")` -> the record's `payloadError` / the reader's
    * `failedAcc` — never silent mojibake, never a dropped file. The
    * x30 gate freezes this contract; a deployment that needs brotli
    * plugs a decoder into exactly the `case` below.
    *
    * `tolerateTruncation` is set for records the crawler MARKED
    * truncated (`WARC-Truncated`, ISO 28500 §5.13 — Common Crawl cuts
    * payloads at ~1 MB and marks them): a mid-stream EOF in the
    * chunked/gzip/deflate decode then yields the decoded PREFIX (what a
    * browser would render) instead of a payload failure; genuinely
    * corrupt data still fails because an UNmarked record gets no
    * tolerance.
    */
  private[graft] def decodeHttpPayload(transferEncoding: String,
      contentEncoding: String, body: Array[Byte],
      tolerateTruncation: Boolean = false,
      maxDecoded: Long = MaxDecodedPayload)
      : Either[String, Array[Byte]] = {
    def codings(v: String): Seq[String] =
      if (v == null || v.isEmpty) Nil
      else v.split(',').toSeq.map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
    var cur = body
    // reverse order: the LAST-applied coding is undone first
    (codings(transferEncoding).reverse ++ codings(contentEncoding).reverse)
      .foreach { c =>
        try {
          c match {
            case "chunked" => cur = deChunk(cur, tolerateTruncation)
            case "gzip" | "x-gzip" =>
              cur = gunzipAll(cur, tolerateTruncation, maxDecoded)
            case "deflate" =>
              cur = deflateDecode(cur, tolerateTruncation, maxDecoded)
            case "zstd" => cur = zstdDecode(cur, tolerateTruncation, maxDecoded)
            case "identity" | "none" => ()
            // brotli ("br") lands here BY PERMANENT CONTRACT (see the
            // scaladoc): a counted failure, never a guess
            case other => return Left(other)
          }
        } catch {
          case scala.util.control.NonFatal(_) => return Left(c)
        }
      }
    Right(cur)
  }

  /** Streaming record iterator over a raw (already-decompressed if
    * needed) WARC stream. Lazy: one record in memory at a time.
    * `decodePayloads = false` skips the HTTP transfer/content-coding
    * decode entirely — for consumers that never read response BODIES
    * (revisits, WET conversion rows), so a shard is not pointlessly
    * de-gzipped record by record. The envelope split (status, headers,
    * Location, validators) always runs.
    */
  def records(in0: java.io.InputStream,
      decodePayloads: Boolean = true,
      extraHeaders: Seq[String] = Nil): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val in = new java.io.BufferedInputStream(in0, 1 << 16)
      private var nextRec: WarcRecord = null
      private var done = false

      private def advance(): Unit = {
        // skip inter-record blank lines, find the version line
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; return }
        require(line.startsWith("WARC/"),
          s"not a WARC record boundary: '${line.take(40)}'")
        val h = readHeaders(in)
        val len = h.getOrElse("content-length",
          sys.error("WARC record without Content-Length")).toInt
        val block = readFully(in, len)
        val typ = h.getOrElse("warc-type", "")
        var status = 0
        var httpCt = ""
        var location = ""
        var etag = ""
        var lastModified = ""
        var body = block
        var payloadError = ""
        var extra = Map.empty[String, String]
        if (typ == "response" && block.length >= 5 &&
            new String(block, 0, 5, "US-ASCII") == "HTTP/") {
          // split the HTTP envelope: status line + headers + CRLFCRLF
          val sep = indexOfCrlfCrlf(block)
          val headEnd = if (sep < 0) block.length else sep
          val head = new String(block, 0, headEnd, "ISO-8859-1")
          val lines = head.split("\r\n|\n")
          status = lines.headOption.map(_.split("\\s+"))
            .filter(_.length >= 2).flatMap(a => a(1).toIntOption).getOrElse(0)
          def header(name: String): String = lines.drop(1)
            .find(_.toLowerCase(java.util.Locale.ROOT).startsWith(name + ":"))
            .map(l => l.substring(l.indexOf(':') + 1).trim).getOrElse("")
          httpCt = header("content-type")
          location = header("location")
          etag = header("etag")
          lastModified = header("last-modified")
          if (extraHeaders.nonEmpty) {
            // ALL instances of a repeatable header, one value per line —
            // separately-sent headers must not share parse state
            // downstream (X-Robots-Tag ua scopes reset per header)
            def headerAll(name: String): String = lines.drop(1)
              .filter(_.toLowerCase(java.util.Locale.ROOT)
                .startsWith(name + ":"))
              .map(l => l.substring(l.indexOf(':') + 1).trim)
              .mkString("\n")
            extra = extraHeaders.flatMap { n =>
              val key = n.toLowerCase(java.util.Locale.ROOT)
              val v = headerAll(key)
              if (v.isEmpty) None else Some(key -> v)
            }.toMap
          }
          body = if (sep < 0) Array.emptyByteArray
          else java.util.Arrays.copyOfRange(block, sep + 4, block.length)
          // de-frame chunked transfer + inflate gzip/deflate BEFORE the
          // payload ever meets the charset ladder; an unknown or broken
          // coding flags THIS record and empties its body (mojibake must
          // never decode silently) — unless the crawler MARKED the
          // record truncated, in which case the decoded prefix is kept.
          // ALL response statuses decode under decodePayloads=true (the
          // public records() contract: body is never wire-encoded bytes
          // posing as text); consumers that read no bodies at all pass
          // decodePayloads=false instead
          if (decodePayloads)
            decodeHttpPayload(header("transfer-encoding"),
                header("content-encoding"), body,
                tolerateTruncation = h.contains("warc-truncated")) match {
              case Right(decoded) => body = decoded
              case Left(coding) =>
                payloadError = coding; body = Array.emptyByteArray
            }
        }
        // a revisit record's identity: the refetched URI (or the record
        // id of the capture it deduplicates to, when the URI is absent)
        val refersTo =
          if (typ == "revisit")
            h.getOrElse("warc-refers-to-target-uri",
              h.getOrElse("warc-refers-to", ""))
              .stripPrefix("<").stripSuffix(">")
          else ""
        nextRec = WarcRecord(
          h.getOrElse("warc-record-id", ""), typ,
          // Common Crawl wraps the URI in <...> in some generators
          h.getOrElse("warc-target-uri", "").stripPrefix("<").stripSuffix(">"),
          h.getOrElse("warc-date", ""), status, httpCt, body, location,
          refersTo, payloadError, etag, lastModified, extra)
      }

      private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
        var i = 0
        while (i + 3 < b.length) {
          if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
            b(i + 3) == '\n') return i
          i += 1
        }
        -1
      }

      def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** 0 = auto: 6x total cores — the straggler/overlap sweet spot the
    * crawlio probe measured (see [[responses]]'s scaladoc). CAVEAT:
    * `defaultParallelism` reflects only the executors registered at
    * call time, so a job that builds its sources immediately after
    * session startup on a dynamic cluster can undercount — the floor
    * below (the old fixed default) bounds the damage, but on a large
    * cluster pass `minPartitions` explicitly (or size from the intended
    * executor count) rather than trusting a cold session's view.
    */
  private[graft] def autoParts(spark: SparkSession, minPartitions: Int): Int =
    if (minPartitions > 0) minPartitions
    else math.max(spark.sparkContext.defaultParallelism * 6, 32)

  private def isGzip(in: java.io.InputStream): java.io.InputStream = {
    val b = new java.io.BufferedInputStream(in, 1 << 16)
    b.mark(2)
    val m0 = b.read(); val m1 = b.read()
    b.reset()
    if (m0 == 0x1f && m1 == 0x8b)
      // multi-member: GZIPInputStream consumes concatenated members
      new java.util.zip.GZIPInputStream(b, 1 << 16)
    else b
  }

  /** THE lazy per-file scaffold every WARC-family reader shares: gzip
    * sniff, streaming record parse, per-record row selection via `f`,
    * the failure seam (a torn WARC frame ends THIS file's iteration,
    * prefix kept, counted once on `failedAcc`), and deterministic close
    * — on exhaustion, on failure, AND via a task-completion listener
    * when one is available, because an early-terminating plan
    * (limit/take/show) abandons a flatMap iterator mid-stream and would
    * otherwise leak a file handle per touched WARC file. Memory is
    * bounded by the largest single record (a 1 GB Common Crawl shard
    * must never buffer whole).
    */
  private def lazyRows[T >: Null <: AnyRef](in0: java.io.InputStream,
      failedAcc: Option[org.apache.spark.util.LongAccumulator],
      f: WarcRecord => Option[T],
      decodePayloads: Boolean = true,
      extraHeaders: Seq[String] = Nil): Iterator[T] =
    new Iterator[T] {
      private val in = isGzip(in0)
      private val it = records(in, decodePayloads, extraHeaders)
      private var nextRow: T = null
      private var done = false
      private var closed = false
      private def close(): Unit =
        if (!closed) {
          closed = true
          try in.close() catch { case scala.util.control.NonFatal(_) => () }
        }
      locally {
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
      }
      private def advance(): Unit =
        while (nextRow == null && !done) {
          // a malformed record throws inside hasNext (the lazy advance)
          // or next: keep what parsed, count the file once, stop
          try {
            if (!it.hasNext) { done = true; close() }
            else f(it.next()).foreach(nextRow = _)
          } catch {
            case scala.util.control.NonFatal(_) =>
              failedAcc.foreach(_.add(1L)); done = true; close()
          }
        }
      def hasNext: Boolean = { advance(); nextRow != null }
      def next(): T = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }

  /** The shared LAZY parse of [[responses]] / [[responsesStream]]:
    * HTTP-200 pages + 3xx-with-Location edges + 304-not-modified
    * revalidations as 9-tuples (incl. the etag / last_modified
    * validators) over [[lazyRows]]. A record whose HTTP payload failed
    * to decode (unknown/broken transfer or content coding) is skipped
    * and counted on `failedAcc` — per RECORD, because the WARC framing
    * around it is intact and the rest of the file must still land.
    *
    * 304 rows are the RESPONSE half of the conditional-refetch story
    * ([[graft.pipeline.WebPrep.planWithValidators]] is the request
    * half, RFC 9110 §15.4.5): a crawler that revalidated a page gets a
    * body-less 304, and that capture must (a) refresh the url's
    * staleness clock — it lands here with its WARC-Date, so a
    * responses∪revisits fetch log feeds
    * [[graft.pipeline.WebPrep.frontierStale]] the revalidation time —
    * (b) count as a fetch attempt, and (c) NEVER become a document:
    * its body row is always empty and every document path
    * ([[extractAll]], [[graft.pipeline.CrawlLoop.webFromBytes]],
    * [[graft.pipeline.WebPrep.prepareBytesStream]],
    * [[graft.job.ExtractJob]]'s html_bytes kind) filters to
    * `http_status = 200`. Its etag/last_modified rows also carry any
    * REFRESHED validators the server sent with the 304 (RFC 9110
    * §15.4.5 allows updating them).
    */
  /** THE response gate, shared by [[responses]] and
    * [[responsesWithHeaders]] so the keep/shape rules (which statuses
    * land, when a payload failure counts, whose body is content) can
    * never diverge between the two readers.
    */
  private def responseTuple(r: WarcRecord,
      failedAcc: Option[org.apache.spark.util.LongAccumulator])
      : Option[(String, String, String, Int, String, Array[Byte],
        String, String, String)] = {
    val isRedirect = r.httpStatus >= 300 && r.httpStatus < 400 &&
      r.httpLocation.nonEmpty
    val isRevalidation = r.httpStatus == 304
    if (r.warcType != "response" ||
        !(r.httpStatus == 200 || isRedirect || isRevalidation)) None
    // a payload failure only matters when the body is the CONTENT: a
    // redirect's (discarded) error-page body must not cost the edge,
    // and a 304 has no body by definition
    else if (r.httpStatus == 200 && r.payloadError.nonEmpty) {
      failedAcc.foreach(_.add(1L)); None
    } else
      Some((r.recordId, r.targetUri, r.httpContentType,
        r.httpStatus, r.warcDate,
        // only a 200's body is content; a redirect's is an error
        // page and a 304's is empty by spec
        if (r.httpStatus == 200) r.body else Array.emptyByteArray,
        r.httpLocation,
        // the HTTP validators a conditional refetch needs
        // (If-None-Match / If-Modified-Since — see
        // WebPrep.planWithValidators)
        r.httpEtag, r.httpLastModified))
  }

  private def parseResponses(in0: java.io.InputStream,
      failedAcc: Option[org.apache.spark.util.LongAccumulator])
      : Iterator[(String, String, String, Int, String, Array[Byte],
        String, String, String)] =
    lazyRows(in0, failedAcc, responseTuple(_, failedAcc))

  /** The crawl-ingest operator: every HTTP-200 `response` record of
    * every WARC file under `path` (glob ok; `.warc` and `.warc.gz`
    * both), PLUS every 3xx redirect response carrying a Location (their
    * targets are crawl edges — see [[redirectEdges]]), PLUS every
    * 304-not-modified revalidation (body-less freshness events — see
    * [[parseResponses]]; document consumers filter `http_status = 200`
    * as ever), as rows ready for
    * [[graft.html.HtmlExtract.extractAllBytes]] /
    * [[graft.pipeline.WebPrep]]:
    *
    *   (doc_id = WARC-Record-ID, url = WARC-Target-URI,
    *    content_type = HTTP Content-Type, http_status, fetch_ts =
    *    WARC-Date, html_bytes = HTTP payload (transfer/content codings
    *    decoded), redirect = raw Location header or "", etag /
    *    last_modified = the HTTP validators, "" when absent — the
    *    conditional-refetch feed of [[graft.pipeline.WebPrep.planWithValidators]])
    *
    * One streaming task per file (binaryFiles); `minPartitions` spreads
    * small file counts across the cluster. The default (0 = auto) is 6x
    * `defaultParallelism` — SEVERAL tasks per core, not 1x: at one task
    * per core a straggling wave idles cores for its whole tail and
    * gunzip I/O cannot overlap extraction CPU — the crawlio probe
    * measured ~3x lower throughput and 0.52 vs 0.84 scaling efficiency
    * at 1x (BENCH/BASELINE.md, round 5). A malformed tail ends that
    * FILE's parse (records before it are kept) and counts on
    * `failedAcc` — never aborts the job.
    */
  def responses(spark: SparkSession, path: String, minPartitions: Int = 0,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path, autoParts(spark, minPartitions))
      .flatMap { case (_, pds) => parseResponses(pds.open(), failedAcc) }
      .toDF("doc_id", "url", "content_type", "http_status", "fetch_ts",
        "html_bytes", "redirect", "etag", "last_modified")
  }

  /** [[responses]] plus opt-in RAW header columns — the ingest seam for
    * header-level opt-out and policy signals ([[graft.ops.Web
    * .optOutSignals]]: X-Robots-Tag, tdm-reservation, tdm-policy) or
    * any other response header a pipeline wants to carry without a
    * second pass over the crawl. One nullable string column per
    * requested name (lowercased, '-' -> '_', so `x-robots-tag` lands as
    * `x_robots_tag` — exactly optOutSignals' default input columns);
    * repeated header instances arrive newline-joined, one line per
    * instance, preserving the per-header scope-reset semantics. Kept
    * SEPARATE from [[responses]] so the base reader's frozen gate
    * schemas (x19/x25/x26) never churn: headers are a pay-for-what-you-
    * ask column set, not a default.
    */
  def responsesWithHeaders(spark: SparkSession, path: String,
      headerNames: Seq[String], minPartitions: Int = 0,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(headerNames.nonEmpty, "ask for at least one header (or use responses)")
    val wanted = headerNames.map(_.toLowerCase(java.util.Locale.ROOT))
    val schema = org.apache.spark.sql.types.StructType(
      Seq(("doc_id", org.apache.spark.sql.types.StringType),
        ("url", org.apache.spark.sql.types.StringType),
        ("content_type", org.apache.spark.sql.types.StringType),
        ("http_status", org.apache.spark.sql.types.IntegerType),
        ("fetch_ts", org.apache.spark.sql.types.StringType),
        ("html_bytes", org.apache.spark.sql.types.BinaryType),
        ("redirect", org.apache.spark.sql.types.StringType),
        ("etag", org.apache.spark.sql.types.StringType),
        ("last_modified", org.apache.spark.sql.types.StringType))
        .map { case (n, t) => org.apache.spark.sql.types.StructField(n, t) } ++
      wanted.map(n => org.apache.spark.sql.types.StructField(
        n.replace('-', '_'), org.apache.spark.sql.types.StringType)))
    val rdd = spark.sparkContext
      .binaryFiles(path, autoParts(spark, minPartitions))
      .flatMap { case (_, pds) =>
        lazyRows[org.apache.spark.sql.Row](pds.open(), failedAcc, { r =>
          responseTuple(r, failedAcc).map(t =>
            org.apache.spark.sql.Row.fromSeq(t.productIterator.toSeq ++
              wanted.map(n => r.extra.get(n).orNull)))
        }, decodePayloads = true, extraHeaders = wanted)
      }
    spark.createDataFrame(rdd, schema)
  }

  /** STREAMING WARC ingest for a continuously-landing crawl: as shards
    * arrive under `dir`, each micro-batch parses only the NEW files
    * into the same rows as [[responses]] plus `event_time` — the
    * record's own WARC-Date (capture time) when it parses as a
    * timestamp, else the shard's file modification time. Preferring the
    * in-band capture clock matters operationally: mtime-preserving
    * placement (`aws s3 sync`, `rsync -t`, distcp, backfills of old
    * shards) would otherwise land rows hours behind the watermark and
    * the downstream dedup would silently drop them as late.
    *
    * File-source checkpointing makes each shard exactly-once — WHICH
    * REQUIRES ATOMIC PLACEMENT (write to a temp name outside `dir`,
    * then rename in; the universal Spark file-source contract): a shard
    * written in place can be read mid-write, and its tail is then never
    * re-read. The malformed-tail seam is per-file as in batch.
    *
    * Memory shape: the `binaryFile` source delivers a whole shard per
    * row (the parse itself stays record-lazy), so a task holds one
    * shard's bytes — keep shards at the few-hundred-MB crawl convention
    * and size executors accordingly; `maxFilesPerTrigger` bounds a
    * micro-batch.
    */
  // the binaryFile source's FIXED schema, stated explicitly (a
  // streaming source cannot infer one)
  private def binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  def responsesStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 8,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(org.apache.spark.sql.functions.col("modificationTime"),
        org.apache.spark.sql.functions.col("content"))
      .as[(java.sql.Timestamp, Array[Byte])]
      .flatMap { case (ts, bytes) =>
        parseResponses(new java.io.ByteArrayInputStream(bytes), failedAcc)
          .map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9, ts))
      }
      .toDF("doc_id", "url", "content_type", "http_status", "fetch_ts",
        "html_bytes", "redirect", "etag", "last_modified", "landed_time")
      .withColumn("event_time",
        org.apache.spark.sql.functions.coalesce(
          // try_: a malformed WARC-Date must fall back, not throw (ANSI)
          org.apache.spark.sql.functions.expr("try_to_timestamp(fetch_ts)"),
          org.apache.spark.sql.functions.col("landed_time")))
      .drop("landed_time")
  }

  /** STREAMING twin of [[revisits]], shaped like [[responsesStream]]:
    * as crawl shards land, each micro-batch surfaces the NEW files'
    * revisit records as `(url, fetch_ts, refers_to, event_time)` rows —
    * the continuously-updating refetch feed for a streaming fetch log
    * (the batch union in the [[revisits]] scaladoc, on arrival). Same
    * exactly-once/atomic-placement and event-clock contract as
    * [[responsesStream]].
    */
  def revisitsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 8,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(org.apache.spark.sql.functions.col("modificationTime"),
        org.apache.spark.sql.functions.col("content"))
      .as[(java.sql.Timestamp, Array[Byte])]
      .flatMap { case (ts, bytes) =>
        lazyRows(new java.io.ByteArrayInputStream(bytes), failedAcc, { r =>
          if (r.warcType == "revisit")
            Some((r.targetUri, r.warcDate, r.refersTo, ts))
          else None
        }, decodePayloads = false)
      }
      .toDF("url", "fetch_ts", "refers_to", "landed_time")
      .withColumn("event_time",
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.expr("try_to_timestamp(fetch_ts)"),
          org.apache.spark.sql.functions.col("landed_time")))
      .drop("landed_time")
  }

  /** The redirect EDGES of a responses/landing frame: one row per 3xx
    * response with a Location, `(url, redirect_url)` — the raw Location
    * resolved RFC 3986-style against the fetch URL (relative Locations
    * are ubiquitous despite RFC 7231 only blessing URI references) and
    * canonicalized with the SAME chain the frontier keys on, ready to
    * union into the next cycle's frontier:
    * {{{
    *   val edges = Warc.redirectEdges(Warc.responses(spark, warcPath))
    *   val next  = frontierNext.union(edges.select("redirect_url")).distinct()
    * }}}
    * Map-only; null/empty targets drop.
    */
  def redirectEdges(responses: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, udf}
    val resolve = udf((base: String, loc: String) =>
      graft.html.HtmlExtract.resolveRef(
        if (base == null) "" else base, loc))
    responses
      .filter(col("http_status") >= 300 && col("http_status") < 400 &&
        col("redirect").isNotNull && col("redirect") =!= "")
      .select(col("url"),
        graft.ops.Web.canonicalUrl(resolve(col("url"), col("redirect")))
          .as("redirect_url"))
      .filter(col("redirect_url").isNotNull)
  }

  /** The `revisit` records of a crawl — Common Crawl and Heritrix emit
    * one per URL re-fetch whose payload was deduplicated away
    * (WARC-Refers-To points at the original capture), so a deduplicated
    * crawl's refetch EVENTS live here, not in `response` records. A
    * fetch log built from [[responses]] alone would see such a page as
    * never-refetched and [[graft.pipeline.WebPrep.frontierStale]] would
    * recrawl it forever; union these rows into the fetched/staleness
    * feeds:
    * {{{
    *   val fetched = Warc.responses(spark, path).select("url", "fetch_ts")
    *     .union(Warc.revisits(spark, path).select("url", "fetch_ts"))
    *   val stale = WebPrep.frontierStale(seeds, fetched)
    * }}}
    * Rows: `(url = WARC-Target-URI, fetch_ts = WARC-Date, refers_to =
    * WARC-Refers-To-Target-URI, or the referred record id when the URI
    * header is absent)` — no payload (a revisit block holds at most the
    * HTTP headers of the duplicate response). Same per-file streaming /
    * failure shape as [[responses]].
    */
  def revisits(spark: SparkSession, path: String, minPartitions: Int = 0,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path, autoParts(spark, minPartitions))
      .flatMap { case (_, pds) =>
        lazyRows(pds.open(), failedAcc, { r =>
          if (r.warcType == "revisit")
            Some((r.targetUri, r.warcDate, r.refersTo))
          else None
        }, decodePayloads = false) // bodies never read: skip the decode
      }
      .toDF("url", "fetch_ts", "refers_to")
  }

  /** WARC -> extracted web documents in one composed call: the full
    * crawl-native path (responses -> charset ladder -> one-pass
    * extractAll). Returns the WebDoc columns.
    */
  def extractAll(spark: SparkSession, path: String, minPartitions: Int = 0,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.html.HtmlExtract.extractAllBytes(
      responses(spark, path, minPartitions, failedAcc)
        .filter(col("http_status") === 200), // redirects are edges, not pages
      htmlCol = "html_bytes", contentTypeCol = Some("content_type"),
      pageUrlCol = Some("url"), failedAcc = failedAcc).toDF()
  }

  // ---------- writers ----------

  /** One record onto `out`: version line, headers, Content-Length
    * framing, block, record terminator — optionally as its own gzip
    * member (the Common Crawl `.gz` shape). Shared by the WARC fixture
    * writer and the WET sink.
    */
  private def writeRecord(out: java.io.OutputStream,
      headers: Seq[(String, String)], block: Array[Byte],
      gzipPerRecord: Boolean): Unit = {
    val sb = new java.lang.StringBuilder()
    sb.append("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(CRLF) }
    sb.append("Content-Length: ").append(block.length).append(CRLF)
    sb.append(CRLF)
    val rec = new java.io.ByteArrayOutputStream()
    rec.write(sb.toString.getBytes("US-ASCII"))
    rec.write(block)
    rec.write((CRLF + CRLF).getBytes("US-ASCII"))
    if (gzipPerRecord) {
      // close() (not just finish()) so the Deflater's native buffer is
      // released deterministically — a WET shard writes one member per
      // document and must not lean on GC timing for native memory; the
      // non-closing wrapper keeps the underlying shard stream open
      val gz = new java.util.zip.GZIPOutputStream(nonClosing(out))
      gz.write(rec.toByteArray); gz.close()
    } else out.write(rec.toByteArray)
  }

  private def nonClosing(under: java.io.OutputStream): java.io.OutputStream =
    new java.io.FilterOutputStream(under) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        under.write(b, off, len)
      override def close(): Unit = under.flush()
    }

  /** Serialize (url, contentType, body) responses as a REAL WARC file:
    * a `warcinfo` record then one `response` record per page, each with
    * a full HTTP envelope. `gzipPerRecord` writes the Common Crawl
    * `.warc.gz` shape (one gzip member per record). Deterministic for
    * the plain form; the gzip form is exercised in unit tests only (the
    * deflate byte stream is JDK-build-pinned, same caveat as the JPEG
    * writer — gates freeze the PLAIN form).
    */
  def writeWarc(pages: Seq[(String, String, Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] =
    writeWarcWithStatus(
      pages.map { case (url, ct, body) => (url, ct, body, 200, "") },
      gzipPerRecord)

  /** [[writeWarc]] with explicit HTTP status + Location per record —
    * the fixture writer for redirect responses (status 3xx, location
    * non-empty emits a Location header and no meaningful body).
    */
  def writeWarcWithStatus(
      pages: Seq[(String, String, Array[Byte], Int, String)],
      gzipPerRecord: Boolean = false): Array[Byte] =
    writeWarcRecords(pages.map { case (url, ct, body, status, loc) =>
      HttpFixture(url, ct, body, status = status, location = loc)
    }, gzipPerRecord)

  /** One fixture record for [[writeWarcRecords]]. `transferEncoding` /
    * `contentEncoding` drive how the BODY is framed on the wire
    * ("chunked", "gzip", "deflate", "" = identity — the writer applies
    * the coding, so a reader must undo it to recover `body`); unknown
    * tokens are written verbatim over the raw body (the unknown-coding
    * fixture). `warcType = "revisit"` writes a payload-less revisit
    * record carrying `refersTo` as WARC-Refers-To-Target-URI.
    */
  final case class HttpFixture(url: String, contentType: String,
      body: Array[Byte], status: Int = 200, location: String = "",
      transferEncoding: String = "", contentEncoding: String = "",
      warcType: String = "response", refersTo: String = "",
      date: String = "2026-01-01T00:00:00Z",
      etag: String = "", lastModified: String = "",
      // cut the ENCODED body to this fraction and mark the record
      // `WARC-Truncated: length` (the Common Crawl payload-cap shape);
      // 1.0 = whole
      truncateTo: Double = 1.0,
      // extra HTTP response headers, one instance per pair (so a
      // repeated X-Robots-Tag renders as two separate header lines)
      extraHttpHeaders: Seq[(String, String)] = Nil)

  /** Deterministic chunked framing for fixtures: fixed 7-octet chunks
    * (several per body, exercising multi-chunk reassembly), a chunk
    * extension on the first size line, and a trailer header after the
    * terminal chunk — the corners RFC 9112 §7.1 allows.
    */
  private def chunkEncode(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    var i = 0
    var first = true
    while (i < body.length) {
      val n = math.min(7, body.length - i)
      val ext = if (first) ";graft=fixture" else ""
      out.write((n.toHexString + ext + CRLF).getBytes("US-ASCII"))
      out.write(body, i, n)
      out.write(CRLF.getBytes("US-ASCII"))
      i += n
      first = false
    }
    out.write(("0" + CRLF + "X-Graft-Trailer: done" + CRLF + CRLF)
      .getBytes("US-ASCII"))
    out.toByteArray
  }

  private def gzipEncode(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(body); gz.close()
    out.toByteArray
  }

  private def deflateEncode(body: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(body); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 14)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** The general fixture writer: warcinfo + one record per
    * [[HttpFixture]], with real on-the-wire transfer/content codings.
    */
  def writeWarcRecords(pages: Seq[HttpFixture],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def record(headers: Seq[(String, String)], block: Array[Byte]): Unit =
      writeRecord(out, headers, block, gzipPerRecord)
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:graft-warcinfo-0>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      ("software: graft-fixture" + CRLF).getBytes("US-ASCII"))
    pages.zipWithIndex.foreach { case (p, i) =>
      if (p.warcType == "revisit") {
        record(Seq(
          "WARC-Type" -> "revisit",
          "WARC-Record-ID" -> s"<urn:uuid:graft-rec-$i>",
          "WARC-Date" -> p.date,
          "WARC-Target-URI" -> p.url,
          "WARC-Refers-To-Target-URI" -> p.refersTo,
          "WARC-Profile" ->
            "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"),
          Array.emptyByteArray)
      } else {
        val reason = if (p.status == 200) "OK"
          else if (p.status >= 300 && p.status < 400) "Redirect" else "Status"
        val encoded = {
          var b = p.body
          p.contentEncoding match {
            case "gzip" | "x-gzip" => b = gzipEncode(b)
            case "deflate" => b = deflateEncode(b)
            case "zstd" =>
              val o = new java.io.ByteArrayOutputStream()
              val z = new com.github.luben.zstd.ZstdOutputStream(o)
              z.write(b); z.close()
              b = o.toByteArray
            case _ => () // identity or unknown-token fixture: raw body
          }
          if (p.transferEncoding == "chunked") b = chunkEncode(b)
          if (p.truncateTo < 1.0)
            b = java.util.Arrays.copyOfRange(b, 0,
              math.max(1, (b.length * p.truncateTo).toInt))
          b
        }
        val http = new java.io.ByteArrayOutputStream()
        http.write((s"HTTP/1.1 ${p.status} $reason" + CRLF +
          "Content-Type: " + p.contentType + CRLF +
          (if (p.location != null && p.location.nonEmpty)
            "Location: " + p.location + CRLF else "") +
          (if (p.etag.nonEmpty) "ETag: " + p.etag + CRLF else "") +
          (if (p.lastModified.nonEmpty)
            "Last-Modified: " + p.lastModified + CRLF else "") +
          (if (p.transferEncoding.nonEmpty)
            "Transfer-Encoding: " + p.transferEncoding + CRLF
          else "Content-Length: " + encoded.length + CRLF) +
          (if (p.contentEncoding.nonEmpty)
            "Content-Encoding: " + p.contentEncoding + CRLF else "") +
          p.extraHttpHeaders.map { case (k, v) => k + ": " + v + CRLF }
            .mkString +
          CRLF).getBytes("US-ASCII"))
        http.write(encoded)
        record(Seq(
          "WARC-Type" -> "response",
          "WARC-Record-ID" -> s"<urn:uuid:graft-rec-$i>",
          "WARC-Date" -> p.date,
          "WARC-Target-URI" -> p.url,
          "Content-Type" -> "application/http; msgtype=response") ++
          (if (p.truncateTo < 1.0) Seq("WARC-Truncated" -> "length")
          else Nil),
          http.toByteArray)
      }
    }
    out.toByteArray
  }

  // ---------- WET: extracted-text interchange (sink + source) ----------

  /** Serialize (url, date, text) extracted documents as one WET file —
    * the Common Crawl extracted-text convention: a `warcinfo` record
    * then one `conversion` record per document (`Content-Type:
    * text/plain`, UTF-8 block, no HTTP envelope — a conversion record's
    * block IS the payload). `idPrefix` keys the deterministic record
    * ids. Plain form is byte-deterministic (the gate freezes the
    * round-trip rows, not the bytes, so the gzip caveat of [[writeWarc]]
    * doesn't bind here either way).
    */
  def writeWet(docs: Seq[(String, String, String)],
      gzipPerRecord: Boolean = false,
      idPrefix: String = "graft-wet"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeWet(out, docs, gzipPerRecord, idPrefix)
    out.toByteArray
  }

  private def writeWet(out: java.io.OutputStream,
      docs: Iterator[(String, String, String)],
      gzipPerRecord: Boolean, idPrefix: String): Unit = {
    writeRecord(out, Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:uuid:$idPrefix-warcinfo>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      ("software: graft-wet" + CRLF).getBytes("US-ASCII"),
      gzipPerRecord)
    var i = 0
    docs.foreach { case (url, date, text) =>
      writeRecord(out, Seq(
        "WARC-Type" -> "conversion",
        "WARC-Record-ID" -> s"<urn:uuid:$idPrefix-$i>",
        "WARC-Date" -> (if (date == null || date.isEmpty)
          "2026-01-01T00:00:00Z" else date),
        "WARC-Target-URI" -> (if (url == null) "" else url),
        "Content-Type" -> "text/plain"),
        (if (text == null) "" else text).getBytes("UTF-8"),
        gzipPerRecord)
      i += 1
    }
  }

  private def writeWet(out: java.io.OutputStream,
      docs: Seq[(String, String, String)],
      gzipPerRecord: Boolean, idPrefix: String): Unit =
    writeWet(out, docs.iterator, gzipPerRecord, idPrefix)

  /** The distributed WET SINK: one `part-NNNNN.warc.wet[.gz]` shard per
    * non-empty partition of `docs` under `dir` — the crawl-pipeline
    * hand-off format (extracted text consumable by anything that reads
    * Common Crawl WET, including [[wetText]] below). Executor-side
    * streaming writes through the Hadoop FileSystem API (so `dir` can
    * be any supported scheme); each task streams its partition record
    * by record — memory is bounded by one document, and shard count =
    * partition count, the knob the caller already owns
    * (`docs.repartition(n)` for ~uniform shard sizes). `dateCol` rows
    * missing/empty fall back to a fixed epoch so output is
    * deterministic, never wall-clock-stamped.
    */
  def writeWetShards(docs: org.apache.spark.sql.DataFrame, dir: String,
      urlCol: String = "url", textCol: String = "text",
      dateCol: Option[String] = None,
      gzipPerRecord: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = docs.sparkSession
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val ext = if (gzipPerRecord) ".warc.wet.gz" else ".warc.wet"
    val rows = docs.select(
      col(urlCol).cast("string"),
      dateCol.map(c => col(c).cast("string")).getOrElse(lit("")),
      col(textCol).cast("string"))
    import spark.implicits._
    rows.as[(String, String, String)].foreachPartition {
      (it: Iterator[(String, String, String)]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(
            dir, f"part-$pid%05d$ext")
          val fs = path.getFileSystem(confSer.value)
          val out = fs.create(path, true)
          try writeWet(out, it, gzipPerRecord, f"graft-wet-$pid%05d")
          finally out.close()
        }
    }
  }

  /** The WET SOURCE: every `conversion` record of every WET file under
    * `path` as `(url, fetch_ts, text)` rows — the inverse of
    * [[writeWetShards]] and a direct reader for external WET corpora.
    * Same scale/failure shape as [[responses]]: one streaming task per
    * file, malformed tail keeps prior records and counts on
    * `failedAcc`; `minPartitions` 0 = auto (6x total cores — see the
    * straggler note on [[responses]]).
    */
  def wetText(spark: SparkSession, path: String, minPartitions: Int = 0,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    // the same record-lazy scaffold as responses: one record in memory
    // at a time (a real Common Crawl WET shard is 150-400 MB
    // uncompressed — the file must never buffer whole), close on
    // exhaustion/failure/task completion
    spark.sparkContext.binaryFiles(path, autoParts(spark, minPartitions))
      .flatMap { case (_, pds) =>
        lazyRows(pds.open(), failedAcc, { r =>
          if (r.warcType == "conversion")
            Some((r.targetUri, r.warcDate, new String(r.body, "UTF-8")))
          else None
        }, decodePayloads = false) // conversion blocks carry no HTTP envelope
      }
      .toDF("url", "fetch_ts", "text")
  }

  /** WARC -> bucketed landing table: the ingest step that makes a crawl
    * container corpus a FIRST-CLASS [[graft.job.ExtractJob]] input.
    * Container files cannot be partition-pruned (a k-chunk job over raw
    * WARCs would re-parse every file per chunk — k full parses of a
    * 100 TB crawl); this one pass parses each WARC exactly once and
    * lays the `(doc_id, url, content_type, http_status, fetch_ts,
    * html_bytes)` rows out as the `bucket=pmod(xxhash64(doc_id),
    * chunks)` directories ExtractJob's `bucketedInput=true` prunes —
    * the same contract as [[graft.job.ExtractJob.bucketizeInput]], fed
    * from the container format. Downstream:
    * `ExtractJob.run(cfg.copy(inputKind = "html_bytes", inputPath =
    * tablePath, bucketedInput = true))` with chunk/doc resume and
    * lineage metrics exactly as for any landed table. 3xx redirect
    * rows land too (with their `redirect` column — [[redirectEdges]]
    * reads them straight off the table, no container re-parse); the
    * job's html_bytes path filters to HTTP 200 so they never become
    * documents.
    */
  def ingestToTable(spark: SparkSession, warcPath: String,
      tablePath: String, chunks: Int, minPartitions: Int = 0,
      format: String = "parquet",
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    responses(spark, warcPath, minPartitions, failedAcc)
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(chunks)))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("bucket").format(format).save(tablePath)
  }
}
