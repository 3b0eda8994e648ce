package graft.lm

/** Deterministic character n-gram language model.
  *
  * Replaces the reference's Flair char-LM perplexity
  * (dehyphen_wrapper.py:9, 18-31) with the substitution BASELINE.json's
  * north_star sanctions: "dictionary + character-n-gram language-model
  * scoring". Design constraints:
  *
  *  - bit-stable across JVMs/partitions: counts are integers, log-probs
  *    are computed with StrictMath and quantized to 1/1024 units (Long),
  *    so a score comparison never depends on platform FP or summation
  *    order;
  *  - one model per executor: the table is built lazily once per JVM from
  *    the embedded corpus (the reference loads one Flair model per
  *    process, dehyphen_wrapper.py:18-31 — same singleton shape);
  *  - allocation-free scoring: n-grams are packed into Long keys (4 chars
  *    x 16 bits) probed against open-addressing long->long tables — no
  *    substring garbage in the hot loop, so 32 executor threads scale
  *    without GC contention;
  *  - lower score = more likely (the reference uses perplexity; only the
  *    ordering of scores is consumed: dehyphen_wrapper.py:58-60).
  *
  * Model: order-4, add-1/2 smoothed, interpolated over orders 4..1 with
  * fixed weights 8:4:3:1 (/16).
  */
object CharLm {

  private val Order = 4
  private val BOS = '\u0002'
  private val Quantum = 1024L
  private val W: Array[Double] = Array(8, 4, 3, 1)

  /** Minimal open-addressing long->long hash map (power-of-2 capacity,
    * linear probing). Key 0 is the empty slot marker; packed gram keys are
    * never 0 because every key carries a nonzero order tag in the top
    * bits.
    */
  private final class LongLongMap(initialCap: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCap) * 2)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var n = 0

    private def idx(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= (h >>> 32)
      (h & (cap - 1)).toInt
    }

    def addTo(k: Long, d: Long): Unit = {
      var i = idx(k)
      var continue = true
      while (continue) {
        val kk = keys(i)
        if (kk == k) { vals(i) += d; continue = false }
        else if (kk == 0L) {
          keys(i) = k; vals(i) = d; n += 1
          if (n * 4 > cap * 3) grow()
          continue = false
        } else i = (i + 1) & (cap - 1)
      }
    }

    def get(k: Long): Long = {
      var i = idx(k)
      while (true) {
        val kk = keys(i)
        if (kk == k) return vals(i)
        if (kk == 0L) return 0L
        i = (i + 1) & (cap - 1)
      }
      0L
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap = cap * 2
      keys = new Array[Long](cap)
      vals = new Array[Long](cap)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != 0L) addTo(ok(i), ov(i))
        i += 1
      }
    }
  }

  /** One model per language, built lazily per JVM — the reference loads
    * one Flair model per process AND selects it by `lang` with a `-fast`
    * suffix convention (dehyphen_wrapper.py:18-31); we mirror the
    * selection: "de"/"en" pick the monolingual corpus, anything else
    * (incl. "multi", "multi-v0-fast", unknown codes) the combined one,
    * and a "-fast"/"-vN" suffix is ignored.
    */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()

  def canonicalLang(lang: String): String = {
    val base = lang.toLowerCase(java.util.Locale.ROOT).split("-")(0)
    base match {
      case "de" | "en" => base
      case _ => "multi"
    }
  }

  private def modelFor(lang: String): Model =
    models.computeIfAbsent(canonicalLang(lang),
      l => new Model(TrainingCorpus.forLang(l)))

  private final class Model(corpus: String) {
    val grams: Array[LongLongMap] = Array.fill(Order)(new LongLongMap(1 << 14))
    val ctxs: Array[LongLongMap] = Array.fill(Order)(new LongLongMap(1 << 12))
    var vocab = 0

    /** pack chars text[i-n+1..i] into a Long (4 x 16-bit chars max) with
      * an order tag in bits 60+ so no packed key is ever 0.
      */
    @inline def pack(text: CharSequence, i: Int, n: Int): Long = {
      var k = 0L
      var j = i - n + 1
      while (j <= i) {
        k = (k << 16) | text.charAt(j).toLong
        j += 1
      }
      // no order tag needed: maps are separate per order and the last
      // char of any real gram is nonzero, so k != 0 (0 = empty slot)
      k
    }

    @inline def packCtx(text: CharSequence, i: Int, n: Int): Long =
      if (n == 1) 1L << 59 // the single empty context
      else pack(text, i - 1, n - 1)

    locally {
      val text = BOS.toString * (Order - 1) + normalize(corpus)
      val seen = new java.util.HashSet[Character]()
      var i = Order - 1
      while (i < text.length) {
        seen.add(text.charAt(i))
        var n = 1
        while (n <= Order) {
          grams(n - 1).addTo(pack(text, i, n), 1L)
          ctxs(n - 1).addTo(packCtx(text, i, n), 1L)
          n += 1
        }
        i += 1
      }
      vocab = seen.size + 1
    }

    /** Quantized negative log2 prob of char at position i. */
    def negLog2Q(text: CharSequence, i: Int): Long = {
      var num = 0.0
      var n = Order
      var wi = 0
      while (n >= 1) {
        val c = grams(n - 1).get(pack(text, i, n))
        val t = ctxs(n - 1).get(packCtx(text, i, n))
        // add-k smoothing, k=1/2: (2c+1)/(2t+vocab)
        val p = (2.0 * c + 1.0) / (2.0 * t + vocab.toDouble)
        num += W(wi) * p
        n -= 1
        wi += 1
      }
      val p = num / 16.0
      val nl = -StrictMath.log(p) / StrictMath.log(2.0)
      StrictMath.round(nl * Quantum)
    }
  }

  def normalize(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Average negative log2 probability per character (quantized), padded
    * with begin-of-text context. Lower = better. Empty text scores +inf.
    */
  def score(text: String): Double = score(text, "multi")

  def score(text: String, lang: String): Double = {
    if (text == null || text.isEmpty) return Double.PositiveInfinity
    val m = modelFor(lang)
    val padded = new PaddedSeq(normalize(text), Order - 1)
    var sum = 0L
    var i = Order - 1
    val end = padded.length
    while (i < end) {
      sum += m.negLog2Q(padded, i)
      i += 1
    }
    (sum.toDouble / (end - Order + 1)) / Quantum.toDouble
  }

  /** CharSequence view `BOS*pad + s` — no concatenation garbage. */
  private final class PaddedSeq(s: String, pad: Int) extends CharSequence {
    def length: Int = s.length + pad
    def charAt(i: Int): Char = if (i < pad) BOS else s.charAt(i - pad)
    def subSequence(a: Int, b: Int): CharSequence =
      throw new UnsupportedOperationException
  }
}

/** Embedded training corpus (original text written for this project —
  * generic German + English sentences in the domain of the reference's
  * test corpus, German administrative documents; see
  * /root/reference/development/notes/04_data.md). Kept small: the LM only
  * breaks ties the heuristic cascade and the dictionary don't decide.
  */
object TrainingCorpus {
  /** German half. NOTE: `de + en` must concatenate to exactly the round-1
    * combined corpus — the multi model's quantized scores pin the frozen
    * goldens.
    */
  val de: String =
    """Die Bedeutung der finanziellen Interessen der Union ist in den
      |vergangenen Jahren stetig gewachsen. Auch andere Staaten, wie
      |beispielsweise Polen, haben entsprechende Regelungen getroffen.
      |Der Entwurf eines Gesetzes zur Stärkung der finanziellen Aufsicht
      |wurde den Verbänden zur Stellungnahme übersandt. Die Bundesregierung
      |hat die Stellungnahmen der Länder und der kommunalen Spitzenverbände
      |geprüft und in die Beratung einbezogen. Im Rahmen des Verfahrens
      |werden die Interessen der Beteiligten angemessen berücksichtigt.
      |Die Kosten für die Verwaltung steigen mit der Zahl der Verfahren.
      |Eine Vereinbarung zwischen den Staaten der Union regelt die
      |Zusammenarbeit der Behörden bei der Verfolgung von Verstößen.
      |Die Kommission hat einen Bericht über die Anwendung der Verordnung
      |vorgelegt. Nach Ansicht der Verbände ist eine weitere Klärung der
      |offenen Fragen erforderlich. Die Regelung tritt am ersten Januar in
      |Kraft und gilt für alle anhängigen Verfahren. Die Mitgliedstaaten
      |übermitteln der Kommission jährlich einen Bericht über die
      |Durchführung der Maßnahmen. Der Ausschuss empfiehlt die Annahme des
      |Entwurfs in der vorliegenden Fassung. Seite drei von zehn Seiten.
      |""".stripMargin

  /** English half. */
  val en: String =
    """The committee has reviewed the proposal and recommends adoption of
      |the amended draft. The financial interests of the member states are
      |protected by common rules and procedures. This report describes the
      |implementation of the regulation during the past year. Further
      |information is provided in the annex to this document. The working
      |group will continue its examination of the remaining questions.
      |A footnote provides additional context for the reader of the text.
      |""".stripMargin

  /** Combined corpus (byte-identical to the round-1 single corpus). */
  val text: String = de + en

  def forLang(canonical: String): String = canonical match {
    case "de" => de
    case "en" => en
    case _ => text
  }
}
