package graft.lm

/** Deterministic character n-gram language model.
  *
  * Replaces the reference's Flair char-LM perplexity
  * (dehyphen_wrapper.py:9, 18-31) with the substitution BASELINE.json's
  * north_star sanctions: "dictionary + character-n-gram language-model
  * scoring". Design constraints:
  *
  *  - bit-stable across JVMs/partitions: counts are integers, log-probs are
  *    computed with StrictMath and quantized to 1/1024 units (Long), so a
  *    score comparison never depends on platform FP or summation order;
  *  - one model per executor: the n-gram table is built lazily once per JVM
  *    from the embedded corpus (the reference loads one Flair model per
  *    process, dehyphen_wrapper.py:18-31 — same singleton shape);
  *  - lower score = more likely (reference uses perplexity; only the
  *    ordering of scores is consumed: dehyphen_wrapper.py:58-60, 137-139).
  *
  * Model: order-4 (trigram context) add-k smoothed with backoff-free
  * interpolation of orders 4..1, over a lowercased char alphabet.
  */
object CharLm {

  private val Order = 4
  private val BOS = '\u0002'
  private val Quantum = 1024L
  // interpolation weights (fixed-point /16): orders 4,3,2,1
  private val W: Array[Long] = Array(8, 4, 3, 1)

  private lazy val model: Model = new Model(TrainingCorpus.text)

  private final class Model(corpus: String) {
    val counts: Array[java.util.HashMap[String, Int]] =
      Array.fill(Order)(new java.util.HashMap[String, Int]())
    val ctxTotals: Array[java.util.HashMap[String, Int]] =
      Array.fill(Order)(new java.util.HashMap[String, Int]())
    var vocab = 0

    locally {
      val text = BOS.toString * (Order - 1) + normalize(corpus)
      val seen = new java.util.HashSet[Char]()
      var i = Order - 1
      while (i < text.length) {
        seen.add(text.charAt(i))
        var n = 1
        while (n <= Order) {
          val gram = text.substring(i - n + 1, i + 1)
          val ctx = gram.substring(0, n - 1)
          counts(n - 1).merge(gram, 1, (a, b) => a + b)
          ctxTotals(n - 1).merge(ctx, 1, (a, b) => a + b)
          n += 1
        }
        i += 1
      }
      vocab = seen.size + 1
    }

    /** Quantized negative log2 prob of char at position i of text. */
    def negLog2Q(text: String, i: Int): Long = {
      // interpolated probability in fixed point: p = sum(w_n * p_n) / 16
      var num = 0.0
      var n = Order
      var wi = 0
      while (n >= 1) {
        val gram = text.substring(i - n + 1, i + 1)
        val ctx = gram.substring(0, n - 1)
        val c = counts(n - 1).getOrDefault(gram, 0)
        val t = ctxTotals(n - 1).getOrDefault(ctx, 0)
        // add-k smoothing, k=1/2 in fixed arithmetic: (2c+1)/(2t+vocab*1... )
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

  def normalize(s: String): String = s.toLowerCase

  /** Average negative log2 probability per character (quantized), padded
    * with begin-of-text context. Lower = better. Empty text scores +inf.
    */
  def score(text: String): Double = {
    if (text == null || text.isEmpty) return Double.PositiveInfinity
    val m = model
    val padded = BOS.toString * (Order - 1) + normalize(text)
    var sum = 0L
    var i = Order - 1
    while (i < padded.length) {
      sum += m.negLog2Q(padded, i)
      i += 1
    }
    // average in the quantized domain, then one division — deterministic
    (sum.toDouble / (padded.length - Order + 1)) / Quantum.toDouble
  }
}

/** Embedded training corpus (original text written for this project —
  * generic German + English sentences in the domain of the reference's
  * test corpus, German administrative documents; see
  * /root/reference/development/notes/04_data.md). Kept small: the LM only
  * breaks ties the heuristic cascade and the dictionary don't decide.
  */
object TrainingCorpus {
  val text: String =
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
      |The committee has reviewed the proposal and recommends adoption of
      |the amended draft. The financial interests of the member states are
      |protected by common rules and procedures. This report describes the
      |implementation of the regulation during the past year. Further
      |information is provided in the annex to this document. The working
      |group will continue its examination of the remaining questions.
      |A footnote provides additional context for the reader of the text.
      |""".stripMargin
}
