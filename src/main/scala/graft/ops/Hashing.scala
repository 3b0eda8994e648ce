package graft.ops

/** Deterministic 64-bit hashing for dedup/similarity operators.
  * FNV-1a with a seed-dependent final mix (splitmix64) — stable across
  * JVMs/platforms, no dependencies; NOT cryptographic (collision-tolerant
  * uses only: minhash permutations, simhash features, LSH buckets).
  */
object Hashing {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def fnv1a(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** fnv1a over raw bytes (unsigned) — for binary payloads; hashing the
    * bytes directly avoids the Base64 String detour (three transient
    * copies of every payload in a hot mapPartitions path).
    */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Seeded hash: one FNV pass + seed-mixed finalizer (cheap "permutation"
    * family for minhash).
    */
  def seeded(s: String, seed: Long): Long = mix(fnv1a(s) ^ mix(seed))

  def seeded(h: Long, seed: Long): Long = mix(h ^ mix(seed))

  /** mix(0), mix(1), ..., mix(n-1) — the seed table [[seeded]] mixes per
    * call, hoisted: a minhash signature evaluates seeded(base, i) for
    * every (shingle, i) pair, and recomputing mix(i) inside that double
    * loop doubled its finalizer work. Values are exactly seeded's, so
    * signatures built from this table are bit-identical.
    */
  private val mixedSeedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def mixedSeeds(n: Int): Array[Long] =
    mixedSeedCache.computeIfAbsent(n, m => Array.tabulate(m)(i => mix(i.toLong)))

  /** FNV-1a of the n tokens `toks(start until start+n)` joined by a single
    * space, computed incrementally — the same hash [[fnv1a]] returns for
    * `toks.slice(start, start+n).mkString(" ")` without building the
    * string.
    */
  def fnv1aWindow(toks: Array[String], start: Int, n: Int): Long = {
    var h = FnvOffset
    var j = 0
    while (j < n) {
      if (j > 0) { h ^= ' '.toLong; h *= FnvPrime }
      val t = toks(start + j)
      var c = 0
      while (c < t.length) { h ^= t.charAt(c).toLong; h *= FnvPrime; c += 1 }
      j += 1
    }
    h
  }

  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5(UTF-8 bytes), little-endian, as a signed Long.
    *
    * This exact convention is what DuckDB's `md5_number_upper(s)` returns
    * (as UBIGINT), so every operator keyed on it — SimHash features,
    * winnowing k-gram hashes — can be recomputed verbatim inside a SQL
    * oracle and gate-checked for exact equality. Slower than fnv1a; use
    * only where oracle-reproducibility is the point.
    */
  def md5Long(s: String): Long =
    md5Long(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0, -1)

  /** [[md5Long]] over a UTF-8 byte slice — the allocation-free face for
    * hot loops (winnowing windows, gram kernels) that already hold the
    * encoded bytes: identical output to `md5Long(new String(...))` for
    * any slice that is valid UTF-8 on its own. `len < 0` = to the end.
    */
  def md5Long(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Digest.get()
    md.reset()
    md.update(bytes, off, if (len < 0) bytes.length - off else len)
    val b = md.digest()
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (b(i) & 0xFFL); i -= 1 }
    h
  }
}
