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
}
