package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batched per-partition passes.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested; the codec itself is a clearly-marked deterministic STUB — the
  * container has no image/audio libraries, so `decodeHeader` parses a
  * synthetic GRFT header instead of e.g. libjpeg (swap `decodeHeader` /
  * `downsample` for real codecs in production).
  */
object Multimodal {

  final case class MediaRow(
      doc_id: String,
      media_ref: String,
      kind: String,
      bytes: Array[Byte])

  final case class MediaMeta(
      doc_id: String,
      media_ref: String,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      bytes_len: Int,
      sha_prefix: String)

  /** Deterministic fake payload: "GRFT" magic + width/height/frames header
    * + seed-derived body.
    */
  def fakePayload(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 64)
    bb.put("GRFT".getBytes("US-ASCII"))
    bb.putInt(w); bb.putInt(h); bb.putInt(frames)
    val rng = new graft.fixtures.Fixtures.Rng(seed)
    (0 until 64).foreach(_ => bb.put((rng.nextLong() & 0xFF).toByte))
    bb.array()
  }

  /** STUB decode: parse the synthetic header (stands in for image decode). */
  def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, "US-ASCII") == "GRFT", "bad media magic (stub codec)")
    (bb.getInt, bb.getInt, bb.getInt)
  }

  /** Batched metadata extraction: one pass per partition, bytes never
    * shuffled (metadata projected out; the binary column is dropped before
    * any wide operation).
    */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val (w, h, f) = decodeHeader(m.bytes)
        md.reset()
        val digest = md.digest(m.bytes).take(4).map("%02x".format(_)).mkString
        MediaMeta(m.doc_id, m.media_ref, m.kind, w, h, f, m.bytes.length, digest)
      }
    }.toDF()
  }

  /** STUB frame-sampling / resize: emits (doc_id, media_ref, frame_idx)
    * rows for every `stride`-th frame — the batch/explode shape a real
    * video pipeline has, with the pixel work stubbed out.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { m =>
      val (w, h, f) = decodeHeader(m.bytes)
      (0 until f by stride).map(i => (m.doc_id, m.media_ref, i, w / 2, h / 2))
    }.toDF("doc_id", "media_ref", "frame_idx", "out_w", "out_h")
  }

  /** STUB resize: binary-in / binary-out batch transform — re-encodes the
    * payload with clamped dimensions (stands in for a real downscale; the
    * body bytes are passed through). The shape that matters at scale:
    * bytes transform inside one mapPartitions pass, never across a
    * shuffle, output column is again opaque binary.
    */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, f) = decodeHeader(m.bytes)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val nw = math.max(1, (w * scale).toInt)
        val nh = math.max(1, (h * scale).toInt)
        val bb = java.nio.ByteBuffer.allocate(m.bytes.length)
        bb.put("GRFT".getBytes("US-ASCII"))
        bb.putInt(nw); bb.putInt(nh); bb.putInt(f)
        bb.put(m.bytes, 16, m.bytes.length - 16)
        m.copy(bytes = bb.array())
      }
    }.toDF()
  }

  /** STUB feature extraction: binary -> dense Array[Float] embedding
    * (hash-derived from the payload, deterministic — stands in for a CNN/
    * CLIP forward pass). Output schema matches the `embeddings` table
    * (vec-per-media), so it composes directly with Similarity.bruteForceTopK
    * / ivfTopK / cosineNearDupPairs — the media near-dup path.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { m =>
      val base = Hashing.fnv1a(m.bytes)
      val vec = Array.tabulate(dim) { i =>
        // unit-scale deterministic pseudo-features
        ((Hashing.seeded(base, i.toLong) >>> 11) * 1.1102230246251565e-16 * 2 - 1).toFloat
      }
      (m.doc_id, m.media_ref, vec.toSeq)
    }.toDF("doc_id", "media_ref", "embedding")
  }

  /** Deterministic synthetic media table derived from a docs table's media
    * spans (one row per image/drawing span).
    */
  def syntheticMediaFor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind").isin("image", "drawing"))
      .select(col("doc_id"), col("s.media_ref").as("media_ref"), col("s.kind").as("kind"))
      .as[(String, String, String)]
      .map { case (d, ref, k) =>
        val seed = Hashing.fnv1a(ref)
        val w = 64 + (Hashing.mix(seed) & 0x3F).toInt
        val h = 64 + (Hashing.mix(seed + 1) & 0x3F).toInt
        val fr = if (k == "image") 1 else 8
        MediaRow(d, ref, k, fakePayload(seed, w, h, fr))
      }.toDF()
  }
}
