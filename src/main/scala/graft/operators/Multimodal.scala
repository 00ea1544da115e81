package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support (BASELINE.json north star): image/audio/
  * video travel as opaque `binary` payload columns with typed metadata
  * structs. The Spark-side plumbing — schema, partitioning, batch-shaped
  * per-partition processing, frame slicing — is real and tested; the
  * actual codec inside [[decodeFeatures]] is a clearly marked
  * deterministic STUB (this environment ships no image/audio libraries),
  * with the exact signature a real decoder plugs into.
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
  final case class Media(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      lane_sums: Array[Long], features: Array[Float])

  /** Media metadata as a typed struct column (what a real ingest would
    * parse from container headers). */
  def metaStruct(width: Column, height: Column, format: Column): Column =
    struct(width.as("width"), height.as("height"), format.as("format"))

  /** Synthesize a deterministic media table from any table with an id
    * and a text column — stands in for real binary ingestion so the
    * plumbing is exercised end-to-end on driver data. */
  def syntheticMedia(df: DataFrame, idCol: Column, textCol: Column): Dataset[Media] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      idCol.cast("long").as("media_id"),
      when(idCol % 2 === 0, "image").otherwise("audio").as("kind"),
      textCol.cast("binary").as("payload"),
      (octet_length(textCol) % 640).cast("int").as("width"),
      (octet_length(textCol) % 480).cast("int").as("height"),
      when(idCol % 2 === 0, "png").otherwise("wav").as("format"))
      .as[Media]
  }

  /** Batch-shaped feature extraction over media payloads: processes one
    * partition at a time through an iterator (the shape a vectorized /
    * native decoder needs — amortized per-partition init, bounded
    * memory). Partition count = parallelism; repartition by media_id
    * upstream for balance.
    *
    * STUB DECODER: `lane_sums` are the exact integer byte sums of each
    * of the `dim` interleaved lanes (order-independent, so they carry an
    * exact cross-engine oracle), and `features` is the single-division
    * float view `lane_sums / 255f`. A real implementation replaces
    * `decodeOne` only — signature, batching and schema stay. */
  def decodeFeatures(media: Dataset[Media], dim: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // per-partition init happens HERE in a real decoder (codec context)
      def decodeOne(m: Media): MediaFeatures = {
        val sums = new Array[Long](dim)
        var i = 0
        while (i < m.payload.length) {
          sums(i % dim) += (m.payload(i) & 0xff)
          i += 1
        }
        val f = Array.tabulate(dim)(j => sums(j) / 255.0f)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, sums, f)
      }
      it.map(decodeOne)
    }
  }

  /** Frame slicing as pure Column expressions: split the payload into
    * `frameSize`-byte frames and keep every `stride`-th one (video
    * frame-sampling topology; `substring` on binary is byte-addressed). */
  def sampleFrames(payload: Column, frameSize: Int, stride: Int): Column = {
    val nFrames = ceil(octet_length(payload).cast("double") / frameSize).cast("int")
    transform(
      filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => i % stride === 0 && octet_length(payload) > i * frameSize),
      i => substring(payload, i * frameSize + 1, lit(frameSize)))
  }

  /** "Resize" stub for binary images: byte-decimate the payload by
    * `factor` (keep every factor-th byte) — stands in for a real
    * resampler, keeps the columnar shape. */
  def resizeStub(payload: Column, factor: Int): Column =
    aggregate(sampleFrames(payload, 1, factor),
      lit(Array.emptyByteArray), (acc, x) => concat(acc, x))

  /** 64-bit PERCEPTUAL-HASH stub from the decoded lane energies: bit j
    * is set iff lane j's byte-sum is >= the mean lane energy
    * (lane_sum * 64 >= total — all integer, so the hash replays
    * exactly in SQL). This is the block-energy-vs-global-mean shape of
    * a real pHash (DCT of a downscaled image thresholded at the
    * median); a real implementation swaps [[decodeFeatures]]'s decoder
    * and this threshold, the topology — decode once, hash per row,
    * near-dup via [[Dedup.simhashPairs]] segment pigeonhole — stays.
    * The 64-element fold re-evaluates the O(64) total per lane (4k
    * integer ops/row — noise next to the decode). Empty payloads hash
    * to all-ones (0 >= 0); filter them upstream if that's not wanted. */
  def phash64(media: Dataset[Media]): DataFrame = {
    val lanes = col("lane_sums")
    val total = aggregate(lanes, lit(0L), (a, x) => a + x)
    val bitVals = typedLit((0 until 64).map(j => 1L << j))
    decodeFeatures(media, dim = 64).toDF()
      .select(col("media_id"),
        aggregate(
          zip_with(lanes, bitVals, (x, b) =>
            when(x * 64L >= total, b).otherwise(0L)),
          lit(0L), (a, b) => a.bitwiseOR(b)).as("ph"))
  }
}
