package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata beside them, and
  * decode / feature-extraction / frame-sampling run as per-partition typed
  * transforms.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs, so `fakeDecode` derives deterministic pseudo-features from the
  * payload bytes. Everything around it is the real Spark shape a production
  * pipeline needs and is what the specs test:
  *  - typed `Dataset[MediaItem]` with a binary column (Encoders handle the
  *    byte arrays; payloads never materialize on the driver),
  *  - `mapPartitions` so per-partition codec init (the expensive part of
  *    real decoders) amortizes over a whole batch,
  *  - stable output schema (`MediaFeatures`) that downstream DataFrame ops
  *    aggregate/join on,
  *  - frame sampling as a pure function of (payload, stride) — rows out
  *    scale with frames, not with partition count.
  */
object Multimodal {

  /** An opaque media payload + the typed metadata a catalog would carry. */
  final case class MediaItem(
      doc_id: Long,
      format: String, // png | jpeg | wav — drives the (stubbed) codec choice
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Decoded per-item features (fixed dim, like a vision-tower embedding). */
  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Int,
      feature: Array[Float], // FEATURE_DIM floats
      checksum: Long)

  /** One sampled "frame" of a payload. */
  final case class Frame(
      doc_id: Long,
      frame_no: Int,
      frame_bytes: Array[Byte])

  val FeatureDim = 8

  /** STUB decoder — stands in for an image/audio codec. Deterministic in
    * the payload bytes so tests and reruns agree. */
  private[ops] def fakeDecode(m: MediaItem): MediaFeatures = {
    val sum = m.payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
    val feat = Array.tabulate(FeatureDim) { i =>
      ((sum >>> (i * 8)) & 0xff).toFloat / 255f
    }
    MediaFeatures(m.doc_id, m.format, m.payload.length, feat, sum)
  }

  /** Batch decode: per-partition codec init + streamed item decode. */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // real pipeline: val codec = Codec.open(...)  (ONCE per partition)
      it.map(fakeDecode)
    }
  }

  /** Frame sampling: every `stride`-th 4-byte block of the payload (a real
    * video path samples every k-th decoded frame the same way). */
  def sampleFrames(items: Dataset[MediaItem], stride: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      m.payload.grouped(4).zipWithIndex
        .collect { case (block, i) if i % stride == 0 =>
          Frame(m.doc_id, i, block) }
    }
  }

  /** Deterministic MediaItems synthesized from the documents table (payload
    * = md5 digest bytes standing in for real object-store media). */
  def itemsFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .selectExpr(
        "doc_id",
        "CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format",
        "cast(64 + (doc_id % 8) * 32 AS int) AS width",
        "cast(64 + (doc_id % 5) * 32 AS int) AS height",
        "unhex(md5(text)) AS payload")
      .as[MediaItem]
  }

  /** Judged query MM2: decode + per-format feature profile. Integer-only
    * outputs (byte sums, modular checksum folds) so the DuckDB oracle —
    * which replays the 31-fold over the same md5 payload bytes in
    * HUGEINT arithmetic — hash-matches with zero float-parity risk. */
  def decodeProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = decodeFeatures(itemsFromDocuments(spark, sfDir))
    feats.toDF()
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        // feature[0] is (checksum & 0xff)/255f — profile the raw byte
        sum(expr("checksum & 255L")).as("f0_byte_sum"),
        sum(expr("pmod(checksum, 1000003L)")).as("checksum_fold"))
      .orderBy("format")
  }

  /** Judged query MM4: cross-item FRAME-level dedup — the video-corpus
    * variant of dd1: sample every frame, fingerprint its bytes, and
    * count recurring fingerprints across items (intros, logo cards and
    * stock footage recur across millions of videos; frame-level dedup is
    * how a video training corpus drops them). One shuffle on the
    * (frame_no, fingerprint) pair, then a tiny per-position rollup —
    * identical plan at 10⁹ videos. Integer outputs only. */
  def frameDedupProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val frames = sampleFrames(itemsFromDocuments(spark, sfDir), stride = 1)
    frames.toDF()
      .select(col("frame_no"), lower(hex(col("frame_bytes"))).as("fp"))
      .groupBy("frame_no", "fp")
      .agg(count(lit(1)).as("n"))
      .groupBy("frame_no")
      .agg(sum("n").as("n_frames"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("n_dup_extra"))
      .orderBy("frame_no")
  }

  /** Rows-only judged query: frame sampling fan-out profile. */
  def frameProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val frames = sampleFrames(itemsFromDocuments(spark, sfDir), stride = 2)
    frames.toDF()
      .groupBy("frame_no")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(length(frame_bytes) AS bigint)")).as("bytes"))
      .orderBy("frame_no")
  }
}
