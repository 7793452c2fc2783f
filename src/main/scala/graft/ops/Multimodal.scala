package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch "decode / feature
  * extract" as partition-wise iterator transforms.
  *
  * The actual codecs (libjpeg/ffmpeg-style decode) are NOT available in this
  * container, so the decode step is a clearly-marked DETERMINISTIC STUB
  * ([[stubDecode]]) keyed on the payload's md5 — but the Spark-side
  * plumbing is real and tested: binary schema, batch-iterator transform
  * (mapPartitions — the Scala analog of mapInPandas batches), partition
  * sizing, and typed output schema.
  */
object Multimodal {

  /** Typed metadata of a decoded media payload. */
  case class MediaMeta(
      id: Long,
      byte_len: Long,
      width: Int,          // STUB: derived from md5, not a real decode
      height: Int,
      n_frames: Int,
      feature: Seq[Float]) // STUB embedding (deterministic from bytes)

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * the stand-in payload for the sandbox; in production this is the real
    * image/audio bytes column). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("byte_len", length(col("payload")).cast("long"))

  /** STUB decode: deterministic pseudo-metadata from md5(payload).
    * A real deployment replaces this body with the actual codec call; the
    * signature and batch shape stay identical. */
  def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    def u(i: Int): Int = md(i) & 0xff
    val width = 64 + (u(0) << 4 | u(1) >> 4) % 1856     // 64..1919
    val height = 64 + (u(2) << 4 | u(3) >> 4) % 1016    // 64..1079
    val frames = 1 + u(4) % 64
    val feature = (0 until 8).map(i => (u(i * 2) * 256 + u(i * 2 + 1)) / 65535.0f)
    MediaMeta(id, payload.length.toLong, width, height, frames, feature)
  }

  /** Batch decode over partitions: the iterator shape means one "decoder
    * init" per partition (where a real codec would allocate its context),
    * then streaming batches — the mapInPandas execution model in Scala. */
  def decodeAll(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    withBinaryPayload(df, textCol)
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition decoder init happens here (stubbed)
        batch.map { case (id, payload) => stubDecode(id, payload) }
      }
  }

  /** Resize planning: aspect-preserving fit of (width, height) into a
    * target box — the pure metadata arithmetic of an image-resize stage
    * (the pixel transform itself is the stubbed codec part; a real
    * deployment maps the plan through the batch decoder). Input is the
    * [[metaColumns]] shape. */
  def resizePlan(meta: DataFrame, idCol: String, targetW: Int,
      targetH: Int): DataFrame = {
    val scale = least(lit(targetW.toDouble) / col("width"),
      lit(targetH.toDouble) / col("height"))
    meta.select(col(idCol), col("width"), col("height"),
      floor(col("width") * scale).cast("long").as("out_w"),
      floor(col("height") * scale).cast("long").as("out_h"))
  }

  /** Frame sampling: one row per sampled frame index (frame 0 always
    * included, then every `step`-th frame) — the explode that turns a
    * video payload into per-frame work items for the batch decoder; at
    * scale the exploded rows repartition across the cluster so frame
    * decode parallelism is independent of video length skew. */
  def frameSample(meta: DataFrame, idCol: String, step: Int): DataFrame =
    meta.select(col(idCol),
        // zero-frame payloads (empty/corrupt video) emit no rows instead of
        // tripping sequence()'s boundary check
        explode(when(col("n_frames") > 0,
            sequence(lit(0), col("n_frames") - 1, lit(step)))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .withColumn("frame_idx", col("frame_idx").cast("long"))

  /** Column-expression form of the stub metadata (used by the SQL-oracled
    * gate query — md5 arithmetic is portable to DuckDB). Matches
    * [[stubDecode]]'s width/height/frames exactly. */
  def metaColumns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    def u(i: Int) = conv(substring(h, 2 * i + 1, 2), 16, 10).cast("int")
    df.select(
      col(idCol),
      length(col(textCol).cast("binary")).cast("long").as("byte_len"),
      (lit(64) + (shiftleft(u(0), 4).bitwiseOR(shiftright(u(1), 4))) % 1856).as("width"),
      (lit(64) + (shiftleft(u(2), 4).bitwiseOR(shiftright(u(3), 4))) % 1016).as("height"),
      (lit(1) + u(4) % 64).as("n_frames"))
  }
}
