package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video treated as opaque
  * `BinaryType` payloads with typed metadata structs, per the north-star
  * mandate (SURVEY.md §2.4 "LLM-pipeline" row).
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic STUB (see [[decodeFeatures]]); everything
  * around it — schema (binary + metadata struct), partition-parallel
  * iterator processing, frame sampling, hashing — is real Spark plumbing
  * and is what carries over unchanged when a real codec is dropped in.
  *
  * Scale posture: payloads never leave their partition (no shuffle in
  * decode/feature paths — pure map-side), and metadata-only queries prune
  * the binary column out of the parquet scan entirely (columnar format =
  * free skip of multi-KB payload bytes; verified via ReadSchema in
  * MultiModalSpec).
  */
object MultiModal {

  /** Deterministic fake payload: the document's UTF-8 bytes stand in for
    * an encoded image. Real pipelines read the bytes from parquet/blob
    * storage; the column type and everything downstream are identical. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(640L)) + 64L).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480L)) + 48L).cast("int").as("height"),
        lit(3).as("channels"),
        lit("raw").as("format")
      ).as("meta"))

  /** Declared query q_multimodal: byte-length, content hash, and 3
    * frame samples (8-byte slices at fixed offsets, hex-encoded — the
    * frame-sampling access pattern of video pipelines) plus metadata
    * fields. Pure codegen'd expressions over the binary column. */
  def payloadFeatures(docs: DataFrame, frames: Int = 3): DataFrame = {
    val df = withPayload(docs)
    val hexed = hex(col("payload"))
    val frameCols = (0 until frames).map(i =>
      substring(hexed, i * 16 + 1, 16).as(s"frame_$i"))
    df.select(Seq(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.width").cast("long").as("width"),
      col("meta.height").cast("long").as("height")
    ) ++ frameCols: _*)
  }

  /** Output row of the resize stage: payload re-encoded at the target
    * geometry, metadata updated to match. */
  case class MMResized(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, channels: Int, format: String)

  /** Resize over the binary column — the remaining step of the
    * decode/feature-extract/resize/frame-sample quartet. Same
    * `mapPartitions` contract as [[decodeFeatures]] (per-partition codec
    * init, payloads never leave their partition).
    *
    * STUB: a real implementation decodes, rescales, and re-encodes;
    * absent codecs, the fake "resample" is nearest-neighbor over the
    * raw bytes, so the output length is round(len · targetArea/srcArea)
    * for BOTH down- and up-scaling (fractional ratios included). The
    * schema (binary out + updated metadata) and the map-side-only plan
    * are the real contract. */
  def resize(docs: DataFrame, width: Int, height: Int): Dataset[MMResized] = {
    withPayload(docs)
      .select(col("doc_id"), col("payload"),
        col("meta.width").as("w"), col("meta.height").as("h"),
        col("meta.channels").as("c"))
      .as[(Long, Array[Byte], Int, Int, Int)](Encoders.tuple(
        Encoders.scalaLong, Encoders.BINARY,
        Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaInt))
      .mapPartitions { rows =>
        // per-partition init of the (stubbed) codec would go here
        rows.map { case (id, bytes, w, h, c) =>
          val ratio = (width.toDouble * height) / math.max(1L, w.toLong * h)
          // long math then clamp: a huge upscale ratio would overflow
          // .toInt (wrapping to a silent 1-byte payload); the clamp to
          // the JVM array ceiling is the documented stub limit
          val outLen =
            if (bytes.length == 0) 0
            else math.max(1L, math.min(math.round(bytes.length * ratio), (Int.MaxValue - 8).toLong)).toInt
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            out(i) = bytes(math.min(bytes.length - 1, (i / ratio).toInt))
            i += 1
          }
          MMResized(id, out, width, height, c, "raw")
        }
      }(Encoders.product[MMResized])
  }

  /** Output row of the decode/feature-extract stage. */
  case class MMFeature(doc_id: Long, n_bytes: Int, mean_byte: Double,
      hist: Array[Long])

  /** Decode + feature-extract over the binary column, one partition at a
    * time (`mapPartitions` — the iterator shape a real batched codec call
    * wants: amortize codec init per partition, stream rows through).
    *
    * STUB: a real implementation would decode `payload` with an image
    * library here; absent codecs in this container, the "features" are a
    * deterministic 16-bucket byte histogram + mean byte value computed
    * from the raw bytes. The Dataset schema, encoder, partitioning and
    * batch shape are the real contract, tested in MultiModalSpec. */
  def decodeFeatures(docs: DataFrame): Dataset[MMFeature] = {
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        // per-partition init of the (stubbed) codec would go here
        rows.map { case (id, bytes) =>
          val hist = new Array[Long](16)
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            hist(b >> 4) += 1
            sum += b
            i += 1
          }
          val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
          MMFeature(id, bytes.length, mean, hist)
        }
      }(Encoders.product[MMFeature])
  }
}
