package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` payloads plus typed metadata, with decode / feature-extract /
  * frame-sample stages as `mapPartitions` over batched rows.
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * environment) with a deterministic fake that derives metadata from the
  * payload bytes — the Spark-side plumbing (binary schema, partition-wise
  * batched processing, explode of per-frame rows) is real and is what
  * matters at 100 TB: payloads never hit the driver, decode runs
  * partition-local, and frame sampling is a generator (no full-video
  * materialization).
  */
object Multimodal {

  /** media(doc_id, media_type, payload binary): fabricated deterministically
    * from a text corpus — payload = UTF-8 bytes, type round-robins. */
  def mediaFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: metadata derived from payload bytes only (deterministic,
    * oracle-reproducible). A real build swaps `fakeDecode` for a codec call;
    * the batching/schema contract stays identical. */
  private def fakeDecode(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    val first = if (len > 0) payload(0) & 0xff else 0
    mediaType match {
      case "image" => (64 + len % 192, 64 + first % 192, 1)
      case "audio" => (8000 + (len % 5) * 8000, 0, 1 + len % 30)      // rate, -, seconds
      case _       => (64 + len % 192, 64 + first % 192, 1 + len % 24) // video frames
    }
  }

  private val metaSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("media_type", StringType),
    StructField("n_bytes", IntegerType), StructField("dim1", IntegerType),
    StructField("dim2", IntegerType), StructField("n_frames", IntegerType)))

  /** Partition-local batched "decode": one pass, no driver collection. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(metaSchema)
    media.select("doc_id", "media_type", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload =
          Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val (d1, d2, nf) = fakeDecode(r.getAs[String]("media_type"), payload)
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
          payload.length, d1, d2, nf)
      }
    }(enc)
  }

  /** Frame sampling: every `stride`-th frame index per video, as rows —
    * generator-style (Iterator.flatMap), never materializing all frames. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("media_type", StringType),
    StructField("payload", BinaryType)))

  /** STUB resize: payload → fixed-size payload, partition-local (a real
    * build swaps the byte slice/pad for a codec resample; the
    * binary-in/binary-out contract and partition locality are the point —
    * payloads stream through executors, never the driver). */
  def resize(media: DataFrame, nBytes: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizedSchema)
    media.select("doc_id", "media_type", "payload").mapPartitions { rows =>
      rows.map { r =>
        // null payload == empty media, not a job-killing NPE
        val p = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val out = new Array[Byte](nBytes)
        var i = 0
        while (i < nBytes) { out(i) = if (p.length > 0) p(i % p.length) else 0; i += 1 }
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"), out)
      }
    }(enc)
  }

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** STUB feature extraction: payload → dense float embedding, partition-
    * local and deterministic (chunked byte sums, unit-scaled) — the output
    * shape feeds the real Similarity/ANN stack unchanged, which is the
    * integration that matters: media → embedding → cosine KNN is the
    * canonical multimodal-dedup pipeline. */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    media.select("doc_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val p = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val acc = new Array[Float](dim)
        var i = 0
        while (i < p.length) { acc(i % dim) += (p(i) & 0xff) / 255.0f; i += 1 }
        Row(r.getAs[Long]("doc_id"), acc.toSeq)
      }
    }(enc)
  }
}
