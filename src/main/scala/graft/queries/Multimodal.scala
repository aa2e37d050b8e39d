package graft.queries

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque binary
  * columns with typed metadata, and decode / feature-extract runs as a
  * batched per-partition operation (the Scala analogue of arrow-batched
  * decode UDFs: one iterator per partition, decoder state amortized
  * across the batch).
  *
  * The actual image/audio decode is STUBBED (no media libraries in this
  * container) with a deterministic fake — but everything Spark-side is
  * real and tested: binary column handling, typed Encoders, partition
  * iterators, schema of the decoded output, and oracle comparison.
  */
object Multimodal {

  /** Input row: media payload as opaque bytes. */
  final case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Decoded metadata row. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, fmt: String, frame_hash: String)

  /** STUB decoder — stands in for an image/audio decode library call.
    * Deterministic arithmetic over the payload so the DuckDB oracle can
    * reproduce it; a real build would decode width/height/format from the
    * codec and hash a sampled frame. */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.content.length.toLong
    val digest = MessageDigest.getInstance("MD5")
      .digest(r.content.take(32))
      .map("%02x".format(_)).mkString
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = n,
      width = (n % 640).toInt,
      height = ((n * 7) % 480).toInt,
      fmt = (n % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      },
      frame_hash = digest)
  }

  val defs: Map[String, QueryDef] = Map(
    // documents.text stands in for a media payload (cast to binary); the
    // decode runs once per partition batch via mapPartitions.
    "t11_multimodal_decode" -> QueryDef(
      (spark, dir) => {
        import spark.implicits._
        val media = Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("content"))
          .as[MediaRow]
        media.mapPartitions { batch =>
          // per-partition setup would initialize the decoder once here
          batch.map(decodeStub)
        }.toDF()
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_bytes,
             |  CAST(length(text) % 640 AS INTEGER) AS width,
             |  CAST((length(text) * 7) % 480 AS INTEGER) AS height,
             |  CASE length(text) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
             |       ELSE 'webp' END AS fmt,
             |  md5(substr(text, 1, 32)) AS frame_hash
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling + resize: 4 evenly-spaced 16-byte "frames" per
    // payload, each signed, plus halved (resized) dimensions. One input
    // row fans out to 4 frame rows inside the partition iterator — the
    // shape of a real video frame-sampler (decoder init once per
    // partition, frames emitted streaming, no driver involvement).
    "t14_multimodal_frames" -> QueryDef(
      (spark, dir) => {
        import spark.implicits._
        val media = Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("content"))
          .as[MediaRow]
        media.mapPartitions { batch =>
          batch.flatMap(frameSampleStub)
        }.toDF()
          .orderBy("doc_id", "frame_no")
      },
      Some("""SELECT doc_id, f.frame_no,
             |  md5(substr(text, f.frame_no * greatest(length(text) // 4, 1) + 1, 16)) AS frame_sig,
             |  CAST((length(text) % 640) // 2 AS INTEGER) AS resized_w,
             |  CAST(((length(text) * 7) % 480) // 2 AS INTEGER) AS resized_h
             |FROM documents,
             |  (SELECT unnest(range(0, 4)) AS frame_no) f
             |ORDER BY doc_id, frame_no""".stripMargin)),

    // Feature extraction: the third leg of the multimodal quartet
    // (decode t11, frames+resize t14, features here). An 8-dim hashed
    // feature vector per payload — the hashing-trick featurization any
    // encoder-less pipeline can run at full scale — produced in the same
    // batched per-partition shape a real embedding model would use (model
    // weights loaded once per partition, rows streamed through). Each
    // feature is 24 bits of a salted md5 scaled to [0,1): integer /
    // 2^24 is exact in a double, so both engines agree bit-for-bit, as
    // does the ascending-fold squared norm.
    "t17_multimodal_features" -> QueryDef(
      (spark, dir) => {
        import spark.implicits._
        val media = Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("content"))
          .as[MediaRow]
        media.mapPartitions { batch =>
          // a real extractor would load its model once per partition here
          batch.map(featureStub)
        }.toDF()
          .orderBy("doc_id")
      },
      Some {
        def feat(k: Int): String = {
          val digits = (1 to 6).map { j =>
            s"(instr('0123456789abcdef', substr(md5(concat('$k|', text)), $j, 1)) - 1) * ${math.pow(16, 6 - j).toLong}"
          }.mkString("(", " + ", ")")
          s"CAST($digits AS DOUBLE) / 16777216.0"
        }
        val cols = (1 to 8).map(k => s"${feat(k)} AS f$k").mkString(",\n  ")
        val norm = (1 to 8).map(k => s"f$k*f$k").mkString(" + ")
        s"""WITH f AS (SELECT doc_id,
           |  $cols
           |FROM documents)
           |SELECT doc_id, f1, f2, f3, f4, f5, f6, f7, f8,
           |  $norm AS f_norm
           |FROM f ORDER BY doc_id""".stripMargin
      })
  )

  /** Hashed feature row (8 dims + squared norm). */
  final case class MediaFeatures(doc_id: Long,
      f1: Double, f2: Double, f3: Double, f4: Double,
      f5: Double, f6: Double, f7: Double, f8: Double, f_norm: Double)

  /** STUB feature extractor — salted-md5 hashing-trick features standing
    * in for a learned encoder; 24 high bits per salt, scaled to [0,1). */
  def featureStub(r: MediaRow): MediaFeatures = {
    val md = MessageDigest.getInstance("MD5")
    // null payload → feature of the bare salt, matching the oracle's
    // concat('k|', NULL) which DuckDB treats as 'k|'
    val content = if (r.content == null) Array.empty[Byte] else r.content
    val feats = (1 to 8).map { k =>
      val h = md.digest(s"$k|".getBytes("UTF-8") ++ content)
      val hex = h.take(3).map("%02x".format(_)).mkString // 6 hex chars
      java.lang.Long.parseLong(hex, 16).toDouble / 16777216.0
    }
    val norm = feats.foldLeft(0.0)((a, x) => a + x * x)
    MediaFeatures(r.doc_id, feats(0), feats(1), feats(2), feats(3),
      feats(4), feats(5), feats(6), feats(7), norm)
  }

  /** Frame row emitted by the sampler stub. */
  final case class Frame(doc_id: Long, frame_no: Int, frame_sig: String,
      resized_w: Int, resized_h: Int)

  /** STUB frame sampler + resizer — 4 evenly spaced 16-byte windows stand
    * in for decoded video frames; dimension halving stands in for resize. */
  def frameSampleStub(r: MediaRow): Seq[Frame] = {
    val n = r.content.length
    val step = math.max(n / 4, 1)
    val digest = MessageDigest.getInstance("MD5")
    (0 until 4).map { f =>
      val off = f * step
      val frame =
        if (off >= n) Array.empty[Byte]
        else r.content.slice(off, math.min(off + 16, n))
      val sig = digest.digest(frame).map("%02x".format(_)).mkString
      Frame(r.doc_id, f, sig, (n % 640) / 2, ((n.toLong * 7) % 480).toInt / 2)
    }
  }
}
