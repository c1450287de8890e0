package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: media payloads as opaque `binary` columns
  * with typed metadata, decoded by a *batched* per-partition kernel — the
  * Spark-side plumbing (schema, partitioning, batch shape) of an
  * image/audio decode stage.
  *
  * The container has no image/audio codecs, so [[Decode.features]] is a
  * clearly-marked DETERMINISTIC STUB: it derives fake width/height/format
  * from an md5 of the payload bytes. Everything around it is real — the
  * documents ⋈ embeddings assembly, the binary column, the typed Encoders,
  * and the batched `mapPartitions` execution shape (batches of 64 rows,
  * mirroring Arrow-batch UDF execution). Swapping in a real codec changes
  * only the body of `Decode.features`.
  *
  * SCALE NOTES (100 TB): the join is on the primary key (doc_id = vec_id)
  * — a shuffle join of co-partitionable fact tables (bucketed layout makes
  * it shuffle-free); decode is per-partition streaming with O(batch)
  * memory, no driver involvement.
  */
object MultimodalOps {

  /** Input row for the decode kernel: key + metadata + opaque payload. */
  final case class MediaIn(
      doc_id: Long, lang: String, payload: Array[Byte],
      emb_dim: Long, emb_norm: Double)

  /** Decoded record: fake media features + carried metadata. */
  final case class MediaOut(
      doc_id: Long, lang: String, byte_len: Long,
      width: Long, height: Long, format: String,
      emb_dim: Long, emb_norm: Double)

  object Decode {
    private val Formats = Vector("png", "jpg", "webp")

    /** STUB for the media decoder (no codecs in this environment): fake
      * dimensions/format derived deterministically from md5(payload) —
      * portable, so the DuckDB oracle can pin the full pipeline. A real
      * deployment replaces this body with an actual image/audio decode.
      */
    def features(payload: Array[Byte]): (Long, Long, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      (payload.length.toLong, h % 640 + 1, h % 480 + 1, Formats((h % 3).toInt))
    }
  }

  /** Video-style frame sampling over the media payload: tile the payload
    * into fixed-size frames (32 units), keep every 4th (the classic
    * keyframe-stride sample), fingerprint each sampled frame. The plan is
    * the c4/explode shape — Generate pipelined into the scan, per-frame
    * work row-local, no shuffle — exactly how a real frame sampler fans a
    * video column out to per-frame rows at 100 TB.
    *
    * Frames here are CHARACTER ranges of the text payload so the DuckDB
    * oracle is exact under any corpus encoding (DuckDB cannot slice
    * BLOBs); a real deployment frames the binary payload by byte ranges —
    * `substring` slices BinaryType with the identical plan shape.
    */
  def d15FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val FrameLen = 32
    val Stride = 4
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= FrameLen) // sequence(0, n-1) must be ascending
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, length(text) div $FrameLen - 1)")).as("frame_idx"))
      .filter(col("frame_idx") % Stride === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(text, cast(frame_idx * $FrameLen + 1 as int), $FrameLen)")).as("frame_md5"))
  }

  /** Input/output rows for the resize kernel. */
  final case class ResizeIn(doc_id: Long, payload: Array[Byte])
  final case class ResizeOut(
      doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, thumb_md5: String)

  /** Integer aspect-fit of (w, h) into a square box, downscale only:
    * unchanged dims when they already fit, else the long side pins to
    * `box` and the short side scales by floor division (min 1).
    */
  private def aspectFit(w: Long, h: Long, box: Long): (Long, Long) =
    if (math.max(w, h) <= box) (w, h)
    else if (w >= h) (box, math.max(1L, h * box / w))
    else (math.max(1L, w * box / h), box)

  /** REAL pixel resample: area-average (box-filter) downsampling of an
    * 8-bit grayscale raster, exact integer arithmetic throughout. Output
    * pixel (ox, oy) averages the source box
    * `[ox*sw/tw, (ox+1)*sw/tw) x [oy*sh/th, (oy+1)*sh/th)` (floor
    * division — the standard integer box decomposition, every source
    * pixel contributing to exactly one output pixel when tw <= sw), value
    * = floor(sum / count). No floats, so any engine replays it bit-exact
    * — the property that keeps the DuckDB oracle hash-green on the REAL
    * kernel, not a fingerprint stub.
    */
  private[ops] def boxAverage(px: (Int, Int) => Int, sw: Int, sh: Int,
      tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var oy = 0
    while (oy < th) {
      val y0 = oy * sh / th; val y1 = (oy + 1) * sh / th
      var ox = 0
      while (ox < tw) {
        val x0 = ox * sw / tw; val x1 = (ox + 1) * sw / tw
        var sum = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += px(x, y); x += 1 }
          y += 1
        }
        out(oy * tw + ox) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Raster width the payload is laid out at (row-major, one byte per
    * grayscale pixel) and the thumbnail box the raster is resampled into.
    */
  val RasterWidth = 32
  val ThumbBox = 8L

  /** Aspect-fit resize of the decoded media into a [[d17Resize]] target
    * box. Two layers, both exact:
    *
    *  - METADATA math — decode dims (d8's stub formulas, the container
    *    has no codecs) aspect-fit into the 256 target box, downscale
    *    only, floor arithmetic — unchanged since round 5;
    *  - the REAL RESAMPLE — the payload interpreted as a row-major 8-bit
    *    grayscale raster ([[RasterWidth]] wide, `len div width` tall,
    *    tail bytes dropped), area-average downsampled ([[boxAverage]])
    *    into its own aspect-fit [[ThumbBox]] target; `thumb_md5`
    *    fingerprints the resampled pixel sequence (values joined with
    *    ','). Integer-exact end to end, so the DuckDB oracle recomputes
    *    the same pixels from the same bytes.
    *
    * Runs in the identical batched `mapPartitions` kernel shape as d8,
    * because that is where a real resampler lives (per-partition,
    * O(batch) memory, no shuffle: resize is row-local).
    */
  def resizeKernel(assembled: org.apache.spark.sql.Dataset[ResizeIn], box: Long): DataFrame = {
    import assembled.sparkSession.implicits._
    assembled.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.grouped(64).flatMap { batch =>
        batch.map { r =>
          val hex = md.digest(r.payload).map("%02x".format(_)).mkString
          val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
          val w = h % 640 + 1; val ht = h % 480 + 1
          val (ow, oh) = aspectFit(w, ht, box)
          val sw = math.min(RasterWidth, r.payload.length)
          val thumb = if (sw == 0) "" else {
            val sh = r.payload.length / sw
            val (tw, th) = aspectFit(sw, sh, ThumbBox)
            boxAverage((x, y) => r.payload(y * sw + x) & 0xFF,
              sw, sh, tw.toInt, th.toInt).mkString(",")
          }
          val thumbMd5 = md.digest(thumb.getBytes("UTF-8")).map("%02x".format(_)).mkString
          ResizeOut(r.doc_id, w, ht, ow, oh, thumbMd5)
        }
      }
    }.toDF()
  }

  /** Thumbnail stage over the documents' media payload: decode dims (d8's
    * stub formulas), aspect-fit them into a 256-box (downscale only,
    * floor arithmetic, min dimension 1), fingerprint the fake resample.
    */
  def d17Resize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    resizeKernel(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[ResizeIn],
      box = 256L)
  }

  /** Assemble the multimodal record (documents ⋈ embeddings on the primary
    * key) and run the batched decode kernel over the binary payload.
    */
  def d8MultimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

    val assembled = docs
      .join(embs, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"),
        col("lang"),
        col("text").cast("binary").as("payload"),
        size(col("v")).cast("long").as("emb_dim"),
        round(sqrt(aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)), 6).as("emb_norm"))
      .as[MediaIn]

    assembled
      .mapPartitions { rows =>
        // batch shape mirrors Arrow-batch UDF execution: decode 64 rows at
        // a time so a real codec could amortize per-batch setup
        rows.grouped(64).flatMap { batch =>
          batch.map { r =>
            val (len, w, h, fmt) = Decode.features(r.payload)
            MediaOut(r.doc_id, r.lang, len, w, h, fmt, r.emb_dim, r.emb_norm)
          }
        }
      }
      .toDF()
  }
}
