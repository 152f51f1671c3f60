package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata structs, batched decode/feature-extract kernels.
  *
  * IMAGE decode is REAL: PNG/JPEG/GIF/BMP payloads are decoded with
  * the JDK's `javax.imageio.ImageIO` (no external dependency) and
  * report true width/height/channel counts. Audio/video decode remains
  * a documented deterministic stub (`fakeDecode` — no codecs in this
  * environment); the Spark-side shape (schema, batching, partitioning,
  * the mapPartitions signature a real codec plugs into) is identical
  * for both and fully tested.
  */
object Multimodal {

  // ImageIO defaults to a temp-FILE cache per read; executors decode
  // thousands of in-memory payloads, so force the heap path once
  private lazy val imageIoReady: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** PNG / JPEG / GIF / BMP magic — the formats the JDK decodes. */
  def isImageMagic(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Decode one media payload: real ImageIO decode for image formats,
    * the deterministic stub otherwise (audio/video/unknown). Corrupt
    * image bytes (`ImageIO.read` → null or IIOException) also fall to
    * the stub rather than failing the partition — quarantine-by-value,
    * like the extraction kernel's parse-failure rows.
    */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val img =
      if (!isImageMagic(bytes)) null
      else {
        imageIoReady
        // NonFatal, not just IOException: the JDK BMP/GIF readers throw
        // IllegalArgument/ArrayIndexOutOfBounds on malformed headers,
        // and any text payload starting with "BM"/"GIF8" reaches here
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      }
    if (img == null) fakeDecode(id, bytes)
    else MediaMeta(id, bytes.length, img.getWidth, img.getHeight,
      img.getRaster.getNumBands, XxHash.hashBytes(bytes, 0L))
  }

  /** Deterministic PNG fixture generator (splitmix64 pixels): real
    * ImageIO encode so specs/oracle queries can round-trip the REAL
    * decode path without committed binaries.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var z = seed + (y.toLong * width + x) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Typed metadata a decoder returns per media object. */
  final case class MediaMeta(
      id: Long, n_bytes: Int, width: Int, height: Int, channels: Int, checksum: Long)

  /** Attach a binary payload column (here synthesized from text via
    * UTF-8 encode; in production this is the raw media column).
    */
  def withBinary(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))

  /** STUB decode for NON-image media (audio/video — no codecs in this
    * environment): deterministic fake header parse. The signature
    * (bytes → meta) and the batched mapPartitions driver below are
    * shared with the real image path.
    */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(id, n, 1 + n % 64, 1 + n % 48, 3, XxHash.hashBytes(bytes, 0L))
  }

  /** Batched decode over the binary column: one kernel invocation per
    * partition, rows streamed in `batchSize` groups (the Scala
    * analogue of `mapInPandas` batch shape — a real decoder would
    * amortize model/codec setup per batch).
    */
  def decodeMeta(df: DataFrame, idCol: String, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder handle, model, …)
        batch.iterator.map { case (id, bytes) => decode(id, bytes) }
      })
  }

  /** Resize stub: target-dimension metadata with aspect-preserving
    * arithmetic (the real implementation swaps the body for a pixel
    * resampler; the schema and batch shape are the deliverable). The
    * scale math is the real contract a resize stage must satisfy.
    */
  def resizeMeta(metas: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    val spark = metas.sparkSession
    import spark.implicits._
    metas.map { m =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      (m.id, m.width, m.height,
        math.max(1, math.round(m.width * scale).toInt),
        math.max(1, math.round(m.height * scale).toInt))
    }.toDF("id", "width", "height", "out_width", "out_height")
  }

  /** Feature-extraction stub: a deterministic `Array[Float]` embedding
    * per media object (dim float features from splitmix64 of the
    * content hash) — the exact column shape the similarity/ANN
    * operators consume, so the multimodal path plugs into
    * `Similarity`/`Dedup.embeddingNearDupPairs` end-to-end. A real
    * implementation swaps the body for a vision encoder invoked once
    * per batch.
    */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int = 64,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // per-batch encoder setup would go here
        batch.iterator.map { case (id, bytes) =>
          val h0 = XxHash.hashBytes(bytes, 7L)
          val v = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            var z = h0 + i * 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z ^= z >>> 31
            v(i) = ((z >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
            i += 1
          }
          (id, v)
        }
      })
      .toDF("id", "embedding")
  }

  /** Deterministic linear-pattern PNG (pixel (x,y) = ((x·7+y·13)%256,
    * (x·3+y·5)%256, (x·11+y)%256)) — real ImageIO encode, and the
    * pixel function is plain integer arithmetic a SQL oracle can
    * restate closed-form (unlike the splitmix fixture, whose 64-bit
    * wrap-around products overflow DuckDB's HUGEINT).
    */
  def encodePngPattern(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, (((x * 7 + y * 13) % 256) << 16) |
          (((x * 3 + y * 5) % 256) << 8) | ((x * 11 + y) % 256))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL pixel kernel (decode → resample → pool), pure JDK: ImageIO
    * decode, nearest-neighbor resample to exactly `tw`×`th` with
    * integer source mapping `src = (dst · srcDim) / dstDim` (our own
    * loop, not AWT's scaler, so the mapping is exact and SQL-
    * restatable), then per-grid-cell channel SUMS (gridW×gridH cells,
    * cell of x = x / (tw/gridW)). Sums are exact integers — the
    * engine-comparable numerators of mean-pooled features; divide by
    * `n_px` for the float embedding. None for undecodable bytes
    * (quarantine-by-value, same contract as [[decode]]).
    */
  def pixelGridSums(bytes: Array[Byte], tw: Int, th: Int,
      gridW: Int, gridH: Int): Option[Seq[(Int, Long, Long, Long, Int)]] = {
    require(tw % gridW == 0 && th % gridH == 0, "grid must tile the target")
    if (!isImageMagic(bytes)) return None
    imageIoReady
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0) return None
    val cw = tw / gridW
    val ch = th / gridH
    val sums = Array.ofDim[Long](gridW * gridH, 3)
    var y = 0
    while (y < th) {
      val srcY = y * h / th
      var x = 0
      while (x < tw) {
        val srcX = x * w / tw
        val rgb = img.getRGB(srcX, srcY)
        val cell = (y / ch) * gridW + (x / cw)
        sums(cell)(0) += (rgb >> 16) & 0xff
        sums(cell)(1) += (rgb >> 8) & 0xff
        sums(cell)(2) += rgb & 0xff
        x += 1
      }
      y += 1
    }
    Some((0 until gridW * gridH).map(c =>
      (c, sums(c)(0), sums(c)(1), sums(c)(2), cw * ch)))
  }

  /** Frame sampling stub: every `stride`-th window of `frameBytes`
    * bytes stands in for video frame extraction; demonstrates the
    * 1-row → n-rows explode shape with deterministic output.
    */
  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int = 16,
      stride: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = bytes.grouped(frameBytes).toArray
        frames.indices.by(stride).map(i => (id, i, frames(i).length, XxHash.hashBytes(frames(i), 0L)))
      }
      .toDF("id", "frame_idx", "frame_bytes", "frame_hash")
  }
}
