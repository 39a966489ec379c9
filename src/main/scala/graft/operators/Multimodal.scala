package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque BINARY
  * columns with typed metadata, plus partition-parallel decode /
  * feature-extract over them.
  *
  * [[decode]] is a REAL image decoder for the formats the JDK ships
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — public, in every JRE): true
  * pixel dimensions and pixel-statistic features. Payloads ImageIO can't
  * parse (audio/video/unknown codecs — no codec libraries in this
  * container) fall back to `decodeStub`'s deterministic fake features, so
  * mixed-modality tables keep flowing; swapping in a richer codec (JNI,
  * or a Python worker via a Pandas-UDF-style batch API) only replaces the
  * inner function.
  */
object Multimodal {

  /** Typed row for decoded media features. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      magic: String,            // first 8 bytes, hex — format sniffing
      width: Int, height: Int,  // fake dimensions from the stub decoder
      features: Array[Float])   // fake embedding from the stub decoder

  /** Wrap a text/blob column as a BINARY payload with metadata — the shape
    * a real ingestion (e.g. image tarballs -> parquet) would produce. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("payload"),
      octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      lit("application/octet-stream").as("mime"))

  private def stubRow(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = if (bytes == null) 0 else bytes.length
    val magic = (if (bytes == null) Array.empty[Byte] else bytes.take(8))
      .map(b => f"$b%02x").mkString
    var h = 0L
    var i = 0
    while (i < n) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val w = (h % 640 + 32).toInt
    val ht = (h % 480 + 24).toInt
    val feats = Array.tabulate(8)(j => (((h * (2 * j + 1) + j) % 1000) / 1000.0).toFloat)
    MediaFeatures(id, n.toLong, magic, w, ht, feats)
  }

  /** Partition-parallel "decode": mapPartitions over the binary payloads.
    * Deterministic stub for payloads with no in-container codec. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) => stubRow(id, bytes) }
    }
  }

  /** REAL image decode via the JDK's bundled codecs (PNG/JPEG/GIF/BMP —
    * `javax.imageio`, public API, no extra jars): true width/height plus an
    * 8-dim pixel-statistic feature vector
    * `[meanR, meanG, meanB, meanLuma, luma(q00), luma(q01), luma(q10), luma(q11)]`
    * (channel means 0..255; quadrant lumas give a coarse spatial
    * signature). Non-image payloads fall back to [[stubRow]] so a mixed
    * media table decodes in one pass. Per-row work is linear in pixels and
    * fully partition-parallel — the same batch geometry a Pandas-UDF
    * encoder would consume at 100 TB. */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      // ImageIO's default stream cache spools every read through a temp
      // FILE in java.io.tmpdir — per-image disk I/O that dwarfs the actual
      // codec work on in-memory payloads. JVM-global flag, idempotent,
      // cheap to re-set per task.
      javax.imageio.ImageIO.setUseCache(false)
      it.map { case (id, bytes) =>
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: java.io.IOException => null }
        if (img == null) stubRow(id, bytes)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val magic = bytes.take(8).map(b => f"$b%02x").mkString
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          // channel sums overall + per-quadrant luma sums (exact integers)
          val sum = new Array[Long](3)
          val qsum = new Array[Long](4)
          val qcnt = new Array[Long](4)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            sum(0) += r; sum(1) += g; sum(2) += b
            val q = (if ((i / w) * 2 >= h) 2 else 0) + (if ((i % w) * 2 >= w) 1 else 0)
            qsum(q) += r + g + b; qcnt(q) += 1
            i += 1
          }
          val n = px.length.toLong
          val feats = Array(
            (sum(0).toDouble / n).toFloat, (sum(1).toDouble / n).toFloat,
            (sum(2).toDouble / n).toFloat,
            ((sum(0) + sum(1) + sum(2)).toDouble / (3.0 * n)).toFloat,
            (qsum(0).toDouble / (3.0 * qcnt(0))).toFloat,
            (qsum(1).toDouble / (3.0 * qcnt(1))).toFloat,
            (qsum(2).toDouble / (3.0 * qcnt(2))).toFloat,
            (qsum(3).toDouble / (3.0 * qcnt(3))).toFloat)
          MediaFeatures(id, bytes.length.toLong, magic, w, h, feats)
        }
      }
    }
  }

  /** Deterministic synthetic PNG payloads (solid color, sized by id) — a
    * fixture for exercising [[decode]] end to end with a closed-form
    * oracle: ImageIO must recover exactly `w = 100 + (id*7) % 500`,
    * `h = 80 + (id*13) % 400` and channel means equal to the fill color
    * derived from the id. Encoded executor-side (mapPartitions), so the
    * fixture itself exercises the real binary-column write path. */
  def syntheticPngTable(df: DataFrame, idCol: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // spread the ids across the executors BEFORE the per-image work: the
    // id column usually arrives as one small parquet split, and without
    // this the whole encode (and the decode chained on it) runs in a
    // single task — an 8-byte-per-row shuffle buys full parallelism
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
      // see decode: keep ImageIO off its temp-file stream cache — the
      // write path otherwise spools every encoded PNG through disk
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (100 + (id * 7) % 500).toInt
        val h = (80 + (id * 13) % 400).toInt
        val rgb = ((id * 2654435761L) % 0x1000000L).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb))
        g.fillRect(0, 0, w, h)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }.toDF("id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("mime", lit("image/png"))
  }

  /** Typed row for decoded audio features: container metadata recovered by
    * the JDK parser plus exact integer quartile energies (sum of squared
    * 16-bit samples over each quarter of the clip — a coarse loudness
    * envelope, the audio analog of [[decode]]'s quadrant lumas). */
  final case class AudioFeatures(
      id: Long, n_bytes: Long, sample_rate: Int, channels: Int,
      n_samples: Long, e0: Long, e1: Long, e2: Long, e3: Long,
      audio_ok: Boolean)

  /** Deterministic synthetic 16-bit PCM mono WAV payloads — the audio
    * fixture for exercising [[decodeAudio]] end to end with a closed-form
    * oracle. Clip for id: `n = 8000 + (id*17) % 4000` samples at 16 kHz,
    * sample t = `(id*31 + t*7) % 2003 - 1001` (a deterministic integer
    * waveform spanning the signed range ±1001). Encoded through the JDK's
    * own WAVE writer (`javax.sound.sampled.AudioSystem.write` — public
    * API, headless-safe), so the payload bytes are the real RIFF/WAVE
    * container layout, and encoded executor-side so the fixture exercises
    * the binary-column write path at full parallelism. */
  def syntheticWavTable(df: DataFrame, idCol: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val n = (8000 + (id * 17) % 4000).toInt
          val data = new Array[Byte](n * 2)
          var t = 0
          while (t < n) {
            val s = ((id * 31 + t.toLong * 7) % 2003 - 1001).toShort
            data(2 * t) = (s & 0xff).toByte
            data(2 * t + 1) = ((s >> 8) & 0xff).toByte
            t += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }.toDF("id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("mime", lit("audio/wav"))
  }

  /** REAL audio decode via the JDK's bundled WAVE/AIFF/AU parsers
    * (`javax.sound.sampled.AudioSystem` — public API, no extra jars):
    * recovers the true sample rate / channel count / sample count from the
    * container, then folds the PCM stream into exact integer quartile
    * energies `e_q = SUM(s(t)^2) for t in [q*n/4, (q+1)*n/4)` (16-bit
    * little-endian mono; other PCM layouts keep metadata with zero
    * energies). Payloads the JDK can't parse fall back to zeros with
    * `audio_ok = false`, so mixed media tables keep flowing — same
    * contract as [[decode]]'s image fallback. Per-row work is linear in
    * samples and fully partition-parallel. */
  def decodeAudio(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select("id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        try {
          if (bytes == null) throw new java.io.IOException("null payload")
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val data = ais.readAllBytes()
          val frameBytes = (fmt.getSampleSizeInBits / 8) * fmt.getChannels
          val n = if (frameBytes > 0) data.length / frameBytes else 0
          val e = new Array[Long](4)
          if (n > 0 && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              !fmt.isBigEndian) {
            var t = 0
            while (t < n) {
              val s = ((data(2 * t) & 0xff) | (data(2 * t + 1) << 8)).toShort.toLong
              e((t.toLong * 4 / n).toInt) += s * s
              t += 1
            }
          }
          AudioFeatures(id, bytes.length.toLong, fmt.getSampleRate.toInt,
            fmt.getChannels, n.toLong, e(0), e(1), e(2), e(3), audio_ok = true)
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException =>
            AudioFeatures(id, if (bytes == null) 0L else bytes.length.toLong,
              0, 0, 0L, 0L, 0L, 0L, 0L, audio_ok = false)
        }
      }
    }
  }

  /** Typed row for per-frame video decode output. */
  final case class VideoFrame(
      id: Long, width: Int, height: Int, n_frames: Int,
      frame_idx: Int, frame_bytes: Long, frame_md5: String,
      dec_w: Int, dec_h: Int, frame_ok: Boolean)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Minimal-but-correct AVI (RIFF) container writer for MJPG-style
    * streams: RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf)) LIST(movi
    * '00dc' chunks)). Frame payloads are whatever `frames` yields —
    * ImageIO-encoded JPEGs make a real playable motion-JPEG video;
    * deterministic ASCII payloads make an oracle-replayable fixture.
    * Chunks are even-padded per the RIFF spec. */
  private def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(fourcc.getBytes("US-ASCII")); o.write(le32(body.length))
      o.write(body); if (body.length % 2 == 1) o.write(0)
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = new java.io.ByteArrayOutputStream()
    avih.write(le32(40000)); avih.write(le32(0)); avih.write(le32(0))
    avih.write(le32(0x10)); avih.write(le32(frames.length)); avih.write(le32(0))
    avih.write(le32(1)); avih.write(le32(0)); avih.write(le32(w)); avih.write(le32(h))
    avih.write(new Array[Byte](16))
    val strh = new java.io.ByteArrayOutputStream()
    strh.write("vids".getBytes("US-ASCII")); strh.write("MJPG".getBytes("US-ASCII"))
    strh.write(new Array[Byte](12)); strh.write(le32(1)); strh.write(le32(25))
    strh.write(le32(0)); strh.write(le32(frames.length)); strh.write(new Array[Byte](16))
    val strf = new java.io.ByteArrayOutputStream()
    strf.write(le32(40)); strf.write(le32(w)); strf.write(le32(h))
    strf.write(Array[Byte](1, 0)); strf.write(Array[Byte](24, 0))
    strf.write("MJPG".getBytes("US-ASCII")); strf.write(le32(w * h * 3))
    strf.write(new Array[Byte](16))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++
      list("strl", chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    bos.write("RIFF".getBytes("US-ASCII"))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write(le32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** Deterministic MJPEG AVI payloads: k solid-color JPEG frames per id,
    * encoded by the JDK's own JPEG writer — a REAL playable video fixture
    * for [[decodeVideo]]'s frame-decode path. */
  def syntheticMjpegTable(df: DataFrame, idCol: String, k: Int = 4)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val w = (64 + (id * 7) % 64).toInt
          val h = (48 + (id * 13) % 48).toInt
          val frames = (0 until k).map { i =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color((((id * 31 + i * 97) % 256).toInt + 256) % 256,
              (((id * 17 + i * 53) % 256).toInt + 256) % 256, 128))
            g.fillRect(0, 0, w, h); g.dispose()
            val o = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", o)
            o.toByteArray
          }
          (id, buildAvi(w, h, frames))
        }
      }.toDF("id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("mime", lit("video/avi"))
  }

  /** Deterministic ASCII-payload AVI fixture: the container layout is the
    * real RIFF/AVI structure but frame i of id carries the replayable
    * bytes of `"frame:<id>:<i>:" * (3 + (id + i) % 5)` — so a SQL oracle
    * can recompute every extracted frame's length and md5 without a
    * codec. Container parsing (chunk walking, even padding, header
    * geometry) is exercised for real. */
  def syntheticAviAsciiTable(df: DataFrame, idCol: String, k: Int = 4)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val w = (64 + (id * 7) % 64).toInt
          val h = (48 + (id * 13) % 48).toInt
          val frames = (0 until k).map { i =>
            (s"frame:$id:$i:" * (3 + ((id + i) % 5)).toInt).getBytes("UTF-8")
          }
          (id, buildAvi(w, h, frames))
        }
      }.toDF("id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("mime", lit("video/avi"))
  }

  /** REAL video container decode: walk the RIFF/AVI chunk tree (pure JVM —
    * the container format is what data pipelines must parse; codecs vary),
    * recover stream geometry from avih, extract every '00dc'/'01dc' frame
    * chunk, and attempt a per-frame ImageIO decode (succeeds for MJPEG —
    * motion-JPEG frames ARE JPEGs — reporting decoded dimensions;
    * `frame_ok=false` for payloads no in-JDK codec reads, keeping mixed
    * tables flowing). One row per frame, partition-parallel, linear in
    * bytes. */
  def decodeVideo(media: DataFrame)(implicit spark: SparkSession): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select("id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        def u32(off: Int): Int =
          (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
            ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
        def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
        if (bytes == null || bytes.length < 12 || fourcc(0) != "RIFF" ||
            fourcc(8) != "AVI ") Iterator.empty
        else {
          var width = 0; var height = 0; var nFrames = 0
          val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, len)
          // size fields are untrusted: clamp every scan end to the real
          // payload, reject negative (high-bit) sizes, and stop at the
          // first chunk that overruns — a truncated/corrupt tail yields
          // the frames parsed so far instead of an exception or a
          // backwards-stepping infinite loop
          def walk(off0: Int, end0: Int): Unit = {
            val end = math.min(end0, bytes.length)
            var off = off0
            var ok = true
            while (ok && off + 8 <= end) {
              val cc = fourcc(off); val sz = u32(off + 4)
              val body = off + 8
              if (sz < 0) ok = false // high-bit size: corrupt, stop
              else {
                if (cc == "LIST" && sz >= 4)
                  // recurse with a clamped end: a truncated tail still
                  // yields every complete child chunk before the cut
                  walk(body + 4, math.min(body.toLong + sz, end.toLong).toInt)
                else if (body.toLong + sz <= end) {
                  if (cc == "avih" && sz >= 40) {
                    nFrames = u32(body + 16); width = u32(body + 32); height = u32(body + 36)
                  } else if (cc.endsWith("dc") || cc.endsWith("db")) frames += ((body, sz))
                } else ok = false // leaf chunk overruns the payload: stop
                val next = body.toLong + sz + (sz % 2)
                if (next > end) ok = false else off = next.toInt
              }
            }
          }
          walk(12, 12 + math.max(0, u32(4) - 4))
          frames.iterator.zipWithIndex.map { case ((foff, flen), i) =>
            val fb = java.util.Arrays.copyOfRange(bytes, foff, foff + flen)
            val md = java.security.MessageDigest.getInstance("MD5").digest(fb)
              .map(b => f"$b%02x").mkString
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
              catch { case _: java.io.IOException => null }
            VideoFrame(id, width, height, nFrames, i, flen.toLong, md,
              if (img == null) 0 else img.getWidth,
              if (img == null) 0 else img.getHeight,
              frame_ok = img != null)
          }
        }
      }
    }
  }

  /** Frame-sampling shape: explode k deterministic "frames" per payload —
    * the batch geometry of video frame extraction. */
  def sampleFrames(media: DataFrame, k: Int = 4): DataFrame =
    media.select(col("id"), col("n_bytes"),
        explode(expr(s"SEQUENCE(0, ${k - 1})")).as("frame_idx"))
      .withColumn("frame_offset", col("frame_idx") * (col("n_bytes") / k).cast("long"))

  /** Resize planning: fit decoded dimensions into a target box preserving
    * aspect ratio, never upscaling — pure per-row arithmetic (codegen'd,
    * scan speed); the pixel work itself belongs in the decoder batch where
    * a real codec would consume (out_w, out_h). */
  def resizePlan(decoded: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame =
    decoded
      .withColumn("__scale", least(lit(1.0),
        least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"))))
      .withColumn("out_w", floor(col("width") * col("__scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("__scale")).cast("int"))
      .drop("__scale")

  /** ViT-style patch-grid planning: explode each image into the
    * (patch_row, patch_col) grid a patch-size-P vision encoder would
    * consume, with pixel offsets. Images not evenly divisible by P keep
    * only full patches (floor), the standard crop-to-grid behavior. Pure
    * integer arithmetic over an explode — no shuffle, row count bounded by
    * rows * (W/P) * (H/P); at 100 TB this is the map-side fan-out feeding
    * a Pandas-UDF encoder batch, and the grid is layout-independent. */
  def patchPlan(sized: DataFrame, patch: Int = 16): DataFrame = {
    require(patch > 0, "patch size must be positive")
    sized
      .withColumn("n_cols", (col("out_w") / patch).cast("int"))
      .withColumn("n_rows", (col("out_h") / patch).cast("int"))
      .filter(col("n_cols") > 0 && col("n_rows") > 0)
      .withColumn("patch_row", explode(expr("SEQUENCE(0, n_rows - 1)")))
      .withColumn("patch_col", explode(expr("SEQUENCE(0, n_cols - 1)")))
      .withColumn("px", col("patch_col") * patch)
      .withColumn("py", col("patch_row") * patch)
  }
}
