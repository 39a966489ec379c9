package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque BINARY
  * columns with typed metadata, plus partition-parallel decode /
  * feature-extract over them.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, per-partition batching,
  * null handling, partitioning — is real, so swapping in a real decoder
  * (e.g. JNI JPEG, or a Python worker via a Pandas-UDF-style batch API)
  * only replaces the inner function.
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

  /** Partition-parallel "decode": mapPartitions over the binary payloads.
    * Deterministic stub — replace the body with a real codec at will. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val n = if (bytes == null) 0 else bytes.length
        val magic = (if (bytes == null) Array.empty[Byte] else bytes.take(8))
          .map(b => f"$b%02x").mkString
        // ??? real decoder goes here; deterministic fake below
        var h = 0L
        var i = 0
        while (i < n) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        val w = (h % 640 + 32).toInt
        val ht = (h % 480 + 24).toInt
        val feats = Array.tabulate(8)(j => (((h * (2 * j + 1) + j) % 1000) / 1000.0).toFloat)
        MediaFeatures(id, n.toLong, magic, w, ht, feats)
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
