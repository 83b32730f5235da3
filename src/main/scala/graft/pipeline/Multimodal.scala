package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition operators (the Scala analog of `mapInPandas`).
  *
  * The Spark-side mechanics — schema, modality partitioning, batch
  * iteration shape, feature/frame output schemas — are real and tested.
  * The codec step itself is PLUGGABLE behind [[BlobCodec]] (the same
  * install-once-per-JVM seam as `Meta.setCommitGuard`): this container
  * has no image/audio libraries, so the default [[StubCodec]] derives
  * deterministic fake features from the bytes. A production deployment
  * implements [[BlobCodec]] over its real decoder (JNI/javacpp ffmpeg,
  * ImageIO, …) and installs it via [[setCodec]] — every plan, schema,
  * partitioning and batching decision around the codec stays.
  */
object Multimodal {

  /** The pluggable pixel/sample path: decode-and-featurize and
    * geometric resample over an opaque encoded payload. Implementations
    * MUST be deterministic per input (the dedup/curation layers above
    * hash their outputs) and thread-safe (one instance is shared by all
    * executor tasks in a JVM); per-task codec contexts belong inside
    * the methods (or a ThreadLocal), not in instance state.
    * Serializable because the instance is captured by task closures.
    */
  trait BlobCodec extends Serializable {
    /** Decode `content` and extract a `dim`-dimensional feature vector. */
    def features(content: Array[Byte], dim: Int): Array[Float]
    /** Re-encode `content` to the target geometry. */
    def resize(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
  }

  /** Default stub codec — deterministic fakes for the offline harness
    * (no codec libraries in this container). Feature path: xorshift
    * stream seeded from a byte-fold of the payload; resize path: keeps
    * the first `w·h` payload bytes (oracle-checkable byte counts).
    * Real media work is the ONLY thing missing; downstream dedup math
    * (dhash banding, digest grouping, curation ledger) is real.
    */
  object StubCodec extends BlobCodec {
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(j) = (h % 1000) / 1000.0f
        j += 1
      }
      out
    }
    def resize(content: Array[Byte], targetW: Int, targetH: Int)
        : Array[Byte] =
      java.util.Arrays.copyOf(content,
        math.min(content.length, targetW * targetH))
  }

  @volatile private var codec: BlobCodec = StubCodec

  /** Install a deployment's real codec (process-wide, before building
    * plans — operators capture the installed instance at plan build).
    */
  def setCodec(c: BlobCodec): Unit = { codec = c }

  def installedCodec: BlobCodec = codec

  val blobSchema: StructType = StructType(Seq(
    StructField("blob_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  /** Build a blob table from the documents fixture: text bytes stand in
    * for encoded media payloads; modality assigned round-robin so the
    * partition-by-modality path is exercised.
    */
  def blobTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("blob_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      struct(
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("blob_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("features", ArrayType(FloatType)),
    StructField("n_bytes", IntegerType)))

  /** Batched feature extraction — mapPartitions with an explicit batch
    * size so the decode amortizes per-batch setup (model load, codec
    * context) exactly like a `mapInPandas` batch would.
    *
    * Partitioning: the decode wants ONE codec kind per task (so the
    * per-batch decoder init is paid once per task, not per row), but
    * hashing on `modality` alone would put an entire modality — all
    * video at 100 TB — into a single task. The compound key
    * (modality, pmod(blob_id, P)) keeps tasks codec-homogeneous while
    * spreading each modality over up to P tasks. P defaults to the
    * session shuffle parallelism so a single-modality corpus still
    * fills the cluster.
    */
  def extractFeatures(blobs: DataFrame, dim: Int = 16, batchSize: Int = 64,
      subPartitionsPerModality: Int = 0): DataFrame = {
    val spark = blobs.sparkSession
    val p =
      if (subPartitionsPerModality > 0) subPartitionsPerModality
      else spark.sessionState.conf.numShufflePartitions
    // Explicit partition count: decode parallelism is a resource
    // decision (one codec context per task), not a data-volume one —
    // without it AQE coalesces a small shuffle back into one partition,
    // which is exactly the serialization this key exists to prevent.
    val partitioned = blobs.repartition(p,
      col("modality"), pmod(col("blob_id"), lit(p.toLong)))
    // the INSTALLED codec is captured at plan-build time and shipped in
    // the task closure (BlobCodec is Serializable) — executors decode
    // with the same instance the driver installed
    val c = codec
    val rdd = partitioned.select("blob_id", "modality", "content").rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (decoder init)
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("content")
            Row(r.getLong(0), r.getString(1),
              c.features(bytes, dim).toSeq, bytes.length)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("blob_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("resized", BinaryType),
    StructField("n_bytes_out", IntegerType)))

  /** Batched image resize — the third multimodal plumbing shape from
    * the pipeline checklist (decode / feature-extract / RESIZE /
    * frame-sample): image blobs re-encoded to a target geometry through
    * the same batched `mapPartitions` channel as [[extractFeatures]]
    * (one codec context per batch). The pixel work goes through the
    * installed [[BlobCodec]] (default [[StubCodec]]: keeps the first
    * `w·h` payload bytes — deterministic, oracle-checkable byte
    * counts); a real implementation installs via [[setCodec]]. Output
    * schema carries the new geometry + payload, exactly what a
    * downstream training-data writer consumes.
    */
  def resizeImages(blobs: DataFrame, targetW: Int = 16, targetH: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val spark = blobs.sparkSession
    val c = codec // captured at plan build, shipped in the closure
    val rdd = blobs.filter(col("modality") === "image")
      .select("blob_id", "content").rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (scaler/codec init)
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("content")
            val out = c.resize(bytes, targetW, targetH)
            Row(r.getLong(0), targetW, targetH, out, out.length)
          }
        }
      }
    spark.createDataFrame(rdd, resizeSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("blob_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", BinaryType),
    StructField("frame_offset", IntegerType)))

  /** Frame sampling for video-like payloads: n evenly spaced byte
    * windows per blob (the real version seeks keyframes; the slicing,
    * explode shape and output schema are identical).
    */
  def sampleFrames(blobs: DataFrame, nFrames: Int = 4, frameSize: Int = 32)
      : DataFrame = {
    val stride = greatest((length(col("content")) / nFrames).cast("int"), lit(1))
    blobs.filter(col("modality") === "video")
      .select(col("blob_id"), posexplode(transform(
        sequence(lit(0), lit(nFrames - 1)),
        i => struct(
          (i * stride).as("off"),
          substring(col("content"), (i * stride + 1).cast("int"), lit(frameSize))
            .as("bytes"))))
        .as(Seq("frame_idx", "frame")))
      .select(col("blob_id"), col("frame_idx"),
        col("frame.bytes").as("frame_bytes"),
        col("frame.off").as("frame_offset"))
  }
}
