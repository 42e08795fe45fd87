package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch feature extraction.
  *
  * The Spark-side contract — schema, partition-preserving batch transform,
  * feature vector shape — is real and tested; the actual codec call is a
  * STUB (`decodeStub`): the deterministic fake below stands in for an
  * image/audio decoder since no media libraries ship in this container.
  * A production deployment swaps `decodeStub` for a real decoder without
  * touching anything else here.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),       // image | audio | video
    StructField("width", IntegerType),     // px (images/video)
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // Hz (audio)
    StructField("n_frames", IntegerType)))   // video frames / audio windows

  /** Attach a deterministic fake media blob + metadata to each row (stand-in
    * for reading real bytes from object storage). Blob bytes derive from the
    * id so every run and every engine agrees on content. */
  def attachFakeMedia(df: DataFrame, idCol: String): DataFrame = {
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (col(idCol) % 3 + 1).cast("int"))
    df.withColumn("media_kind", kind)
      .withColumn("media_bytes",
        // 64 deterministic bytes: sha256 of the id, twice
        concat(sha2(col(idCol).cast("string").cast("binary"), 256).cast("binary"),
          sha2(concat(col(idCol).cast("string"), lit("x")).cast("binary"), 256)
            .cast("binary")))
      .withColumn("media_meta", struct(
        col("media_kind").as("kind"),
        when(col("media_kind") =!= "audio", lit(640)).as("width"),
        when(col("media_kind") =!= "audio", lit(480)).as("height"),
        when(col("media_kind") === "audio", lit(16000)).as("sample_rate"),
        when(col("media_kind") === "video", (col(idCol) % 100 + 1).cast("int"))
          .as("n_frames")))
  }

  /** STUB decoder: a real implementation would decode the blob with an
    * image/audio codec and emit pixel/spectrogram features. This fake is
    * deterministic in the bytes: an 8-bin byte histogram normalized to
    * frequencies — same shape (fixed-length Array[Float]) as a real
    * feature extractor, so downstream plumbing is exercised honestly. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    if (bytes == null || bytes.isEmpty) return bins
    bytes.foreach(b => bins((b & 0xff) / 32) += 1f)
    bins.map(_ / bytes.length)
  }

  /** Batch feature extraction over the media column. Runs as a
    * partition-local Dataset transform (the Scala analog of
    * `mapInPandas`): no shuffle, batches stream through the decoder. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col("media_bytes"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) =>
      (id, decodeStub(bytes))
    }).toDF(idCol, "features")
  }

  /** Frame sampling for video rows: every `stride`-th frame index — the
    * plumbing for "decode only sampled frames" (generates (id, frame_idx)
    * work units without touching bytes). */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int): DataFrame =
    df.filter(col("media_kind") === "video")
      .select(col(idCol),
        explode(sequence(lit(0),
          col("media_meta").getField("n_frames") - 1,
          lit(stride))).as("frame_idx"))
}
