package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as distributed per-partition batch passes.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubCodec.decode]] derives deterministic fake
  * width/height/duration from the payload's md5, so every downstream Spark
  * concern — schema, partitioning, batch shape, null handling — is real and
  * testable, and a production build swaps only the function body.
  *
  * At 100 TB these stages are narrow `mapPartitions` passes: no shuffle, no
  * driver collection; partition sizing is inherited from the scan
  * (`spark.sql.files.maxPartitionBytes`), which is exactly how you want
  * binary-blob decode parallelized on a 1000-executor cluster.
  */
object Multimodal {

  /** Decoded-media schema appended by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_checksum", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** ===== STUB ===== deterministic fake codec: md5-derived dimensions.
    * Production: replace body with a real decoder (e.g. javax.imageio /
    * ffmpeg bindings); signature and batch shape stay identical.
    */
  object StubCodec {
    private val md5 = new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

    def md5Hex(bytes: Array[Byte]): String =
      md5.get().digest(bytes).map("%02x".format(_)).mkString

    /** (checksum, nBytes, width, height) — width/height are pure functions
      * of the checksum so a SQL oracle can reproduce them.
      */
    def decode(payload: Array[Byte]): (String, Long, Int, Int) = {
      val h = md5Hex(payload)
      val w = 16 + (java.lang.Long.parseLong(h.substring(0, 4), 16) % 1024).toInt
      val ht = 16 + (java.lang.Long.parseLong(h.substring(4, 8), 16) % 1024).toInt
      (h, payload.length.toLong, w, ht)
    }
  }

  /** Attach media payload + metadata to a text table (the harness has no
    * binary table, so the payload is the utf-8 bytes of `textCol` — opaque
    * to everything downstream, exactly like a real image blob).
    */
  def withMediaColumn(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        octet_length(col("media")).cast("long").as("n_bytes"),
        lit("utf8-blob").as("format")))

  /** Decode + feature-extract: one imperative batch pass per partition over
    * the binary column (the MapProcessor shape, SURVEY §2.3), emitting the
    * original row + [[featureSchema]] columns.
    */
  def decodeFeatures(df: DataFrame, mediaCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ featureSchema.fields)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (ck, n, w, h) =
          if (payload == null) (null, 0L, 0, 0) else StubCodec.decode(payload)
        Row.fromSeq(r.toSeq ++ Seq(ck, n, w, h))
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stub: recompute dimensions against a bounding box, preserving
    * aspect ratio in integer arithmetic (deterministic, oracle-friendly).
    */
  def resize(df: DataFrame, maxSide: Int): DataFrame =
    df.withColumn("scale_num",
        when(greatest(col("width"), col("height")) > maxSide, lit(maxSide))
          .otherwise(greatest(col("width"), col("height"))))
      // floor() in both engines — Spark's double→int cast truncates while
      // DuckDB's rounds, so the truncation must be explicit for the oracle.
      .withColumn("out_w", floor(col("width") * col("scale_num") / greatest(col("width"), col("height"))).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale_num") / greatest(col("width"), col("height"))).cast("int"))
      .drop("scale_num")

  /** Frame-sample stub for video-like payloads: emit every `stride`-th
    * "frame index" up to a fake frame count derived from payload size.
    * Generator shape (1 row → N) = the reference's flat-map processors.
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("n_frames", (col("n_bytes") % 240 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
}
