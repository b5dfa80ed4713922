package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt mandate; no analog in the
  * reference). Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode/feature-extraction runs per-partition in
  * batches, exactly the shape a Pandas-UDF / `mapInPandas` stage has in
  * PySpark. The codec itself is a clearly-marked deterministic FAKE —
  * image/audio libraries are not in this container — but the Spark-side
  * contract (schema, batching, partitioning) is real and tested.
  */
object Multimodal {

  /** media table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  /** Wrap the documents table as a media table: payload = UTF-8 bytes of
    * `text` (a stand-in blob), metadata derived deterministically. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("image/fake").as("kind"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height")).as("meta"))

  /** FAKE DECODER — stands in for an image/audio codec (libs absent in this
    * container). Deterministic features from the raw bytes so tests are
    * reproducible. A real deployment swaps only this function; the
    * partition-batched execution shape stays identical. */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array.fill(4)(0.0)
    else {
      val n = payload.length.toDouble
      val mean = payload.map(_ & 0xff).sum / n
      val mx = payload.map(_ & 0xff).max.toDouble
      val mn = payload.map(_ & 0xff).min.toDouble
      Array(n, mean, mx, mn)
    }
  }

  /** FAKE RESIZE — nearest-neighbor byte subsample standing in for an image
    * scaler: the output payload is exactly `w*h` bytes sampled at uniform
    * stride from the source, metadata updated to the new dimensions. Same
    * batch shape as [[decodeFeatures]]; a real deployment swaps only the
    * per-payload kernel. */
  def resize(media: DataFrame, w: Int, h: Int, batchSize: Int = 512): DataFrame = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    // w·h in Int wraps for large-but-valid dimensions (50000² → negative
    // → NegativeArraySizeException per row; 65536² → exactly 0 → silent
    // empty payloads); check the product in Long and bound the buffer
    require(w.toLong * h <= (1L << 30),
      s"target payload $w x $h exceeds 1 GiB per row — resize smaller or tile")
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val target = w * h
    media.select("doc_id", "media", "meta").mapPartitions { it =>
      it.grouped(math.max(1, batchSize)).flatMap { batch =>
        // per-batch setup for a real scaler would happen HERE, once
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val out =
            if (payload == null || payload.isEmpty) Array.emptyByteArray
            else Array.tabulate(target)(j => payload((j.toLong * payload.length / target).toInt))
          val meta = r.getStruct(2)
          Row(r.getLong(0), out, Row(meta.getString(0), w, h))
        }
      }
    }(enc)
  }

  /** FAKE FRAME SAMPLER — stands in for a video decoder: the payload is
    * treated as consecutive `frameBytes`-sized frames and every `stride`-th
    * frame is emitted as its own row (one-to-many, the flatMap shape a
    * real frame extractor has). Deterministic, so the declared query
    * carries a full DuckDB oracle over the byte arithmetic. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int,
                   batchSize: Int = 512): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "media").mapPartitions { it =>
      it.grouped(math.max(1, batchSize)).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null || payload.isEmpty) Iterator.empty
          else {
            val nFrames = (payload.length + frameBytes - 1) / frameBytes
            (0 until nFrames by stride).iterator.map { i =>
              val from = i * frameBytes
              Row(id, i.toLong, java.util.Arrays.copyOfRange(
                payload, from, math.min(from + frameBytes, payload.length)))
            }
          }
        }
      }
    }(enc)
  }

  /** Partition-batched decode → feature columns — the Scala analog of a
    * Pandas-UDF `mapInPandas` stage: rows arrive in `batchSize` groups so a
    * real codec can amortize model/library setup per batch (exactly the
    * Arrow-batch shape), and the output schema is fixed so downstream stays
    * fully relational. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 512): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
      StructField("max_byte", DoubleType, nullable = false),
      StructField("min_byte", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "media").mapPartitions { it =>
      it.grouped(math.max(1, batchSize)).flatMap { batch =>
        // per-batch setup for a real codec would happen HERE, once
        batch.map { r =>
          val id = r.getLong(0)
          val f = fakeDecodeFeatures(r.getAs[Array[Byte]](1))
          Row(id, f(0).toLong, f(1), f(2), f(3))
        }
      }
    }(enc)
  }
}
