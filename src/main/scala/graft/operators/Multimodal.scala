package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, per the training-data-pipeline brief.
  *
  * The sandbox has no image/audio libraries and the driver tables have no
  * binary column, so two things are deliberately split:
  *   - REAL: the Spark-side plumbing — BinaryType columns, schemas, byte-level
  *     metadata extraction (length, magic sniff, big-endian field reads), and
  *     the mapPartitions decode shape (per-partition batching, typed output
  *     rows) that a real codec would plug into.
  *   - STUB: the codec itself. `decodeImagesStub` computes deterministic
  *     per-byte statistics where a JPEG/PNG decoder would run; every stub
  *     output is still oracle-checkable (hex arithmetic reproduces it).
  *
  * All metadata extraction is hex-string Column math (codegen'd, no UDF), so
  * it scales as a pure map stage. */
object Multimodal {

  /** Deterministic variable-length fake payload (16/20/24 bytes keyed by id):
    * stands in for an image-bytes column so the binary plumbing is exercised
    * end-to-end against real BinaryType data. */
  def fakeImageBytes(text: Column, idCol: Column): Column =
    unhex(concat(md5(text),
      md5(concat(text, lit("x"))).substr(lit(1), ((idCol % 3) * 8).cast("int"))))

  /** Payload size in bytes (Spark length() on binary = octet count). */
  def byteLength(bin: Column): Column = length(bin).cast("long")

  /** Container-format sniff from the leading byte. On real data the same
    * shape dispatches on true magic numbers (0x89"PNG", 0xFFD8FF JPEG,
    * "GIF8", "RIFF"); the fake payload classifies by leading-byte range so
    * every class is exercised deterministically. */
  def sniffFormat(bin: Column): Column = {
    val b0 = conv(substring(hex(bin), 1, 2), 16, 10).cast("int")
    when(b0 < 64, "png").when(b0 < 128, "jpeg")
      .when(b0 < 192, "gif").otherwise("webp")
  }

  /** Big-endian unsigned 16-bit field at `byteOffset` — the primitive for
    * header reads (e.g. PNG width/height live at fixed offsets). */
  def beUint16(bin: Column, byteOffset: Int): Column =
    conv(substring(hex(bin), byteOffset * 2 + 1, 4), 16, 10).cast("long")

  /** Typed metadata record per payload: size, sniffed format, and
    * header-style dimension fields. Pure map stage, zero shuffles. */
  def imageMeta(df: DataFrame, id: String, bin: String): DataFrame =
    df.select(col(id),
      byteLength(col(bin)).as("n_bytes"),
      sniffFormat(col(bin)).as("format"),
      beUint16(col(bin), 0).as("width"),
      beUint16(col(bin), 2).as("height"))

  /** Video-shaped frame sampling: treat the payload as fixed-size frames and
    * emit every `everyNth` frame as its own row — the standard decimation
    * step before per-frame feature extraction. One row per SAMPLED frame
    * (explode of a bounded sequence), binary slicing via substr-on-binary;
    * payloads shorter than one frame produce no rows. The emitted frame is
    * hex-encoded so the DuckDB oracle (which cannot slice blobs) reproduces
    * it by slicing the hex text instead. Pure map + generate, zero shuffles —
    * output volume is len/(frameBytes·everyNth) of the input, decided before
    * any bytes move. */
  def frameSample(df: DataFrame, id: String, bin: String, frameBytes: Int,
                  everyNth: Int): DataFrame =
    df.select(col(id), col(bin))
      .withColumn("_nf", (byteLength(col(bin)) / frameBytes).cast("long"))
      .filter(col("_nf") > 0)
      .select(col(id),
        explode(sequence(lit(0L), col("_nf") - 1, lit(everyNth.toLong))).as("frame_idx"),
        col(bin))
      .select(col(id), col("frame_idx"),
        upper(hex(col(bin).substr(
          (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as("frame_hex"))

  case class DecodedImage(doc_id: Long, n_bytes: Long, byte_sum: Long)
  implicit val decodedImageEnc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
  private implicit val rawEnc: Encoder[(Long, Array[Byte])] =
    Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)

  /** Decode shape: typed mapPartitions over (id, bytes) — the slot where a
    * real per-partition codec loop goes (load library once per partition,
    * decode each payload, emit typed features).
    *
    * STUB: the "decode" here is deterministic per-byte statistics; swap the
    * body for an actual decoder when the runtime has one. The partitioning,
    * batch shape, and output schema are the real contract. */
  def decodeImagesStub(df: DataFrame, id: String, bin: String): Dataset[DecodedImage] =
    df.select(col(id).cast("long"), col(bin)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup for a real codec would happen here, once
        it.map { case (docId, bytes) =>
          DecodedImage(docId, bytes.length.toLong,
            bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
        }
      }
}
