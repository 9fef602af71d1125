package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decode/feature-extract as partition-wise batch functions.
  *
  * The real media libs are absent in this container, so the DECODE step is
  * a clearly-marked deterministic stub (`FakeDecoder`) — but the Spark
  * plumbing is real: binary columns, a typed Dataset, `mapPartitions`
  * batch shape (the Scala analog of `mapInPandas`: one iterator per
  * partition, decode amortized across the batch, no per-row UDF dispatch),
  * and deterministic outputs the DuckDB oracle can still verify because
  * the stub derives features from the bytes arithmetically.
  *
  * At scale: blobs stay in their partition (no shuffle); decode
  * parallelism = input splits; metadata-only queries prune the blob column
  * at the parquet scan (columnar projection).
  */
object MultimodalOps {
  import Tables.documents

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * "width/height" are the first two bytes, "brightness" the mean of the
    * first 16 bytes. A real deployment swaps this for the codec call and
    * keeps every shape below identical. */
  object FakeDecoder {
    final case class Media(doc_id: Long, blob: Array[Byte])
    final case class Decoded(doc_id: Long, width: Int, height: Int,
                             n_bytes: Long, brightness: Double)
    def decodeBatch(it: Iterator[Media]): Iterator[Decoded] = {
      // per-partition init would happen here (codec handles, buffers)
      it.map { m =>
        val b = m.blob
        val head = b.take(16).map(_ & 0xff)
        Decoded(
          doc_id = m.doc_id,
          width = if (b.length > 0) (b(0) & 0xff) else 0,
          height = if (b.length > 1) (b(1) & 0xff) else 0,
          n_bytes = b.length.toLong,
          brightness =
            if (head.nonEmpty) head.sum.toDouble / head.length else 0.0)
      }
    }

    final case class Resized(doc_id: Long, n_bytes_out: Int,
                             resized: Array[Byte])
    /** STUB resize — stride subsampling stands in for a real scaler;
      * the batch shape (iterator in, iterator out, per-partition init
      * point) is what a libvips/ffmpeg call would slot into. */
    def resizeBatch(stride: Int)(it: Iterator[Media]): Iterator[Resized] =
      it.map { m =>
        val out = Array.tabulate((m.blob.length + stride - 1) / stride)(
          i => m.blob(i * stride))
        Resized(m.doc_id, out.length, out)
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata path: blob byte length + content digest, pure column ops.
    "multimodal_meta" -> ((s, d) =>
      documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("blob")).as("n_bytes"),
          md5(col("blob")).as("content_md5"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
        .select(col("doc_id"), col("n_bytes"), col("content_md5"),
                col("meta.lang").as("m_lang"),
                col("meta.n_chars").as("m_chars"))),

    // Decode path: typed Dataset -> mapPartitions batch decode (stubbed).
    "multimodal_decode" -> ((s, d) => {
      import s.implicits._
      import FakeDecoder._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[Media]
        .mapPartitions(decodeBatch _)
        .toDF()
    }),

    // Resize path: same typed batch shape, stride-2 "downscale" stub;
    // digest the resized payload so the oracle can verify it without
    // shipping blobs out of the executors.
    "multimodal_resize" -> ((s, d) => {
      import s.implicits._
      import FakeDecoder._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[Media]
        .mapPartitions(resizeBatch(2) _)
        .toDF()
        .select(col("doc_id"), col("n_bytes_out"),
                md5(col("resized")).as("resized_md5"))
    }),

    // Frame sampling: treat the blob as fixed 16-byte "frames", keep
    // every 4th — pure column ops (sequence/filter/explode), no UDF, so
    // the whole thing stays in codegen and blobs never leave their
    // partition.
    "multimodal_frame_sample" -> ((s, d) =>
      documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .withColumn("nf", floor(length(col("blob")) / 16).cast("int"))
        .filter(col("nf") > 0)
        .withColumn("f", explode(expr(
          "filter(sequence(0, nf - 1), x -> x % 4 = 0)")))
        .select(col("doc_id"), col("f").as("frame_idx"),
                md5(expr("substring(blob, f * 16 + 1, 16)"))
                  .as("frame_md5")))
  )

  val oracles: Map[String, String] = Map(
    // text is ASCII, so bytes == chars and the stub's byte arithmetic is
    // expressible over code points.
    "multimodal_meta" ->
      """SELECT doc_id,
         cast(strlen(text) as int) AS n_bytes,
         md5(text) AS content_md5,
         lang AS m_lang, n_chars AS m_chars
         FROM documents""",
    "multimodal_decode" ->
      """SELECT doc_id,
         cast(ascii(substr(text, 1, 1)) as int) AS width,
         cast(ascii(substr(text, 2, 1)) as int) AS height,
         cast(strlen(text) as bigint) AS n_bytes,
         cast(list_aggregate(list_transform(
             range(1, least(strlen(text), 16) + 1),
             i -> ascii(substr(text, i, 1))), 'sum') as double) /
           least(strlen(text), 16) AS brightness
         FROM documents""",
    // stride-2 subsample: bytes at 1-based positions 1, 3, 5, ...
    "multimodal_resize" ->
      """SELECT doc_id,
         cast(len(pieces) as int) AS n_bytes_out,
         md5(array_to_string(pieces, '')) AS resized_md5
         FROM (
           SELECT doc_id,
             list_transform(range(0, cast((strlen(text) + 1) // 2 as int)),
               i -> substr(text, cast(i * 2 + 1 as int), 1)) AS pieces
           FROM documents)""",
    "multimodal_frame_sample" ->
      """SELECT doc_id, cast(f as int) AS frame_idx,
         md5(substr(text, cast(f * 16 + 1 as int), 16)) AS frame_md5
         FROM (
           SELECT doc_id, text,
             unnest(list_filter(range(0, strlen(text) // 16),
               x -> x % 4 = 0)) AS f
           FROM documents
           WHERE strlen(text) >= 16)"""
  )
}
