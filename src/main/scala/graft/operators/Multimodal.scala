package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video handled as opaque `binary` payloads
  * with typed metadata extracted by batched per-partition workers — the
  * Spark-side plumbing (schema, batch shape, partition parallelism) is real;
  * the actual codec call is stubbed behind [[FakeCodec]] because no media
  * libraries ship in this environment.
  *
  * At scale this is the `mapInPandas`/Arrow-batch pattern: payloads stay on
  * executors, workers see fixed-size batches, output is a typed struct
  * column that downstream relational operators can filter/aggregate on.
  */
object Multimodal extends QueryModule {

  /** Typed metadata row produced by the decode stage. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, magic: String,
      width: Long, height: Long, n_chunks: Long)

  /** Deterministic stand-in for a real image/audio decoder.
    *
    * A production build would replace `decode` with the real codec
    * (e.g. libjpeg / ffmpeg bindings) — everything around it (batching,
    * schema, partitioning) stays unchanged. Dimensions are derived
    * deterministically from payload size so tests and the SQL oracle can
    * validate the plumbing end-to-end.
    */
  object FakeCodec {
    val chunkBytes = 64

    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      // real impl: ??? (codec unavailable in this container)
      val n = payload.length.toLong
      (n % 640, (n * 7) % 480, (n + chunkBytes - 1) / chunkBytes)
    }

    def magic(payload: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(payload).take(4).map("%02x".format(_)).mkString
    }
  }

  /** The batched per-partition decode stage (mapInPandas analogue): binary
    * payloads → typed metadata, processed in fixed-size batches. */
  def decodeMeta(s: SparkSession, payloads: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    import s.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "worker call" per batch — the real codec would be invoked here
          batch.iterator.map { case (id, bytes) =>
            val (w, h, chunks) = FakeCodec.decode(bytes)
            MediaMeta(id, bytes.length.toLong, FakeCodec.magic(bytes), w, h, chunks)
          }
        }
      }
  }

  /** documents.text treated as an opaque binary payload */
  def payloads(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents").select(col("doc_id"), col("text").cast("binary").as("payload"))

  override val defs: Seq[Q] = Seq(
    Q("q_mm_meta",
      (s, d) => decodeMeta(s, payloads(s, d)).toDF()
        .select(col("doc_id"), col("n_bytes"), col("magic"), col("width"),
          col("height"), col("n_chunks"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
               substring(md5(text), 1, 8) AS magic,
               CAST(strlen(text) % 640 AS BIGINT) AS width,
               CAST((strlen(text) * 7) % 480 AS BIGINT) AS height,
               CAST((strlen(text) + ${FakeCodec.chunkBytes} - 1) // ${FakeCodec.chunkBytes} AS BIGINT) AS n_chunks
               FROM documents ORDER BY doc_id"""))
  )
}
