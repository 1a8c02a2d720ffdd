package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("batched mapPartitions decode matches the declarative metadata path") {
    val viaWorkers = Multimodal.decodeMeta(spark, Multimodal.payloads(spark, TestSpark.sf0),
        batchSize = 7) // odd batch size to exercise the grouping
      .toDF().orderBy("doc_id").collect()

    val viaSql = Tables(spark, TestSpark.sf0, "documents").select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      substring(md5(col("text")), 1, 8).as("magic"),
      (octet_length(col("text")).cast("long") % 640).as("width"),
      (octet_length(col("text")).cast("long") * 7 % 480).as("height"),
      ((octet_length(col("text")).cast("long") + 63) / 64).cast("long").as("n_chunks"))
      .orderBy("doc_id").collect()

    assert(viaWorkers.length === 500)
    assert(viaWorkers.toSeq === viaSql.toSeq)
  }
}
