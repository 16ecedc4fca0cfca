package graft

import graft.multimodal.StubDecoder
import graft.multimodal.StubDecoder.Blob
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("mm_framesample emits 4 deterministic frames per blob") {
    val df = SparkEntry.queries("mm_framesample")(spark, sf)
    val counts = df.groupBy("doc_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSeq === Seq(4L))
    // deterministic: two runs hash identically
    val a = df.collect().map(_.toString).toSeq
    val b = SparkEntry.queries("mm_framesample")(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("synthetic corpus is pure ASCII — mm oracle byte/char equivalence holds") {
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val nonAscii = Tables(spark, sf).documents
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0L)
  }

  test("stub decoder runs per-partition over typed blobs") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Blob]
    val blobs = spark.createDataset(
      Seq(Blob(1, "hello world".getBytes), Blob(2, Array.emptyByteArray)))
    val out = StubDecoder.decode(blobs).collect().sortBy(_.doc_id)
    assert(out.length === 2)
    assert(out(0).n_bytes === 11 && out(0).mean_byte > 0)
    assert(out(1).n_bytes === 0 && out(1).mean_byte === 0.0)
  }
}
