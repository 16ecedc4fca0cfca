package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class RateDebugSpec extends AnyFunSuite {
  import TestSpark._

  test("debug rate stream") {
    val ckpt = java.nio.file.Files.createTempDirectory("rate_ck").toString
    val out = java.nio.file.Files.createTempDirectory("rate_out").toString + "/d"
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .format(graft.sources.GraftRateSourceProvider.format)
      .option("totalRows", "1000")
      .option("rowsPerTrigger", "300")
      .option("partitions", "4")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val n = batch.count()
        println(s"### batch $id rows=$n")
        if (n > 0) nBatches.incrementAndGet()
        batch.write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    println(s"### exception=${q.exception}")
    println(s"### nBatches=${nBatches.get}")
    q.stop()
    println(s"### rows=${spark.read.parquet(out).count()}")
  }
}
