package graft.tools

import org.apache.spark.paths.SparkPath
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Dev probe: can ParquetPartitionReaderFactory run on the DRIVER
  * thread (no task context)? If yes, tiny sidecar loads need zero
  * Spark jobs. Prints rows read and the number of jobs submitted
  * around the local read.
  */
object LocalReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lrp").toString
    Seq(("a.parquet", 1L), ("b.parquet", 7L), ("a.parquet", 3L))
      .toDF("_file", "_pos").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    Thread.sleep(300)
    val before = jobs.get()
    val schema = StructType(Seq(StructField("_file", StringType), StructField("_pos", LongType)))
    val factory = Bridge.parquetReaderFactory(spark, schema, schema, Array.empty)
    val pf = PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(f.getAbsolutePath), 0L, f.length(), Array.empty, 0L, f.length())
    val r = factory.createReader(FilePartition(0, Array(pf)))
    var n = 0
    try while (r.next()) {
      val row = r.get()
      println(s"ROW ${row.getUTF8String(0)} ${row.getLong(1)}")
      n += 1
    } finally r.close()
    Thread.sleep(500)
    println(s"LOCALREAD rows=$n jobsDuring=${jobs.get() - before}")
    spark.stop()
  }
}
