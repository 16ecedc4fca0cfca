package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler._
import graft.{GraftCache, GraftSession, SparkEntry}

/** Dev profiler: run one catalog query and print a per-Spark-job time
  * breakdown (job wall ms, #tasks, shuffle read/write bytes, call site)
  * plus the gaps between jobs (driver-side work: planning, manifest IO,
  * commit bookkeeping). Usage:
  *   sbt "runMain graft.tools.ProfileOne <query> [sfDir] [reps=N]"
  */
object ProfileOne {

  final case class JobRec(
      id: Int,
      var desc: String = "",
      var submitted: Long = 0L,
      var completed: Long = 0L,
      var tasks: Int = 0,
      var shufRead: Long = 0L,
      var shufWrite: Long = 0L,
      var input: Long = 0L)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.drop(1).find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(2)
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = new JobRec(e.jobId)
        r.submitted = e.time
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.completed = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        // attribute task metrics to the newest incomplete job (approx; dev tool)
        val m = e.taskMetrics
        if (m != null) {
          var best: JobRec = null
          val it = jobs.values().iterator()
          while (it.hasNext) {
            val r = it.next()
            if (r.completed == 0L && (best == null || r.id > best.id)) best = r
          }
          if (best != null) {
            best.synchronized {
              best.tasks += 1
              best.shufRead += m.shuffleReadMetrics.totalBytesRead
              best.shufWrite += m.shuffleWriteMetrics.bytesWritten
              best.input += m.inputMetrics.bytesRead
            }
          }
        }
      }
    }

    // warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    var rep = 1
    while (rep <= reps) {
      GraftCache.clear()
      if (rep == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name rep$rep total=$dt%.2f s")
      rep += 1
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)

    import scala.jdk.CollectionConverters._
    val recs = jobs.values().asScala.toSeq.sortBy(_.id)
    var prevEnd = 0L
    var jobSum = 0L
    var gapSum = 0L
    println("  id | wall_ms | gap_ms | tasks | input_kb | shW_kb | shR_kb | desc")
    recs.foreach { r =>
      val wall = r.completed - r.submitted
      val gap = if (prevEnd == 0L) 0L else (r.submitted - prevEnd).max(0L)
      jobSum += wall.max(0L); gapSum += gap
      println(f"  ${r.id}%3d | ${wall}%7d | ${gap}%6d | ${r.tasks}%5d | ${r.input / 1024}%8d | ${r.shufWrite / 1024}%6d | ${r.shufRead / 1024}%6d | ${r.desc.take(90)}")
      prevEnd = r.completed
    }
    println(f"SUMMARY jobs=${recs.size} jobTime=${jobSum}ms gaps=${gapSum}ms")
    spark.stop()
  }
}
