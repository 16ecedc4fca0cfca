package graft.tools

import graft.{GraftCache, GraftSession, SparkEntry}

/** Dev tool: dump `.explain("formatted")` of the named catalog queries
  * to <outDir>/<query>_<tag>.txt in one JVM.
  *   sbt "runMain graft.tools.ExplainMany <outDir> <tag> q1,q2,..."
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, list) = args.take(3)
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val dir = "/root/testdata/sf0.01"
    list.split(",").foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"EXPLAINED $name")
      } catch {
        case e: Throwable => System.err.println(s"[explain] $name failed: $e")
      } finally GraftCache.clear()
    }
    spark.stop()
  }
}
