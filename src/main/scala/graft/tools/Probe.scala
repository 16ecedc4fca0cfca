package graft.tools

import graft.GraftSession

/** Scratch diagnostics main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.001"
    try {
      val df = graft.SparkEntry.queries("rel_rollup")(spark, dir)
      df.show(40, false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
