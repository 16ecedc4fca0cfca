package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-hygiene audit: prints the formatted physical plan of key queries
  * so pushdown/pruning/broadcast decisions can be eyeballed (SURVEY §5).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    val interesting = if (args.nonEmpty) args.toSeq
    else Seq("rel_filter", "rel_scan_project", "rel_join_broadcast", "rel_agg_group", "rel_join_multiway")
    interesting.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
