package graft.tools

import graft.GraftSession

/** Dev probe: print the formatted plan of named INTERNAL frames (stages
  * hidden behind `.rdd`/json conversions that query-level explain cannot
  * show). Usage: sbt "runMain graft.tools.FramePlan <frame> [sfDir]" */
object FramePlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    args(0) match {
      case "ordersLines" =>
        graft.wikidata.SyntheticDump.ordersLines(spark, dir).explain("formatted")
      case other => throw new IllegalArgumentException(s"unknown frame $other")
    }
    spark.stop()
  }
}
