package graft

/** Dev tool: print the formatted physical plan of one catalog query.
  *   sbt "runMain graft.ExplainOne <query_name> [sfDir]"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
