ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wd2duckdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// If the local cache carries the DuckDB JDBC driver, put exactly ONE
// jar (newest by numeric version, never -sources/-javadoc) on the Test
// and Runtime classpaths: SinksSpec/MainSpec exercise a real DuckDB
// file end-to-end, and `runMain graft.Main --database out.duckdb` can
// produce the reference's literal artifact (no compile-time dependency
// — the sink loads the driver reflectively). Absent the jar, those
// tests self-cancel and the CLI reports a clear error.
def duckdbDriverJar: Def.Initialize[Task[Seq[Attributed[File]]]] = Def.task {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  def version(f: File): Seq[Int] =
    "[0-9]+".r.findAllIn(f.getName).toSeq.map(_.toInt)
  import scala.math.Ordering.Implicits._
  (cache ** "duckdb_jdbc-*.jar").get()
    .filter(_.getName.matches("duckdb_jdbc-[0-9.]+\\.jar"))
    .sortBy(version)
    .takeRight(1)
    .classpath
}
Runtime / unmanagedJars ++= duckdbDriverJar.value
Test / unmanagedJars ++= duckdbDriverJar.value
Test / fork := true
run / fork := true
// The driver json-parses Bench's one-line metric from the tail of sbt's
// stdout. sbt's default forked-output strategy prefixes every line with
// "[info] "/"[error] ", which breaks that parse (BENCH_r04..r06 all
// recorded parsed:null with the complete line in-window). StdoutOutput
// inherits the forked JVM's stdout/stderr directly — the metric line
// reaches the driver byte-identical to what Bench printed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's own trailing "[success] Total time" line so the
// metric line is the LAST line of stdout even for a parser that only
// looks at the final line.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
