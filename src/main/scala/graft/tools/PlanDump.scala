package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for declared queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the round-6 optimization evidence
  * (before/after plan shapes for every touched query).
  *
  * Usage: runMain graft.tools.PlanDump <suffix> [sfDir] [name...]
  *   suffix: "before" | "after" (file name suffix)
  *   default sfDir /root/testdata/sf0.1, default names = all queries
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      println(s"wrote plans/r06/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
