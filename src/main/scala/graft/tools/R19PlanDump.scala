package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round plan evidence dumper: writes
  * `<dir>/<entry>_<suffix>.txt` (formatted physical plan) for a
  * comma-separated entry list, one JVM for all of them. Usage:
  * `sbt "runMain graft.tools.R19PlanDump before q17_range_join,semdedup"`.
  * `SPARK_GRAFT_PLAN_DIR` overrides the output dir (default
  * `plans/r19`; round 20 dumps pass `plans/r20`).
  */
object R19PlanDump {
  private val usage =
    "usage: R19PlanDump <suffix> <entry[,entry...]> [sfDir]   " +
      "(env: SPARK_GRAFT_PLAN_DIR=plans/rNN)"
  def main(args: Array[String]): Unit = {
    // both positionals are required — a missing entry list must print
    // the usage, not throw ArrayIndexOutOfBoundsException (r19 ADVICE)
    if (args.length < 2) { System.err.println(usage); sys.exit(64) }
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    if (names.isEmpty) { System.err.println(usage); sys.exit(64) }
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r19")
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(planDir))
    names.foreach { name =>
      val df = graft.p6.Queries.all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(s"$planDir/${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // entries that persist/checkpoint inside the builder leave debris
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(s"[r19plandump] wrote $planDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
