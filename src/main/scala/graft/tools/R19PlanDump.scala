package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Round-19 plan evidence dumper: writes
  * `plans/r19/<entry>_<suffix>.txt` (formatted physical plan) for a
  * comma-separated entry list, one JVM for all of them. Usage:
  * `sbt "runMain graft.tools.R19PlanDump before q17_range_join,semdedup"`.
  */
object R19PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r19"))
    names.foreach { name =>
      val df = graft.p6.Queries.all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(s"plans/r19/${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // entries that persist/checkpoint inside the builder leave debris
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(s"[r19plandump] wrote plans/r19/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
