package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Print the formatted physical plan (and optionally time an
  * execution) for ONE registry entry — the attribution tool for
  * driver-vs-board outliers: `sbt "runMain graft.tools.PlanProbe
  * containment_neardup [sfDir] [runs]"`. With runs > 0 it also
  * noop-sinks the entry that many times and prints per-run seconds,
  * so a plan question ("is the exchange reused?") and a timing
  * question ("does the time move when I change X?") answer from the
  * same session.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("containment_neardup")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 0
    val spark = graft.ExecMode.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.p6.Queries.all(name)(spark, sfDir)
    // format("formatted") elides reused subtrees; "extended" shows
    // the analyzed/optimized trees too when PLAN_MODE asks for them.
    val mode = sys.env.getOrElse("SPARK_GRAFT_PLAN_MODE", "formatted")
    println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
