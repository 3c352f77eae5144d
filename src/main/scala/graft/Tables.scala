package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At real cluster
  * scale these would be multi-file partitioned datasets; `spark.read
  * .parquet` handles both shapes identically, and all downstream
  * operators are written against the schema, not the file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped as TIMESTAMP(NANOS) (which Spark 4 rejects
    // unless read as long) in some corpus generations and TIMESTAMP(MICROS)
    // in others. Normalize BY SCHEMA, not by assumption, to the
    // session-timezone (UTC) TIMESTAMP every downstream operator,
    // watermark, and DuckDB oracle was written against.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => // nanos-as-long: truncate to micros (DuckDB does the same)
          df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => // micros NTZ: reinterpret in UTC (value-identical)
          df.withColumn("ts", df.col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  /** Register every corpus table as a temp view (catalog-of-views model,
    * mirroring the reference's dict-of-DataFrames workbook —
    * /root/reference/src/P6/loader.py:30).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
