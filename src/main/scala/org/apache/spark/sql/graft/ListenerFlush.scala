package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** QueryExecutionListener events dispatch asynchronously on the
  * shared LiveListenerBus; a harness that attributes observed metrics
  * to the query that just finished (graft.Bench) must drain the bus
  * between entries or a slow dispatch bleeds into the next entry's
  * bucket. `waitUntilEmpty` is `private[spark]`, hence this shim in
  * the org.apache.spark namespace (same pattern as the codegen
  * kernels in this package).
  */
object ListenerFlush {
  /** Block until the listener bus is drained; best-effort (a timeout
    * just means one metric may attribute late — never fail a bench).
    */
  def flush(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () }
}
