package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-pipeline column ops used by both the batch query surface
  * (graft.p6.Queries) and the streaming operators
  * (graft.streaming.EventStreams) — one definition so batch and stream
  * agree structurally, not just by spec. Tokenization lives in
  * [[graft.operators.Dedup.tokens]].
  */
object TextOps {

  /** Canonical fingerprint text: lower-cased with every non-alnum run
    * collapsed to a single space (the exact-dedup normalization).
    */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Deterministic seedless train/test membership: docs whose id-md5
    * prefix sorts below `testBound` land in "test" (~10% for "1a").
    * Stable across runs, partitionings, and batch-vs-stream.
    */
  def stableSplit(id: Column, testBound: String = "1a"): Column =
    when(substring(md5(id.cast("string")), 1, 2) < testBound, "test")
      .otherwise("train")
}
