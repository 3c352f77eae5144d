package graft

/** Per-metric alarm predicates for the observe() metrics Bench and
  * Verify record into their artifacts (r16 VERDICT #6). The old rule —
  * ANY nonzero column is an alarm — was correct while containment's
  * `star_rows` (nonzero = star-degraded corpus) was the only observed
  * metric, but the first legitimately-nonzero informational metric
  * added would have permanently cried wolf in every scale-gate log.
  *
  * Dispatch is by the suffix-deduped metric name (Bench/Verify strip
  * the per-call `_<n>` uniquifier before recording):
  *   - an explicit entry decides (`containment_hot`: alarm iff any
  *     star row was emitted);
  *   - metrics named `stat_*` are DECLARED informational — nonzero is
  *     their normal state, never an alarm;
  *   - anything else stays CONSERVATIVE: nonzero ⇒ alarm, so a new
  *     degradation signal added without an entry here still surfaces
  *     rather than silently passing.
  */
object ObservedAlarms {
  private def nonzero(v: Any): Boolean = v match {
    case n: Long => n != 0L
    case n: Int => n != 0
    case n: Double => n != 0.0
    case _ => true
  }

  private val anyNonzero: Seq[(String, Any)] => Boolean =
    cols => cols.exists { case (_, v) => nonzero(v) }

  /** metric name (uniquifier-stripped) -> "these column values are an
    * alarm". Add an entry alongside any new observe() metric; omitting
    * one is safe (conservative default) but noisy for informational
    * metrics — name those `stat_*` instead.
    */
  private val predicates: Map[String, Seq[(String, Any)] => Boolean] = Map(
    // hot-posting star tier (operators/Dedup.observeStarPairs): any
    // emitted star row means the pair set is star-linked, not
    // complete, above the df cap — always an alarm
    "containment_hot" -> anyNonzero
  )

  /** The explicitly-mapped metric names — ObservedAlarmsSpec sweeps
    * every observe() call site in src/main and asserts each name
    * resolves here, is `stat_`-prefixed, or is listed as
    * conservative-by-choice in the spec (r17 VERDICT #8).
    */
  private[graft] def mappedMetrics: Set[String] = predicates.keySet

  def isAlarm(metric: String, cols: Seq[(String, Any)]): Boolean =
    predicates.get(metric) match {
      case Some(p) => p(cols)
      case None if metric.startsWith("stat_") => false
      case None => anyNonzero(cols)
    }
}
