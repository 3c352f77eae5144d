package graft

import org.scalatest.funsuite.AnyFunSuite

/** Review-discipline gate for the observe() → ObservedAlarms wiring
  * (r17 VERDICT #8): every observed-metric name emitted anywhere in
  * src/main must resolve to an INTENDED alarm disposition — an
  * explicit predicate, the `stat_` informational convention, or a
  * name listed below as conservative-by-choice (nonzero ⇒ alarm via
  * the default, and that default is what the author wants). A metric
  * added without classification fails here instead of silently
  * falling into the conservative default and crying wolf — or worse,
  * being assumed informational by a reader of the artifact.
  *
  * The sweep is source-text-based on purpose: observe() names are
  * string literals at the call site (sometimes with a `${...}`
  * uniquifier suffix, which Bench/Verify strip before dispatch), so
  * the call-site text IS the registry of emitted names.
  */
class ObservedAlarmsSpec extends AnyFunSuite {

  /** Metric names whose absence from the predicate map is a CHOICE:
    * the conservative nonzero⇒alarm default is the intended
    * disposition. Empty today — add names here (with a why) rather
    * than letting them pass unclassified.
    */
  private val conservativeByChoice: Set[String] = Set.empty

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    kids.filter(_.isDirectory).flatMap(scalaFiles) ++
      kids.filter(f => f.isFile && f.getName.endsWith(".scala"))
  }

  /** observe() call sites in src/main: the literal (or literal-prefix,
    * for interpolated uniquifiers) metric name of each.
    */
  private def observedNames: Seq[(String, String)] = {
    // .observe("name" ...) or .observe(s"name_${...}" ...)
    val call = """\.observe\(\s*s?"([^"$]+)""".r
    for {
      f <- scalaFiles(new java.io.File("src/main/scala"))
      m <- call.findAllMatchIn(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    } yield {
      // strip a trailing uniquifier stem: `containment_hot_` (from
      // s"containment_hot_${n}") dispatches as `containment_hot`
      val raw = m.group(1)
      val name = if (raw.endsWith("_")) raw.dropRight(1) else raw
      (f.getPath, name)
    }
  }

  test("every observe() metric name in src/main has an intended alarm disposition") {
    val sites = observedNames
    // the sweep itself must be alive: Dedup's star tier observes
    assert(sites.exists(_._2 == "containment_hot"),
      s"sweep found no observe() call sites (regex rot?): $sites")
    val unclassified = sites.filterNot { case (_, name) =>
      ObservedAlarms.mappedMetrics.contains(name) ||
        name.startsWith("stat_") ||
        conservativeByChoice.contains(name)
    }
    assert(unclassified.isEmpty,
      "observe() metrics without an intended alarm disposition — add an " +
        "ObservedAlarms predicate, rename to stat_*, or list as " +
        s"conservative-by-choice in this spec: $unclassified")
  }

  test("mapped and conservative-by-choice names correspond to live call sites") {
    // the reverse direction: a predicate for a metric nothing emits is
    // dead wiring that will silently diverge from the next rename
    val emitted = observedNames.map(_._2).toSet
    val dead = (ObservedAlarms.mappedMetrics ++ conservativeByChoice)
      .filterNot(emitted.contains)
    assert(dead.isEmpty,
      s"alarm entries with no observe() call site left in src/main: $dead")
  }

  test("dispatch semantics: mapped, stat_, and conservative defaults") {
    assert(ObservedAlarms.isAlarm("containment_hot",
      Seq("star_rows" -> 7L)))
    assert(!ObservedAlarms.isAlarm("containment_hot",
      Seq("star_rows" -> 0L)))
    assert(!ObservedAlarms.isAlarm("stat_anything",
      Seq("rows" -> 123L)))
    assert(ObservedAlarms.isAlarm("unclassified_new_metric",
      Seq("rows" -> 1L)))
    assert(!ObservedAlarms.isAlarm("unclassified_new_metric",
      Seq("rows" -> 0L)))
  }
}
