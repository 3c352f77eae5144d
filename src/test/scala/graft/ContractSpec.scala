package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: naming drift between the query registry and
  * the oracle map silently downgrades a query to a rows-only check, so
  * pin the invariants here.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("oracle coverage is complete except the documented hash/sketch queries") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set.empty[String]
    assert(rowsOnly == documented,
      s"unexpected rows-only queries (add an oracle or document): ${rowsOnly -- documented}")
  }

  test("QUERIES.md inventory matches the registry (count + every name documented)") {
    // Three consecutive rounds of count drift — pin the doc to the code.
    // Explicit codec: the JVM default charset follows the shell locale, and
    // a C-locale box (LANG unset) throws MalformedInputException on the
    // doc's UTF-8 multibyte chars.
    val md = scala.io.Source.fromFile("QUERIES.md")(scala.io.Codec.UTF8)
    val text = try md.mkString finally md.close()
    val header = """\((\d+) total: (\d+) oracle-backed, (\d+)\s*\nrows-only\)""".r
    val m = header.findFirstMatchIn(text)
      .getOrElse(fail("QUERIES.md count line not found / format changed"))
    val (total, oracle, rowsOnly) =
      (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
    assert(total == SparkEntry.queries.size,
      s"QUERIES.md says $total queries, registry has ${SparkEntry.queries.size}")
    assert(oracle == SparkEntry.oracleSql.size,
      s"QUERIES.md says $oracle oracle-backed, registry has ${SparkEntry.oracleSql.size}")
    assert(rowsOnly == SparkEntry.queries.size - SparkEntry.oracleSql.size)
    val documented = """(?m)^\| `([a-z0-9_]+)` \|""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    assert(documented == SparkEntry.queries.keySet,
      s"missing rows: ${SparkEntry.queries.keySet -- documented}; " +
        s"stale rows: ${documented -- SparkEntry.queries.keySet}")
  }

  test("every multi-row oracle carries a deterministic ORDER BY") {
    val singleRow = Set("q2_revenue_filter", "q7_semi_anti_join", "q8_set_ops",
      "q9_distinct_counts", "dedup_exact", "dedup_fingerprint",
      "p6_term_checks", "p6_batch_validate", "q40_set_ops_all", "corpus_funnel",
      "fuzzy_join", "q46_subqueries", "media_dedup",
      "dedup_corpus", "dedup_increment", "dedup_increment_warm",
      "approx_distinct", "approx_percentiles",
      "ann_lsh_topk", "ann_ivf_topk",
      "emb_neardup", "simhash_neardup_pairs", "semdedup",
      "semdedup_planted", "leakage_safe_split")
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !singleRow(name) &&
        !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("ObservedAlarms: per-metric predicates — star_rows alarms, stat_* never does, unknown stays conservative") {
    // r16 VERDICT #6: the old any-nonzero rule would have permanently
    // cried wolf on the first legitimately-nonzero observe() metric.
    val hot = Seq("star_rows" -> (42L: Any))
    assert(ObservedAlarms.isAlarm("containment_hot", hot),
      "nonzero star_rows must alarm")
    assert(!ObservedAlarms.isAlarm("containment_hot",
      Seq("star_rows" -> (0L: Any))), "zero star_rows must not alarm")
    // a benign informational metric: nonzero is its NORMAL state
    assert(!ObservedAlarms.isAlarm("stat_rows_scanned",
      Seq("rows" -> (123456L: Any))),
      "stat_* metrics are informational and must never alarm")
    // unknown metrics keep the conservative default
    assert(ObservedAlarms.isAlarm("future_degradation_signal",
      Seq("n" -> (1L: Any))), "unknown nonzero metric must alarm")
    assert(!ObservedAlarms.isAlarm("future_degradation_signal",
      Seq("n" -> (0L: Any), "m" -> (0.0: Any))))
  }

  test("oracle SQL avoids DuckDB HUGEINT (raw sum over integer columns)") {
    // sums of known integer columns/expressions must be CAST to BIGINT
    // window sums (sum(...) OVER) stay internal to the query and never
    // reach the output schema, so they are exempt
    val offenders = SparkEntry.oracleSql.filter { case (_, sql) =>
      "(?i)(?<!CAST\\()sum\\((?:o_orderkey|p_partkey|doc_id|event_id|n_chars|is_new)\\w*\\)(?!\\s*OVER)"
        .r.findFirstIn(sql).isDefined
    }.keySet
    assert(offenders.isEmpty, s"possible HUGEINT sums: $offenders")
  }
}
