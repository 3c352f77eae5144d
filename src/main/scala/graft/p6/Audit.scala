package graft.p6

import org.apache.spark.sql.DataFrame

/** The audit-excel preprocessing passes (ref: src/P6/__main__.py:394-455)
  * — pure driver-side metadata over `df.columns`, no jobs launched.
  */
object Audit {

  /** Three passes over the sheet map: header counts, content-based
    * classification, variant-column presence. The classification
    * message reproduces the reference's rendering exactly, including
    * the unconditional parenthetical (a phenotype/skip sheet renders
    * as e.g. "phenotype (hgvs)" because the reference always appends
    * the variant-detail suffix, ref: src/P6/__main__.py:430-437).
    */
  def preprocess(tables: Seq[(String, DataFrame)]): Seq[AuditEntry] = {
    val headerEntries = tables.map { case (name, df) =>
      AuditEntry("normalize-headers", name, s"${dataColumns(df)} cols", "info")
    }
    val classifyEntries = tables.map { case (name, df) =>
      val cols = df.columns.drop(1).toSet // first column = patient-ID index
      val hasRaw = Normalize.rawVariantColumns.subsetOf(cols)
      val hasHgvs = (Normalize.hgvsVariantColumns & cols).nonEmpty
      val isGen = Normalize.genotypeBaseColumns.subsetOf(cols) && (hasRaw || hasHgvs)
      val isPheno = Normalize.phenotypeKeyColumns.subsetOf(cols)
      val kind = if (isGen) "genotype" else if (isPheno) "phenotype" else "skip"
      val detail = if (hasRaw && hasHgvs) "raw+hgvs" else if (hasRaw) "raw" else "hgvs"
      AuditEntry("classify-sheet", name, s"$kind ($detail)", "info")
    }
    val variantEntries = tables.flatMap { case (name, df) =>
      val cols = df.columns.drop(1).toSet
      if (Normalize.genotypeBaseColumns.subsetOf(cols) &&
          !(Normalize.rawVariantColumns.subsetOf(cols) ||
            (Normalize.hgvsVariantColumns & cols).nonEmpty))
        Some(AuditEntry("variant-check", name, "missing raw & HGVS", "error"))
      else None
    }
    headerEntries ++ classifyEntries ++ variantEntries
  }

  /** pandas' len(df.columns) excludes the index column; our DataFrames
    * keep it as column 0.
    */
  private def dataColumns(df: DataFrame): Int = math.max(df.columns.length - 1, 0)

  /** Fixed-width table rendering (ref: src/P6/__main__.py:74-77). */
  def renderTable(entries: Seq[AuditEntry]): String = {
    val header = f"${"SHEET"}%-20s  ${"STEP"}%-25s  ${"LEVEL"}%-8s  MESSAGE"
    (header +: entries.map(e =>
      f"${e.sheet}%-20s  ${e.step}%-25s  ${e.level}%-8s  ${e.message}")).mkString("\n")
  }

  /** JSON array rendering (ref: src/P6/__main__.py:66-72, indent=2). */
  def renderJson(entries: Seq[AuditEntry]): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    if (entries.isEmpty) "[]"
    else entries.map { e =>
      s"""  {
         |    "step": ${q(e.step)},
         |    "sheet": ${q(e.sheet)},
         |    "level": ${q(e.level)},
         |    "message": ${q(e.message)}
         |  }""".stripMargin
    }.mkString("[\n", ",\n", "\n]")
  }
}
