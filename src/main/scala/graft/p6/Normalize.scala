package graft.p6

import org.apache.spark.sql.DataFrame
import graft.functions.P6Functions

/** Ingest-side normalization (SURVEY.md §2.2 P1-P6): header rewrite,
  * alias renames, index-column promotion, and sheet binding. All of this
  * is driver-side metadata work — schemas are known without running jobs.
  */
object Normalize {

  /** P1+P2: normalize every column name, then apply the alias map where it
    * hits (ref: src/P6/loader.py:48-63).
    */
  def normalizeHeaders(df: DataFrame): DataFrame = {
    val normalized = df.columns.map(P6Functions.normalizeHeaderName)
    val renamed = normalized.map(c => P6Functions.renameMap.getOrElse(c, c))
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** P3: promote the leading (index) column to the kind-specific patient-id
    * name (ref: src/P6/mapper.py:189-194, 502-511). After parquet/xlsx
    * ingest the index is already an ordinary first column.
    */
  def promoteIndex(df: DataFrame, idName: String): DataFrame =
    df.withColumnRenamed(df.columns.head, idName)

  /** P4: sheet-name alias binding (ref: src/P6/mapper.py:95-101,513-541).
    * Keys of the result: genotype, phenotype, diseases, measurements,
    * biosamples — value None when no sheet matches.
    */
  val sheetAliases: Map[String, Set[String]] = Map(
    "genotype" -> Set("genotype", "variants", "variant", "geno"),
    "phenotype" -> Set("phenotype", "hpo", "pheno"),
    "diseases" -> Set("disease", "diseases"),
    "measurements" -> Set("measurement", "measurements", "labs"),
    "biosamples" -> Set("biosample", "biosamples", "samples"))

  def chooseNamedTables(tables: Map[String, DataFrame])
      : (Map[String, DataFrame], Seq[Issue]) = {
    val chosen = sheetAliases.flatMap { case (kind, aliases) =>
      tables.collectFirst {
        case (name, df) if aliases.contains(name.trim.toLowerCase) => kind -> df
      }
    }
    val issues =
      if (chosen.contains("genotype") || chosen.contains("phenotype")) Nil
      else Seq(Issue("workbook", "choose-tables", "error",
        "Missing required sheet: either 'genotype' or 'phenotype'."))
    (chosen, issues)
  }

  /** P6: content-based classifier used by the audit path
    * (ref: src/P6/__main__.py:421-440). Returns (classification, detail).
    */
  val genotypeBaseColumns = Set("contact_email", "phasing")
  val rawVariantColumns =
    Set("chromosome", "start_position", "end_position", "reference", "alternate")
  val hgvsVariantColumns = Set("hgvsg", "hgvsc", "hgvsp")
  val phenotypeKeyColumns = Set("hpo_id", "date_of_observation", "status")

  def classifySheet(columns: Seq[String]): (String, String) = {
    val cols = columns.toSet
    val hasRaw = rawVariantColumns.subsetOf(cols)
    val hasHgvs = (hgvsVariantColumns & cols).nonEmpty
    if (genotypeBaseColumns.subsetOf(cols) && (hasRaw || hasHgvs)) {
      val detail =
        if (hasRaw && hasHgvs) "raw+hgvs" else if (hasRaw) "raw" else "hgvs"
      ("genotype", detail)
    } else if (phenotypeKeyColumns.subsetOf(cols)) ("phenotype", "")
    else ("skip", "")
  }
}
