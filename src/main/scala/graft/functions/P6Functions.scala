package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-function surface (SURVEY.md §2.3/§2.5),
  * re-expressed as Catalyst `Column` compositions so every op stays
  * inside whole-stage codegen — no UDFs in the hot path.
  *
  * Semantics are pinned by the reference (cited per function) and by the
  * truth tables in its test suite; our ScalaTest specs mirror those.
  */
object P6Functions {

  // ---------------------------------------------------------------- F1
  /** Normalize a time-like cell to the reference's visit-token form
    * (ref: src/P6/mapper.py:196-216).
    *   null / blank           -> ""
    *   numeric                -> "T" + truncated integer part
    *   string                 -> trimmed; "T" prefixed unless already T/t
    */
  def normalizeTimeLike(c: Column): Column = {
    val s = trim(c.cast("string"))
    val numeric = s.rlike("^-?\\d+(\\.\\d+)?$")
    when(c.isNull || s === "", lit(""))
      .when(numeric, concat(lit("T"), s.cast("double").cast("long").cast("string")))
      .when(upper(s).startsWith("T"), s)
      .otherwise(concat(lit("T"), s))
  }

  // ---------------------------------------------------------------- F2
  /** Robust boolean parse with Python-truthiness fallback
    * (ref: src/P6/mapper.py:218-235). Truthy {1,true,t,yes,y}; falsy
    * {0,false,f,no,n,"",null}; anything else -> non-empty => true.
    *
    * CONTRACT: the engine's input model is STRING-CELL semantics
    * (every workbook cell arrives as a string; the reference's pandas
    * path reads the same sheets as object/str columns). A TYPED
    * numeric fed directly — e.g. `lit(0.0)` — casts to the string
    * "0.0", which is not in the falsy set and is non-empty, so it
    * parses TRUE, whereas Python `bool(0.0)` is False. That input is
    * unreachable through workbook ingest on either engine; a future
    * typed ingest that wants Python numeric truthiness must cast
    * numerics to boolean BEFORE calling this (PropertySpec pins the
    * divergence so it can't land silently).
    */
  def toBoolLike(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    when(c.isNull, lit(false))
      .when(s.isin("1", "true", "t", "yes", "y"), lit(true))
      .when(s.isin("0", "false", "f", "no", "n", ""), lit(false))
      .otherwise(length(s) > 0)
  }

  // ---------------------------------------------------------------- F3/F4
  /** Extract HPO digits from a free-form cell like "Myopia (HP:0000545)",
    * "HP:545", "545" (ref regex: src/P6/mapper.py:339-349). Returns the
    * digit run, or null when the cell doesn't parse.
    */
  private val hpoCellPattern = "^\\s*(.*?)\\s*\\(?(?i:HP:?)?(\\d+)\\)?\\s*$"

  def hpoDigits(c: Column): Column = {
    val d = regexp_extract(c, hpoCellPattern, 2)
    when(d === "", lit(null)).otherwise(d)
  }

  /** Optional label preceding the HPO id in the same cell. */
  def hpoLabel(c: Column): Column =
    trim(regexp_extract(c, hpoCellPattern, 1))

  /** Zero-pad digits to 7 and prefix "HP:" (ref: src/P6/mapper.py:358). */
  def hpoCurie(digits: Column): Column =
    when(digits.isNull, lit(null))
      .otherwise(concat(lit("HP:"), lpad(digits, 7, "0")))

  /** Full cell -> CURIE in one step. */
  def hpoCellToCurie(c: Column): Column = hpoCurie(hpoDigits(c))

  // ---------------------------------------------------------------- F5
  /** Chromosome normalize: trim, prefix "chr" unless already present
    * case-insensitively (ref: src/P6/mapper.py:279-284).
    */
  def normalizeChromosome(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(c.isNull || s === "", lit(null))
      .when(lower(s).startsWith("chr"), s)
      .otherwise(concat(lit("chr"), s))
  }

  // ---------------------------------------------------------------- F6
  /** Missing email -> "unknown@example.com", else trimmed
    * (ref: src/P6/mapper.py:273-276).
    */
  def emailOrDefault(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(c.isNull || s === "" || s === "nan", lit("unknown@example.com")).otherwise(s)
  }

  // ---------------------------------------------------------------- F7
  /** Parse an HGVS g. SNV like "chr16:g.100A>G" into a struct
    * (chrom, pos, ref, alt); null fields when no match.
    * Permissive chromosome class per ref: src/P6/genotype.py:67-77.
    */
  private val hgvsGPattern = "(?i)^\\s*(?:chr)?([0-9XYM]+):g\\.(\\d+)([ACGT]+)>([ACGT]+)\\s*$"

  def parseHgvsG(c: Column): Column = {
    val matched = c.rlike(hgvsGPattern)
    struct(
      when(matched, regexp_extract(c, hgvsGPattern, 1)).as("chrom"),
      when(matched, regexp_extract(c, hgvsGPattern, 2).cast("long")).as("pos"),
      when(matched, upper(regexp_extract(c, hgvsGPattern, 3))).as("ref"),
      when(matched, upper(regexp_extract(c, hgvsGPattern, 4))).as("alt"))
  }

  /** Strict-chromosome variant used by the consistency check
    * (ref: src/P6/mapper.py:451-455): chrom is any non-colon run.
    */
  private val hgvsGStrict = "(?i)^(?:chr)?([^:]+):g\\.(\\d+)([ACGT]+)>([ACGT]+)$"

  def parseHgvsGStrict(c: Column): Column = {
    val s = trim(c.cast("string"))
    val matched = s.rlike(hgvsGStrict)
    struct(
      when(matched, regexp_extract(s, hgvsGStrict, 1)).as("chrom"),
      when(matched, regexp_extract(s, hgvsGStrict, 2).cast("long")).as("pos"),
      when(matched, upper(regexp_extract(s, hgvsGStrict, 3))).as("ref"),
      when(matched, upper(regexp_extract(s, hgvsGStrict, 4))).as("alt"))
  }

  // ---------------------------------------------------------------- F8
  /** Normalize a g.HGVS expression (ref: src/P6/genotype.py:252-270):
    * SNV match -> "{chrom}:g.{pos}{REF}>{ALT}" (chr stripped, alleles
    * upcased); non-match starting with chr -> prefix stripped; other
    * non-blank -> trimmed passthrough; blank/null -> null.
    */
  def normalizeGExpression(c: Column): Column = {
    val s = trim(c.cast("string"))
    val p = parseHgvsG(s)
    when(c.isNull || s === "", lit(null))
      .when(p.getField("pos").isNotNull,
        concat(p.getField("chrom"), lit(":g."),
          p.getField("pos").cast("string"), p.getField("ref"),
          lit(">"), p.getField("alt")))
      .when(lower(s).startsWith("chr"), substring(s, 4, Int.MaxValue))
      .otherwise(s)
  }

  // ---------------------------------------------------------------- F9
  /** Split hgvsc "NM_000000.0:c.100A>G" -> (tx, cPart)
    * (ref: src/P6/genotype.py:80-91,236-250).
    */
  private val hgvscPattern = "(?i)^\\s*((?:N[MR]|X[MR]|E(?:NST)?)_?\\d+(?:\\.\\d+)?):(c\\..+)$"

  def parseHgvsC(c: Column): Column = {
    val matched = c.rlike(hgvscPattern)
    struct(
      when(matched, regexp_extract(c, hgvscPattern, 1)).as("tx"),
      when(matched, regexp_extract(c, hgvscPattern, 2)).as("cPart"))
  }

  // ---------------------------------------------------------------- F10
  /** Slash-tokenize + per-token trim/lower (zygosity & inheritance cells,
    * ref: src/P6/mapper.py:248-255).
    */
  /** Equivalent to `transform(split(cell, "/"), t => lower(trim(t)))`
    * but fully codegen'd: `transform` is a higher-order function with
    * no doGenCode, so the per-token form dropped every consumer (the
    * genotype validator runs per input row) out of whole-stage
    * codegen. Folding the space-trim into the split delimiter and
    * lowering the whole cell once is token-for-token identical —
    * `lower` commutes with `split`, and `trim`/`[ ]*` both strip
    * exactly the space character (0x20).
    */
  def slashTokens(c: Column): Column =
    split(lower(trim(coalesce(c.cast("string"), lit("")))), "[ ]*/[ ]*")

  // ---------------------------------------------------------------- F11
  /** Enum decode maps (ref: src/P6/mapper.py:67-80). A miss yields null,
    * which the caller routes to the issues channel.
    */
  val zygosityMap: Map[String, String] = Map(
    "het" -> "heterozygous",
    "hom" -> "homozygous",
    "comphet" -> "compound_heterozygosity",
    "hemi" -> "hemizygous",
    "mosaic" -> "mosaic")

  val inheritanceMap: Map[String, String] = Map(
    "unknown" -> "unknown",
    "inherited" -> "inherited",
    "denovo" -> "de_novo_mutation")

  def decodeZygosity(token: Column): Column =
    element_at(typedLit(zygosityMap), token)

  def decodeInheritance(token: Column): Column =
    element_at(typedLit(inheritanceMap), token)

  // ---------------------------------------------------------------- F12
  /** GENO allelic-state codes from normalized zygosity
    * (ref: src/P6/genotype.py:58-64,181-189).
    */
  val genoAllelicStateCodes: Map[String, String] = Map(
    "heterozygous" -> "GENO:0000135",
    "homozygous" -> "GENO:0000134",
    "compound_heterozygosity" -> "GENO:0000191",
    "hemizygous" -> "GENO:0000136",
    "mosaic" -> "GENO:0000150")

  def genoAllelicState(zygosity: Column): Column =
    element_at(typedLit(genoAllelicStateCodes), zygosity)

  // ---------------------------------------------------------------- F13
  /** Frequency label decode (dormant Periodicity model,
    * ref: src/P6/periodicity.py:24-42): strip/lower/spaces->_/drop parens.
    */
  val frequencyMap: Map[String, String] = Map(
    "obligate" -> "HP:0040280",
    "very_frequent" -> "HP:0040281",
    "frequent" -> "HP:0040282",
    "occasional" -> "HP:0040283",
    "very_rare" -> "HP:0040284",
    "excluded" -> "HP:0040285")

  def decodeFrequency(label: Column): Column = {
    val norm = regexp_replace(
      regexp_replace(lower(trim(label.cast("string"))), "\\(.*?\\)", ""),
      "\\s+", "_")
    element_at(typedLit(frequencyMap), regexp_replace(norm, "_+$", ""))
  }

  // ---------------------------------------------------------------- P1
  /** Header normalization as a *data* function (applied to column-name
    * strings on the driver; exposed as a Column op so it is also testable
    * against the DuckDB oracle). Ref order (src/P6/loader.py:48-54):
    * strip -> drop "(...)" -> whitespace->_ -> drop ":" -> lowercase.
    */
  def normalizeHeader(c: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_replace(trim(c.cast("string")), "\\s*\\(.*?\\)", ""),
      "\\s+", "_"), ":", ""))

  /** Same normalization in plain Scala, for driver-side column renames. */
  def normalizeHeaderName(s: String): String =
    s.trim.replaceAll("\\s*\\(.*?\\)", "").replaceAll("\\s+", "_")
      .replace(":", "").toLowerCase

  /** P2 alias rename map (ref: src/P6/loader.py:4-27). */
  val renameMap: Map[String, String] = Map(
    "ref" -> "reference", "alt" -> "alternate", "gene" -> "gene_symbol",
    "start" -> "start_position", "end" -> "end_position",
    "chrom" -> "chromosome", "hpo" -> "hpo_id", "hpo_term" -> "hpo_id",
    "timestamp" -> "date_of_observation")

  // ------------------------------------------------------------ V1-V9
  /** CHECK-constraint layer (ref: src/P6/genotype.py:140-175,
    * src/P6/phenotype.py:34-54) as boolean Columns.
    */
  def validPatientId(c: Column): Column = c.rlike("^[A-Za-z0-9]+$")

  def validEmail(c: Column): Column =
    c.rlike("^[\\w\\.\\+\\-]+@[\\w\\.\\-]+\\.[A-Za-z]+$")

  val allowedChromEncodings = Seq("hgvs", "ucsc", "refseq", "ensembl", "ncbi", "ega")

  def validChromosome(c: Column): Column =
    c.isin(allowedChromEncodings: _*) || lower(c).startsWith("chr")

  def validPosition(c: Column): Column =
    c.try_cast("long").isNotNull && c.try_cast("long") >= 0

  def nonEmpty(c: Column): Column =
    c.isNotNull && length(trim(c.cast("string"))) > 0

  def validZygosity(c: Column): Column =
    c.isin(zygosityMap.values.toSeq: _*)

  def validInheritance(c: Column): Column =
    c.isin(inheritanceMap.values.toSeq: _*)

  def validHpoId(c: Column): Column = c.rlike("^(HP:\\d{7}|\\d{7})$")

  def validObservationDate(c: Column): Column = c.rlike("^T\\d+$")

  // ---------------------------------------------------------------- V10
  /** HGVS <-> raw-coordinate consistency (ref: src/P6/mapper.py:444-500).
    * Returns a struct(parsed boolean, consistent boolean): `parsed` false
    * => reference emits "malformed HGVS" error; else `consistent` false
    * => warning (error iff strict mode, decided by the caller).
    * Accepts 1-based (start==end==pos) and BED-like (start==pos-1,
    * end==pos) SNV conventions; chromosome compared chr- and
    * case-insensitively; alleles upcased.
    */
  def hgvsConsistency(hgvsg: Column, chromosome: Column, startPos: Column,
      endPos: Column, refAllele: Column, altAllele: Column): Column = {
    val p = parseHgvsGStrict(hgvsg)
    val parsed = p.getField("pos").isNotNull
    val chromCell = regexp_replace(lower(trim(chromosome.cast("string"))), "^chr", "")
    val chromHgvs = lower(trim(p.getField("chrom")))
    val pos = p.getField("pos")
    val s = startPos.try_cast("long")
    val e = endPos.try_cast("long")
    val snvMatches = (s === pos && e === pos) || (s === pos - 1 && e === pos)
    val consistent = chromCell === chromHgvs && snvMatches &&
      upper(trim(refAllele.cast("string"))) === p.getField("ref") &&
      upper(trim(altAllele.cast("string"))) === p.getField("alt")
    struct(parsed.as("parsed"), coalesce(consistent, lit(false)).as("consistent"))
  }

  // ---------------------------------------------------------------- G1
  /** Zip-truncating multi-token zip (ref zip() semantics,
    * src/P6/mapper.py:258-261): pairs the two token arrays up to the
    * SHORTER length — unlike arrays_zip, which pads with null.
    * Returns array<struct<zyg,inh>> ready for explode().
    */
  def zipTruncate(a: Column, b: Column): Column = {
    val n = least(size(a), size(b))
    arrays_zip(slice(a, lit(1), n).as("zyg"), slice(b, lit(1), n).as("inh"))
  }
}
