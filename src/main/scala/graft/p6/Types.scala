package graft.p6

/** The record schema of the engine — case-class mirrors of the
  * reference's five dataclasses (SURVEY.md §1.1):
  * Genotype        ref: src/P6/genotype.py:99-134
  * Phenotype       ref: src/P6/phenotype.py:16-31
  * DiseaseRecord   ref: src/P6/disease.py:10-27
  * MeasurementRec  ref: src/P6/measurement.py:10-27
  * BiosampleRecord ref: src/P6/biosample.py:10-25
  *
  * Genomic positions are Long (positions exceed 2^31 on real genomes;
  * the reference uses Python arbitrary-precision int).
  */
final case class GenotypeRecord(
    genotype_patient_ID: String,
    contact_email: String,
    phasing: Boolean,
    chromosome: String,
    start_position: Long,
    end_position: Long,
    reference: String,
    alternate: String,
    gene_symbol: String,
    hgvsg: String,
    hgvsc: String,
    hgvsp: String,
    zygosity: String,
    inheritance: String)

final case class PhenotypeRecord(
    phenotype_patient_ID: String,
    HPO_ID: String,
    date_of_observation: String,
    status: Boolean)

final case class DiseaseRecord(
    patient_ID: String,
    disease_term: String,
    disease_label: Option[String],
    disease_onset: String,
    disease_status: Boolean)

final case class MeasurementRecord(
    patient_ID: String,
    measurement_type: String,
    measurement_value: Double,
    measurement_unit: String,
    measurement_timestamp: Option[String])

final case class BiosampleRecord(
    patient_ID: String,
    biosample_id: String,
    biosample_type: String,
    collection_date: String)

/** Error/warning side-channel row (SURVEY.md §2.9) — the distributed
  * replacement for the reference's stairval Notepad
  * (ref: src/P6/mapper.py:121). `level` is "error" | "warning".
  */
final case class Issue(sheet: String, step: String, level: String, message: String)

/** Audit report entry (ref: src/P6/__main__.py:25). */
final case class AuditEntry(step: String, sheet: String, message: String, level: String)
