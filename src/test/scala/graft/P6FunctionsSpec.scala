package graft

import org.apache.spark.sql.functions._
import graft.functions.P6Functions._

/** Truth tables ported from the reference test suite
  * (tests/test_mapper_utils.py, test_genotype.py, test_phenotype.py,
  * test_mapper_check_hgvs.py) — exact semantic parity checks.
  */
class P6FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column, v: Any): Any = {
    val df = Seq(Option(v).map(_.toString)).toDF("v")
    df.select(c.as("r")).collect()(0).get(0)
  }

  test("F1 normalizeTimeLike truth table (ref tests/test_mapper_utils.py:10-16)") {
    assert(evalStr(normalizeTimeLike(col("v")), "20200101") == "T20200101")
    assert(evalStr(normalizeTimeLike(col("v")), "T2020") == "T2020")
    assert(evalStr(normalizeTimeLike(col("v")), " 2020 ") == "T2020")
    assert(evalStr(normalizeTimeLike(col("v")), "") == "")
    assert(evalStr(normalizeTimeLike(col("v")), null) == "")
    assert(evalStr(normalizeTimeLike(col("v")), "20.5") == "T20")
    assert(evalStr(normalizeTimeLike(col("v")), "t99") == "t99")
    assert(evalStr(normalizeTimeLike(col("v")), "visit3") == "Tvisit3")
  }

  test("F2 toBoolLike truth table (ref tests/test_mapper_utils.py:19-24)") {
    for (t <- Seq("1", "true", "TRUE", "Yes", "y", "t"))
      assert(evalStr(toBoolLike(col("v")), t) == true, s"truthy $t")
    for (f <- Seq("0", "false", "no", "", null, "f", "n", "  "))
      assert(evalStr(toBoolLike(col("v")), f) == false, s"falsy $f")
    // Python-truthiness fallback: arbitrary non-empty strings are true
    for (x <- Seq("O", "Phased", "Unphased", "2"))
      assert(evalStr(toBoolLike(col("v")), x) == true, s"fallback $x")
  }

  test("F3/F4 HPO cell parse + CURIE (ref src/P6/mapper.py:336-358)") {
    assert(evalStr(hpoCellToCurie(col("v")), "HP:510") == "HP:0000510")
    assert(evalStr(hpoCellToCurie(col("v")), "HP:0000510") == "HP:0000510")
    assert(evalStr(hpoCellToCurie(col("v")), "510") == "HP:0000510")
    assert(evalStr(hpoCellToCurie(col("v")), "Myopia (HP:0000545)") == "HP:0000545")
    assert(evalStr(hpoCellToCurie(col("v")), "Myopia (545)") == "HP:0000545")
    assert(evalStr(hpoCellToCurie(col("v")), "hp:545") == "HP:0000545")
    assert(evalStr(hpoCellToCurie(col("v")), "no digits here") == null)
    assert(evalStr(hpoLabel(col("v")), "Myopia (HP:0000545)") == "Myopia")
  }

  test("F5 chromosome normalize (ref src/P6/mapper.py:279-284)") {
    assert(evalStr(normalizeChromosome(col("v")), "16") == "chr16")
    assert(evalStr(normalizeChromosome(col("v")), "chr16") == "chr16")
    assert(evalStr(normalizeChromosome(col("v")), "CHRX") == "CHRX")
    assert(evalStr(normalizeChromosome(col("v")), " X ") == "chrX")
    assert(evalStr(normalizeChromosome(col("v")), "") == null)
  }

  test("F6 email default (ref src/P6/mapper.py:273-276)") {
    assert(evalStr(emailOrDefault(col("v")), null) == "unknown@example.com")
    assert(evalStr(emailOrDefault(col("v")), " a@b.co ") == "a@b.co")
  }

  test("F7/F8 HGVS g. parse + normalize (ref src/P6/genotype.py:67-77,252-270)") {
    val p = Seq("chr16:g.100A>G").toDF("v")
      .select(parseHgvsG(col("v")).as("p")).select($"p.*").collect()(0)
    assert(p.getString(0) == "16" && p.getLong(1) == 100L &&
      p.getString(2) == "A" && p.getString(3) == "G")
    assert(evalStr(normalizeGExpression(col("v")), "chr16:g.100A>G") == "16:g.100A>G")
    assert(evalStr(normalizeGExpression(col("v")), "16:g.100a>g") == "16:g.100A>G")
    // non-SNV with chr prefix: prefix stripped
    assert(evalStr(normalizeGExpression(col("v")), "chr7:g.100_102del") == "7:g.100_102del")
    // non-SNV without prefix: passthrough
    assert(evalStr(normalizeGExpression(col("v")), "NC_0001:g.100_102del") == "NC_0001:g.100_102del")
    assert(evalStr(normalizeGExpression(col("v")), "  ") == null)
  }

  test("F9 hgvsc split (ref src/P6/genotype.py:80-91)") {
    val r = Seq("NM_000000.0:c.100A>G", "ENST00000205557.12:c.2428G>A", "garbage")
      .toDF("v").select(parseHgvsC(col("v")).as("p")).select($"p.*").collect()
    assert(r(0).getString(0) == "NM_000000.0" && r(0).getString(1) == "c.100A>G")
    assert(r(1).getString(0) == "ENST00000205557.12" && r(1).getString(1) == "c.2428G>A")
    assert(r(2).isNullAt(0) && r(2).isNullAt(1))
  }

  test("F10/F11 slash tokens + enum decode (ref src/P6/mapper.py:67-80,248-255)") {
    val toks = Seq("Het/HOM ").toDF("v")
      .select(slashTokens(col("v")).as("t")).collect()(0).getSeq[String](0)
    assert(toks == Seq("het", "hom"))
    assert(evalStr(decodeZygosity(col("v")), "het") == "heterozygous")
    assert(evalStr(decodeZygosity(col("v")), "comphet") == "compound_heterozygosity")
    assert(evalStr(decodeZygosity(col("v")), "nope") == null)
    assert(evalStr(decodeInheritance(col("v")), "denovo") == "de_novo_mutation")
  }

  test("F12 GENO allelic state (ref src/P6/genotype.py:58-64)") {
    assert(evalStr(genoAllelicState(col("v")), "heterozygous") == "GENO:0000135")
    assert(evalStr(genoAllelicState(col("v")), "mosaic") == "GENO:0000150")
  }

  test("F13 frequency decode (ref src/P6/periodicity.py:24-42)") {
    assert(evalStr(decodeFrequency(col("v")), "Very frequent") == "HP:0040281")
    assert(evalStr(decodeFrequency(col("v")), "obligate") == "HP:0040280")
    assert(evalStr(decodeFrequency(col("v")), "unknown label") == null)
  }

  test("P1 header normalize (ref src/P6/loader.py:48-54)") {
    assert(normalizeHeaderName("  Start Position (bp) ") == "start_position")
    assert(normalizeHeaderName("HPO: Term") == "hpo_term")
    assert(normalizeHeaderName("Contact Email") == "contact_email")
    assert(evalStr(normalizeHeader(col("v")), "HPO: Term") == "hpo_term")
  }

  test("V1-V8 validation predicates (ref src/P6/genotype.py:140-175, phenotype.py:34-48)") {
    assert(evalStr(validPatientId(col("v")), "P100") == true)
    assert(evalStr(validPatientId(col("v")), "P-100") == false)
    assert(evalStr(validEmail(col("v")), "a.b+c@x-y.org") == true)
    assert(evalStr(validEmail(col("v")), "nope") == false)
    assert(evalStr(validChromosome(col("v")), "chr16") == true)
    assert(evalStr(validChromosome(col("v")), "hgvs") == true)
    assert(evalStr(validChromosome(col("v")), "16") == false)
    assert(evalStr(validHpoId(col("v")), "HP:0000510") == true)
    assert(evalStr(validHpoId(col("v")), "0000510") == true)
    assert(evalStr(validHpoId(col("v")), "HP:510") == false)
    assert(evalStr(validObservationDate(col("v")), "T20200101") == true)
    assert(evalStr(validObservationDate(col("v")), "2020") == false)
  }

  test("V10 HGVS consistency incl. BED convention (ref tests/test_mapper_check_hgvs.py)") {
    val df = Seq(
      // 1-based exact
      ("chr16:g.100A>G", "chr16", 100L, 100L, "A", "G", true, true),
      // BED-like start=pos-1
      ("chr16:g.100A>G", "16", 99L, 100L, "a", "g", true, true),
      // mismatching alt
      ("chr16:g.100A>G", "chr16", 100L, 100L, "A", "T", true, false),
      // malformed
      ("garbage", "chr16", 100L, 100L, "A", "G", false, false))
      .toDF("h", "c", "s", "e", "r", "a", "expParsed", "expConsistent")
    val got = df.select(
      hgvsConsistency(col("h"), col("c"), col("s"), col("e"), col("r"), col("a")).as("x"),
      col("expParsed"), col("expConsistent")).collect()
    got.foreach { row =>
      val x = row.getStruct(0)
      assert(x.getBoolean(0) == row.getBoolean(1), s"parsed: $row")
      assert(x.getBoolean(1) == row.getBoolean(2), s"consistent: $row")
    }
  }

  test("G1 zipTruncate truncates to shorter side (ref src/P6/mapper.py:258-261)") {
    val out = Seq(("het/hom/het", "inherited/denovo"))
      .toDF("z", "i")
      .select(explode(zipTruncate(slashTokens(col("z")), slashTokens(col("i")))).as("p"))
      .select($"p.zyg", $"p.inh").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "het" && out(0).getString(1) == "inherited")
    assert(out(1).getString(0) == "hom" && out(1).getString(1) == "denovo")
  }
}
