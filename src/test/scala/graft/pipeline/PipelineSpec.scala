package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end bronze→silver→gold on acordos-domain fixtures (FIXTURES.md §A):
  * duplicates, '-' placeholders, malformed dates, nulls, >255-char título,
  * rows differing only in dropped columns.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val longTitle = "acordo " * 50 // 350 chars

  // raw sheet layout: 13 columns, original header casing, all strings
  private def rawDf = Seq(
    // (data, parceiro, tipo_parceiro, continente, regiao, local, tipo_acordo,
    //  titulo, objetivo, recursos, tipo_doc, vigencia, link)
    ("01/02/2010", " frança ", "País", "Europa", "Europa Ocidental", "Paris",
     "bilateral", "acordo d'água", "cooperação", "hídricos", "memorando",
     "01/02/2020", "http://a"),
    ("01/02/2010", " frança ", "País", "Europa", "Europa Ocidental", "Paris",
     "bilateral", "acordo d'água", "cooperação", "hídricos", "memorando",
     "01/02/2020", "http://a"), // exact duplicate
    ("01/02/2010", " frança ", "País", "Europa", "Europa Ocidental", "Paris",
     "bilateral", "acordo d'água", "cooperação", "hídricos", "memorando",
     "99/99/9999", "http://OTHER"), // differs only in vigência/link -> collapses at silver
    ("bogus-date", "ONU", "Organização", "-", null, "Genebra",
     "multilateral", longTitle, "-", null, "tratado", null, null),
  ).toDF(Schemas.rawHeaders.map(h => h.toUpperCase): _*) // scrambled casing

  test("bronze: normalize names, parse dates (coerce), truncate título") {
    val b = Bronze.transform(rawDf)
    assert(b.columns.toSeq === Schemas.bronze.fieldNames.toSeq)
    val rows = b.select("data_de_celebração", "vigência", "título").collect()
    assert(rows(0).getDate(0).toString === "2010-02-01")
    assert(rows(2).isNullAt(1))        // 99/99/9999 -> NULL
    assert(rows(3).isNullAt(0))        // bogus-date -> NULL
    assert(rows(3).getString(2).length === 255)
  }

  test("silver: fill/replace, trim+title, ano, project+dedup") {
    val s = Silver.transform(Bronze.transform(rawDf))
    assert(s.columns.toSeq === Schemas.silver.fieldNames.toSeq)
    // 4 raw rows -> dup collapses AND the vigência/link-only variant collapses
    assert(s.count() === 2)
    val fr = s.filter($"parceiro" === "França").head()
    assert(fr.getAs[String]("tipo_de_parceiro") === "País")
    assert(fr.getAs[String]("título") === "Acordo D'Água") // pandas-title
    assert(fr.getAs[Int]("ano") === 2010)
    val onu = s.filter($"parceiro" === "Onu").head()
    assert(onu.getAs[String]("continente") === "Não Informado") // '-' replaced then titled
    assert(onu.getAs[String]("região") === "Não Informado")     // NULL filled then titled
    assert(onu.isNullAt(s.columns.indexOf("ano")))              // null date -> null ano
  }

  test("O3 retries: flaky task succeeds within budget; exhausted budget rethrows") {
    var calls = 0
    val got = Orchestrate.withRetries(3) {
      calls += 1
      if (calls < 3) sys.error(s"flaky $calls")
      "ok"
    }
    assert(got === "ok" && calls === 3)
    intercept[RuntimeException] {
      Orchestrate.withRetries(2) { sys.error("always") }
    }
  }

  test("O2/O4 fan-out: failures are isolated, successes complete") {
    val (ok, bad) = Orchestrate.runAll(Seq(
      "a" -> (() => 1),
      "boom" -> (() => sys.error("nope")),
      "b" -> (() => 2)), attempts = 2)
    assert(ok === Map("a" -> 1, "b" -> 2))
    assert(bad.keySet === Set("boom"))
  }

  test("gold: derived dims, país/org splits, null-propagating hierarchy") {
    val g = Gold.transform(Silver.transform(Bronze.transform(rawDf)), persist = false)
    assert(g.hier.columns.toSeq === Seq("local_completo", "acordo_recurso"))
    val hier = g.hier.collect().map(r => Option(r.getString(0))).toSet
    assert(hier.contains(Some("Europa > Europa Ocidental > Paris")))
    assert(g.pais.count() === 1 && g.org.count() === 1)
    assert(g.acordos.count() === 2)
    // all levels informative for ONU row (filled at silver) -> concat non-null
    val orgRow = g.org.head()
    assert(orgRow.getString(0) === "Não Informado > Não Informado > Genebra")
  }
}
