package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Fixtures for the query-bank extraction (Facesheet.py:104-175), the R8
  * defaults bank (Lauren_RX_JPG_Reader.py:47-63), and the KV4 routing +
  * 13-rule cleanup battery (Ethan_PDFandJPG3.py:228-418) — one fixture
  * per cleanup rule where the rule has observable output.
  */
class RoutingSpec extends AnyFunSuite {

  test("queryKey: reference derivation (after first 'the ', cut at '?')") {
    assert(Extract.queryKey("What is the Patient Name?") == "Patient Name")
    assert(Extract.queryKey("What is the Garuntor relation to patient?") ==
      "Garuntor relation to patient")
    // no "the ": whole string (total-function deviation from the
    // reference's IndexError); no "?": to end
    assert(Extract.queryKey("MRN") == "MRN")
    assert(Extract.queryKey("What is the MRN") == "MRN")
  }

  test("queryBank: answered from anchors, unanswered stays with ''") {
    val text = "Patient Name: DOE, JANE\nMRN: 12345\nEncounter Date: 01/02/2020"
    val qs = Seq("What is the Patient Name?", "What is the MRN?",
      "What is the Patient Address?")
    val dd = Extract.queryBank(qs, text)
    assert(dd("Patient Name") == "DOE, JANE")
    assert(dd("MRN") == "12345")
    assert(dd("Patient Address") == "")
    assert(Extract.confidenceA1(dd) == 2.0 / 3.0)
  }

  test("defaultsBank: match or '<Field> not found'; Age/DOB captures group 2") {
    val f = Extract.defaultsBank("Name: Ana Li\nDOB: 01/02/1990\nRx: pump")
    assert(f("Name") == "Ana Li")
    assert(f("Age/DOB") == "01/02/1990")
    assert(f("Rx") == "pump")
    assert(f("Address") == "Address not found")
    assert(f("Refills") == "Refills not found")
    assert(f("Signature") == "Signature not found")
  }

  test("routing: skip terms, patient/doctor terms, unroutable dropped") {
    val (pa, dr, rx) = Extract.routeAndClean(
      "Guarantor Phone: (210) 555-0000\nICD-10 Code: Z39.1\nPlan Group: ABC\n" +
        "Prescribing MD: Dr Kim\nuses a breast pump daily")
    assert(pa.contains("Guarantor Phone")) // "phone" term
    assert(!pa.exists(_._1.contains("ICD"))) // skip term
    assert(!pa.contains("Plan Group") && !dr.contains("Plan Group"))
    assert(dr("Prescribing MD") == "Dr Kim") // doctor term, not physician-moved
    assert(rx("Prescription") == "Double Electric Breast Pump")
  }

  test("rule 1: unwanted checkbox-label fields removed from patient") {
    val (pa, _, _) = Extract.routeAndClean(
      "Mother expects regular separation from infant: X\nPatient Name: Ana Li")
    assert(!pa.keys.exists(_.contains("Mother expects")))
    assert(pa("First Name") == "Ana")
  }

  test("rule 2: physician key in patient moves to doctor as Doctor Name") {
    val (pa, dr, _) = Extract.routeAndClean("Physician Name: Dr Kim")
    // "name" routes it into patient first; rule 2 relocates it
    assert(!pa.keys.exists(_.toLowerCase.contains("physician")))
    assert(dr("Doctor Name") == "Dr Kim")
  }

  test("rules 5+8+11: 'Name MD - NPI' doctor key splits; X becomes the flag") {
    // no patient term in the key -> routed to doctor directly ("md"),
    // rule 5 turns the X value into Selected, rule 8 splits the combined
    // key, rule 11 renames the Selected flag
    val (_, dr, _) = Extract.routeAndClean("J. Kim MD - 1234567890: X")
    assert(dr("Doctor Name") == "J. Kim")
    assert(dr("NPI") == "1234567890")
    assert(dr("Is Prescribing Physician") == "Yes")
  }

  test("rules 3+13: infant relabeling and Infant-Name-capture fix") {
    val (pa, _, _) = Extract.routeAndClean(
      "Infant Name: Infant Date of Birth\nInfant DOB: 02/03/2024")
    assert(pa("Infant Name") == "Not present") // rule 13
    assert(pa("Infant DOB") == "02/03/2024")   // rule 3 strips+re-adds prefix
  }

  test("rules 4+9+10: alias removal and comma-aware name split") {
    val (pa, _, _) = Extract.routeAndClean("Patient Name: DOE, JANE\nName: ignored alias")
    assert(pa("First Name") == "JANE")
    assert(pa("Last Name") == "DOE")
    assert(!pa.contains("Name")) // alias removed because Patient Name existed
  }

  test("rules 5+6+7+12: checkbox/signature value normalization") {
    val (_, dr, _) = Extract.routeAndClean(
      "MD Signature: s\nPhysician Signature: scribble marks")
    assert(!dr.contains("MD Signature"))         // rule 6 then 7
    assert(dr("Physician Signature") == "Present") // rule 12
  }

  test("C4 geometry arm: wide short text-less span reads as a signature stroke") {
    import Extract.LayoutSpan
    assert(Extract.detectSignatureGeometry(Seq(LayoutSpan(0.3, 0.04, hasText = false))))
    // each single-condition violation: too narrow / too tall / has text
    assert(!Extract.detectSignatureGeometry(Seq(LayoutSpan(0.15, 0.04, hasText = false))))
    assert(!Extract.detectSignatureGeometry(Seq(LayoutSpan(0.3, 0.06, hasText = false))))
    assert(!Extract.detectSignatureGeometry(Seq(LayoutSpan(0.3, 0.04, hasText = true))))
    // full ladder: geometry arm fires without any text indicator
    assert(Extract.detectSignatureFull("no indicators here",
      Seq(LayoutSpan(0.5, 0.02, hasText = false))))
    assert(!Extract.detectSignatureFull("no indicators here", Seq.empty))
  }

  test("routedRecordJson: canonical nested shape, sections sorted") {
    val j = Extract.routedRecordJson("Patient Name: Ana Li\nuses a breast pump")
    assert(j.startsWith("{\"doctor\":{"))
    assert(j.contains("\"patient\":{\"First Name\":\"Ana\",\"Last Name\":\"Li\"}"))
    assert(j.endsWith("\"prescription\":{\"Prescription\":\"Double Electric Breast Pump\"}}"))
  }
}
