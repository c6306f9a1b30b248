package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.TranscriptGen

class ExtractSpec extends AnyFunSuite {

  test("tokenizer: lowercase, >2 chars, distinct, sorted") {
    assert(Extract.tokenize("The the THE cat Cat scan-merge x yz") ==
      Vector("cat", "merge", "scan", "the"))
    assert(Extract.tokenize("") == Vector.empty)
    assert(Extract.tokenize(null) == Vector.empty)
  }

  test("segmenter: ALL-CAPS headers open sections, blank line closes; spans recover bodies") {
    val txt = "intro line\nPATIENT INFORMATION\na: 1\nb: 2\n\ntrailing"
    val s = Extract.segment(txt)
    assert(s.map(_.header) == Vector("PARAGRAPH", "PATIENT INFORMATION", "PARAGRAPH"))
    assert(s(0).body(txt) == "intro line")
    assert(s(1).body(txt) == "a: 1\nb: 2")
    assert(s(2).body(txt) == "trailing")
  }

  test("header detector rejects key:value and long lines") {
    assert(Extract.isAllCapsHeader("INSURANCE"))
    assert(!Extract.isAllCapsHeader("MRN: 123"))
    assert(!Extract.isAllCapsHeader("123456"))
    assert(!Extract.isAllCapsHeader("x" * 61))
  }

  test("classifier thresholds and precedence") {
    assert(Extract.classify(TranscriptGen.facesheet(testRng())) == "FACESHEET")
    assert(Extract.classify(TranscriptGen.prescription(testRng())) == "PRESCRIPTION")
    assert(Extract.classify(TranscriptGen.agreement(testRng())) == "AGREEMENT")
    assert(Extract.classify(TranscriptGen.insurance(testRng())) == "INSURANCE")
    assert(Extract.classify("nothing to see here") == "UNKNOWN")
  }

  test("kv anchors: first occurrence wins, key normalized") {
    val kv = Extract.kvAnchors("Patient Name: A\nPatient Name: B\nthe Provider?: X").toMap
    assert(kv("Patient Name") == "A")
    assert(kv.get("Provider").contains("X"))
  }

  test("anchor spans: absolute offsets recover the value; degenerate lines emit nothing") {
    val t = "Patient Name:  DOE, JANE  \nno anchor here\nMRN: M42\nEmpty:   \n:nokey\n : bad"
    val spans = Extract.anchorSpans(t)
    assert(spans.map(s => (s._1, s._4)) == Seq("Patient Name" -> "DOE, JANE", "MRN" -> "M42"))
    for ((_, st, ln, v) <- spans) assert(t.substring(st, st + ln) == v)
    assert(spans.head._2 == 15 && spans.head._3 == 9)
    assert(Extract.anchorSpans("").isEmpty)
    assert(Extract.anchorSpans("::").isEmpty) // first colon at index 0 -> no key
    assert(Extract.anchorSpans("a:\nb:  ").isEmpty) // empty trimmed values
  }

  test("facesheet bank extracts name/dob/phone and splits name") {
    val f = Extract.facesheetBank(
      "Patient Name: DOE, JANE\nPatient Date of Birth: 04/12/1987\nPatient Phone Number: (713) 555-0142")
    assert(f("patient_name") == "DOE, JANE")
    assert(f("patient_first_name") == "JANE")
    assert(f("patient_last_name") == "DOE")
    assert(f("patient_dob") == "04/12/1987")
    assert(f("patient_phone") == "(713) 555-0142")
  }

  test("prescription bank: icd fallback chain, tri-group, pump canonical, npi split") {
    val txt = TranscriptGen.prescription(testRng())
    val f = Extract.prescriptionBank(txt)
    assert(f("icd10").matches("Z39\\.\\d"))
    assert(f("pump_type") == "Double Electric Breast Pump")
    assert(f("item_code") == "E0603")
    assert(f("qty").toInt >= 1)
    assert(f("physician_npi").matches("\\d{10}"))
    assert(f.contains("necessity_items"))
  }

  test("agreement bank: tail window, name validation, date fallback") {
    val txt = "AGREEMENT\n" + ("filler line\n" * 20) +
      "Signed by customer: Maria Gomez\nDate : 07/13/2024 07:04 CMT"
    val f = Extract.agreementBank(txt)
    assert(f("signed_by") == "Maria Gomez")
    assert(f("signed_date") == "07/13/2024 07:04 CMT")
    // excluded phrase rejected
    val g = Extract.agreementBank("Signed by customer: X\nDate : 01/01/2020")
    assert(!g.contains("signed_by"))
    assert(g("signed_date") == "01/01/2020")
  }

  test("insurance bank: member name/id split (P10)") {
    val f = Extract.insuranceBank("Member Name JOHN ROE W123456789\nBIN: 610011")
    assert(f("member_name") == "JOHN ROE")
    assert(f("member_id") == "W123456789")
  }

  test("phone sweep (R9) with lazy ?? quantifier finds all forms") {
    val v = Extract.phoneNumbers("call (713) 555-0142 or 832.555.9931 now")
    assert(v.size == 2)
  }

  test("boilerplate strip keeps dense blocks, drops nav/footer") {
    val html = TranscriptGen.html(testRng())
    val out = Extract.stripBoilerplate(html)
    assert(out.contains("Main content paragraph"))
    assert(!out.contains("Privacy"))
    assert(!out.contains("Home"))
  }

  test("chrome pruning drops nav/header/aside/footer subtrees by position") {
    val html =
      """<html><head><title>Page Title Words</title></head><body>
        |<header>Brand slogan words repeated here again today folks</header>
        |<nav>Products pricing support documentation contact about team blog</nav>
        |<div>Article body kept with plenty of plain words here.</div>
        |<aside>Sponsored related reading list promotion words appear here</aside>
        |<footer>Copyright terms privacy contact address line words here</footer>
        |</body></html>""".stripMargin
    val out = Extract.stripBoilerplate(html)
    assert(out == "Article body kept with plenty of plain words here.")
    // unclosed chrome tag: subtree falls through to the density rule
    val unclosed = "<body><nav>one two<div>Real content words five six seven eight</div></body>"
    assert(Extract.stripBoilerplate(unclosed)
      .contains("Real content words five six seven eight"))
  }

  test("textBlocks computes word count and link density per block") {
    val bs = Extract.textBlocks(
      """<body><p>five plain words right here</p>
        |<div><a href="u">related one</a> <a href="v">related two</a></div></body>""".stripMargin)
    assert(bs.map(_.words) == Vector(5, 4))
    assert(bs(0).linkDensity == 0.0)
    assert(bs(1).linkDensity > 0.9)
  }

  test("boilerpipe stump: neighbor context decides short blocks") {
    val page =
      """<body>
        |<p>Alpha body one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen</p>
        |<div><a href="u">related one</a> <a href="v">related two</a> <a href="w">related three</a></div>
        |<p>Caption text under the related links block here today folks</p>
        |<p>Short intro before long paragraph</p>
        |<p>Bravo content continues with many more words to easily pass the sixteen word threshold here now yes</p>
        |<div><a href="x">terms</a> <a href="y">privacy</a></div>
        |<p>Copyright footer style trailing words appear here today</p>
        |</body>""".stripMargin
    val out = Extract.mainContentBoilerpipe(page).split("\n").toVector
    // 17-word lead, 5-word intro (next is long), 18-word paragraph kept;
    // link farms, the 10-word caption after a link farm, and the trailing
    // 8-word block after a link farm dropped.
    assert(out.size == 3)
    assert(out(0).startsWith("Alpha body"))
    assert(out(1) == "Short intro before long paragraph")
    assert(out(2).startsWith("Bravo content"))
    // the flat density rule keeps the caption and trailer (both >= 5
    // plain words) — the context stump is genuinely a different classifier
    val flat = Extract.stripBoilerplate(page)
    assert(flat.contains("Caption text") && flat.contains("Copyright footer"))
  }

  test("confidence A1: empty-value counting") {
    assert(Extract.confidenceA1(Map()) == 0.0)
    assert(Extract.confidenceA1(Map("a" -> "x", "b" -> "")) == 0.5)
    assert(Extract.confidenceA1(Map("a" -> "x")) == 1.0)
  }

  test("confidence A2: 3-point rounded 2dp") {
    assert(Extract.confidenceA2(Map("signed_by" -> "A", "signed_date" -> "d"), sig = true) == 1.0)
    assert(Extract.confidenceA2(Map("signed_by" -> "A"), sig = false) == 0.33)
    assert(Extract.confidenceA2(Map(), sig = true) == 0.33)
    assert(Extract.confidenceA2(Map("signed_by" -> "A", "signed_date" -> "d"), sig = false) == 0.67)
  }

  test("extractTurn: quarantine arms (E1/F3)") {
    assert(Extract.extractTurn("c", 0, null).status == "failed:empty")
    assert(Extract.extractTurn("c", 0, "").status == "failed:empty")
    // oversize guard without allocating 10MiB repeatedly: fake via small cap not possible;
    // construct one oversized string once.
    val big = "a" * (Extract.MaxTextChars + 1)
    assert(Extract.extractTurn("c", 0, big).status == "failed:oversize")
  }

  test("extractTurn is deterministic and pure") {
    val t = TranscriptGen.turn(3, 5)
    val a = Extract.extractTurn(t.conv_id, t.turn_idx, t.text)
    val b = Extract.extractTurn(t.conv_id, t.turn_idx, t.text)
    assert(a == b)
    assert(a.status == "ok")
  }

  test("generator is deterministic and order-independent") {
    val a = TranscriptGen.turn(7, 2)
    val b = TranscriptGen.turn(7, 2)
    assert(a == b)
    // skew fixture: conv 0 is giant
    assert(TranscriptGen.convSize(0, 256) == 256)
    assert(TranscriptGen.convSize(1, 256) <= 25)
  }

  test("every generated shape extracts with expected doc_type") {
    val expected = Map(
      "facesheet" -> "FACESHEET", "prescription" -> "PRESCRIPTION",
      "agreement" -> "AGREEMENT", "insurance" -> "INSURANCE")
    TranscriptGen.turns(40, 16).foreach { t =>
      val e = Extract.extractTurn(t.conv_id, t.turn_idx, t.text)
      assert(e.status == "ok", s"${t.conv_id}/${t.turn_idx}")
      expected.get(t.tool).foreach { want =>
        assert(e.doc_type == want, s"${t.tool}: got ${e.doc_type} for\n${t.text}")
      }
      assert(e.confidence >= 0.0 && e.confidence <= 1.0)
    }
  }

  test("piiSpans finds overlapping hits; merge+splice redacts them once") {
    val text = "mail a.b@x.org tel (212) 555-0199 ssn 123-45-6789 end"
    val raw = Extract.piiSpans(text)
    // email, phone, ssn, plus digit runs INSIDE phone (0199) and ssn (6789)
    assert(raw.size === 5)
    val merged = Extract.mergeSpans(raw)
    assert(merged.map(_._3) === Seq(1, 2, 2))
    assert(Extract.spliceSpans(text, merged, n => s"[$n]") ===
      "mail [1] tel [2] ssn [2] end")
  }

  test("spliceSpans handles spans at the string boundaries and no spans") {
    assert(Extract.spliceSpans("abcdef", Seq((0, 2, 1)), _ => "*") === "*cdef")
    assert(Extract.spliceSpans("abcdef", Seq((4, 6, 1)), _ => "*") === "abcd*")
    assert(Extract.spliceSpans("abcdef", Seq((0, 6, 3)), _ => "*") === "*")
    assert(Extract.spliceSpans("abcdef", Nil, _ => "*") === "abcdef")
    assert(Extract.piiSpans("no pii here at all") === Seq.empty)
  }

  private def testRng() = new graft.gen.Rng(1234L)
}
