package graft

import graft.label.Biose
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class BioseSpec extends AnyFunSuite {

  // ---- fixMultiBiose (reference ne_evaluate_mentions.py:5-24) ----

  test("fixMultiBiose reference cases") {
    assert(Biose.fixMultiBiose("O-ORG^B-ORG^I-ORG") === "B-ORG") // README.md:74 example
    assert(Biose.fixMultiBiose("B-PER^E-PER") === "S-PER")       // B∧E → S
    assert(Biose.fixMultiBiose("S-LOC") === "S-LOC")
    assert(Biose.fixMultiBiose("O^O^O") === "O")
    assert(Biose.fixMultiBiose("I-GPE^E-GPE") === "E-GPE")
    assert(Biose.fixMultiBiose("O^B-FAC") === "B-FAC")
    assert(Biose.fixMultiBiose("O^S-DUC^O") === "S-DUC")
    // category = chars after FIRST '-' truncated to 3 ("PER^B" → "PER")
    assert(Biose.fixMultiBiose("B-PER^I-PER") === "B-PER")
  }

  // ---- validate/fix sequences (reference nemo.py:154-214) ----

  test("fixedForValidBiose on each regex class") {
    assert(Biose.fixedForValidBiose("OOO") === "O")
    assert(Biose.fixedForValidBiose("OSO") === "S")
    assert(Biose.fixedForValidBiose("OBIEO") === "S")   // complete span inside token → S
    assert(Biose.fixedForValidBiose("OBI") === "B")
    assert(Biose.fixedForValidBiose("II") === "I")
    assert(Biose.fixedForValidBiose("IEO") === "E")
    intercept[IllegalArgumentException](Biose.fixedForValidBiose("EB"))
  }

  test("validateBioseSequence valid and invalid paths") {
    assert(Biose.validateBioseSequence(Seq("O", "B-PER", "E-PER")) === ((true, true, "S-PER")))
    assert(Biose.validateBioseSequence(Seq("B-PER", "I-PER")) === ((true, true, "B-PER")))
    val (valid, single, fixed) = Biose.validateBioseSequence(Seq("E-ORG", "B-PER"))
    assert(!valid); assert(!single); assert(fixed === "S-ORG") // B∧E → S, first category
    assert(Biose.validateBioseSequence(Seq("O", "O"))._3 === "O")
  }

  // ---- span extraction / mention scan ----

  test("parseSpans positional semantics") {
    val labels = IndexedSeq("O", "B-PER", "I-PER", "E-PER", "S-ORG", "O", "B-LOC")
    val spans = Biose.parseSpans(labels)
    assert(spans === IndexedSeq(Biose.SpanT("PER", 1, 4), Biose.SpanT("ORG", 4, 5)))
  }

  test("mentionScan reference scan semantics") {
    val toks = IndexedSeq("a", "b", "c", "d", "e")
    val labels = IndexedSeq("S-PER", "O", "B-ORG", "E-ORG", "S-PER")
    assert(Biose.mentionScan(toks, labels, joinChar = " ") ===
      IndexedSeq(("a", "PER"), ("c d", "ORG"), ("e", "PER")))
    // dangling/ill-formed sequences are dropped, as in sent_to_mentions_dict
    assert(Biose.mentionScan(toks.take(3), IndexedSeq("O", "I-PER", "E-PER")) === IndexedSeq())
    assert(Biose.mentionScan(toks.take(3), IndexedSeq("B-PER", "I-PER", "O")) === IndexedSeq())
  }

  // ---- tag scheme converters ----

  test("bio↔bioes round trip") {
    val bio = Seq("O", "B-PER", "I-PER", "B-ORG", "O", "B-LOC", "I-LOC", "I-LOC")
    val bioes = Biose.bioToBioes(bio)
    assert(bioes === Seq("O", "B-PER", "E-PER", "S-ORG", "O", "B-LOC", "I-LOC", "E-LOC"))
    assert(Biose.bioesToBio(bioes) === bio)
  }

  test("bioToBioes matches reference BIO2BIOES on category-switching noise") {
    // tagSchemeConverter.py:32,37 — continuation is decided only by the next
    // label carrying "I-"; the category is NOT compared. (B-PER, I-ORG)
    // therefore converts to (B-PER, E-ORG), not (S-PER, E-ORG).
    assert(Biose.bioToBioes(Seq("B-PER", "I-ORG")) === Seq("B-PER", "E-ORG"))
    assert(Biose.bioToBioes(Seq("I-PER", "I-ORG", "O")) === Seq("I-PER", "E-ORG", "O"))
  }

  test("iobToBio begins runs correctly") {
    assert(Biose.iobToBio(Seq("I-PER", "I-PER", "O", "I-ORG")) ===
      Seq("B-PER", "I-PER", "O", "B-ORG"))
  }

  // ---- properties (deterministic random sweeps) ----

  private def randomValidBio(r: Random): List[String] = {
    val cats = IndexedSeq("PER", "ORG", "LOC", "GPE")
    val n = 1 + r.nextInt(10)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < n) {
      if (r.nextBoolean()) { out += "O"; i += 1 }
      else {
        val len = math.min(1 + r.nextInt(3), n - i)
        val c = cats(r.nextInt(cats.length))
        out ++= (0 until len).map(j => (if (j == 0) "B-" else "I-") + c)
        i += len
      }
    }
    out.toList
  }

  test("property: bioToBioes∘bioesToBio = id on 500 random valid BIO seqs") {
    val r = new Random(7)
    for (_ <- 0 until 500) {
      val bio = randomValidBio(r)
      assert(Biose.bioesToBio(Biose.bioToBioes(bio)) === bio)
    }
  }

  test("property: fixedBioSequence total on 1000 arbitrary atom seqs") {
    val atoms = IndexedSeq("O", "B-PER", "I-PER", "E-PER", "S-ORG", "B-LOC", "E-GPE", "I-ORG", "S-PER")
    val r = new Random(11)
    for (_ <- 0 until 1000) {
      val seq = (0 to r.nextInt(8)).map(_ => atoms(r.nextInt(atoms.length)))
      val fixed = Biose.fixedBioSequence(seq)
      assert(fixed == "O" || fixed.matches("[SBIE]-.+"))
    }
  }

  test("property: parseSpans recovers every entity from valid BIOES, non-overlapping") {
    val r = new Random(13)
    for (_ <- 0 until 500) {
      val bio = randomValidBio(r)
      val bioes = Biose.bioToBioes(bio).toIndexedSeq
      val spans = Biose.parseSpans(bioes)
      spans.foreach { sp => assert(sp.start >= 0 && sp.end <= bioes.length && sp.start < sp.end) }
      spans.sliding(2).foreach {
        case Seq(a, b) => assert(a.end <= b.start)
        case _         =>
      }
      assert(spans.length === bio.count(_.startsWith("B-")))
    }
  }

  test("property: scan-based shape predicates equal the reference regexes (fixedForValidBiose + validity)") {
    // the five languages of nemo.py:147-151, as regexes — the original
    // implementation these scans replaced; every random letter string must
    // classify identically
    val validRe = "^O*BI*$|^O*BI*EO*$|^I+$|^I*EO*$|^O*SO*$".r
    val oRe = "^O+$".r
    val sRe = "^O*SO*$|^O*BI*EO*$".r
    val bRe = "^O*BI*$".r
    val iRe = "^I+$".r
    val eRe = "^I*EO*$".r
    def regexFixed(s: String): Option[String] =
      if (oRe.findFirstIn(s).isDefined) Some("O")
      else if (sRe.findFirstIn(s).isDefined) Some("S")
      else if (bRe.findFirstIn(s).isDefined) Some("B")
      else if (iRe.findFirstIn(s).isDefined) Some("I")
      else if (eRe.findFirstIn(s).isDefined) Some("E")
      else None
    val letters = "OBIES".toCharArray
    val r = new Random(77)
    val cases = Seq("", "O", "I", "OBI", "OBIEO", "IEO", "OSO", "S", "B", "E",
      "BE", "OB", "IE", "SS", "OSOS", "BIB", "OOO", "III", "BIIE") ++
      (0 until 3000).map(_ => (0 until (1 + r.nextInt(8))).map(_ => letters(r.nextInt(5))).mkString)
    for (c <- cases) {
      val exp = regexFixed(c)
      val gotValid = scala.util.Try(Biose.fixedForValidBiose(c)).toOption
      assert(gotValid === exp, s"fixedForValidBiose('$c')")
      // validity via validateBioseSequence on the expanded atoms
      val atoms = c.map(ch => if (ch == 'O') "O" else s"$ch-PER").toIndexedSeq
      val (valid, _, _) = Biose.validateBioseSequence(atoms)
      assert(valid === validRe.findFirstIn(c).isDefined, s"validity('$c')")
    }
  }

  test("validateBioseSequence quirks survive the imperative rewrite: dash-less atoms, mixed cats, empty") {
    // dash-less non-O atom records category "" (splitAtom semantics) and a
    // trailing-dash fixed label is produced, exactly as before the rewrite
    assert(Biose.validateBioseSequence(Seq("B", "I-PER")) ===
      (true, false, "B-"))
    // first category wins the fixed label; mixed cats flip the single flag
    assert(Biose.validateBioseSequence(Seq("B-ORG", "E-PER")) ===
      (true, false, "S-ORG"))
    assert(Biose.validateBioseSequence(Seq.empty) === (false, true, "O"))
    assert(Biose.validateBioseSequence(Seq("O", "O")) === (false, true, "O")) // "OO" is outside all five languages, exactly as the reference regexes had it
  }
}
