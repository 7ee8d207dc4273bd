package graft

import graft.io.ConllFiles
import graft.eval.NerMetric
import graft.schema.LatticeEdge
import graft.lattice.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** File-format fidelity (A3/A4/A6/A7/A13) + training metric (E4). */
class FormatsSpec extends AnyFunSuite {

  test("token file round trip, dummy_o and only_tokens modes (A3/A4)") {
    val sents = Seq(Seq(("שלום", "O"), ("אברם", "S-PER")), Seq(("עולם", "O")))
    val normal = ConllFiles.writeTokensFile(sents)
    assert(normal === "שלום O\nאברם S-PER\n\nעולם O\n\n")
    assert(ConllFiles.writeTokensFile(sents, dummyO = true).contains("אברם O"))
    assert(ConllFiles.writeTokensFile(sents, onlyTokens = true).startsWith("שלום\n"))
    val back = ConllFiles.readFileSents(normal)
    assert(back === Seq((0, sents(0)), (1, sents(1))))
  }

  test("readFileSents: comments skipped, multi tags fixed (A4/B5)") {
    val content = "# 1.0000\nx O-ORG^B-ORG\ny E-ORG\n\n"
    val sents = ConllFiles.readFileSents(content)
    assert(sents === Seq((0, Seq(("x", "B-ORG"), ("y", "E-ORG")))))
    val raw = ConllFiles.readFileSents(content, fixMultiTag = false)
    assert(raw.head._2.head._2 === "O-ORG^B-ORG")
  }

  test("nbest decode file carries # score headers (A13)") {
    val out = ConllFiles.writeDecodedResults(
      Seq(Seq(("a", "O"))), Some(Seq(Seq(1.0))))
    assert(out === "# 1.0000\na O\n\n")
  }

  test("lattice TSV round trip (A6/A7)") {
    val lat = Analyzer.sentenceLattice(IndexedSeq("בגדנק", "צצצ"), Set("גדנק", "צצצ").contains _)
    val text = ConllFiles.writeLattices(Seq(lat.toSeq))
    val back = ConllFiles.readLattices(text)
    assert(back === Seq(lat.toSeq))
  }

  test("readTokensFileDf: distributed reader groups sentence blocks") {
    val spark = SparkTestBase.spark
    val tmp = java.nio.file.Files.createTempFile("toks", ".txt")
    java.nio.file.Files.writeString(tmp, "a O\nb S-PER\n\nc O\n\n")
    val df = ConllFiles.readTokensFileDf(spark, tmp.toString).collect()
    assert(df.length === 2)
    assert(df(0).getSeq[String](1) === Seq("a", "b"))
    assert(df(1).getSeq[String](2) === Seq("O"))
    java.nio.file.Files.delete(tmp)
  }

  // ---- E4 metric (utils/metric.py port) ----

  test("nerBMES position-indexed spans incl. dangling-run quirk") {
    assert(NerMetric.nerBMES(Seq("O", "B-PER", "M-PER", "E-PER", "S-ORG")) ===
      Seq("[1,3]PER", "[4]ORG"))
    // dangling B..M closed by next B at i-1 (metric.py:89-91)
    assert(NerMetric.nerBMES(Seq("B-PER", "M-PER", "B-ORG", "E-ORG")) ===
      Seq("[0,1]PER", "[2,3]ORG"))
    // dangling at end still emitted, without a close index (metric.py:108-116)
    assert(NerMetric.nerBMES(Seq("O", "B-PER")) === Seq("[1]PER"))
  }

  test("nerBIO spans") {
    assert(NerMetric.nerBIO(Seq("B-PER", "I-PER", "O", "B-ORG")) ===
      Seq("[0,1]PER", "[3]ORG"))
    // category switch inside I closes the run
    assert(NerMetric.nerBIO(Seq("B-PER", "I-ORG", "O")) === Seq("[0,0]PER"))
  }

  test("fMeasure micro metrics + accuracy + sentinels") {
    val gold = Seq(Seq("B-PER", "E-PER", "O"), Seq("S-ORG"))
    val predPerfect = gold
    val r = NerMetric.fMeasure(gold, predPerfect)
    assert(r.accuracy === 1.0 && r.precision === 1.0 && r.recall === 1.0 && r.f1 === 1.0)
    val predHalf = Seq(Seq("B-PER", "E-PER", "O"), Seq("O"))
    val r2 = NerMetric.fMeasure(gold, predHalf)
    assert(r2.precision === 1.0 && r2.recall === 0.5)
    assert(r2.accuracy === 0.75)
    val empty = NerMetric.fMeasure(Seq(Seq("O")), Seq(Seq("O")))
    assert(empty.precision === -1.0 && empty.recall === -1.0 && empty.f1 === -1.0)
  }
}
