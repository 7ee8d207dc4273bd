package graft

import graft.io.ConllFiles
import graft.eval.Mentions
import org.scalatest.funsuite.AnyFunSuite

/** Fidelity anchor against the reference's OWN committed golden outputs
  * (/root/reference/example_output_*.txt, README.md:67): our file reader +
  * mention-multiset eval must reproduce the numbers the reference's
  * ne_evaluate_mentions.py computes on those same files (harvested once by
  * running the reference script; values hardcoded below).
  */
class ReferenceGoldenSpec extends AnyFunSuite {

  private val files = Map(
    "SINGLE" -> "/root/reference/example_output_SINGLE.txt",
    "MULTI_ALIGN" -> "/root/reference/example_output_MULTI_ALIGN.txt",
    "MORPH_YAP" -> "/root/reference/example_output_MORPH_YAP.txt",
    "MORPH_HYBRID" -> "/root/reference/example_output_MORPH_HYBRID.txt",
    "MHAT" -> "/root/reference/example_output_MORPH_HYBRID_ALIGN_TOKENS.txt")

  private def mentions(path: String): Seq[(Long, String, String, Int)] = {
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    ConllFiles.readFileSents(content).flatMap { case (sentId, rows) =>
      val toks = rows.map(_._1).toIndexedSeq
      val labels = rows.map(_._2).toIndexedSeq
      Mentions.sentenceMentions(sentId.toLong, toks, labels, joinChar = " ")
    }
  }

  test("mention counts on every reference golden match ne_evaluate_mentions.py") {
    val expected = Map("SINGLE" -> 21, "MULTI_ALIGN" -> 17, "MORPH_YAP" -> 21,
      "MORPH_HYBRID" -> 24, "MHAT" -> 24)
    for ((name, path) <- files) {
      assert(mentions(path).size === expected(name), s"scenario $name")
    }
  }

  test("specific mention tuples (sent_id, surface, cat, occ) match the reference") {
    val single = mentions(files("SINGLE")).toSet
    // values printed by reference sents_to_mentions on example_output_SINGLE.txt
    assert(single.contains((0L, "גרמנית", "ANG", 1)))
    assert(single.contains((0L, "גרמנית", "ANG", 2)))   // occurrence indexing
    assert(single.contains((0L, "מרטין", "PER", 1)))
    assert(single.contains((1L, "The Office", "ORG", 1)))
    val yap = mentions(files("MORPH_YAP")).toSet
    assert(yap.contains((0L, "מרטין היידגר", "PER", 1)))
    assert(yap.contains((1L, "באנגלית", "ORG", 1)))
  }

  test("cross-scenario P/R/F reproduces the reference evaluate_files numbers") {
    // reference: evaluate_files(MORPH_HYBRID, MORPH_YAP, str_join_char=' ')
    val prf = Mentions.evaluate(mentions(files("MORPH_HYBRID")), mentions(files("MORPH_YAP")))
    assert(math.abs(prf.precision - 0.809524) < 1e-6, prf.precision)
    assert(math.abs(prf.recall - 0.708333) < 1e-6, prf.recall)
    assert(math.abs(prf.f1 - 0.755556) < 1e-6, prf.f1)
    // reference: evaluate_files(SINGLE, MORPH_HYBRID_ALIGN_TOKENS)
    val prf2 = Mentions.evaluate(mentions(files("SINGLE")), mentions(files("MHAT")))
    assert(math.abs(prf2.precision - 0.541667) < 1e-6, prf2.precision)
    assert(math.abs(prf2.recall - 0.619048) < 1e-6, prf2.recall)
    assert(math.abs(prf2.f1 - 0.577778) < 1e-6, prf2.f1)
  }

  test("tokenizer reproduces bclm.tokenize on the reference's example.txt (all 10 sentences)") {
    // golden token sequences = forms column of example_output_SINGLE.txt,
    // which the reference produced by running bclm.tokenize on example.txt
    val input = java.nio.file.Files.readString(java.nio.file.Paths.get("/root/reference/example.txt"))
    val goldenSents = ConllFiles.readFileSents(
      java.nio.file.Files.readString(java.nio.file.Paths.get(files("SINGLE"))))
      .map(_._2.map(_._1))
    val ours = graft.text.HebTokenizer.tokenizeText(input).map(_.toSeq).toSeq
    assert(ours.length === goldenSents.length)
    for ((mine, gold) <- ours.zip(goldenSents))
      assert(mine === gold)
  }

  test("nbest score headers in SINGLE golden are skipped by the reader") {
    val content = java.nio.file.Files.readString(
      java.nio.file.Paths.get(files("SINGLE")))
    assert(content.startsWith("#")) // the '# 1.0000' nbest header lines exist
    val sents = ConllFiles.readFileSents(content)
    assert(sents.size === 10)
    sents.foreach { case (_, rows) => rows.foreach { case (f, _) => assert(!f.startsWith("#")) } }
  }
}
