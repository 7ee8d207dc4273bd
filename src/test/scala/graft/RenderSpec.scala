package graft

import graft.fixtures.Fixtures
import graft.label.Biose
import graft.serve.Render
import org.scalatest.funsuite.AnyFunSuite

/** Notebook display helpers: HTML output pinned against the reference's
  * displaCy templates (api/notebook_utils.py:58-99) and the escape/offset
  * algebra of render_ents (notebook_utils.py:149-179). */
class RenderSpec extends AnyFunSuite {

  test("escapeHtml matches notebook_utils.escape_html (order matters: & first)") {
    assert(Render.escapeHtml("""a < b & c > "d"""") ===
      "a &lt; b &amp; c &gt; &quot;d&quot;")
    // & replaced first, so pre-existing entities double-escape exactly like
    // the reference (replace("&") runs before "<" introduces none)
    assert(Render.escapeHtml("&lt;") === "&amp;lt;")
  }

  test("renderEnts pins the RTL mark template, colors, offsets and tail text") {
    val words = IndexedSeq("שלום", "דוד", "כהן", "מ<תל>", "אביב")
    val spans = Seq(Biose.SpanT("PER", 1, 3), Biose.SpanT("XYZ", 3, 4))
    val html = Render.renderEnts(words, spans)
    val expected =
      "\n<div class=\"entities\" style=\"line-height: 2.5; direction: rtl\">" +
        "שלום" +
        "\n<mark class=\"entity\" style=\"background: #aa9cfc; padding: 0.45em 0.6em; margin: 0 0.25em; line-height: 1; border-radius: 0.35em\">\n" +
        "    דוד כהן\n" +
        "    <span style=\"font-size: 0.8em; font-weight: bold; line-height: 1; border-radius: 0.35em; vertical-align: middle; margin-right: 0.5rem\">PER</span>\n" +
        "</mark>\n" +
        "" + // empty gap between back-to-back spans (offset==start)
        "\n<mark class=\"entity\" style=\"background: #ddd; padding: 0.45em 0.6em; margin: 0 0.25em; line-height: 1; border-radius: 0.35em\">\n" +
        "    מ&lt;תל&gt;\n" + // entity text HTML-escaped
        "    <span style=\"font-size: 0.8em; font-weight: bold; line-height: 1; border-radius: 0.35em; vertical-align: middle; margin-right: 0.5rem\">XYZ</span>\n" +
        "</mark>\n" +
        "אביב" + // tail after the last span
        "</div>\n"
    assert(html === expected)
  }

  test("ents whitelist: non-listed label renders as plain text (reference else-branch)") {
    val words = IndexedSeq("a", "b", "c")
    val spans = Seq(Biose.SpanT("PER", 0, 1), Biose.SpanT("ORG", 2, 3))
    val html = Render.renderEnts(words, spans,
      Render.Options(ents = Some(Seq("org")))) // case-folded like the reference
    assert(!html.contains("#aa9cfc")) // PER not marked
    assert(html.contains("#7aecec")) // ORG marked
    // the PER surface is still present, unmarked
    assert(html.contains(">a\n<mark") || html.contains(">a<") || html.startsWith("\n<div class=\"entities\" style=\"line-height: 2.5; direction: rtl\">a"))
  }

  test("color overrides upper-case the label key like EntityRenderer.__init__") {
    val html = Render.renderEnts(IndexedSeq("x"), Seq(Biose.SpanT("per", 0, 1)),
      Render.Options(colors = Map("per" -> "#123456")))
    assert(html.contains("background: #123456"))
  }

  test("ltr template variant uses margin-left and the trailing semicolon") {
    val html = Render.renderEnts(IndexedSeq("x"), Seq(Biose.SpanT("PER", 0, 1)),
      Render.Options(direction = "ltr"))
    assert(html.contains("margin-left: 0.5rem"))
    assert(html.contains("border-radius: 0.35em;\">")) // TPL_ENT keeps the ';'
    assert(html.contains("direction: ltr"))
  }

  test("page wrapper pins TPL_PAGE lang/dir") {
    val page = Render.page("<p>x</p>")
    assert(page.contains("<html lang=\"he\">"))
    assert(page.contains("direction: rtl\"><p>x</p></body>"))
    assert(page.startsWith("\n<!DOCTYPE html>"))
  }

  test("render over annotated fixture docs agrees with parseSpans per scenario") {
    val m = Pipeline.fixtureModels()
    val lex: String => Boolean = m.lexicon.contains _
    val docs = (0 until 6).map { i =>
      val fd = Fixtures.doc(i)
      Pipeline.annotateDoc(m, lex, graft.schema.InputDoc(fd.docId, fd.spans.toArray))
    }
    for ((level, scenario) <- Seq(
        ("token", "nemo_single"), ("token", "nemo_multi_align_token"),
        ("morph", "nemo_morph"), ("morph", "nemo_multi_align_morph"))) {
      val html = Render.render(docs, level, scenario)
      val expectedMarks = docs.flatMap(_.sents).map { s =>
        val labels =
          if (level == "token") s.tokens.map(t => scenario match {
            case "nemo_single" => t.nemoSingle
            case _ => t.nemoMultiAlignToken
          }).toIndexedSeq
          else s.tokens.flatMap(_.morphs).map(mm => scenario match {
            case "nemo_morph" => mm.nemoMorph
            case _ => mm.nemoMultiAlignMorph
          }).toIndexedSeq
        Biose.parseSpans(labels).length
      }.sum
      assert(html.sliding(5).count(_ == "<mark") === expectedMarks,
        s"mark count for $level/$scenario")
      // one entities div per sentence, like the reference's per-doc loop
      assert(html.sliding(21).count(_ == "<div class=\"entities\"") ===
        docs.map(_.sents.length).sum)
    }
  }

  test("entsToRows flattens every level x scenario like ents_to_df") {
    val m = Pipeline.fixtureModels()
    val lex: String => Boolean = m.lexicon.contains _
    val docs = (0 until 4).map { i =>
      val fd = Fixtures.doc(i)
      Pipeline.annotateDoc(m, lex, graft.schema.InputDoc(fd.docId, fd.spans.toArray))
    }
    val rows = Render.entsToRows(docs)
    assert(rows.nonEmpty)
    assert(rows.map(_.level).toSet.subsetOf(Set("token", "morph")))
    // sent_id is the global sentence index across docs (reference enumerate)
    val nSents = docs.map(_.sents.length).sum
    assert(rows.map(_.sent_id).max < nSents)
    // per-scenario counts equal the rendered mark counts (same span decoder)
    val byScenario = rows.groupBy(r => (r.level, r.scenario)).view.mapValues(_.size).toMap
    for (((level, scenario), n) <- byScenario) {
      val html = Render.render(docs, level, scenario)
      assert(html.sliding(5).count(_ == "<mark") === n, s"$level/$scenario")
    }
    // surfaces are space-joined slices of the rendered words
    assert(rows.forall(r => r.text.nonEmpty))
  }
}
