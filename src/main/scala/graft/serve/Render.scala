package graft.serve

import graft.label.Biose
import graft.schema.Doc

/** Entity HTML renderer — the engine counterpart of the reference's notebook
  * display helpers (api/notebook_utils.py:40-179: escape_html, the displaCy
  * TPL_ENTS / TPL_ENT_RTL / TPL_PAGE templates, DEFAULT_LABEL_COLORS, and
  * EntityRenderer.render/render_ents), closing the one reference file that
  * had no counterpart here. Presentation-only and driver-side by construction:
  * it renders Docs ALREADY annotated by [[graft.Pipeline.annotateDoc]] — at
  * cluster scale a user renders a handful of sampled rows, never a table, so
  * there is deliberately no Spark job in this path.
  *
  * Span extraction reuses the same [[Biose.parseSpans]] the serving surface
  * and every mention oracle run on, so the HTML shows exactly the spans the
  * engine emits — no second span-decoding code path to drift.
  */
object Render {

  /** notebook_utils.py:40-50 — same four replacements, same order (the `&`
    * pass runs first so entity ampersands are not double-escaped). */
  def escapeHtml(text: String): String =
    text.replace("&", "&amp;")
      .replace("<", "&lt;")
      .replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** notebook_utils.py:88-99. */
  val defaultLabelColors: Map[String, String] = Map(
    "ORG" -> "#7aecec",
    "DUC" -> "#bfeeb7",
    "GPE" -> "#feca74",
    "LOC" -> "#ff9561",
    "PER" -> "#aa9cfc",
    "FAC" -> "#9cc9cc",
    "EVE" -> "#ffeb80",
    "LAW" -> "#ff8197",
    "ANG" -> "#ff8197",
    "WOA" -> "#f0d0ff")

  val defaultEntityColor = "#ddd"   // notebook_utils.py:55
  val defaultLang = "he"            // notebook_utils.py:53
  val defaultDir = "rtl"            // notebook_utils.py:54

  /** notebook_utils.py:70-75 TPL_ENT_RTL (the default — direction is rtl). */
  private def entMarkRtl(text: String, label: String, bg: String): String =
    s"""
<mark class="entity" style="background: $bg; padding: 0.45em 0.6em; margin: 0 0.25em; line-height: 1; border-radius: 0.35em">
    $text
    <span style="font-size: 0.8em; font-weight: bold; line-height: 1; border-radius: 0.35em; vertical-align: middle; margin-right: 0.5rem">$label</span>
</mark>
"""

  /** notebook_utils.py:63-68 TPL_ENT (ltr variant). */
  private def entMarkLtr(text: String, label: String, bg: String): String =
    s"""
<mark class="entity" style="background: $bg; padding: 0.45em 0.6em; margin: 0 0.25em; line-height: 1; border-radius: 0.35em;">
    $text
    <span style="font-size: 0.8em; font-weight: bold; line-height: 1; border-radius: 0.35em; vertical-align: middle; margin-left: 0.5rem">$label</span>
</mark>
"""

  /** Renderer options (notebook_utils.py:106-126): label→color overrides and
    * an optional label whitelist (`ents`) — a span whose label is not listed
    * renders as plain text, exactly the reference's else-branch. */
  final case class Options(
      colors: Map[String, String] = Map.empty,
      ents: Option[Seq[String]] = None,
      direction: String = defaultDir,
      lang: String = defaultLang)

  /** notebook_utils.py:149-179 render_ents — one sentence's words + its
    * BIOSE-decoded spans to a `<div class="entities">` block. `words` are
    * token texts (level=token) or morpheme forms (level=morph); spans index
    * into them ([start,end) word offsets, the reference's span dict shape). */
  def renderEnts(words: IndexedSeq[String], spans: Seq[Biose.SpanT],
                 opts: Options = Options()): String = {
    val colors = (defaultLabelColors ++ opts.colors.map { case (k, v) => k.toUpperCase -> v })
    val allow = opts.ents.map(_.map(_.toUpperCase).toSet)
    val mark: (String, String, String) => String =
      if (opts.direction == "rtl") entMarkRtl else entMarkLtr
    val sb = new StringBuilder
    var offset = 0
    spans.foreach { s =>
      sb.append(escapeHtml(words.slice(offset, s.start).mkString(" ")))
      val entity = escapeHtml(words.slice(s.start, s.end).mkString(" "))
      if (allow.forall(_.contains(s.label.toUpperCase))) {
        val bg = colors.getOrElse(s.label.toUpperCase, defaultEntityColor)
        sb.append(mark(entity, s.label, bg))
      } else sb.append(entity)
      offset = s.end
    }
    sb.append(escapeHtml(words.slice(offset, words.length).mkString(" ")))
    s"""
<div class="entities" style="line-height: 2.5; direction: ${opts.direction}">$sb</div>
"""
  }

  /** The (level, scenario) → label-column algebra shared with the serving
    * surface (api_main.py get_spans field names): token-level scenarios read
    * token columns, morph-level scenarios read the flattened morpheme stream. */
  private def wordsAndLabels(doc: Doc, level: String, scenario: String)
      : Seq[(IndexedSeq[String], IndexedSeq[String])] =
    doc.sents.toIndexedSeq.map { sent =>
      level match {
        case "token" =>
          val words = sent.tokens.map(_.text).toIndexedSeq
          val labels = sent.tokens.map(t => scenario match {
            case "nemo_single" => t.nemoSingle
            case "nemo_multi" => t.nemoMulti
            case "nemo_multi_align_token" => t.nemoMultiAlignToken
            case "nemo_morph_align_token" => t.nemoMorphAlignToken
            case other => throw new IllegalArgumentException(
              s"unknown token scenario '$other'")
          }).toIndexedSeq
          (words, labels)
        case "morph" =>
          val morphs = sent.tokens.flatMap(_.morphs).toIndexedSeq
          val words = morphs.map(_.form)
          val labels = morphs.map(m => scenario match {
            case "nemo_morph" => m.nemoMorph
            case "nemo_multi_align_morph" => m.nemoMultiAlignMorph
            case other => throw new IllegalArgumentException(
              s"unknown morph scenario '$other'")
          })
          (words, labels)
        case other => throw new IllegalArgumentException(
          s"unknown level '$other' (token|morph)")
      }
    }

  /** notebook_utils.py:128-147 EntityRenderer.render — every sentence of every
    * doc rendered for one (level, scenario), markup concatenated. */
  def render(docs: Seq[Doc], level: String, scenario: String,
             opts: Options = Options()): String =
    docs.flatMap(wordsAndLabels(_, level, scenario)).map { case (words, labels) =>
      renderEnts(words, Biose.parseSpans(labels), opts)
    }.mkString

  /** notebook_utils.py:78-86 TPL_PAGE — full standalone HTML page. */
  def page(content: String, opts: Options = Options()): String =
    s"""
<!DOCTYPE html>
<html lang="${opts.lang}">
    <head>
        <title>displaCy</title>
    </head>
    <body style="font-size: 16px; font-family: -apple-system, BlinkMacSystemFont, 'Segoe UI', Helvetica, Arial, sans-serif, 'Apple Color Emoji', 'Segoe UI Emoji', 'Segoe UI Symbol'; padding: 4rem 2rem; direction: ${opts.direction}">$content</body>
</html>
"""

  /** One flattened ents row (notebook_utils.py:25-38 ents_to_df). */
  final case class EntRow(sent_id: Long, text: String, label: String,
                          level: String, scenario: String)

  private val tokenScenarios =
    Seq("nemo_single", "nemo_multi", "nemo_multi_align_token", "nemo_morph_align_token")
  private val morphScenarios = Seq("nemo_morph", "nemo_multi_align_morph")

  /** notebook_utils.py:25-38 ents_to_df — flatten every (level, scenario)
    * span of every sentence to rows; `sent_id` is the global sentence index
    * across the given docs, matching the reference's enumerate(docs) where a
    * "doc" is one sentence. Driver-side (rendering-sized input); the
    * distributed equivalent of this flatten IS the registered mention
    * queries (`nemo_mentions_*`). */
  def entsToRows(docs: Seq[Doc]): Seq[EntRow] = {
    // wordsAndLabels runs ONCE per (doc, level, scenario) — its per-sentence
    // results zip against a running global sentence offset (the reference's
    // enumerate), keeping row order sentence-major, scenario-minor
    val levScen = morphScenarios.map(("morph", _)) ++ tokenScenarios.map(("token", _))
    val offsets = docs.scanLeft(0)((acc, d) => acc + d.sents.length)
    docs.zip(offsets).flatMap { case (doc, off) =>
      val cols = levScen.map { case (lv, sc) => (lv, sc, wordsAndLabels(doc, lv, sc)) }
      doc.sents.indices.flatMap { si =>
        cols.flatMap { case (lv, sc, perSent) =>
          val (words, labels) = perSent(si)
          Biose.parseSpans(labels).map(s =>
            EntRow((off + si).toLong, words.slice(s.start, s.end).mkString(" "),
              s.label, lv, sc))
        }
      }
    }
  }
}
