package graft.io

import graft.schema.LatticeEdge
import graft.label.Biose
import scala.collection.mutable.ArrayBuffer

/** Reference file-format fidelity (SURVEY §2 A3/A4/A6/A7/A13) — the token-file
  * and lattice-TSV conventions the reference uses between pipeline stages.
  * In-engine these formats never appear (labels stay in columns); they exist
  * for golden-file round-trip tests and for interop with reference tooling.
  *
  * Formats:
  *  - token file: one `form SP label` per line, blank line between sentences
  *    (nemo.py:34-49); `only_tokens` omits the label, `dummy_o` writes O.
  *  - nbest decode file: like token file but each sentence prefixed with a
  *    `# score1 score2 …` comment (utils/data.py:355-392; seen in
  *    example_output_SINGLE.txt:1).
  *  - lattice TSV: `ID1 ID2 form lemma upostag xpostag feats token_id`, blank
  *    line between sentences (nemo.py:100-105).
  */
object ConllFiles {

  // ---- A3: write_tokens_file ----

  def writeTokensFile(sents: Seq[Seq[(String, String)]],
                      dummyO: Boolean = false, onlyTokens: Boolean = false): String = {
    val sb = new StringBuilder
    for (sent <- sents) {
      for ((form, label) <- sent) {
        if (onlyTokens) sb.append(form)
        else if (dummyO) sb.append(form).append(" O")
        else sb.append(form).append(' ').append(label)
        sb.append('\n')
      }
      sb.append('\n')
    }
    sb.toString
  }

  // ---- A13: write_(nbest_)decoded_results ----

  def writeDecodedResults(sents: Seq[Seq[(String, String)]],
                          nbestScores: Option[Seq[Seq[Double]]] = None): String = {
    val sb = new StringBuilder
    for ((sent, i) <- sents.zipWithIndex) {
      nbestScores.foreach { scores =>
        sb.append("# ").append(scores(i).map(s => f"$s%.4f").mkString(" ")).append('\n')
      }
      for ((form, label) <- sent) sb.append(form).append(' ').append(label).append('\n')
      sb.append('\n')
    }
    sb.toString
  }

  // ---- A4: read_file_sents (ne_evaluate_mentions.py:27-42) ----

  /** Parse token-file content into per-sentence (form, label) lists with their
    * sentence ids (running block index + shift). Lines starting with the
    * comment prefix are skipped; `fixMultiTag` collapses `^`-multi labels via
    * B5, exactly like the reference default. */
  def readFileSents(content: String, commentPrefix: String = "#",
                    fieldDelim: String = " ", fixMultiTag: Boolean = true,
                    sentIdShift: Int = 0): Seq[(Int, Seq[(String, String)])] = {
    content.split("\n\n").zipWithIndex.collect {
      case (block, i) if block.nonEmpty =>
        val rows = block.split('\n').toSeq
          .filterNot(_.startsWith(commentPrefix))
          .filter(_.nonEmpty)
          .map { line =>
            val ls = line.split(fieldDelim)
            val tag0 = ls.last
            val tag = if (fixMultiTag && tag0.contains('^')) Biose.fixMultiBiose(tag0) else tag0
            (ls.head, tag)
          }
        (i + sentIdShift, rows)
    }.toSeq.filter(_._2.nonEmpty)
  }

  // ---- A6: to_lattices ----

  def writeLattices(sentences: Seq[Seq[LatticeEdge]]): String = {
    val sb = new StringBuilder
    for (sent <- sentences) {
      for (e <- sent)
        sb.append(Seq(e.id1, e.id2, e.form, e.lemma, e.upos, e.xpos, e.feats, e.tokenId)
          .mkString("\t")).append('\n')
      sb.append('\n')
    }
    sb.toString
  }

  // ---- A7: read_lattices ----

  def readLattices(content: String): Seq[Seq[LatticeEdge]] =
    content.split("\n\n").toSeq.filter(_.nonEmpty).map { block =>
      block.split('\n').toSeq.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        LatticeEdge(f(0).toInt, f(1).toInt, f(2), f(3), f(4), f(5), f(6), f(7).toInt)
      }
    }

  // ---- A8: CoNLL-X dependency trees (reference bclm.read_conll call sites:
  //      nemo.py:298,347, api_main.py:334; cols consumed: id, form, lemma,
  //      xpostag, feats, head, deprel) ----

  /** Write dep trees as 10-column CoNLL-X blocks (CPOSTAG mirrored from
    * xpostag; PHEAD/PDEPREL underscored, as YAP emits). */
  def writeConll(sentences: Seq[Seq[graft.lattice.DepParser.DepNode]]): String = {
    val sb = new StringBuilder
    for (sent <- sentences) {
      for (n <- sent)
        sb.append(Seq(n.id, n.form, n.lemma, n.xpos, n.xpos, n.feats,
          n.head, n.deprel, "_", "_").mkString("\t")).append('\n')
      sb.append('\n')
    }
    sb.toString
  }

  /** Parse CoNLL-X blocks back into dep nodes. */
  def readConll(content: String): Seq[Seq[graft.lattice.DepParser.DepNode]] =
    content.split("\n\n").toSeq.filter(_.trim.nonEmpty).map { block =>
      block.split('\n').toSeq.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        graft.lattice.DepParser.DepNode(f(0).toInt, f(1), f(2), f(4), f(5), f(6).toInt, f(7))
      }
    }

  // ---- Spark-side readers: text → sentence blocks ----

  /** Distributed token-file reader — DELEGATES to [[readFileSents]], so its
    * sentence ids and label handling are identical to the reference-fidelity
    * parser by construction (a separate line-based re-implementation assigned
    * different sent_ids whenever a file had consecutive blank lines or a
    * comment-only block: raw "\n\n" block indices count those, a
    * non-empty-sentence counter does not — and a (doc_id, sent_id) join
    * between the two readers would silently misalign everything after the
    * irregularity). One task holds one file's content (these are
    * reference-format corpora ingested for evaluation, not engine tables). */
  def readTokensFileDf(spark: org.apache.spark.sql.SparkSession, path: String,
                       fixMultiTag: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // single text file → one partition preserves line order
    val lines = spark.read.textFile(path).coalesce(1)
    lines.mapPartitions { it =>
      val content = it.mkString("\n")
      readFileSents(content, fixMultiTag = fixMultiTag).iterator.map {
        case (i, rows) => (i.toLong, rows)
      }
    }.toDF("sent_id", "rows")
      .select(col("sent_id"), col("rows._1").as("forms"), col("rows._2").as("labels"))
  }
}
