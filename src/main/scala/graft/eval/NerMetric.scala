package graft.eval

import scala.collection.mutable.ArrayBuffer

/** Training-time NER metric (SURVEY §2 E4) — exact port of the reference's
  * utils/metric.py:15-166 (get_ner_fmeasure / get_ner_BMES / get_ner_BIO):
  * position-indexed span strings "[start,end]CAT", micro P/R/F over the
  * concatenated corpus plus token accuracy, −1 sentinels for empty sides.
  *
  * Behavioral quirks preserved deliberately (they differ from the
  * mention-multiset eval of ne_evaluate_mentions.py):
  *  - a dangling B..M/I run is closed by the NEXT B/S (at i−1) or at sequence
  *    end, and still counts as a span;
  *  - spans are compared as SETS per sentence (duplicates collapse);
  *  - labels are upper-cased before matching.
  */
object NerMetric {

  final case class Result(accuracy: Double, precision: Double, recall: Double, f1: Double)

  private def reverseStyle(s: String): String = {
    val p = s.indexOf('[')
    s.substring(p) + s.substring(0, p)
  }

  /** metric.py:76-117 (get_ner_BMES). BIOES/BMES span strings. */
  def nerBMES(labels: Seq[String]): Seq[String] = {
    var wholeTag = ""; var indexTag = ""
    val tagList = new ArrayBuffer[String]()
    for ((l0, i) <- labels.zipWithIndex) {
      val l = l0.toUpperCase
      if (l.contains("B-")) {
        if (indexTag != "") tagList += s"$wholeTag,${i - 1}"
        wholeTag = l.replaceFirst("B-", "") + "[" + i
        indexTag = l.replaceFirst("B-", "")
      } else if (l.contains("S-")) {
        if (indexTag != "") tagList += s"$wholeTag,${i - 1}"
        wholeTag = l.replaceFirst("S-", "") + "[" + i
        tagList += wholeTag
        wholeTag = ""; indexTag = ""
      } else if (l.contains("E-")) {
        if (indexTag != "") tagList += s"$wholeTag,$i"
        wholeTag = ""; indexTag = ""
      } // M-/I-/O: continue (extends implicitly)
    }
    if (wholeTag != "" && indexTag != "") tagList += wholeTag
    tagList.filter(_.nonEmpty).map(t => reverseStyle(t + "]")).toSeq
  }

  /** metric.py:120-166 (get_ner_BIO). */
  def nerBIO(labels: Seq[String]): Seq[String] = {
    var wholeTag = ""; var indexTag = ""
    val tagList = new ArrayBuffer[String]()
    for ((l0, i) <- labels.zipWithIndex) {
      val l = l0.toUpperCase
      if (l.contains("B-")) {
        if (indexTag != "") tagList += s"$wholeTag,${i - 1}"
        wholeTag = l.replaceFirst("B-", "") + "[" + i
        indexTag = l.replaceFirst("B-", "")
      } else if (l.contains("I-")) {
        if (l.replaceFirst("I-", "") != indexTag) {
          if (wholeTag != "" && indexTag != "") tagList += s"$wholeTag,${i - 1}"
          wholeTag = ""; indexTag = ""
        }
      } else {
        if (wholeTag != "" && indexTag != "") tagList += s"$wholeTag,${i - 1}"
        wholeTag = ""; indexTag = ""
      }
    }
    if (wholeTag != "" && indexTag != "") tagList += wholeTag
    tagList.filter(_.nonEmpty).map(t => reverseStyle(t + "]")).toSeq
  }

  /** metric.py:15-64 (get_ner_fmeasure). labelType: "BMES"/"BIOES" or "BIO". */
  def fMeasure(golden: Seq[Seq[String]], predicted: Seq[Seq[String]],
               labelType: String = "BMES"): Result = {
    var rightTag = 0L; var allTag = 0L
    var goldenNum = 0L; var predictNum = 0L; var rightNum = 0L
    for ((g, p) <- golden.zip(predicted)) {
      rightTag += g.zip(p).count { case (a, b) => a == b }
      allTag += g.length
      val gmx = if (labelType == "BMES" || labelType == "BIOES") nerBMES(g) else nerBIO(g)
      val pmx = if (labelType == "BMES" || labelType == "BIOES") nerBMES(p) else nerBIO(p)
      rightNum += gmx.toSet.intersect(pmx.toSet).size
      goldenNum += gmx.length
      predictNum += pmx.length
    }
    val precision = if (predictNum == 0) -1.0 else rightNum.toDouble / predictNum
    val recall = if (goldenNum == 0) -1.0 else rightNum.toDouble / goldenNum
    val f = if (precision == -1 || recall == -1 || precision + recall <= 0) -1.0
            else 2 * precision * recall / (precision + recall)
    Result(if (allTag == 0) 0.0 else rightTag.toDouble / allTag, precision, recall, f)
  }
}
