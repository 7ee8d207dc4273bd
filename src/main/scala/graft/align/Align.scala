package graft.align

import graft.label.Biose
import scala.collection.mutable.ArrayBuffer

/** Label/morpheme alignment algebra (SURVEY §2 C-group) — pure functions.
  *
  * The reference's "join zoo" is positional zipping keyed by (sent_id, token_id);
  * in our engine both sides live inside one row, so these are in-row array
  * functions invoked from `withColumn`/UDF or mapPartitions.
  */
object Align {

  /** C1: atom count of a multi label (len(bio.split('^')) — nemo.py:66-75). */
  // limit -1: Python's split keeps trailing empty atoms; Scala's default drops them
  def bioseCount(multi: String): Int = multi.split("\\^", -1).length

  /** C4: soft-merge token-multi atoms onto that token's predicted morphemes
    * (exact port of soft_merge_bio_labels, nemo.py:117-137).
    * Branches (reference's new_forms tuple tag):
    *   1 — equal lengths: plain zip;
    *   2 — more morphemes than atoms: first (diff) morphemes get O, remaining
    *       zip RIGHT-aligned;
    *   3 — fewer morphemes: zip right-aligned (atoms truncated from the left).
    * Returns (branch, Seq(form → label)).
    */
  def softMergeToken(forms: Seq[String], multiLabel: String): (Int, Seq[(String, String)]) = {
    val bio = multiLabel.split("\\^", -1).toSeq // limit -1: Python split semantics
    if (forms.length == bio.length) (1, forms.zip(bio))
    else if (forms.length > bio.length) {
      val dif = forms.length - bio.length
      // right-aligned zip: the LAST bio.length forms pair with the atoms
      val padded = forms.take(dif).map(f => (f, "O")) ++ forms.drop(dif).zip(bio)
      (2, padded)
    } else {
      // right-aligned zip: atoms truncated from the left to forms.length
      (3, forms.zip(bio.takeRight(forms.length)))
    }
  }

  /** C5: whole-sentence soft merge — one (form, label) list per sentence. */
  def softMergeSentence(
      tokenForms: Seq[Seq[String]],     // per token: its morpheme forms (MD output)
      multiLabels: Seq[String]): Seq[(String, String)] = {
    val out = new ArrayBuffer[(String, String)]()
    for ((forms, label) <- tokenForms.zip(multiLabels))
      out ++= softMergeToken(forms, label)._2
    out.toSeq
  }

  /** C6: morph-level labels back to one token-level label: join the token's
    * morpheme labels with '^' then fix via B6 (get_fixed_tok, nemo.py:217-226).
    * Order of `morphLabels` must be morpheme order within the token —
    * the Spark caller guarantees it via sort_array(collect_list(struct(idx, _)))
    * or by keeping morphemes in-row (ordering hazard, SURVEY §7.5#4). */
  def fixedTokenLabel(morphLabels: Seq[String]): String =
    Biose.fixedBioSequence(morphLabels)

  /** [[fixedTokenLabel]] over a slice [off, off+len) of a flat label
    * sequence — the annotate assembly's shape; skips the per-token array +
    * wrapper for the dominant single-morpheme case. */
  def fixedTokenLabelSlice(labels: IndexedSeq[String], off: Int, len: Int): String =
    if (len == 1) Biose.fixedBioSequence1(labels(off))
    else {
      val a = new Array[String](len)
      var j = 0
      while (j < len) { a(j) = labels(off + j); j += 1 }
      Biose.fixedBioSequence(scala.collection.immutable.ArraySeq.unsafeWrapArray(a))
    }

  /** The label side of [[softMergeToken]] — all the annotate assembly
    * consumes (it reads only `._2` of each aligned pair). The aligned labels
    * depend ONLY on (multiLabel, forms.length): every branch zips positions,
    * never form contents, and every branch returns exactly forms.length
    * pairs. So the memo keys on the label with a per-length slot — zero
    * allocation on a hit (the tuple-seq construction was ~10% of the
    * annotate kernel's churn — JFR). Values are computed THROUGH
    * [[softMergeToken]] so the semantics cannot drift, and treated
    * immutable by all callers. Label-space-bounded; lengths > 16 (vanishing
    * at fixture and corpus scale) bypass the memo. */
  private val mergeLabelMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicReferenceArray[Array[String]]](1 << 10)

  def softMergeLabels(nForms: Int, multiLabel: String): Array[String] = {
    def compute(): Array[String] = {
      val placeholder = scala.collection.immutable.ArraySeq.fill(nForms)("")
      softMergeToken(placeholder, multiLabel)._2.map(_._2).toArray
    }
    if (nForms > 16) return compute()
    var slot = mergeLabelMemo.get(multiLabel)
    if (slot == null) {
      if (mergeLabelMemo.size >= (1 << 14)) return compute() // cap: stop admitting labels, keep serving existing
      mergeLabelMemo.putIfAbsent(multiLabel,
        new java.util.concurrent.atomic.AtomicReferenceArray[Array[String]](17))
      slot = mergeLabelMemo.get(multiLabel)
    }
    val hit = slot.get(nForms)
    if (hit != null) hit
    else { val r = compute(); slot.set(nForms, r); r }
  }

  /** C7/C8: regroup a flat (tokenId, value) list into per-token sublists,
    * preserving order (itertools.groupby semantics — consecutive runs). */
  def groupByToken[T](tokenIds: Seq[Int], values: Seq[T]): Seq[(Int, Seq[T])] = {
    val out = new ArrayBuffer[(Int, ArrayBuffer[T])]()
    for ((tid, v) <- tokenIds.zip(values)) {
      if (out.nonEmpty && out.last._1 == tid) out.last._2 += v
      else out += ((tid, ArrayBuffer(v)))
    }
    out.map { case (t, vs) => (t, vs.toSeq) }.toSeq
  }
}
