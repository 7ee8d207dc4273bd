package graft.ner

/** Bidirectional string↔int vocabulary (SURVEY §2 F2).
  * Reference: utils/alphabet.py:17-91 — growable then frozen, UNKNOWN at a fixed
  * slot. Index 0 is reserved for padding; UNKNOWN (for non-label alphabets) is
  * index 1, exactly like NCRF++'s Alphabet.
  * Immutable once built — shipped to executors inside a Broadcast.
  */
final case class Alphabet(instances: IndexedSeq[String], isLabel: Boolean) {
  val unkIndex: Int = if (isLabel) -1 else 1
  private val index: Map[String, Int] =
    instances.iterator.zipWithIndex.map { case (s, i) => s -> (i + firstId) }.toMap

  private def firstId: Int = if (isLabel) 1 else 2 // 0 pad (+1 unk for words)

  /** string → id with UNK fallback for word/char alphabets (reference
    * alphabet.py:47-56). A LABEL alphabet has no UNKNOWN slot — the frozen
    * reference raises KeyError there (`instance2index[UNKNOWN]` misses), so
    * an unknown label fails loudly here too instead of silently mapping to
    * whichever label holds id 1. */
  def get(s: String): Int =
    index.getOrElse(s,
      if (isLabel) throw new NoSuchElementException(
        s"unknown label '$s' in frozen label alphabet")
      else unkIndex)

  /** Direct-mapped char→id table (single-UTF-16-unit instances only) — the
    * hot path ([[Scorer.charCnn]]/[[Scorer.charLstm]]) looks up one id per
    * CHARACTER of every scored token; going through `get(c.toString)`
    * allocated a String per character and hashed it (measured by
    * tools/AllocProbe as part of the 165 KB/doc churn that caps 32-thread
    * scaling on memory bandwidth). 256 KB per alphabet, built lazily so only
    * char alphabets pay it; @transient so broadcasts ship the instances, not
    * the table. Equivalence: a Char can only ever equal a single-unit
    * instance, so `getChar(c) == get(c.toString)` for every possible c. */
  @transient private lazy val charTable: Array[Int] = {
    val t = new Array[Int](Character.MAX_VALUE + 1)
    java.util.Arrays.fill(t, unkIndex)
    instances.iterator.zipWithIndex.foreach { case (s, i) =>
      if (s.length == 1) t(s.charAt(0)) = i + firstId
    }
    t
  }

  /** char → id with UNK fallback; char alphabets only (labels never index
    * by char). Identical to `get(c.toString)` minus the String allocation. */
  def getChar(c: Char): Int = charTable(c)

  /** id → string; pad/unk render as sentinels. */
  def instance(id: Int): String =
    if (id >= firstId && id - firstId < instances.length) instances(id - firstId)
    else if (id == unkIndex && !isLabel) "</unk>"
    else "</pad>"

  /** Number of ids including pad (and unk for word alphabets). */
  def size: Int = instances.length + firstId
}

object Alphabet {
  def fromStrings(xs: Iterable[String], isLabel: Boolean = false): Alphabet =
    Alphabet(xs.toSeq.distinct.toIndexedSeq, isLabel)
}
