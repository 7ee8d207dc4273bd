package graft.text

import scala.collection.mutable.ArrayBuffer

/** Deterministic tokenizer with the semantics the reference gets from
  * `bclm.tokenize` (reference nemo.py:25-31): whitespace split plus punctuation
  * isolation, with Hebrew-specific quote handling — a gershayim (U+05F4 or ")
  * INSIDE a word (acronyms like צה"ל) and a geresh (U+05F3 or ') attached to a
  * letter stay inside the token; leading/trailing punctuation splits off.
  *
  * Pure function — registered as a UDF by the pipeline (SURVEY §2 A2).
  */
object HebTokenizer {

  private def isHebLetter(c: Char): Boolean = c >= 'א' && c <= 'ת'
  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || isHebLetter(c)
  private def isQuote(c: Char): Boolean = c == '"' || c == '״'
  private def isGeresh(c: Char): Boolean = c == '\'' || c == '׳'

  /** Zipf token interning: tokens repeat corpus-wide, so flush() probes a
    * fixed-size shared open-addressing pool keyed by the builder's chars and
    * returns the canonical String on a hit — ZERO allocation (fresh token
    * Strings were ~19% of the annotate kernel's allocation churn — JFR), and
    * downstream token-keyed caches get reference-equal keys with cached
    * hashCodes. Unsynchronized publication is sound for String (final-field
    * semantics); a lost race or hash collision just bypasses the pool (first
    * occupant keeps the slot). */
  private val internPool = new java.util.concurrent.atomic.AtomicReferenceArray[String](1 << 16)
  private val internMask = (1 << 16) - 1

  private def internToken(cur: java.lang.StringBuilder): String = {
    val n = cur.length
    var h = 0
    var i = 0
    while (i < n) { h = h * 31 + cur.charAt(i); i += 1 } // == String.hashCode
    val idx = (h ^ (h >>> 16)) & internMask
    val cand = internPool.get(idx)
    if (cand != null && cand.length == n) {
      var j = 0
      while (j < n && cand.charAt(j) == cur.charAt(j)) j += 1
      if (j == n) return cand
    }
    val s = cur.toString
    if (cand == null) internPool.set(idx, s)
    s
  }

  /** Canonical single-char strings (isolated punctuation tokens). */
  private val charStrings = new java.util.concurrent.atomic.AtomicReferenceArray[String](1 << 16)
  private def charString(c: Char): String = {
    val hit = charStrings.get(c)
    if (hit != null) hit
    else { val s = String.valueOf(c); charStrings.set(c, s); s }
  }

  /** Tokenize one sentence. */
  def tokenize(sentence: String): Array[String] = {
    val out = new ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder()
    def flush(): Unit = { if (cur.length > 0) { out += internToken(cur); cur.setLength(0) } }
    var i = 0
    val n = sentence.length
    while (i < n) {
      val c = sentence.charAt(i)
      if (Character.isWhitespace(c)) flush()
      else if (isWordChar(c)) cur.append(c)
      else if ((isQuote(c) || isGeresh(c)) &&
               cur.length > 0 && i + 1 < n && isWordChar(sentence.charAt(i + 1))) {
        // in-word quote (acronym/geresh): keep inside the token
        cur.append(c)
      } else {
        // punctuation: isolate as its own token
        flush()
        out += charString(c)
      }
      i += 1
    }
    flush()
    out.toArray
  }

  /** Split a text blob into sentences the way the reference does
    * (newline-separated; blank lines dropped — nemo.py:25-31). */
  def sentences(text: String): Array[String] =
    text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toArray

  /** Full text → tokenized sentences (reference tokenize_text). */
  def tokenizeText(text: String): Array[Array[String]] =
    sentences(text).map(tokenize)
}
