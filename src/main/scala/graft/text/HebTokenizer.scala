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

  /** Tokenize one sentence. */
  def tokenize(sentence: String): Array[String] = {
    val out = new ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder()
    def flush(): Unit = { if (cur.length > 0) { out += cur.toString; cur.setLength(0) } }
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
        out += c.toString
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
