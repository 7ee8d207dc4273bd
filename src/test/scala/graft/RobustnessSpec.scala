package graft

import graft.fixtures.Fixtures
import graft.label.Biose
import graft.schema.{InputDoc, Span}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Fuzz hardening: the engine ingests EXTERNAL corpora at 10^12-doc scale, so
  * a single weird document must never kill an executor task. Deterministic
  * seeded fuzzing (no scalacheck bridge needed) over the full annotate path
  * and the label algebra that external token files reach via readFileSents.
  */
class RobustnessSpec extends AnyFunSuite {

  private val models = Pipeline.fixtureModels()
  private val lex: String => Boolean = models.lexicon.contains _

  private def randomText(r: Random): String = {
    val pools = Array(
      "אבגדהוזחטיכלמנסעפצקרשת",          // Hebrew incl. clitic letters
      "abcXYZ0123456789",                  // latin + digits
      "§±!@#$%^&*()-_=+[]{};:'\",.<>/?\\|", // punctuation incl. ^ and -
      " \t ",                         // whitespace variants
      "Ωπ漢字日本語한국어",                   // other scripts
      "")                      // control chars
    val len = r.nextInt(60)
    val sb = new StringBuilder
    for (_ <- 0 until len) {
      val pool = pools(r.nextInt(pools.length))
      sb.append(pool.charAt(r.nextInt(pool.length)))
    }
    sb.toString
  }

  test("annotateDoc never throws on arbitrary unicode input and keeps invariants") {
    val r = new Random(4242)
    for (docId <- 0 until 500) {
      val nSpans = r.nextInt(5)
      val spans = (0 until nSpans).map { i =>
        if (r.nextInt(4) == 0) Span("media", "", s"media://f/$i", i)
        else Span("text", randomText(r), "", i)
      }.toArray
      val in = InputDoc(f"fuzz-$docId%04d", spans)
      val doc = Pipeline.annotateDoc(models, lex, in) // must not throw
      // passenger invariant: spans ride through untouched
      assert(doc.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)).toSeq ===
        spans.map(s => (s.kind, s.text, s.media_ref, s.offset)).toSeq)
      // one sentence per text span
      assert(doc.sents.length === spans.count(_.kind == "text"))
      for (sent <- doc.sents; tok <- sent.tokens) {
        // morphemes re-concatenate to their token surface
        assert(tok.morphs.map(_.form).mkString === tok.text,
          s"morph split broke surface: '${tok.text}' -> ${tok.morphs.map(_.form).mkString("|")}")
        // all label layers present (possibly "O", never null)
        assert(tok.nemoSingle != null && tok.nemoMulti != null &&
          tok.nemoMultiAlignToken != null && tok.nemoMorphAlignToken != null)
      }
      // scored sentences carry a well-formed dependency tree (exactly one root)
      for (sent <- doc.sents) {
        val morphs = sent.tokens.flatMap(_.morphs)
        if (morphs.exists(_.deprel.nonEmpty))
          assert(morphs.count(m => m.head == 0 && m.deprel == "root") === 1)
      }
    }
  }

  test("label algebra never throws on adversarial tag strings") {
    val r = new Random(77)
    val atoms = Array("O", "B-PER", "I-", "E", "S-ORG^", "^", "", "-", "B-", "O^B-ORG",
      "X-!@#", "B-VERYLONGCATEGORY", "S-倉", "I-PER^E-PER^O", "--", "^^")
    for (_ <- 0 until 2000) {
      val tag = (0 until r.nextInt(4)).map(_ => atoms(r.nextInt(atoms.length))).mkString("^")
      val fixed = Biose.fixMultiBiose(tag) // must not throw (Python-parity degrade)
      assert(fixed != null && fixed.nonEmpty)
      val labels = (0 until r.nextInt(8)).map(_ => atoms(r.nextInt(atoms.length))).toIndexedSeq
      Biose.parseSpans(labels)                       // must not throw
      val toks = labels.map(_ => randomText(r))
      Biose.mentionScan(toks, labels)                // must not throw
      Biose.bioToBioes(labels); Biose.bioesToBio(labels); Biose.iobToBio(labels)
    }
  }

  test("dep parser is total: any POS sequence yields a single-rooted tree") {
    val r = new Random(11)
    val poses = Array("IN", "DT", "CC", "REL", "NN", "VB", "??", "")
    for (_ <- 0 until 500) {
      val n = r.nextInt(12)
      val xpos = IndexedSeq.fill(n)(poses(r.nextInt(poses.length)))
      val forms = IndexedSeq.fill(n)(randomText(r))
      val dep = graft.lattice.DepParser.parse(forms, forms, xpos, feats = null)
      assert(dep.length === n)
      if (n > 0) {
        assert(dep.count(_.head == 0) === 1, s"poses=$xpos -> ${dep.map(d => (d.head, d.deprel))}")
        // acyclic: every node reaches the root
        val headOf = dep.map(d => d.id -> d.head).toMap
        for (d <- dep) {
          var cur = d.id; var steps = 0
          while (cur != 0 && steps <= n) { cur = headOf(cur); steps += 1 }
          assert(cur === 0)
        }
      }
    }
  }

  test("SPARQL parser is total: adversarial query strings fail loudly or run") {
    // the HTTP endpoint feeds USER STRINGS straight into Sparql.query — a
    // malformed query must come back as the parser's IllegalArgumentException
    // (mapped to 400 on the wire), never a hang, a MatchError, an NPE, or a
    // Spark analysis crash from inside the compiled plan
    lazy val spark = SparkTestBase.spark
    import spark.implicits._
    val trip = Seq(("s1", "p0", "o1"), ("s2", "p1", "s1"))
      .toDF("subj", "pred", "obj")
    val r = new Random(20260823)
    val frags = Array(
      "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "WHERE", "OPTIONAL", "MINUS",
      "FILTER", "EXISTS", "NOT", "UNION", "VALUES", "GROUP", "BY", "ORDER",
      "LIMIT", "OFFSET", "DISTINCT", "REGEX", "{", "}", "(", ")", ".", ",",
      "?a", "?b", "?", "p0", "p1+", "^p0", "p0|p1", "s1", "\"q\"", "'u'",
      "=", "!=", "<", ">=", "COUNT", "SUM", "AS", "*", "10", "zz",
      // round-5 grammar growth: GRAPH scopes, subqueries, BIND, HAVING,
      // boolean connectives — same totality property must hold
      "GRAPH", "BIND", "HAVING", "CONCAT", "&&", "||")
    var parsed = 0
    for (round <- 0 until 300) {
      val q = Seq.fill(r.nextInt(14) + 1)(frags(r.nextInt(frags.length)))
        .mkString(" ")
      try { graft.kg.Sparql.query(trip, q).collect(); parsed += 1 }
      catch {
        case _: IllegalArgumentException => // the documented loud failure
        case e: Throwable =>
          fail(s"round $round: '$q' threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // the generator must actually exercise BOTH outcomes
    assert(parsed > 0 && parsed < 300, s"degenerate generator: $parsed/300 parsed")
  }
}
