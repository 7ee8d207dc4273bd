package graft

import graft.text.HebTokenizer
import graft.lattice.{Analyzer, Prune, Disambig}
import graft.align.Align
import graft.eval.Mentions
import graft.schema.LatticeEdge
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Tokenizer, lattice (D1-D4), alignment (C-group), mention eval (E1-E3). */
class CoreSpec extends AnyFunSuite {

  // ---- tokenizer (A2) ----

  test("tokenizer splits punctuation, keeps in-word quotes") {
    assert(HebTokenizer.tokenize("שלום, עולם!").toSeq === Seq("שלום", ",", "עולם", "!"))
    assert(HebTokenizer.tokenize("""צה"ל הודיע""").toSeq === Seq("""צה"ל""", "הודיע"))
    assert(HebTokenizer.tokenize("a  b\tc").toSeq === Seq("a", "b", "c"))
    assert(HebTokenizer.tokenize("(x)").toSeq === Seq("(", "x", ")"))
  }

  test("sentences: newline split, blanks dropped (nemo.py:25-31)") {
    assert(HebTokenizer.sentences("a\n\n  \nb c\n").toSeq === Seq("a", "b c"))
  }

  // ---- lattice generation (D1) ----

  test("analyzer emits unsegmented + clitic readings sharing endpoints") {
    val lex = Set("גדנק")
    val edges = Analyzer.sentenceLattice(IndexedSeq("בגדנק"), lex.contains _)
    // two readings: [בגדנק] and [ב, גדנק]
    val forms = edges.map(_.form).toSet
    assert(forms === Set("בגדנק", "ב", "גדנק"))
    val start = edges.map(_.id1).min
    val end = edges.map(_.id2).max
    // every simple path start→end spells a full segmentation
    val paths = Prune.simplePaths(edges.map(e => (e.id1, e.id2)).toIndexedSeq, start, end, -1)
    assert(paths.length === 2)
  }

  test("analyzer: unknown remainder not split when lexicon is closed") {
    val edges = Analyzer.sentenceLattice(IndexedSeq("בצצצ"), Set("גדנק").contains _)
    assert(edges.length === 1) // only the unsegmented reading
  }

  // ---- lattice pruning (D2/D3, exact nemo.py:78-97 semantics) ----

  private def mkEdges(tid: Int, pairs: (Int, Int)*): IndexedSeq[LatticeEdge] =
    pairs.map { case (a, b) => LatticeEdge(a, b, s"f$a$b", "", "NN", "NN", "_", tid) }.toIndexedSeq

  test("prune keeps only paths of length biose_count+1 nodes") {
    // diamond: 0→2 direct, 0→1→2 split
    val edges = mkEdges(1, (0, 2), (0, 1), (1, 2))
    // biose_count=2 ("O^B-PER") → keep 3-node path only
    val kept = Prune.pruneSentence(edges, IndexedSeq("O^B-PER"))
    assert(kept.map(e => (e.id1, e.id2)) === IndexedSeq((0, 1), (1, 2)))
    // biose_count=1 ("B-PER") → keep direct edge only
    val kept1 = Prune.pruneSentence(edges, IndexedSeq("B-PER"))
    assert(kept1.map(e => (e.id1, e.id2)) === IndexedSeq((0, 2)))
  }

  test("prune keep_all_if_no_valid fallback (nemo.py:92-93)") {
    val edges = mkEdges(1, (0, 2), (0, 1), (1, 2))
    // count=3 → no 4-node path exists → keep everything
    val kept = Prune.pruneSentence(edges, IndexedSeq("O^O^B-PER"))
    assert(kept === edges)
  }

  test("prune non_o_only=true skips count filter for category-less labels") {
    val edges = mkEdges(1, (0, 2), (0, 1), (1, 2))
    val keptAll = Prune.pruneSentence(edges, IndexedSeq("O^O"), nonOOnly = true)
    assert(keptAll === edges) // no '-' in label → all simple paths
    val keptCnt = Prune.pruneSentence(edges, IndexedSeq("O^O"), nonOOnly = false)
    assert(keptCnt.map(e => (e.id1, e.id2)) === IndexedSeq((0, 1), (1, 2)))
  }

  // ---- MD (D4) ----

  test("disambig picks lexicon-backed split over unsegmented unknown") {
    val lex = Set("גדנק")
    val edges = Analyzer.sentenceLattice(IndexedSeq("בגדנק", "גדנק"), lex.contains _).toIndexedSeq
    val md = Disambig.disambiguate(edges, lex.contains _)
    assert(md.map(_.form) === IndexedSeq("ב", "גדנק", "גדנק"))
    // exactly one path per token
    assert(md.count(_.tokenId == 1) === 2)
    assert(md.count(_.tokenId == 2) === 1)
  }

  // ---- alignment (C1/C4/C6/C8) ----

  test("bioseCount (C1)") {
    assert(Align.bioseCount("O") === 1)
    assert(Align.bioseCount("O^B-PER^I-PER") === 3)
    // Python len("B-ORG^".split('^')) == 2: trailing empty atoms COUNT
    assert(Align.bioseCount("B-ORG^") === 2)
    assert(Align.bioseCount("^") === 2)
  }

  test("softMergeToken three branches (nemo.py:117-137)") {
    // branch 1: equal lengths
    assert(Align.softMergeToken(Seq("a", "b"), "O^B-PER") ===
      ((1, Seq(("a", "O"), ("b", "B-PER")))))
    // branch 2: more morphemes → left-pad O, right-align
    assert(Align.softMergeToken(Seq("a", "b", "c"), "O^B-PER") ===
      ((2, Seq(("a", "O"), ("b", "O"), ("c", "B-PER")))))
    // branch 3: fewer morphemes → truncate atoms from the left
    assert(Align.softMergeToken(Seq("a"), "O^B-PER") ===
      ((3, Seq(("a", "B-PER")))))
  }

  test("fixedTokenLabel (C6) delegates to B6 fix") {
    assert(Align.fixedTokenLabel(Seq("O", "B-PER", "E-PER")) === "S-PER")
    assert(Align.fixedTokenLabel(Seq("O", "O")) === "O")
  }

  test("groupByToken preserves consecutive runs (itertools.groupby)") {
    assert(Align.groupByToken(Seq(1, 1, 2, 3, 3), Seq("a", "b", "c", "d", "e")) ===
      Seq((1, Seq("a", "b")), (2, Seq("c")), (3, Seq("d", "e"))))
  }

  // ---- dep parser (A8/A11/C10, verbosity 2) ----

  test("arc-standard dep parse: clitics attach to their host, one root") {
    val lex = Set("גדנק", "צצצ")
    val md = Disambig.disambiguate(
      Analyzer.sentenceLattice(IndexedSeq("בגדנק", "צצצ"), lex.contains _).toIndexedSeq, lex.contains _)
    val dep = graft.lattice.DepParser.parseMd(md)
    assert(dep.map(_.form) === IndexedSeq("ב", "גדנק", "צצצ"))
    assert(dep.count(_.head == 0) === 1)                    // exactly one root
    assert(dep(0).head === 2 && dep(0).deprel === "case")   // clitic → host
    assert(dep(1).deprel === "root")
    // C10 zip keeps parallel order
    val zipped = graft.lattice.DepParser.addDepInfo(md.map(_.form), dep)
    assert(zipped.map(_._1) === dep.map(_.form))
  }

  test("dep parse golden: two-clause sentence with conjunction and proclitics") {
    import graft.lattice.DepParser, DepParser.DepNode
    // "f1 N1 N2 CC f2 N3" — two clauses joined by a conjunction, each with a
    // proclitic; forms stand in for a real 2-clause Hebrew sentence
    val forms = IndexedSeq("ב", "בית", "גדול", "ו", "ל", "עיר")
    val xpos  = IndexedSeq("IN", "NN", "NN", "CC", "IN", "NN")
    val dep = DepParser.parse(forms, forms, xpos, IndexedSeq.fill(6)("_"))
    assert(dep === IndexedSeq(
      DepNode(1, "ב", "ב", "IN", "_", 2, "case"),     // proclitic → host N1
      DepNode(2, "בית", "בית", "NN", "_", 0, "root"), // first content = root
      DepNode(3, "גדול", "גדול", "NN", "_", 2, "dep"),// spine: N2 → N1
      DepNode(4, "ו", "ו", "CC", "_", 6, "cc"),       // conj → next host N3
      DepNode(5, "ל", "ל", "IN", "_", 6, "case"),     // proclitic → host N3
      DepNode(6, "עיר", "עיר", "NN", "_", 3, "dep"))) // clause 2 head → spine
    // tree well-formedness: exactly one root, acyclic (every node reaches 0)
    assert(dep.count(_.head == 0) === 1)
    val headOf = dep.map(d => d.id -> d.head).toMap
    for (d <- dep) {
      var cur = d.id; var steps = 0
      while (cur != 0 && steps <= dep.length) { cur = headOf(cur); steps += 1 }
      assert(cur === 0, s"node ${d.id} does not reach root")
    }
  }

  test("CoNLL write/read round-trips the dep parse (A8)") {
    import graft.lattice.DepParser
    val s1 = DepParser.parse(IndexedSeq("ב", "בית"), IndexedSeq("ב", "בית"),
      IndexedSeq("IN", "NN"), IndexedSeq.fill(2)("_"))
    val s2 = DepParser.parse(IndexedSeq("עיר", "ו", "בית"), IndexedSeq("עיר", "ו", "בית"),
      IndexedSeq("NN", "CC", "NN"), IndexedSeq.fill(3)("gen=F"))
    val text = graft.io.ConllFiles.writeConll(Seq(s1, s2))
    assert(graft.io.ConllFiles.readConll(text) === Seq(s1, s2))
  }

  test("property: allocation-free actionCode equals argmax over actionScores on every input") {
    import graft.lattice.DepParser
    val poses = Seq("ROOT", "IN", "DT", "CC", "REL", "NN", "VB", "JJ")
    for (s1 <- poses; s0 <- poses; s1Root <- Seq(true, false); buf <- Seq(true, false)) {
      val (l, r, s) = DepParser.actionScores(s1, s0, s1Root, buf)
      val expected = if (l >= r && l >= s) 0 else if (r >= s) 1 else 2
      assert(DepParser.actionCode(s1, s0, s1Root, buf) === expected,
        s"s1=$s1 s0=$s0 root=$s1Root buf=$buf")
    }
  }

  test("property: parseHeadsRels equals the DepNode parse on random POS sequences") {
    import graft.lattice.DepParser
    val r = new Random(42)
    val poses = IndexedSeq("IN", "DT", "CC", "REL", "NN", "VB")
    for (_ <- 0 until 200) {
      val n = r.nextInt(9)
      val xpos = IndexedSeq.fill(n)(poses(r.nextInt(poses.length)))
      val forms = IndexedSeq.tabulate(n)(i => s"f$i")
      val full = DepParser.parse(forms, forms, xpos, feats = null)
      val (heads, rels) = DepParser.parseHeadsRels(xpos)
      assert(full.map(_.head) === (1 to n).map(heads(_)))
      assert(full.map(_.deprel) === (1 to n).map(rels(_)))
    }
  }

  // ---- mention eval (E1-E3) ----

  test("sentenceMentions assigns occurrence indices") {
    val toks = IndexedSeq("x", "y", "x", "z")
    val labels = IndexedSeq("S-PER", "O", "S-PER", "O")
    assert(Mentions.sentenceMentions(5L, toks, labels) ===
      Seq((5L, "x", "PER", 1), (5L, "x", "PER", 2)))
  }

  test("evaluate sentinel semantics (ne_evaluate_mentions.py:53-81)") {
    val m = Seq((1L, "a", "PER", 1))
    assert(Mentions.evaluate(Seq.empty, m).recall === -1.0)
    assert(Mentions.evaluate(m, Seq.empty).precision === -1.0)
    val prf = Mentions.evaluate(m, m)
    assert(prf.precision === 1.0 && prf.recall === 1.0 && prf.f1 === 1.0)
    val prf2 = Mentions.evaluate(m ++ Seq((1L, "b", "ORG", 1)), m)
    assert(prf2.precision === 1.0 && prf2.recall === 0.5)
  }

  test("property: connected-components-free multiset eval equals brute force on 200 random cases") {
    val r = new Random(3)
    for (_ <- 0 until 200) {
      def ments() = (0 until r.nextInt(8)).map(_ =>
        (r.nextInt(3).toLong, s"s${r.nextInt(3)}", "PER", r.nextInt(2) + 1))
      val t = ments(); val p = ments()
      val prf = Mentions.evaluate(t, p)
      val correct = p.toSet.intersect(t.toSet).size
      if (p.toSet.nonEmpty) assert(prf.precision === correct.toDouble / p.toSet.size)
      if (t.toSet.nonEmpty) assert(prf.recall === correct.toDouble / t.toSet.size)
    }
  }
}
