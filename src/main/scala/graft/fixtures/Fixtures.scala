package graft.fixtures

import graft.schema._
import scala.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic corpus generator (FIXTURES.md §1/§4).
  *
  * Closed synthetic-Hebrew vocabulary over letters that exclude the clitic
  * prefixes (ב/ל/כ/ה/ו/ש/מ), so a token starting with a clitic letter is
  * unambiguously clitic+base — the generator can plant clitic-prefixed entity
  * mentions and the lattice analyzer/MD recovers them deterministically.
  *
  * The generator KNOWS where it planted entities, so gold labels (token-single,
  * token-multi, morph), gold mentions, and expected triples are all computable —
  * these freeze into the goldens that the P/R≥0.95 gate checks.
  *
  * Everything is a pure function of (seed, docId): fully regenerable, never
  * committed, identical across JVMs — the fixture analog of the reference's
  * example.txt + example_output_*.txt golden pattern.
  */
object Fixtures {

  val Seed = 42L
  val categories: IndexedSeq[String] =
    IndexedSeq("PER", "ORG", "LOC", "GPE", "FAC", "EVE", "WOA", "ANG", "DUC")

  // letters that are NOT proclitics
  private val letters = "אגדזחטינסעפצקרת".toIndexedSeq
  private val clitics = IndexedSeq("ב", "ל", "ו")

  private def word(r: Random): String = {
    val len = 3 + r.nextInt(4)
    (0 until len).map(_ => letters(r.nextInt(letters.length))).mkString
  }

  final case class FixtureEntity(entityId: Long, tokens: IndexedSeq[String], category: String) {
    def surface: String = tokens.mkString(" ")
  }

  /** One generated sentence with all gold layers. */
  final case class FixtureSentence(
      tokens: IndexedSeq[String],          // surface tokens (entity tokens may be clitic-prefixed)
      goldSingle: IndexedSeq[String],      // token-level BIOSE
      goldMulti: IndexedSeq[String],       // ^-joined multi labels
      morphForms: IndexedSeq[IndexedSeq[String]], // per token: true morpheme split
      goldMorph: IndexedSeq[IndexedSeq[String]],  // per token: per-morpheme BIOSE
      entityIds: IndexedSeq[Long])         // entity ids mentioned, in order

  final case class FixtureDoc(docId: String, sentences: IndexedSeq[FixtureSentence], spans: IndexedSeq[Span])

  /** Closed filler vocabulary (never entity tokens). */
  lazy val fillers: IndexedSeq[String] = {
    val r = new Random(Seed)
    Iterator.continually(word(r)).distinct.take(60).toIndexedSeq
  }

  /** Entity gazetteer: unique tokens, disjoint from fillers and each other.
    * ~500 entities per FIXTURES.md §4; the Zipf pick makes a handful hot. */
  def entities(n: Int = 500): IndexedSeq[FixtureEntity] = {
    val r = new Random(Seed + 1)
    val used = scala.collection.mutable.HashSet[String](fillers: _*)
    (0 until n).map { i =>
      val k = 1 + r.nextInt(3)
      val toks = (0 until k).map { _ =>
        var w = word(r)
        while (used.contains(w)) w = word(r)
        used += w
        w
      }
      FixtureEntity(i.toLong, toks.toIndexedSeq, categories(r.nextInt(categories.length)))
    }
  }

  lazy val defaultEntities: IndexedSeq[FixtureEntity] = entities()

  /** Base-word lexicon for the lattice analyzer / MD scorer. */
  lazy val lexicon: Set[String] =
    (fillers ++ defaultEntities.flatMap(_.tokens)).toSet

  /** Zipfian entity pick (s≈1.1) — a few entities are hot (skew fixture). */
  private def zipfPick(r: Random, n: Int): Int = {
    // inverse-CDF over precomputed weights; the table bounds the supported
    // gazetteer size — fail with a message, not an executor-side AIOOBE
    require(n <= zipfW.length,
      s"fixture gazetteer size $n exceeds the ${zipfW.length}-entry zipf table")
    val u = r.nextDouble() * zipfTotal(n)
    var acc = 0.0; var i = 0
    while (i < n - 1 && acc + zipfW(i) < u) { acc += zipfW(i); i += 1 }
    i
  }
  private lazy val zipfW: Array[Double] = Array.tabulate(4096)(i => 1.0 / math.pow(i + 1, 1.1))
  private def zipfTotal(n: Int): Double = { var s = 0.0; var i = 0; while (i < n) { s += zipfW(i); i += 1 }; s }

  /** Generate one document — pure function of (Seed, docId). */
  def doc(docIdNum: Int, ents: IndexedSeq[FixtureEntity] = defaultEntities): FixtureDoc = {
    val r = new Random(Seed ^ (docIdNum.toLong * 0x9E3779B97F4A7C15L))
    val nSents = 1 + r.nextInt(4)
    val sents = (0 until nSents).map { _ =>
      val toks = new ArrayBuffer[String]()
      val single = new ArrayBuffer[String]()
      val multi = new ArrayBuffer[String]()
      val mforms = new ArrayBuffer[IndexedSeq[String]]()
      val mlabels = new ArrayBuffer[IndexedSeq[String]]()
      val eids = new ArrayBuffer[Long]()
      val nFill = 3 + r.nextInt(5)
      val nEnts = 1 + r.nextInt(2)
      val entPositions = (0 until nEnts).map(_ => r.nextInt(nFill + 1)).sorted
      var fi = 0; var ei = 0
      def emitFiller(): Unit = {
        val w = fillers(r.nextInt(fillers.length))
        toks += w; single += "O"; multi += "O"
        mforms += IndexedSeq(w); mlabels += IndexedSeq("O")
      }
      def emitEntity(): Unit = {
        val e = ents(zipfPick(r, ents.length))
        eids += e.entityId
        val k = e.tokens.length
        for ((base, j) <- e.tokens.zipWithIndex) {
          val bio =
            if (k == 1) "S"
            else if (j == 0) "B"
            else if (j == k - 1) "E"
            else "I"
          val lab = s"$bio-${e.category}"
          val prefixed = j == 0 && r.nextDouble() < 0.3
          if (prefixed) {
            val c = clitics(r.nextInt(clitics.length))
            toks += (c + base)
            single += lab                       // token-level span includes the clitic token
            multi += s"O^$lab"                  // clitic morpheme O + base label
            mforms += IndexedSeq(c, base)
            mlabels += IndexedSeq("O", lab)
          } else {
            toks += base
            single += lab
            multi += lab
            mforms += IndexedSeq(base)
            mlabels += IndexedSeq(lab)
          }
        }
      }
      while (fi < nFill || ei < nEnts) {
        if (ei < nEnts && entPositions(ei) == fi) { emitEntity(); ei += 1 }
        else if (fi < nFill) { emitFiller(); fi += 1 }
        else { emitEntity(); ei += 1 }
      }
      FixtureSentence(toks.toIndexedSeq, single.toIndexedSeq, multi.toIndexedSeq,
        mforms.toIndexedSeq, mlabels.toIndexedSeq, eids.toIndexedSeq)
    }
    // spans: one text span per sentence + 0-2 media passengers at random slots
    val spans = new ArrayBuffer[Span]()
    for (s <- sents) spans += Span("text", s.tokens.mkString(" "), "", 0)
    val nMedia = r.nextInt(3)
    for (_ <- 0 until nMedia) {
      val pos = r.nextInt(spans.length + 1)
      val ref = f"media://img/${r.nextLong().toHexString}"
      spans.insert(pos, Span("media", "", ref, 0))
    }
    val ordered = spans.zipWithIndex.map { case (sp, i) => sp.copy(offset = i) }
    FixtureDoc(f"doc-$docIdNum%06d", sents, ordered.toIndexedSeq)
  }

  /** The north-rule input table rows (driver-side; small fixtures only). */
  def inputDocs(n: Int): IndexedSeq[InputDoc] =
    (0 until n).map { i => val d = doc(i); InputDoc(d.docId, d.spans.toArray) }

  /** Distributed generation: doc(i) is a pure function of i, so executors
    * synthesize their own partitions — no driver-serial bottleneck, no shuffle
    * (spark.range with explicit numPartitions). This is how the bench corpus
    * scales without the generator becoming the measured serial section. */
  def inputDocsDs(spark: org.apache.spark.sql.SparkSession, n: Int, partitions: Int)
      : org.apache.spark.sql.Dataset[InputDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .mapPartitions(_.map { i => val d = doc(i.toInt); InputDoc(d.docId, d.spans.toArray) })
  }

  /** Entity dictionary rows (linking target): canonical + aliases (incl.
    * clitic-prefixed variants of the first token, so token-level surfaces
    * link). Every 40th id PAIR additionally shares a synthetic alias
    * ("group-K") that no mention surface can collide with — canonicalization
    * genuinely merges components on the fixture corpus, so sameAs triples are
    * non-empty and the CC path is exercised end-to-end by the driver oracle. */
  def entityDictionary(ents: IndexedSeq[FixtureEntity] = defaultEntities): IndexedSeq[Entity] =
    ents.map { e =>
      val aliases = (e.surface +: clitics.map(c => ((c + e.tokens.head) +: e.tokens.tail).mkString(" "))) ++
        (if (e.entityId % 40 < 2) Seq(s"group-${e.entityId / 40}") else Nil)
      Entity(e.entityId, e.surface, aliases.distinct.toArray, e.category)
    }

  /** Oracle word→label maps for the three NER modes (feeds
    * NerModel.synthesizeOracle). */
  def oracleVocab(nDocs: Int): (Map[String, String], Map[String, String], Map[String, String]) = {
    val single = scala.collection.mutable.HashMap[String, String]()
    val multi = scala.collection.mutable.HashMap[String, String]()
    val morph = scala.collection.mutable.HashMap[String, String]()
    for (f <- fillers) { single(f) = "O"; multi(f) = "O"; morph(f) = "O" }
    for (c <- clitics) morph.getOrElseUpdate(c, "O")
    for (e <- defaultEntities) {
      val k = e.tokens.length
      for ((base, j) <- e.tokens.zipWithIndex) {
        val bio = if (k == 1) "S" else if (j == 0) "B" else if (j == k - 1) "E" else "I"
        val lab = s"$bio-${e.category}"
        single(base) = lab; multi(base) = lab; morph(base) = lab
        if (j == 0) for (c <- clitics) {
          single(c + base) = lab
          multi(c + base) = s"O^$lab"
        }
      }
    }
    (single.toMap, multi.toMap, morph.toMap)
  }
}
