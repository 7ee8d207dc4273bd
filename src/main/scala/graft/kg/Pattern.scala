package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern (BGP) matching over the materialized triple store —
  * the KG READ path. Every other KG query here runs over pre-triple stages
  * (mentions, linked, cooc edges); a downstream consumer of the emitted
  * (subj, pred, obj) table asks SPARQL-shaped questions of the TRIPLES
  * themselves ("which entities co-occur in a document with a PER entity"),
  * and this is that surface: a conjunction of triple patterns sharing
  * variables, compiled to a declarative Catalyst join tree.
  *
  * Spark-first compilation, one frame per pattern:
  *   1. constant terms → `filter` on the scan. The triple store is written
  *      bucketed (io/TableFormat) and `pred` is a natural partition column at
  *      scale (the classic vertical-partitioning layout for triple stores —
  *      one predicate, one partition): a constant-`pred` pattern then prunes
  *      to ONE predicate's partitions before any shuffle, and the remaining
  *      subj/obj constants reach parquet as PushedFilters.
  *   2. a variable repeated INSIDE one pattern → in-row equality filter
  *      (still scan-stage, no shuffle).
  *   3. patterns are joined left-to-right on their shared variables — plain
  *      equi-joins Catalyst reorders and AQE sizes: a selective pattern
  *      (e.g. `?a category "PER"`, one predicate × one object) comes out
  *      broadcast; only genuinely large-large steps shuffle, keyed by the
  *      shared variable. Patterns with NO shared variable cross-join — that
  *      is BGP semantics (a cartesian of independent matches); callers at
  *      scale order patterns so each step shares a variable with the prefix.
  *
  * No RDDs, no UDFs, no driver-side evaluation: the whole BGP is one logical
  * plan, so predicate pushdown / join reordering / AQE apply end-to-end.
  */
object Pattern {

  /** A term of a triple pattern: variable or constant. */
  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: String) extends Term

  /** One (subject, predicate, object) pattern. */
  final case class Tp(s: Term, p: Term, o: Term)

  /** Match a conjunction of triple patterns against a (subj, pred, obj)
    * table. Output: one column per distinct variable, named after it, in
    * first-appearance order; rows are distinct bindings (set semantics, like
    * SPARQL SELECT DISTINCT — the triple store carries per-doc provenance
    * duplicates a reader of entity-level answers does not want). A pattern
    * with no variables degrades to an existence gate: it contributes one row
    * when at least one triple matches, none otherwise. */
  def matchBgp(triples: DataFrame, bgp: Seq[Tp],
               distinctRows: Boolean = true): DataFrame = {
    require(bgp.nonEmpty, "empty basic graph pattern")
    val joined = bgp.map(one(triples, _)).reduceLeft { (acc, f) =>
      val shared = acc.columns.toSeq.intersect(f.columns.toSeq)
      if (shared.nonEmpty) acc.join(f, shared) else acc.crossJoin(f)
    }
    // Spark's USING-join hoists join keys to the front — restore global
    // first-appearance variable order so output shape is caller-predictable
    val varOrder = bgp.flatMap(tp => Seq(tp.s, tp.p, tp.o))
      .collect { case V(n) => n }.distinct
    val out = joined.drop("__exists")
    val ordered =
      if (varOrder.nonEmpty) out.select(varOrder.map(col): _*) else out
    if (distinctRows && ordered.columns.nonEmpty) ordered.distinct() else ordered
  }

  private def one(triples: DataFrame, tp: Tp): DataFrame = {
    val terms = Seq("subj" -> tp.s, "pred" -> tp.p, "obj" -> tp.o)
    // constants filter first — these are the scan-stage pruners
    var df = terms.foldLeft(triples.select("subj", "pred", "obj")) {
      case (d, (c, C(v))) => d.filter(col(c) === lit(v))
      case (d, _) => d
    }
    // same variable twice within the pattern → in-row equality, still pre-shuffle
    val varCols = terms.collect { case (c, V(n)) => (c, n) }
    varCols.groupBy(_._2).valuesIterator.filter(_.size > 1).foreach { g =>
      g.map(_._1).sliding(2).foreach {
        case Seq(a, b) => df = df.filter(col(a) === col(b))
        case _ =>
      }
    }
    // one output column per distinct variable, first-appearance order
    val firstCol = scala.collection.mutable.LinkedHashMap[String, String]()
    varCols.foreach { case (c, n) => if (!firstCol.contains(n)) firstCol(n) = c }
    if (firstCol.isEmpty)
      // all-constant pattern: existence gate (≥1 match → one neutral row)
      df.limit(1).select(lit(1).as("__exists"))
    else
      df.select(firstCol.toSeq.map { case (n, c) => col(c).as(n) }: _*)
  }
}
