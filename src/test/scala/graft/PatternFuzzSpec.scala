package graft

import graft.kg.Pattern
import graft.kg.Pattern.{C, Term, Tp, V}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property fuzz for the SPARQL algebra: every operator compared against a
  * NAIVE solution-mapping evaluator (direct transcription of the SPARQL 1.1
  * set semantics over in-memory triples) on seeded random stores and
  * patterns. Same deterministic-seed style as RobustnessSpec — the point is
  * that the Catalyst compilation (join trees, semi/anti boundaries, NULL
  * padding) can never drift from the algebra it claims to implement, for
  * ANY store shape, not just the hand-enumerated fixtures in PatternSpec.
  *
  * Generation keeps OPTIONAL/MINUS/EXISTS groups WELL-DESIGNED (their shared
  * variables come from the required part, the only case the API documents):
  * outside it, SPARQL's unbound-is-compatible rule and SQL NULL-equality
  * genuinely differ, and the API rejects the degenerate no-shared-var case
  * loudly instead.
  */
class PatternFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private type Triple = (String, String, String)
  private type Sol = Map[String, String]

  // ---- naive SPARQL 1.1 evaluator over Seq[Triple] ----

  private def unify(t: Term, v: String, sol: Option[Sol]): Option[Sol] =
    sol.flatMap { m =>
      t match {
        case C(c) => if (c == v) Some(m) else None
        case V(n) => m.get(n) match {
          case Some(b) => if (b == v) Some(m) else None
          case None    => Some(m + (n -> v))
        }
      }
    }

  private def evalBgp(store: Seq[Triple], bgp: Seq[Tp]): Seq[Sol] =
    bgp.foldLeft(Seq(Map.empty[String, String])) { (sols, tp) =>
      sols.flatMap(sol => store.flatMap { case (s0, p0, o0) =>
        unify(tp.o, o0, unify(tp.p, p0, unify(tp.s, s0, Some(sol))))
      })
    }

  private def vars(tps: Seq[Tp]): Seq[String] =
    tps.flatMap(tp => Seq(tp.s, tp.p, tp.o)).collect { case V(n) => n }.distinct

  private def compatible(a: Sol, b: Sol, shared: Seq[String]): Boolean =
    shared.forall(v => (a.get(v), b.get(v)) match {
      case (Some(x), Some(y)) => x == y
      case _                  => true // unbound compatible (unreached: well-designed gen)
    })

  /** solution set → comparable canonical form: one Option[String] per output
    * column (None = unbound/NULL). */
  private def canon(sols: Seq[Sol], cols: Seq[String]): Set[Seq[Option[String]]] =
    sols.map(s => cols.map(s.get)).toSet

  private def collectDf(df: org.apache.spark.sql.DataFrame): Set[Seq[Option[String]]] = {
    val cols = df.columns.toSeq
    df.collect().map(r => cols.indices.map(i => Option(r.getString(i)))).toSet
  }

  // ---- seeded generators ----

  private val subjects = (0 to 5).map(i => s"s$i")
  private val preds = (0 to 3).map(i => s"p$i")
  private val objects = subjects ++ (0 to 3).map(i => s"o$i") // subj∩obj: joins + paths

  private def randStore(r: Random): Seq[Triple] =
    Seq.fill(r.nextInt(30) + 1)((subjects(r.nextInt(subjects.size)),
      preds(r.nextInt(preds.size)), objects(r.nextInt(objects.size))))

  private val varPool = Seq("a", "b", "c", "d")

  private def randTerm(r: Random, pool: Seq[String], consts: Seq[String]): Term =
    if (r.nextInt(3) == 0) C(consts(r.nextInt(consts.size)))
    else V(pool(r.nextInt(pool.size)))

  private def randBgp(r: Random, n: Int): Seq[Tp] = {
    val bgp = Seq.fill(n)(Tp(randTerm(r, varPool, subjects),
      randTerm(r, varPool.drop(2), preds), randTerm(r, varPool, objects)))
    if (vars(bgp).nonEmpty) bgp else randBgp(r, n) // engine needs ≥1 variable
  }

  /** well-designed group: ≥1 variable drawn FROM the prefix's vars, the rest
    * fresh (x/y), constants from the store vocab. */
  private def randGroup(r: Random, prefixVars: Seq[String]): Seq[Tp] = {
    val anchor = prefixVars(r.nextInt(prefixVars.size))
    val fresh = Seq("x", "y")
    val grp = Seq.fill(r.nextInt(2) + 1)(Tp(
      randTerm(r, anchor +: fresh, subjects),
      randTerm(r, Seq(anchor), preds),
      randTerm(r, anchor +: fresh, objects)))
    if (vars(grp).contains(anchor)) grp
    else Tp(V(anchor), C(preds(r.nextInt(preds.size))), V("x")) +: grp.drop(1)
  }

  private def df(store: Seq[Triple]) = store.toDF("subj", "pred", "obj")

  // ---- the properties ----

  test("matchBgp equals the naive evaluator on random stores and patterns") {
    val r = new Random(20260820)
    for (round <- 0 until 25) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(3) + 1)
      val got = collectDf(Pattern.matchBgp(df(store), bgp))
      val want = canon(evalBgp(store, bgp), vars(bgp))
      assert(got === want, s"round $round bgp=$bgp store=$store")
    }
  }

  test("GRAPH scope equals the naive quad evaluator (same-graph conjunction)") {
    val graphs = Seq("g1", "g2", "g3")
    val r = new Random(20260820)
    for (round <- 0 until 25) {
      val quads = Seq.fill(r.nextInt(30) + 1)((subjects(r.nextInt(subjects.size)),
        preds(r.nextInt(preds.size)), objects(r.nextInt(objects.size)),
        graphs(r.nextInt(graphs.size))))
      val bgp = randBgp(r, r.nextInt(3) + 1)
      val gterm: Term = if (r.nextBoolean()) V("g") else C(graphs(r.nextInt(graphs.size)))
      val qdf = quads.toDF("subj", "pred", "obj", "doc_id")
      val got = collectDf(Pattern.matchBgpGraph(qdf, bgp, gterm))
      // naive: each pattern must match a quad whose graph unifies with the
      // graph term — SPARQL 1.1 §13.3's per-block graph substitution
      val sols = bgp.foldLeft(Seq(Map.empty[String, String])) { (ss, tp) =>
        ss.flatMap(sol => quads.flatMap { case (s0, p0, o0, g0) =>
          unify(gterm, g0,
            unify(tp.o, o0, unify(tp.p, p0, unify(tp.s, s0, Some(sol)))))
        })
      }
      val cols = gterm match {
        case V(g) if !vars(bgp).contains(g) => vars(bgp) :+ g
        case _                              => vars(bgp)
      }
      assert(got === canon(sols, cols), s"round $round bgp=$bgp graph=$gterm quads=$quads")
    }
  }

  test("stats-ordered matchBgp binds identically to the naive evaluator") {
    // the selectivity reorder must be invisible in the RESULT for any store
    // shape and any caller order — a BGP is one natural join, so orderBgp
    // may only change the plan. Stats come from the store itself.
    val r = new Random(20260821)
    for (round <- 0 until 25) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(3) + 1)
      val stats = store.groupBy(_._2).map { case (p, ts) => p -> ts.size.toLong }
      val got = collectDf(Pattern.matchBgp(df(store), bgp, stats = Some(stats)))
      val want = canon(evalBgp(store, bgp), vars(bgp))
      assert(got === want, s"round $round bgp=$bgp store=$store")
    }
  }

  test("parsed value FILTERs equal naive solution filtering") {
    // string comparisons only (the generator vocab is non-numeric, so the
    // engine takes the lexicographic path, same as the naive compare)
    val r = new Random(20260822)
    val ops = Seq("=", "!=", "<", ">=")
    def cmp(op: String, a: String, b: String): Boolean = op match {
      case "="  => a == b
      case "!=" => a != b
      case "<"  => a < b
      case ">=" => a >= b
    }
    for (round <- 0 until 25) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val vs = vars(bgp)
      val v = vs(r.nextInt(vs.size))
      val op = ops(r.nextInt(ops.size))
      val rhsVar = r.nextBoolean() && vs.size > 1
      val rhs = if (rhsVar) vs(r.nextInt(vs.size)) else objects(r.nextInt(objects.size))
      val pat = bgp.map(tp => Seq(tp.s, tp.p, tp.o).map {
        case V(n) => s"?$n"
        case C(c) => c
      }.mkString(" ")).mkString(" . ")
      val q = s"SELECT DISTINCT ${vs.map("?" + _).mkString(" ")} WHERE { $pat " +
        s"FILTER ( ?$v $op ${if (rhsVar) "?" + rhs else rhs} ) }"
      val got = collectDf(graft.kg.Sparql.query(df(store), q))
      val want = canon(
        evalBgp(store, bgp).filter(m =>
          cmp(op, m(v), if (rhsVar) m(rhs) else rhs)),
        vs)
      assert(got === want, s"round $round q=$q store=$store")
    }
  }

  test("OPTIONAL equals naive left-join semantics (well-designed groups)") {
    val r = new Random(555)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val grp = randGroup(r, vars(bgp))
      val outCols = vars(bgp) ++ vars(grp).filterNot(vars(bgp).contains)
      val got = collectDf(Pattern.matchBgpOpt(df(store), bgp, Seq(grp)))
      val req = evalBgp(store, bgp)
      val ext = evalBgp(store, grp)
      val shared = vars(bgp).intersect(vars(grp))
      val want = canon(req.flatMap { m1 =>
        val ms = ext.filter(m2 => compatible(m1, m2, shared)).map(m1 ++ _)
        if (ms.nonEmpty) ms else Seq(m1)
      }, outCols)
      assert(got === want, s"round $round bgp=$bgp grp=$grp store=$store")
    }
  }

  test("UNION equals naive different-domain union") {
    val r = new Random(777)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val b1 = randBgp(r, r.nextInt(2) + 1)
      val b2 = randBgp(r, r.nextInt(2) + 1)
      val outCols = (vars(b1) ++ vars(b2)).distinct
      val got = collectDf(Pattern.matchUnion(df(store), Seq(b1, b2)))
      val want = canon(evalBgp(store, b1) ++ evalBgp(store, b2), outCols)
      assert(got === want, s"round $round b1=$b1 b2=$b2 store=$store")
    }
  }

  test("MINUS and FILTER [NOT] EXISTS equal their naive set definitions") {
    val r = new Random(999)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val grp = randGroup(r, vars(bgp))
      val shared = vars(bgp).intersect(vars(grp))
      val req = evalBgp(store, bgp)
      val ext = evalBgp(store, grp)
      def hasMatch(m1: Sol) = ext.exists(m2 => compatible(m1, m2, shared))
      val cols = vars(bgp)
      assert(collectDf(Pattern.matchBgpMinus(df(store), bgp, Seq(grp))) ===
        canon(req.filterNot(hasMatch), cols), s"MINUS round $round")
      assert(collectDf(Pattern.filterExists(df(store), bgp, grp)) ===
        canon(req.filter(hasMatch), cols), s"EXISTS round $round")
      assert(collectDf(Pattern.filterExists(df(store), bgp, grp, negate = true)) ===
        canon(req.filterNot(hasMatch), cols), s"NOT EXISTS round $round")
    }
  }

  test("pathPlus equals naive transitive closure; symClosurePairs agrees when symmetric") {
    val r = new Random(2468)
    for (round <- 0 until 12) {
      val n = r.nextInt(8) + 2
      val nodes = (0 until n).map(i => s"n$i")
      val raw = Seq.fill(r.nextInt(2 * n) + 1)(
        (nodes(r.nextInt(n)), nodes(r.nextInt(n))))
      // naive closure: iterate compose-with-base until fixpoint
      var reach = raw.distinct.toSet
      var grew = true
      while (grew) {
        val next = reach ++ (for ((a, b) <- reach; (c, d) <- reach if b == c) yield (a, d))
        grew = next.size != reach.size; reach = next
      }
      val got = Pattern.pathPlus(raw.toDF("src", "dst"))
        .as[(String, String)].collect().toSet
      assert(got === reach, s"round $round edges=$raw")
      // symmetrized: the CC fast path must agree with doubling
      val sym = (raw ++ raw.map(_.swap)).distinct
      val viaCc = Pattern.symClosurePairs(sym.toDF("src", "dst"))
        .as[(String, String)].collect().toSet
      val viaDoubling = Pattern.pathPlus(sym.toDF("src", "dst"))
        .as[(String, String)].collect().toSet
      assert(viaCc === viaDoubling, s"round $round symmetric edges=$sym")
    }
  }

  test("DESCRIBE equals the naive touching-triples definition") {
    // description of a node set = every triple whose subj OR obj is in it;
    // nodes come from the WHERE pattern's bindings of the described var
    val r = new Random(20260824)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val vs = vars(bgp)
      val v = vs(r.nextInt(vs.size))
      val pat = bgp.map(tp => Seq(tp.s, tp.p, tp.o).map {
        case V(n) => s"?$n"
        case C(c) => c
      }.mkString(" ")).mkString(" . ")
      val got = graft.kg.Sparql.query(df(store), s"DESCRIBE ?$v WHERE { $pat }")
        .collect().map(row => (row.getString(0), row.getString(1), row.getString(2)))
        .toSet
      val nodes = evalBgp(store, bgp).map(_(v)).toSet
      val want = store.filter { case (s0, _, o0) => nodes(s0) || nodes(o0) }.toSet
      assert(got === want, s"round $round v=$v bgp=$bgp store=$store")
    }
  }

  test("GROUP BY aggregates equal naive multiset aggregation") {
    // COUNT(*) / COUNT(DISTINCT ?x) / MIN / MAX per group over the solution
    // MULTISET (provenance duplicates count) — the §11 semantics the parser
    // documents, replayed on the naive evaluator's solution list
    val r = new Random(20260825)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val vs = vars(bgp)
      if (vs.size >= 2) {
        val g = vs.head
        val x = vs(1)
        val pat = bgp.map(tp => Seq(tp.s, tp.p, tp.o).map {
          case V(n) => s"?$n"
          case C(c) => c
        }.mkString(" ")).mkString(" . ")
        val q = s"SELECT ?$g ( COUNT ( * ) AS ?agg_n ) ( COUNT ( DISTINCT ?$x ) AS ?agg_d ) " +
          s"( MIN ( ?$x ) AS ?agg_lo ) ( MAX ( ?$x ) AS ?agg_hi ) " +
          s"""( GROUP_CONCAT ( DISTINCT ?$x , "/" ) AS ?agg_gc ) ( SAMPLE ( ?$x ) AS ?agg_s ) """ +
          s"WHERE { $pat } GROUP BY ?$g"
        val got = graft.kg.Sparql.query(df(store), q).collect()
          .map(row => row.getString(0) ->
            ((row.getLong(1), row.getLong(2), row.getString(3), row.getString(4),
              row.getString(5), row.getString(6))))
          .toMap
        val want = evalBgp(store, bgp).groupBy(_(g)).map { case (k, sols) =>
          val xs = sols.map(_(x))
          k -> ((xs.size.toLong, xs.distinct.size.toLong, xs.min, xs.max,
            xs.distinct.sorted.mkString("/"), xs.min))
        }
        assert(got === want, s"round $round q=$q store=$store")
      }
    }
  }

  private def patStr(bgp: Seq[Tp]): String =
    bgp.map(tp => Seq(tp.s, tp.p, tp.o).map {
      case V(n) => s"?$n"
      case C(c) => c
    }.mkString(" ")).mkString(" . ")

  test("FILTER connectives equal naive boolean evaluation (random &&/|| trees)") {
    // random expression trees over string comparisons; `&&` binds tighter
    // than `||` in the grammar, and the generator emits explicit parens for
    // every composite, so the naive recursive eval is the unambiguous model
    val r = new Random(20260910)
    val ops = Seq("=", "!=", "<", ">=")
    def cmp(op: String, a: String, b: String): Boolean = op match {
      case "="  => a == b
      case "!=" => a != b
      case "<"  => a < b
      case ">=" => a >= b
    }
    sealed trait E
    case class Leaf(v: String, op: String, rhs: String) extends E
    case class Node(and: Boolean, l: E, rr: E) extends E
    def genE(depth: Int, vs: Seq[String]): E =
      if (depth == 0 || r.nextInt(3) == 0)
        Leaf(vs(r.nextInt(vs.size)), ops(r.nextInt(ops.size)),
          objects(r.nextInt(objects.size)))
      else Node(r.nextBoolean(), genE(depth - 1, vs), genE(depth - 1, vs))
    def text(e: E): String = e match {
      case Leaf(v, op, rhs) => s"?$v $op $rhs"
      case Node(and, l, rr) => s"( ${text(l)} ) ${if (and) "&&" else "||"} ( ${text(rr)} )"
    }
    def ev(e: E, m: Sol): Boolean = e match {
      case Leaf(v, op, rhs) => cmp(op, m(v), rhs)
      case Node(true, l, rr)  => ev(l, m) && ev(rr, m)
      case Node(false, l, rr) => ev(l, m) || ev(rr, m)
    }
    for (round <- 0 until 25) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val vs = vars(bgp)
      val e = genE(2, vs)
      val q = s"SELECT DISTINCT ${vs.map("?" + _).mkString(" ")} WHERE { ${patStr(bgp)} " +
        s"FILTER ( ${text(e)} ) }"
      val got = collectDf(graft.kg.Sparql.query(df(store), q))
      val want = canon(evalBgp(store, bgp).filter(ev(e, _)), vs)
      assert(got === want, s"round $round q=$q store=$store")
    }
  }

  test("HAVING equals the naive post-aggregation filter") {
    val r = new Random(20260901)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val g = vars(bgp).head
      val k = r.nextInt(3) + 1
      val q = s"SELECT ?$g ( COUNT ( * ) AS ?agg_n ) WHERE { ${patStr(bgp)} } " +
        s"GROUP BY ?$g HAVING ( ?agg_n >= $k )"
      val got = graft.kg.Sparql.query(df(store), q).collect()
        .map(row => row.getString(0) -> row.getLong(1)).toMap
      val want = evalBgp(store, bgp).groupBy(_(g))
        .view.mapValues(_.size.toLong).filter(_._2 >= k).toMap
      assert(got === want, s"round $round q=$q store=$store")
    }
  }

  test("BIND equals naive solution extension (concat over bound operands)") {
    val r = new Random(20260902)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val vs = vars(bgp)
      val v1 = vs(r.nextInt(vs.size))
      val v2 = vs(r.nextInt(vs.size))
      val q = s"SELECT * WHERE { ${patStr(bgp)} . " +
        s"""BIND ( CONCAT ( ?$v1 , "-" , ?$v2 ) AS ?bnd ) }"""
      val got = collectDf(graft.kg.Sparql.query(df(store), q))
      val want = canon(
        evalBgp(store, bgp).map(m => m + ("bnd" -> s"${m(v1)}-${m(v2)}")),
        vs :+ "bnd")
      assert(got === want, s"round $round q=$q store=$store")
    }
  }

  test("subqueries equal naive bottom-up evaluation joined on shared projected vars") {
    val r = new Random(20260903)
    for (round <- 0 until 20) {
      val store = randStore(r)
      val outer = randBgp(r, r.nextInt(2) + 1)
      val ovs = vars(outer)
      val shared = ovs(r.nextInt(ovs.size))
      val pc = preds(r.nextInt(preds.size))
      val q = s"SELECT DISTINCT * WHERE { ${patStr(outer)} . " +
        s"{ SELECT ?$shared ( COUNT ( * ) AS ?sq_n ) WHERE { ?$shared $pc ?z } GROUP BY ?$shared } }"
      val cols = ovs :+ "sq_n"
      val got = graft.kg.Sparql.query(df(store), q).collect()
        .map(row => cols.indices.map(i => Option(row.get(i)).map(_.toString))).toSet
      val innerAgg = store.filter(_._2 == pc).groupBy(_._1)
        .view.mapValues(_.size.toLong).toMap
      val want = evalBgp(store, outer)
        .filter(m => innerAgg.contains(m(shared)))
        .map(m => cols.map(c =>
          if (c == "sq_n") Some(innerAgg(m(shared)).toString) else m.get(c)))
        .toSet
      assert(got === want, s"round $round q=$q store=$store")
    }
  }

  test("CONSTRUCT equals naive template instantiation") {
    val r = new Random(1357)
    for (round <- 0 until 15) {
      val store = randStore(r)
      val bgp = randBgp(r, r.nextInt(2) + 1)
      val bound = vars(bgp)
      def tTerm(): Term =
        if (r.nextInt(3) == 0) C(objects(r.nextInt(objects.size)))
        else V(bound(r.nextInt(bound.size)))
      val tmpl = Seq.fill(r.nextInt(2) + 1)(Tp(tTerm(), tTerm(), tTerm()))
      val got = Pattern.construct(df(store), bgp, tmpl)
        .as[(String, String, String)].collect().toSet
      def inst(t: Term, m: Sol) = t match { case C(c) => c; case V(n) => m(n) }
      val want = (for { m <- evalBgp(store, bgp); tp <- tmpl }
        yield (inst(tp.s, m), inst(tp.p, m), inst(tp.o, m))).toSet
      assert(got === want, s"round $round bgp=$bgp tmpl=$tmpl store=$store")
    }
  }
}
