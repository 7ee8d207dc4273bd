package graft.lattice

import graft.schema.LatticeEdge

/** Dependency-parse STUB (SURVEY §2 A8/A11/C10 — verbosity-2 output, "stub or
  * omit"). The reference shells out to YAP `dep` (api_main.py:127-131) and zips
  * (id, head, deprel) onto morphemes (api_main.py:338-351). There is no
  * Spark-native dependency parser in scope; this deterministic stand-in emits a
  * well-formed tree so the verbosity-2 Doc shape and the C10 zip are real and
  * testable: first content morpheme is root (head 0), proclitics attach forward
  * to the next content morpheme, other morphemes attach to the root.
  */
object DepStub {

  final case class DepNode(id: Int, form: String, head: Int, deprel: String)

  private val cliticPos = Set("IN", "DT", "CC", "REL")

  /** MD lattice (one path per token) → dependency nodes, 1-based ids. */
  def depTree(md: IndexedSeq[LatticeEdge]): IndexedSeq[DepNode] = {
    if (md.isEmpty) return IndexedSeq.empty
    val rootIdx = md.indexWhere(e => !cliticPos.contains(e.upos)) match {
      case -1 => 0
      case i  => i
    }
    md.zipWithIndex.map { case (e, i) =>
      if (i == rootIdx) DepNode(i + 1, e.form, 0, "root")
      else if (cliticPos.contains(e.upos)) {
        // proclitic: attach to the next content morpheme (its host)
        val host = md.indexWhere(x => !cliticPos.contains(x.upos), i + 1)
        val h = if (host >= 0) host + 1 else rootIdx + 1
        DepNode(i + 1, e.form, h, relOf(e.upos))
      } else DepNode(i + 1, e.form, rootIdx + 1, "dep")
    }
  }

  private def relOf(pos: String): String = pos match {
    case "IN"  => "case"
    case "DT"  => "det"
    case "CC"  => "cc"
    case "REL" => "mark"
    case _     => "dep"
  }

  /** C10: zip (head, deprel) onto parallel morpheme attributes. */
  def addDepInfo[T](morphs: IndexedSeq[T], deps: IndexedSeq[DepNode]): IndexedSeq[(T, Int, String)] =
    morphs.zip(deps).map { case (m, d) => (m, d.head, d.deprel) }
}
