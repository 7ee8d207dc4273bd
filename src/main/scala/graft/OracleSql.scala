package graft

/** DuckDB oracle SQL for the queries whose expected output is re-derived from
  * aux tables (`{{AUX}}` is substituted by Verify with the sibling dir `<outDir>_aux`).
  *
  * Design note: every query here is verified end-to-end by an INDEPENDENT
  * computation — the SQL reimplements the operator's semantics from scratch
  * over (a) the fixture generator's gold layers and (b) the frozen randomness
  * of the LSH/IVF ops (minhash coefficients, hyperplanes, k-means centroids),
  * never by replaying the engine's own output. All float-sensitive compares
  * are integerized (basis points via integer division, fixed-point sums) or
  * performed on arithmetic both engines execute identically (sequential
  * double folds).
  */
object OracleSql {

  private def norm(c: String) =
    s"trim(regexp_replace(regexp_replace(lower($c), '[[:punct:]]', '', 'g'), '\\s+', ' ', 'g'))"

  /** BIOSE run extraction over a gold (forms, labels) pair. Grouping by a
    * running count of run-starts (S-/B-) is exactly Biose.parseSpans for
    * WELL-FORMED sequences — fixture gold is well-formed by construction
    * (every B…E closes, no dangling I/E). */
  private def mentionCtes(formsCol: String, labelsCol: String): String =
    s"""WITH s AS (
       |  SELECT doc_id, sent_id, $formsCol AS forms, $labelsCol AS labels
       |  FROM read_parquet('{{AUX}}/gold_sents/*.parquet')
       |), tok AS (
       |  SELECT doc_id, sent_id, forms, i, labels[i] AS lab
       |  FROM s, unnest(generate_series(1, len(labels))) AS t(i)
       |  WHERE labels[i] <> 'O'
       |), grp AS (
       |  SELECT doc_id, sent_id, forms, i, lab,
       |    SUM(CASE WHEN lab LIKE 'S-%' OR lab LIKE 'B-%' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id, sent_id ORDER BY i) AS g
       |  FROM tok
       |), ment AS (
       |  SELECT doc_id, sent_id,
       |    string_agg(forms[i], ' ' ORDER BY i) AS surface,
       |    substr(first(lab ORDER BY i), 3) AS category,
       |    MIN(i) - 1 AS start, MAX(i) AS "end"
       |  FROM grp GROUP BY doc_id, sent_id, g
       |)""".stripMargin

  def mentions(formsCol: String, labelsCol: String, level: String, scenario: String): String =
    s"""${mentionCtes(formsCol, labelsCol)}
       |SELECT doc_id, sent_id, surface, category, start, "end",
       |  '$level' AS level, '$scenario' AS scenario,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id, sent_id, surface, category ORDER BY start) AS occ
       |FROM ment""".stripMargin

  /** Blocking-key linking: first-token block join + token-set Jaccard + 0.5
    * category bonus, best candidate by (score desc, entity_id). Mirrors
    * Linker.link semantics over the morph-scenario mentions. */
  /** `dictWhere` filters the dictionary rows (e.g. the dict-shrink twin links
    * against the surviving subset) — empty means the whole aux dump. */
  private def linkCtes(level: String, scenario: String, dictWhere: String = ""): String =
    s""", mnorm AS (
       |  SELECT *, ${norm("surface")} AS surface_norm
       |  FROM (SELECT doc_id, sent_id, surface, category, start, "end",
       |          '$level' AS level, '$scenario' AS scenario,
       |          ROW_NUMBER() OVER (PARTITION BY doc_id, sent_id, surface, category ORDER BY start) AS occ
       |        FROM ment)
       |), mblk AS (
       |  SELECT * FROM (SELECT *, string_split(surface_norm, ' ')[1] AS block FROM mnorm)
       |  WHERE block IS NOT NULL AND block <> ''
       |), dnorm AS (
       |  SELECT entity_id, canonical, category AS dict_category,
       |    ${norm("alias")} AS alias_norm
       |  FROM (SELECT entity_id, canonical, category, unnest(aliases) AS alias
       |        FROM read_parquet('{{AUX}}/dict/*.parquet') $dictWhere)
       |), dblk AS (
       |  SELECT * FROM (SELECT *, string_split(alias_norm, ' ')[1] AS block FROM dnorm)
       |  WHERE block IS NOT NULL AND block <> ''
       |), scored AS (
       |  SELECT *, CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(list_concat(sa, sb)))
       |       + CASE WHEN category = dict_category THEN 0.5 ELSE 0.0 END AS score
       |  FROM (SELECT m.*, d.entity_id, d.canonical, d.dict_category,
       |          list_distinct(list_filter(string_split(m.surface_norm, ' '), x -> x <> '')) AS sa,
       |          list_distinct(list_filter(string_split(d.alias_norm, ' '), x -> x <> '')) AS sb
       |        FROM mblk m JOIN dblk d USING (block))
       |  WHERE len(sa) > 0 AND len(sb) > 0
       |), linked AS (
       |  SELECT doc_id, sent_id, surface, category, start, "end", level, scenario, occ,
       |         entity_id, canonical, dict_category
       |  FROM (SELECT *, ROW_NUMBER() OVER (
       |          PARTITION BY doc_id, sent_id, scenario, level, start, surface, category, occ
       |          ORDER BY score DESC, entity_id) AS rk
       |        FROM scored WHERE score >= 0.6)
       |  WHERE rk = 1
       |)""".stripMargin

  def linked: String =
    s"""${mentionCtes("morph_forms", "morph_labels")}${linkCtes("morph", "morph")}
       |SELECT * FROM linked""".stripMargin

  /** Star-edge connected-components closure over the alias blocks
    * (canonical_id = component min) — ONE definition of canonicalization,
    * shared by the triples and cooc oracles. */
  private def ccClosureCtes: String =
    """, star AS (
      |  SELECT entity_id AS src, MIN(entity_id) OVER (PARTITION BY alias_norm) AS dst
      |  FROM (SELECT DISTINCT entity_id, alias_norm FROM dblk)
      |), e AS (SELECT DISTINCT src, dst FROM star WHERE src <> dst),
      |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
      |reach(node, comp) AS (
      |  SELECT src, src FROM sym
      |  UNION
      |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node
      |), comp AS (SELECT node, MIN(comp) AS canonical_id FROM reach GROUP BY node)""".stripMargin

  /** Full KG chain: mentions → linking → star-edge connected components
    * (recursive-CTE transitive closure, canonical_id = component min) →
    * 5-predicate triple union (mentions multiset, the rest distinct). */
  def triples: String = triplesWith("")

  /** Dict-shrink twin: the one-shot chain over the SURVIVING dictionary rows
    * only — what the incremental shrink fold must land on. */
  def triplesShrunk: String = triplesWith("WHERE entity_id % 5 <> 0")

  /** CTE prefix ending in `base` (linked mentions + CC-canonical subj) and
    * the 5-predicate union select — shared by the triple-materialize oracles
    * and the BGP read-path oracle (which wraps the union in a `trip` CTE). */
  private def triplesPrefix(dictWhere: String): String =
    s"""${mentionCtes("morph_forms", "morph_labels")}${linkCtes("morph", "morph", dictWhere)}
${ccClosureCtes}
       |,
       |base AS (
       |  SELECT 'ent:' || CAST(COALESCE(c.canonical_id, l.entity_id) AS VARCHAR) AS subj,
       |         l.entity_id, l.canonical, l.dict_category, l.surface, l.doc_id
       |  FROM linked l LEFT JOIN comp c ON c.node = l.entity_id
       |)""".stripMargin

  private def tripUnionSelect: String =
    """SELECT subj, 'mentions' AS pred, surface AS obj, doc_id FROM base
      |UNION ALL SELECT DISTINCT subj, 'inDoc' AS pred, doc_id AS obj, doc_id FROM base
      |UNION ALL SELECT DISTINCT subj, 'label' AS pred, canonical AS obj, doc_id FROM base
      |UNION ALL SELECT DISTINCT subj, 'category' AS pred, dict_category AS obj, doc_id FROM base
      |UNION ALL SELECT DISTINCT subj, 'sameAs' AS pred, 'ent:' || CAST(entity_id AS VARCHAR) AS obj, doc_id FROM base
      |  WHERE 'ent:' || CAST(entity_id AS VARCHAR) <> subj""".stripMargin

  private def triplesWith(dictWhere: String): String =
    (triplesPrefix(dictWhere) + "\n" + tripUnionSelect)
      .replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** BGP read-path oracle (`nemo_kg_2hop`): the SAME triple derivation as
    * [[triples]] wrapped in a `trip` CTE, then the three-pattern conjunction
    * `?a category <cat> . ?a inDoc ?d . ?b inDoc ?d (a ≠ b)` replayed as
    * plain self-joins — which entities co-occur in a document with a
    * <cat>-category entity, answered from the materialized triples. */
  def kg2hop(cat: String): String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT ca.subj AS per_ent, b.subj AS other_ent, a.obj AS doc
       |FROM trip ca
       |JOIN trip a ON a.pred = 'inDoc' AND a.subj = ca.subj
       |JOIN trip b ON b.pred = 'inDoc' AND b.obj = a.obj
       |WHERE ca.pred = 'category' AND ca.obj = '$cat' AND b.subj <> ca.subj"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** SPARQL-OPTIONAL oracle (`nemo_kg_optional`): PER-category entities
    * LEFT-joined to their sameAs alias edges — unmatched rows survive with
    * the alias unbound, replayed as a plain SQL LEFT JOIN over the same
    * `trip` CTE (NULL folded to '' on both sides for the string-hash
    * compare). */
  /** GRAPH-provenance oracle (`nemo_kg_sparql_graph`): the named-graph
    * dimension is the triple's doc provenance, so the same-graph mention
    * pair query replays as a doc_id self-join over the trip CTE. */
  def kgSparqlGraph: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT CAST(m1.doc_id AS VARCHAR) AS g, m1.subj AS a, m2.subj AS b
       |FROM trip m1 JOIN trip m2 ON m2.doc_id = m1.doc_id
       |WHERE m1.pred = 'mentions' AND m2.pred = 'mentions' AND m2.subj <> m1.subj"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** FILTER-connectives oracle (`nemo_kg_sparql_boolfilter`): the ||/&&
    * expression replayed with SQL OR/AND — both grammars bind AND tighter,
    * so the unparenthesized mixed tree means the same thing. */
  def kgSparqlBoolFilter: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT c.subj AS a, c.obj AS c, d.obj AS d
       |FROM trip c JOIN trip d ON d.subj = c.subj
       |WHERE c.pred = 'category' AND d.pred = 'inDoc'
       |  AND (c.obj = 'ORG' OR c.obj = 'PER' AND d.obj < c.subj)"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** GROUP_CONCAT/SAMPLE oracle (`nemo_kg_sparql_groupconcat`): the
    * engine's sorted-group determinism replayed with string_agg(… ORDER BY)
    * over a distinct subselect (the DISTINCT composes before the sort on
    * both sides); SAMPLE's deterministic pick is MIN. */
  def kgSparqlGroupConcat: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT d, string_agg(e, ',' ORDER BY e) AS ents, MIN(e) AS one
       |FROM (SELECT DISTINCT obj AS d, subj AS e FROM trip WHERE pred = 'inDoc')
       |GROUP BY d"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** HAVING oracle (`nemo_kg_sparql_having`): mention count per entity over
    * the solution multiset with a post-aggregation threshold — SQL HAVING
    * over the trip CTE's mentions family (UNION ALL, so duplicates count,
    * matching the engine's §11 multiset rule). */
  def kgSparqlHaving: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT subj AS e, CAST(COUNT(*) AS BIGINT) AS n
       |FROM trip WHERE pred = 'mentions'
       |GROUP BY subj HAVING COUNT(*) >= 3"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** BIND oracle (`nemo_kg_sparql_bind`): the minted (category, doc)
    * compound key replayed as string concatenation over a two-pattern
    * self-join of the trip CTE. */
  def kgSparqlBind: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT c.subj AS e, c.obj || '@' || d.obj AS qid
       |FROM trip c JOIN trip d ON d.subj = c.subj
       |WHERE c.pred = 'category' AND d.pred = 'inDoc'"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Subquery oracle (`nemo_kg_sparql_subquery`): the aggregate subquery is
    * a grouped derived table joined back on its projected variable; the
    * group-end FILTER on the alias becomes the outer WHERE. */
  def kgSparqlSubquery: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT cat.subj AS e, cat.obj AS c, m.n
       |FROM trip cat
       |JOIN (SELECT subj, CAST(COUNT(*) AS BIGINT) AS n FROM trip
       |      WHERE pred = 'mentions' GROUP BY subj) m
       |  ON m.subj = cat.subj
       |WHERE cat.pred = 'category' AND m.n >= 3"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** SPARQL-UPDATE oracle (`nemo_kg_update`): the 4-op script replayed as
    * set algebra over the trip CTE in script order — drop the sameAs
    * family, derive+persist coDoc edges (from the POST-op-1 state,
    * sequential semantics), add two ground rows, remove one. The engine
    * side reads back its updated store, so this doubles as an integrity
    * check of the partition-scoped rewrite (a stale or lost leaf would
    * hash-mismatch). */
  def kgUpdate(cat: String): String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |),
       |t0 AS (SELECT DISTINCT subj, pred, obj FROM trip),
       |t1 AS (SELECT * FROM t0 WHERE pred <> 'sameAs'),
       |co AS (SELECT DISTINCT ca.subj AS subj, 'coDoc' AS pred, b.subj AS obj
       |       FROM t1 ca
       |       JOIN t1 a ON a.pred = 'inDoc' AND a.subj = ca.subj
       |       JOIN t1 b ON b.pred = 'inDoc' AND b.obj = a.obj
       |       WHERE ca.pred = 'category' AND ca.obj = '$cat' AND b.subj <> ca.subj),
       |t2 AS (SELECT * FROM t1 UNION SELECT * FROM co),
       |t3 AS (SELECT * FROM t2 UNION SELECT 'ent:graft', 'category', 'SYS'
       |       UNION SELECT 'ent:graft', 'label', 'GraftEngine'),
       |-- DELETE DATA as a row filter (DuckDB rejects EXCEPT inside a WITH
       |-- RECURSIVE chain)
       |t4 AS (SELECT * FROM t3
       |       WHERE NOT (subj = 'ent:graft' AND pred = 'category' AND obj = 'SYS'))
       |SELECT subj, pred, obj FROM t4""".stripMargin
      .replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  def kgOptional(cat: String): String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT c.subj AS a, COALESCE(sa.obj, '') AS al
       |FROM trip c
       |LEFT JOIN (SELECT subj, obj FROM trip WHERE pred = 'sameAs') sa
       |  ON sa.subj = c.subj
       |WHERE c.pred = 'category' AND c.obj = '$cat'"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** SPARQL-UNION oracle (`nemo_kg_union`): branch 1 binds only ?a
    * (<cat>-category entities), branch 2 binds ?a and ?al (sameAs alias
    * edges) — replayed as a plain SQL UNION ALL over the same `trip` CTE
    * with branch 1's unbound ?al emitted as '' (the engine folds unbound
    * NULL to '' the same way before the string-hash compare). */
  def kgUnion(cat: String): String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT a, al FROM (
       |  SELECT subj AS a, '' AS al FROM trip WHERE pred = 'category' AND obj = '$cat'
       |  UNION ALL
       |  SELECT subj AS a, obj AS al FROM trip WHERE pred = 'sameAs'
       |)"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Property-path p+ oracle (`nemo_kg_reach`): the transitive closure of
    * the doc-share edge set (entities sharing a document, derived from the
    * inDoc predicate family), replayed as a DuckDB RECURSIVE CTE — the
    * UNION-distinct recursion terminates exactly at the same fixpoint the
    * engine's iterative-doubling loop reaches. */
  def kgReach: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |),
       |ind AS (SELECT DISTINCT subj AS ent, obj AS d FROM trip WHERE pred = 'inDoc'),
       |dse AS (
       |  SELECT DISTINCT x.ent AS src, y.ent AS dst
       |  FROM ind x JOIN ind y ON x.d = y.d WHERE x.ent <> y.ent
       |),
       |rplus AS (
       |  SELECT src, dst FROM dse
       |  UNION
       |  SELECT r.src, dse.dst FROM rplus r JOIN dse ON dse.src = r.dst
       |)
       |SELECT src, dst FROM rplus"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** SPARQL-MINUS oracle (`nemo_kg_minus`): PER-category entities minus
    * those with a sameAs alias edge — on shared variables SPARQL MINUS is
    * exactly a SQL anti join, replayed here as LEFT JOIN … IS NULL over the
    * same `trip` CTE. */
  def kgMinus(cat: String): String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT c.subj AS a
       |FROM trip c
       |LEFT JOIN (SELECT subj FROM trip WHERE pred = 'sameAs') sa
       |  ON sa.subj = c.subj
       |WHERE c.pred = 'category' AND c.obj = '$cat' AND sa.subj IS NULL"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Symmetric property-path oracle (`nemo_kg_alias_reach`): the transitive
    * closure of sameAs edges taken in BOTH directions — `(sameAs|^sameAs)+`
    * — replayed as a DuckDB recursive CTE over the symmetrized edge set;
    * UNION-distinct recursion terminates at the engine loop's fixpoint. */
  def kgAliasReach: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |),
       |saed AS (
       |  SELECT DISTINCT subj AS src, obj AS dst FROM trip WHERE pred = 'sameAs'
       |  UNION
       |  SELECT DISTINCT obj AS src, subj AS dst FROM trip WHERE pred = 'sameAs'
       |),
       |rplus AS (
       |  SELECT src, dst FROM saed
       |  UNION
       |  SELECT r.src, saed.dst FROM rplus r JOIN saed ON saed.src = r.dst
       |)
       |SELECT src, dst FROM rplus"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** SPARQL-CONSTRUCT oracle (`nemo_kg_construct`): the two template arms
    * replayed as a UNION (set semantics — the graph distinct) of plain
    * selects over the sameAs family of the same `trip` CTE. */
  def kgConstruct: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT obj AS subj, 'aliasOf' AS pred, subj AS obj
       |FROM trip WHERE pred = 'sameAs'
       |UNION
       |SELECT obj AS subj, 'category' AS pred, 'ALIAS' AS obj
       |FROM trip WHERE pred = 'sameAs'"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** SPARQL-ASK oracle (`nemo_kg_ask`): EXISTS as 1/0 BIGINT per question
    * over the same `trip` CTE (integers stringify identically across
    * DuckDB and Spark; booleans do not). */
  def kgAsk: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT 'per_exists' AS q,
       |  CASE WHEN EXISTS (SELECT 1 FROM trip WHERE pred = 'category' AND obj = 'PER')
       |       THEN 1 ELSE 0 END AS matched
       |UNION ALL
       |SELECT 'zzz_exists' AS q,
       |  CASE WHEN EXISTS (SELECT 1 FROM trip WHERE pred = 'category' AND obj = 'ZZZ')
       |       THEN 1 ELSE 0 END AS matched"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Value-FILTER oracle (`nemo_kg_sparql_filter`): the parsed query's
    * string comparison is plain lexicographic >= on both engines, the regex
    * a partial match (Spark rlike / DuckDB regexp_matches). */
  def kgSparqlFilter: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT ca.subj AS a, d.obj AS d
       |FROM trip ca
       |JOIN trip d ON d.pred = 'inDoc' AND d.subj = ca.subj
       |WHERE ca.pred = 'category' AND ca.obj = 'PER'
       |  AND d.obj >= 'doc-000100'
       |  AND regexp_matches(d.obj, '[0-4]$$')"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** VALUES oracle (`nemo_kg_sparql_values`): inline data is an IN-list
    * restriction on the bound variable — SQL IN over the same trip CTE. */
  def kgSparqlValues: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT DISTINCT subj AS a, obj AS d FROM trip
       |WHERE pred = 'inDoc'
       |  AND subj IN ('ent:1', 'ent:2', 'ent:3', 'ent:15', 'ent:999999')"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** DESCRIBE oracle (`nemo_kg_sparql_describe`): the description of the
    * PER entities is every triple whose subject or object is one — two
    * IN-subqueries over the same trip CTE, distinct graph out. */
  def kgSparqlDescribe: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |),
       |nodes AS (SELECT DISTINCT subj AS node FROM trip
       |          WHERE pred = 'category' AND obj = 'PER')
       |SELECT DISTINCT t.subj, t.pred, t.obj FROM trip t
       |WHERE t.subj IN (SELECT node FROM nodes)
       |   OR t.obj  IN (SELECT node FROM nodes)"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Lineage-manifest integrity oracle (`nemo_kg_count_meta`): the engine
    * side answers per-predicate COUNT(*) from the store's write-time
    * manifest stats (Sparql's metadata-only fast path — zero table scans);
    * DuckDB recounts the same triples the hard way. Equality proves the
    * manifest's partition_rows ARE the table's true per-predicate counts. */
  def kgCountMeta: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT pred, count(*) AS n FROM trip GROUP BY pred"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Pattern-aggregation oracle (`nemo_kg_degree`): per-entity distinct
    * document count over the inDoc family of the same `trip` CTE. */
  def kgDegree: String =
    s"""${triplesPrefix("")},
       |trip AS (
       |${tripUnionSelect}
       |)
       |SELECT subj AS a, COUNT(DISTINCT obj) AS deg
       |FROM trip WHERE pred = 'inDoc' GROUP BY subj"""
      .stripMargin.replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Shared chain link → star-edge CC closure → per-sentence distinct
    * canonical entities → pairs → exact integer lift, ending in a `cedges`
    * CTE — ONE definition of the co-occurrence edge set, consumed by the
    * cooc oracle and reused as the graph of the salience (PageRank) oracle. */
  private def coocEdgeCtes: String =
    s"""${mentionCtes("morph_forms", "morph_labels")}${linkCtes("morph", "morph")}
${ccClosureCtes}
       |,
       |canon AS (
       |  SELECT DISTINCT l.doc_id, l.sent_id, COALESCE(c.canonical_id, l.entity_id) AS cid
       |  FROM linked l LEFT JOIN comp c ON c.node = l.entity_id
       |),
       |tot AS (SELECT COUNT(*) AS n_sent FROM (SELECT DISTINCT doc_id, sent_id FROM canon)),
       |marg AS (SELECT cid, COUNT(*) AS n_ent FROM canon GROUP BY cid),
       |pairs AS (
       |  SELECT a.cid AS ent_a, b.cid AS ent_b, COUNT(*) AS n_ab
       |  FROM canon a JOIN canon b ON a.doc_id = b.doc_id AND a.sent_id = b.sent_id AND a.cid < b.cid
       |  GROUP BY a.cid, b.cid
       |  HAVING COUNT(*) >= 2
       |),
       |cedges AS (
       |  SELECT * FROM (
       |    SELECT p.ent_a, p.ent_b, p.n_ab, ma.n_ent AS n_a, mb.n_ent AS n_b, t.n_sent,
       |      CAST((CAST(p.n_ab AS HUGEINT) * t.n_sent * 10000) // (CAST(ma.n_ent AS HUGEINT) * mb.n_ent) AS BIGINT) AS lift_bp
       |    FROM pairs p JOIN marg ma ON ma.cid = p.ent_a JOIN marg mb ON mb.cid = p.ent_b, tot t
       |  ) WHERE lift_bp >= 10000
       |)""".stripMargin

  /** Entity co-occurrence edges (kg.Cooccur.edges): replay link → star-edge
    * CC closure → per-sentence distinct canonical entities → pairs → exact
    * integer lift (HUGEINT intermediates mirror Spark's DECIMAL(38,0)). */
  def cooc: String =
    s"$coocEdgeCtes\nSELECT * FROM cedges"
      .replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  /** Entity salience (SparkEntry nemo_salience): fixed-point integer
    * PageRank over the symmetrized co-occurrence graph — the cooc chain's
    * `cedges` becomes the `e(src, dst)` input of the shared unrolled-PR
    * generator. */
  def salience(iterations: Int = 5): String =
    (s"$coocEdgeCtes,\npredge AS (SELECT ent_a AS src, ent_b AS dst FROM cedges)" +
      s"${prIterCtes(iterations, "predge", "pr_")}\nSELECT node AS canonical_id, pr AS salience FROM pr_r$iterations")
      .replaceFirst("WITH s AS", "WITH RECURSIVE s AS")

  def langId: String =
    """WITH m(lang, marker) AS (VALUES
      |  ('en',' the '),('en',' and '),('en',' of '),('en',' is '),('en',' to '),('en','ing '),('en',' that '),
      |  ('de',' der '),('de',' die '),('de',' das '),('de',' und '),('de',' ist '),('de','sch'),('de',' nicht '),
      |  ('fr',' le '),('fr',' la '),('fr',' les '),('fr',' et '),('fr',' est '),('fr',' une '),('fr',' que '),
      |  ('es',' el '),('es',' la '),('es',' los '),('es',' y '),('es',' es '),('es',' que '),('es','ción'),
      |  ('he','של'),('he','את'),('he','הוא'),('he','היא'),('he','אשר')),
      |d AS (SELECT doc_id, ' ' || lower(text) || ' ' AS padded FROM documents),
      |sc AS (SELECT d.doc_id, m.lang, SUM(CASE WHEN contains(d.padded, m.marker) THEN 1 ELSE 0 END) AS score
      |       FROM d CROSS JOIN m GROUP BY d.doc_id, m.lang),
      |best AS (SELECT doc_id, lang FROM (SELECT doc_id, lang,
      |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
      |         FROM sc WHERE score > 0) WHERE rk = 1),
      |pick AS (SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred FROM d LEFT JOIN best b USING (doc_id))
      |SELECT lang_pred, COUNT(*) AS n FROM pick GROUP BY lang_pred""".stripMargin

  /** Distinct 2-gram shingles of whitespace-tokenized lowercase text —
    * Dedup.ngramShinglesCol / shingleStrings semantics. */
  private val ngram2 =
    """CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
      |    WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
      |    ELSE list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) END""".stripMargin

  /** Shingles hashed to 48-bit longs (Dedup.hash48Col — the md5 hex fold h48
    * below replays it) before the all-pairs set math, mirroring the engine. */
  def ngramJaccard: String =
    s"""WITH toks0 AS (
       |  SELECT doc_id AS id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents WHERE doc_id < 500
       |), shs AS (SELECT id, $ngram2 AS sh FROM toks0),
       |nz AS (SELECT id, list_transform(sh, s -> ${h48("s")}) AS sh FROM shs WHERE len(sh) > 0)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  (len(list_intersect(a.sh, b.sh)) * 10000) // len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_bp
       |FROM nz a JOIN nz b ON a.id < b.id
       |WHERE len(list_intersect(a.sh, b.sh)) * 4 >= len(list_distinct(list_concat(a.sh, b.sh)))""".stripMargin

  /** hash48: first 12 md5 hex chars folded to a 48-bit BIGINT — Dedup.hash48. */
  private def h48(s: String) =
    s"list_reduce(list_transform(regexp_extract_all(substr(md5($s),1,12), '.'), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x,y) -> x*16+y)"

  def annIvf: String = {
    def sq(v: String) =
      s"(CAST(ct.cent[j] AS DOUBLE) - CAST($v[j] AS DOUBLE)) * (CAST(ct.cent[j] AS DOUBLE) - CAST($v[j] AS DOUBLE))"
    s"""WITH cents AS (SELECT cell, cent FROM read_parquet('{{AUX}}/ivf_centroids/*.parquet')),
       |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 5),
       |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
       |cd AS (SELECT c.id, c.vec, ct.cell,
       |  list_reduce(list_transform(range(1, len(ct.cent)+1), j -> ${sq("c.vec")}), (a,b) -> a + b) AS d
       |  FROM c CROSS JOIN cents ct),
       |assign AS (SELECT id, vec, cell FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cell) AS rk FROM cd) WHERE rk = 1),
       |qd AS (SELECT q.qid, q.qvec, ct.cell,
       |  list_reduce(list_transform(range(1, len(ct.cent)+1), j -> ${sq("q.qvec")}), (a,b) -> a + b) AS d
       |  FROM q CROSS JOIN cents ct),
       |probe AS (SELECT qid, qvec, cell FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, cell) AS rk FROM qd) WHERE rk <= 4),
       |scored AS (SELECT p.qid, a.id, list_cosine_similarity(a.vec::DOUBLE[], p.qvec::DOUBLE[]) AS cos FROM probe p JOIN assign a USING (cell))
       |SELECT qid, id, rk FROM (SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk FROM scored) WHERE rk <= 3""".stripMargin
  }

  /** PQ ANN replay: re-derive each corpus row's codes (per-subspace argmin
    * over the aux-dumped codebooks, ties to the smallest code — the engine's
    * strict-< convention), then rank by the SAME exact-integer ADC the
    * engine computes: Σ_sub floor(‖q_sub − cent‖² × 2^24) as BIGINT. Both
    * engines fold the per-subspace double distance in array order and sum
    * LONGS across subspaces, so the hash check is bit-stable. Subspace
    * geometry is derived from the aux codebooks themselves (slice offset =
    * sub × len(cent)), so the oracle tracks pqIndex's (dim, m) by
    * construction instead of hardcoding the 8×8 fixture shape. */
  def annPq: String = {
    def sq(v: String) =
      s"(CAST(bk.cent[j] AS DOUBLE) - CAST($v[bk.sub*len(bk.cent) + j] AS DOUBLE)) * (CAST(bk.cent[j] AS DOUBLE) - CAST($v[bk.sub*len(bk.cent) + j] AS DOUBLE))"
    s"""WITH bks AS (SELECT sub, code, cent FROM read_parquet('{{AUX}}/pq_codebooks/*.parquet')),
       |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 5),
       |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
       |enc0 AS (SELECT c.id, bk.sub, bk.code,
       |  list_reduce(list_transform(range(1, len(bk.cent)+1), j -> ${sq("c.vec")}), (a,b) -> a + b) AS d
       |  FROM c CROSS JOIN bks bk),
       |enc AS (SELECT id, sub, code FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id, sub ORDER BY d, code) AS rk FROM enc0) WHERE rk = 1),
       |ad0 AS (SELECT q.qid, e.id,
       |  CAST(floor(list_reduce(list_transform(range(1, len(bk.cent)+1), j -> ${sq("q.qvec")}), (a,b) -> a + b) * 16777216) AS BIGINT) AS df
       |  FROM q CROSS JOIN enc e JOIN bks bk ON bk.sub = e.sub AND bk.code = e.code),
       |adc AS (SELECT qid, id, CAST(SUM(df) AS BIGINT) AS adc FROM ad0 GROUP BY qid, id)
       |SELECT qid, id, adc, rk FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, id) AS rk FROM adc) WHERE rk <= 3""".stripMargin
  }

  /** IVF-PQ composed replay: the annIvf CTEs re-derive the cell assignment
    * and the 4-cell probe set from the aux centroids; the annPq CTEs
    * re-derive each corpus row's codes from the aux codebooks; ADC is then
    * summed ONLY over (qid, id) pairs whose cells were probed — the exact
    * pruning gate ivfPqTopKEncoded puts in the plan. Same exact-integer
    * arithmetic as both parents, so the hash check is bit-stable. */
  /** Recall@k of the IVF result vs the exact top-k: composes the two
    * existing oracles as subqueries (DuckDB allows a WITH inside a derived
    * table) and intersects on (qid, id). Integer per-mille via floor
    * division, matching Spark's `div`. */
  def annRecall: String =
    s"""WITH exact AS (SELECT qid, id FROM ($annTopkSql) ex),
       |approx AS (SELECT qid, id FROM ($annIvf) ap),
       |hits AS (SELECT e.qid, COUNT(*) AS hits FROM exact e JOIN approx a ON e.qid = a.qid AND e.id = a.id GROUP BY e.qid),
       |tot AS (SELECT qid, COUNT(*) AS k FROM exact GROUP BY qid)
       |SELECT t.qid, COALESCE(h.hits, 0) AS hits, t.k,
       |  (COALESCE(h.hits, 0) * 1000) // t.k AS recall_permille
       |FROM tot t LEFT JOIN hits h ON t.qid = h.qid""".stripMargin

  /** The d_ann_topk statement, shared verbatim with [[annRecall]]'s exact arm. */
  val annTopkSql: String =
    """SELECT qid, id, rk FROM (
      |  SELECT q.vec_id AS qid, c.vec_id AS id,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, c.vec_id) AS rk
      |  FROM embeddings c, embeddings q
      |  WHERE q.vec_id < 5 AND c.vec_id >= 5)
      |WHERE rk <= 3""".stripMargin

  /** SQ8 replay (Similarity.sq8Encode/sq8TopKEncoded): re-derive the int8
    * codes from the raw floats (round is half-away-from-zero in BOTH engines,
    * and the scale division is the same IEEE double expression), integer dot,
    * rank by the de-quantized double score with id tiebreak. */
  def annSq8: String = {
    def enc(src: String, idAs: String) =
      s"""SELECT $idAs, CASE WHEN m = 0 THEN 1.0 ELSE m END AS s,
         |    list_transform(vec, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / (CASE WHEN m = 0 THEN 1.0 ELSE m END)) AS BIGINT)) AS cds
         |  FROM (SELECT vec_id, embedding AS vec,
         |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
         |        FROM embeddings WHERE $src)""".stripMargin
    s"""WITH enc AS (${enc("vec_id >= 5", "vec_id AS id")}),
       |qenc AS (${enc("vec_id < 5", "vec_id AS qid")}),
       |dot AS (SELECT q.qid, e.id, q.s AS qs, e.s AS es,
       |    list_reduce(list_transform(range(1, len(e.cds)+1), j -> q.cds[j] * e.cds[j]), (a, b) -> a + b) AS idot
       |  FROM enc e CROSS JOIN qenc q),
       |sc AS (SELECT qid, id, idot, qs * es * idot AS score FROM dot)
       |SELECT qid, id, idot, rk FROM (
       |  SELECT qid, id, idot,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
       |  FROM sc)
       |WHERE rk <= 3""".stripMargin
  }

  def annIvfPq: String = {
    def sqC(v: String) =
      s"(CAST(ct.cent[j] AS DOUBLE) - CAST($v[j] AS DOUBLE)) * (CAST(ct.cent[j] AS DOUBLE) - CAST($v[j] AS DOUBLE))"
    def sqB(v: String) =
      s"(CAST(bk.cent[j] AS DOUBLE) - CAST($v[bk.sub*len(bk.cent) + j] AS DOUBLE)) * (CAST(bk.cent[j] AS DOUBLE) - CAST($v[bk.sub*len(bk.cent) + j] AS DOUBLE))"
    s"""WITH cents AS (SELECT cell, cent FROM read_parquet('{{AUX}}/ivf_centroids/*.parquet')),
       |bks AS (SELECT sub, code, cent FROM read_parquet('{{AUX}}/pq_codebooks/*.parquet')),
       |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 5),
       |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
       |cd AS (SELECT c.id, ct.cell,
       |  list_reduce(list_transform(range(1, len(ct.cent)+1), j -> ${sqC("c.vec")}), (a,b) -> a + b) AS d
       |  FROM c CROSS JOIN cents ct),
       |assign AS (SELECT id, cell FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cell) AS rk FROM cd) WHERE rk = 1),
       |qd AS (SELECT q.qid, q.qvec, ct.cell,
       |  list_reduce(list_transform(range(1, len(ct.cent)+1), j -> ${sqC("q.qvec")}), (a,b) -> a + b) AS d
       |  FROM q CROSS JOIN cents ct),
       |probe AS (SELECT qid, qvec, cell FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, cell) AS rk FROM qd) WHERE rk <= 4),
       |enc0 AS (SELECT c.id, bk.sub, bk.code,
       |  list_reduce(list_transform(range(1, len(bk.cent)+1), j -> ${sqB("c.vec")}), (a,b) -> a + b) AS d
       |  FROM c CROSS JOIN bks bk),
       |enc AS (SELECT id, sub, code FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id, sub ORDER BY d, code) AS rk FROM enc0) WHERE rk = 1),
       |ad0 AS (SELECT p.qid, asg.id,
       |  CAST(floor(list_reduce(list_transform(range(1, len(bk.cent)+1), j -> ${sqB("p.qvec")}), (x,y) -> x + y) * 16777216) AS BIGINT) AS df
       |  FROM probe p JOIN assign asg USING (cell) JOIN enc e ON e.id = asg.id JOIN bks bk ON bk.sub = e.sub AND bk.code = e.code),
       |adc AS (SELECT qid, id, CAST(SUM(df) AS BIGINT) AS adc FROM ad0 GROUP BY qid, id)
       |SELECT qid, id, adc, rk FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, id) AS rk FROM adc) WHERE rk <= 3""".stripMargin
  }

  /** Decoded-media replay: the synthetic encoder (Multimodal.syntheticMedia)
    * writes REAL P6 / WAV / P6-frame bodies whose pixel and sample values are
    * closed-form in the media_ref's tail hex chars — pixel(j) =
    * (3·(j mod perFrame) + seed + j div perFrame) mod 256 with
    * seed = 16·hv2 + hv3 over thumbnail dims (header dims / 8), sample(i) =
    * ((i·(7+hv3) + hv4) mod 65536) − 32768 capped at 2048 samples. The engine
    * DECODES the bodies byte-for-byte (PPM/WAV parsers); this SQL re-derives
    * the same exact-integer feature sums from the ref alone, so a decode that
    * drifts from the encoded content (or silently degrades) hash-fails. */
  def mediaDecode: String =
    s"""WITH g AS (SELECT doc_id, media_ref FROM read_parquet('{{AUX}}/gold_media/*.parquet')),
       |h AS (SELECT doc_id, media_ref,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref), 1)) - 1, 0) % 3 AS code,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 1, 1)) - 1, 0) AS hv2,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 2, 1)) - 1, 0) AS hv3,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 3, 1)) - 1, 0) AS hv4
       |  FROM g),
       |m AS (SELECT doc_id, media_ref, code, hv2, hv3, hv4,
       |  CASE code WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |  CASE WHEN code = 2 THEN 1 + hv2 ELSE 1 END AS frames,
       |  ((64 + 4 * hv3) // 8) * ((64 + 4 * hv4) // 8) * 3 AS per_frame,
       |  16 * hv2 + hv3 AS seed,
       |  least(2048, 1000 * (1 + hv2)) AS ns
       |  FROM h)
       |SELECT doc_id, media_ref, modality, CAST(frames AS INT) AS frames,
       |  TRUE AS decoded,
       |  CAST(CASE WHEN code = 1 THEN 0 ELSE
       |    list_reduce(list_transform(range(0, frames * per_frame),
       |      j -> (3 * (j % per_frame) + seed + (j // per_frame)) % 256), (a,b) -> a + b)
       |  END AS BIGINT) AS px_sum,
       |  CAST(CASE WHEN code = 1 THEN 0 ELSE frames * per_frame END AS BIGINT) AS n_px,
       |  CAST(CASE WHEN code = 1 THEN
       |    list_reduce(list_transform(range(0, ns),
       |      i -> abs(((i * (7 + hv3) + hv4) % 65536) - 32768)), (a,b) -> a + b)
       |  ELSE 0 END AS BIGINT) AS samp_abs_sum,
       |  CAST(CASE WHEN code = 1 THEN ns ELSE 0 END AS BIGINT) AS n_samp
       |FROM m""".stripMargin

  /** Winnow overlap-pair replay (Dedup.winnowOverlapPairs k=3 w=4): the
    * [[winnow]] selection statement feeds a distinct (doc, hash) set, hot
    * hashes are capped at the same bucket bound, ordered pairs counted and
    * gated on the same minShared. */
  def winnowPairs(maxBucket: Int = 64, minShared: Int = 2): String =
    s"""WITH fps AS (SELECT DISTINCT doc_id, fp_hash FROM ($winnow) s),
       |sized AS (SELECT fp_hash FROM fps GROUP BY fp_hash
       |          HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
       |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |      FROM fps a JOIN sized USING (fp_hash) JOIN fps b USING (fp_hash)
       |      WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, COUNT(*) AS n_shared_fps
       |FROM j GROUP BY 1, 2 HAVING COUNT(*) >= $minShared""".stripMargin

  /** Multimodal near-dup replay (Multimodal.mediaNearDuplicates): re-derive
    * each visual payload's 48-bit aHash from the synthetic pixel rule (the
    * [[mediaDecode]] closed form — pixel byte j of frame 0 is
    * (3j + seed) mod 256 over thumbnail dims), sample the same 6×8 grid
    * (y = r·th/6, x = c·tw/8, gray = (R+G+B)//3, bit set iff
    * gray·48 > Σgrays), then replay the 4 × 12-bit Hamming banding with the
    * same bucket cap and exact bit_count verify. */
  def mediaNearDup(maxDist: Int = 3, maxBucket: Int = 64): String =
    s"""WITH g AS (SELECT doc_id, media_ref FROM read_parquet('{{AUX}}/gold_media/*.parquet')),
       |h AS (SELECT doc_id, media_ref,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref), 1)) - 1, 0) % 3 AS code,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 1, 1)) - 1, 0) AS hv2,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 2, 1)) - 1, 0) AS hv3,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 3, 1)) - 1, 0) AS hv4
       |  FROM g),
       |m AS (SELECT doc_id || ':' || media_ref AS id,
       |  (64 + 4 * hv3) // 8 AS tw, (64 + 4 * hv4) // 8 AS th,
       |  16 * hv2 + hv3 AS seed
       |  FROM h WHERE code <> 1),
       |cells AS (SELECT id, r * 8 + c AS bit,
       |    ((r * th) // 6) * tw + ((c * tw) // 8) AS p, seed
       |  FROM m, unnest(generate_series(0, 5)) AS tr(r),
       |          unnest(generate_series(0, 7)) AS tc(c)),
       |grays AS (SELECT id, bit,
       |    ((9 * p + seed) % 256 + (9 * p + 3 + seed) % 256 + (9 * p + 6 + seed) % 256) // 3 AS gray
       |  FROM cells),
       |tot AS (SELECT id, SUM(gray) AS total FROM grays GROUP BY id),
       |hsh AS (SELECT g2.id,
       |    CAST(SUM(CASE WHEN g2.gray * 48 > t.total
       |             THEN (CAST(1 AS BIGINT) << g2.bit) ELSE 0 END) AS BIGINT) AS sim
       |  FROM grays g2 JOIN tot t USING (id) GROUP BY g2.id),
       |mem AS (SELECT id, sim, b AS band, (sim >> (b * 12)) & 4095 AS chunk
       |        FROM hsh, unnest(generate_series(0, 3)) AS t(b)),
       |sized AS (SELECT band, chunk FROM mem GROUP BY band, chunk
       |          HAVING COUNT(*) BETWEEN 2 AND $maxBucket)
       |SELECT DISTINCT m1.id AS id_a, m2.id AS id_b,
       |  CAST(bit_count(xor(m1.sim, m2.sim)) AS INT) AS dist
       |FROM mem m1 JOIN mem m2 USING (band, chunk) JOIN sized USING (band, chunk)
       |WHERE m1.id < m2.id AND bit_count(xor(m1.sim, m2.sim)) <= $maxDist""".stripMargin

  /** Resized-media replay (Multimodal.resizeVisual(dstW, dstH) →
    * extractFeatures): the resize is nearest-neighbor with floor sampling
    * (src y = r·th//dstH, x = c·tw//dstW), so each resized pixel is the
    * closed-form synthetic pixel at the sampled source index — the SQL
    * re-derives every resized frame's exact px_sum from the ref alone.
    * Audio passes through untouched (the [[mediaDecode]] audio branch). */
  def mediaResize(dstW: Int, dstH: Int): String = {
    val pf = dstW * dstH * 3
    val rowB = dstW * 3
    s"""WITH g AS (SELECT doc_id, media_ref FROM read_parquet('{{AUX}}/gold_media/*.parquet')),
       |h AS (SELECT doc_id, media_ref,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref), 1)) - 1, 0) % 3 AS code,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 1, 1)) - 1, 0) AS hv2,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 2, 1)) - 1, 0) AS hv3,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 3, 1)) - 1, 0) AS hv4
       |  FROM g),
       |m AS (SELECT doc_id, media_ref, code, hv2, hv3, hv4,
       |  CASE code WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |  CASE WHEN code = 2 THEN 1 + hv2 ELSE 1 END AS frames,
       |  (64 + 4 * hv3) // 8 AS tw, (64 + 4 * hv4) // 8 AS th,
       |  16 * hv2 + hv3 AS seed,
       |  least(2048, 1000 * (1 + hv2)) AS ns
       |  FROM h)
       |SELECT doc_id, media_ref, modality,
       |  CAST(CASE WHEN code = 1 THEN 0 ELSE $dstW END AS INT) AS width,
       |  CAST(CASE WHEN code = 1 THEN 0 ELSE $dstH END AS INT) AS height,
       |  CAST(frames AS INT) AS frames,
       |  TRUE AS decoded,
       |  CAST(CASE WHEN code = 1 THEN 0 ELSE
       |    list_reduce(list_transform(range(0, frames * $pf),
       |      j -> (3 * ((((((j % $pf) // $rowB) * th) // $dstH) * tw
       |                 + ((((j % $pf) % $rowB) // 3) * tw) // $dstW) * 3
       |                 + (j % 3))
       |            + seed + (j // $pf)) % 256), (a,b) -> a + b)
       |  END AS BIGINT) AS px_sum,
       |  CAST(CASE WHEN code = 1 THEN 0 ELSE frames * $pf END AS BIGINT) AS n_px,
       |  CAST(CASE WHEN code = 1 THEN
       |    list_reduce(list_transform(range(0, ns),
       |      i -> abs(((i * (7 + hv3) + hv4) % 65536) - 32768)), (a,b) -> a + b)
       |  ELSE 0 END AS BIGINT) AS samp_abs_sum,
       |  CAST(CASE WHEN code = 1 THEN ns ELSE 0 END AS BIGINT) AS n_samp
       |FROM m""".stripMargin
  }

  /** Frame-sample replay (Multimodal.sampleFrames(k) → extractFeatures):
    * sampled indices are DISTINCT ⌊i·frames/k⌋ for i < k; each sampled frame
    * becomes a standalone image payload (ref suffixed `#f<idx>`) whose pixel
    * bytes are the closed-form rule at that frame index, so the SQL
    * re-derives each sampled frame's exact px_sum. Audio emits no rows. */
  def mediaFrameSample(k: Int): String =
    s"""WITH g AS (SELECT doc_id, media_ref FROM read_parquet('{{AUX}}/gold_media/*.parquet')),
       |h AS (SELECT doc_id, media_ref,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref), 1)) - 1, 0) % 3 AS code,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 1, 1)) - 1, 0) AS hv2,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 2, 1)) - 1, 0) AS hv3,
       |  greatest(strpos('0123456789abcdef', substr(media_ref, length(media_ref) - 3, 1)) - 1, 0) AS hv4
       |  FROM g),
       |m AS (SELECT doc_id, media_ref,
       |  CASE WHEN code = 2 THEN 1 + hv2 ELSE 1 END AS frames,
       |  (64 + 4 * hv3) // 8 AS tw, (64 + 4 * hv4) // 8 AS th,
       |  ((64 + 4 * hv3) // 8) * ((64 + 4 * hv4) // 8) * 3 AS per_frame,
       |  16 * hv2 + hv3 AS seed
       |  FROM h WHERE code <> 1),
       |s AS (SELECT DISTINCT doc_id, media_ref AS ref0, tw, th, per_frame, seed,
       |  (i * frames) // $k AS fidx
       |  FROM m, unnest(generate_series(0, ${k - 1})) AS t(i))
       |SELECT doc_id, ref0 || '#f' || CAST(fidx AS VARCHAR) AS media_ref,
       |  'image' AS modality,
       |  CAST(tw AS INT) AS width, CAST(th AS INT) AS height,
       |  CAST(1 AS INT) AS frames, TRUE AS decoded,
       |  CAST(list_reduce(list_transform(range(0, per_frame),
       |    j -> (3 * j + seed + fidx) % 256), (a,b) -> a + b) AS BIGINT) AS px_sum,
       |  CAST(per_frame AS BIGINT) AS n_px
       |FROM s""".stripMargin

  def minhashNearDup: String =
    s"""WITH coefs AS (SELECT i, a, b FROM read_parquet('{{AUX}}/minhash_coefs/*.parquet')),
       |toks0 AS (SELECT doc_id AS id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks FROM documents),
       |shs AS (SELECT id, $ngram2 AS sh FROM toks0),
       |hx AS (SELECT id, list_transform(sh, s -> ${h48("s")}) AS hs FROM shs WHERE len(sh) > 0),
       |h1 AS (SELECT id, unnest(hs) AS h FROM hx),
       |sigv AS (SELECT h1.id, c.i,
       |    MIN(CAST(((CAST(c.a >> 32 AS HUGEINT) * h1.h) % 4294967296 * 4294967296
       |          + CAST(c.a & 4294967295 AS HUGEINT) * h1.h + c.b) % 18446744073709551616 AS UBIGINT)) AS mv
       |         FROM h1 CROSS JOIN coefs c GROUP BY h1.id, c.i),
       |sig AS (SELECT id, array_agg(mv ORDER BY i) AS sig FROM sigv GROUP BY id),
       |mem AS (SELECT id, b AS band, sig[b*2+1:b*2+2] AS slice FROM sig, unnest(generate_series(0, 15)) AS t(b)),
       |sized AS (SELECT band, slice FROM mem GROUP BY band, slice HAVING COUNT(*) BETWEEN 2 AND 64),
       |pairs AS (SELECT DISTINCT m1.id AS id_a, m2.id AS id_b
       |          FROM mem m1 JOIN mem m2 USING (band, slice) JOIN sized USING (band, slice) WHERE m1.id < m2.id),
       |v AS (SELECT p.id_a, p.id_b,
       |        len(list_intersect(a.hs, b.hs)) AS inter,
       |        len(list_distinct(list_concat(a.hs, b.hs))) AS uni
       |      FROM pairs p JOIN hx a ON a.id = p.id_a JOIN hx b ON b.id = p.id_b)
       |SELECT id_a, id_b, (inter * 10000) // uni AS jaccard_bp FROM v WHERE inter * 4 >= uni""".stripMargin

  /** SimHash candidate-pair CTE chain (shared by the pair query and the
    * cluster query — identical banding/cap parameters to the engine calls). */
  private def simhashCtes: String =
    s"""WITH t1 AS (SELECT doc_id AS id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS tok FROM documents),
       |th AS (SELECT id, ${h48("tok")} AS h FROM t1),
       |bits AS (SELECT id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
       |         FROM th CROSS JOIN unnest(generate_series(0, 47)) AS t(b) GROUP BY id, b),
       |sim AS (SELECT id, SUM(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS sim FROM bits GROUP BY id),
       |mem AS (SELECT id, sim, b AS band, (sim >> (b*12)) & 4095 AS chunk FROM sim, unnest(generate_series(0, 3)) AS t(b)),
       |sized AS (SELECT band, chunk FROM mem GROUP BY band, chunk HAVING COUNT(*) BETWEEN 2 AND 64),
       |pairs AS (SELECT DISTINCT m1.id AS id_a, m2.id AS id_b, bit_count(xor(m1.sim, m2.sim)) AS dist
       |          FROM mem m1 JOIN mem m2 USING (band, chunk) JOIN sized USING (band, chunk) WHERE m1.id < m2.id)""".stripMargin

  def simhashNearDup: String =
    s"""$simhashCtes
       |SELECT id_a, id_b, dist FROM pairs WHERE dist <= 10""".stripMargin

  /** Fuzzy-dedup clusters: the simhash pair chain + recursive-CTE transitive
    * closure (the same closure shape as the triples oracle) + component min
    * as cluster representative. Replays Dedup.nearDupClusters(maxDist=3 —
    * the banding recall-guarantee zone, so the pair set is exact). */
  def nearDupClusters: String = {
    val body =
      s"""$simhashCtes,
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs WHERE dist <= 3),
         |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
         |reach(node, comp) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node
         |), cmp AS (SELECT node, MIN(comp) AS cluster_rep FROM reach GROUP BY node),
         |sz AS (SELECT cluster_rep, COUNT(*) AS cluster_size FROM cmp GROUP BY cluster_rep)
         |SELECT c.node AS doc_id, c.cluster_rep, s.cluster_size
         |FROM cmp c JOIN sz s USING (cluster_rep)""".stripMargin
    body.replaceFirst("WITH t1 AS", "WITH RECURSIVE t1 AS")
  }

  /** Gopher repetition signals: non-distinct 2-gram multiset per doc, hashed
    * to 48-bit longs (hash48 fold), top-gram and duplicate-gram fractions as
    * integer basis points. Replays TextQuality.repetitionSignals(n=2). */
  def repetitionSignals: String =
    s"""WITH toks0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks FROM documents),
       |g0 AS (SELECT doc_id, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS gs
       |       FROM toks0 WHERE len(toks) >= 2),
       |g1 AS (SELECT doc_id, unnest(gs) AS g FROM g0),
       |g2 AS (SELECT doc_id, ${h48("g")} AS h FROM g1),
       |c AS (SELECT doc_id, h, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, h),
       |a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams, MAX(cnt) AS maxc, COUNT(*) AS ndist FROM c GROUP BY doc_id)
       |SELECT doc_id, n_grams,
       |  (maxc * 10000) // n_grams AS top_gram_bp,
       |  ((n_grams - ndist) * 10000) // n_grams AS dup_gram_bp
       |FROM a""".stripMargin

  /** Stopword list rendered from TextQuality.defaultStopwords — ONE source
    * of truth (an edit there must not silently diverge the oracles). */
  private[graft] def sqlStopwordsList: String = sqlStopwords
  private def sqlStopwords: String =
    graft.datapipe.TextQuality.defaultStopwords.mkString("['", "','", "']")

  /** C4/Gopher composite filter verdict — same rule order and integer
    * thresholds as TextQuality.c4Filter. */
  def c4Filter: String =
    raw"""WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS tot_chars,
      |    CAST(len(list_filter(toks, x -> list_contains($sqlStopwords, x))) AS BIGINT) AS stop_cnt,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS dist_cnt,
      |    CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS BIGINT) AS alpha_chars,
      |    CAST(length(text) AS BIGINT) AS len
      |  FROM (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks FROM documents)
      |), v AS (
      |  SELECT doc_id,
      |    CASE WHEN n IS NULL THEN 'null_text' -- n is null iff text is null
      |         WHEN n < 20 THEN 'too_short'
      |         WHEN tot_chars * 100 < n * 200 THEN 'short_tokens'
      |         WHEN tot_chars * 100 > n * 1200 THEN 'long_tokens'
      |         WHEN stop_cnt = 0 THEN 'no_stopwords'
      |         WHEN dist_cnt * 10000 < n * 2500 THEN 'repetitive'
      |         WHEN alpha_chars * 10000 < len * 6000 THEN 'symbol_soup'
      |         ELSE 'ok' END AS reason
      |  FROM f)
      |SELECT doc_id, reason, CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INT) AS keep FROM v""".stripMargin

  /** Deterministic stratified hash sample: md5-fold bucket of 'sample:doc_id'
    * under a per-language rate (en downsampled 4×) — TextQuality
    * .stratifiedHashSample semantics. */
  /** Epoch-shuffle replay: the same seeded 48-bit hash ("epoch0:" salt),
    * shard = h mod nShards, within-shard (h, id) rank. */
  def shuffleEpoch(nShards: Int = 8): String =
    s"""SELECT doc_id, CAST(h % $nShards AS INT) AS shard,
       |  ROW_NUMBER() OVER (PARTITION BY h % $nShards ORDER BY h, doc_id) AS pos
       |FROM (SELECT doc_id, ${h48("'epoch0:' || CAST(doc_id AS VARCHAR)")} AS h
       |      FROM documents)""".stripMargin

  /** Winnowing replay (Dedup.winnowFingerprints k=3, w=4): token 3-gram
    * 48-bit hashes, 4-wide sliding min with rightmost tie-break via
    * min(struct(h, -pos)), full windows only, distinct selections. */
  def winnow: String =
    s"""WITH seq AS (SELECT doc_id, toks FROM (
       |    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
       |    FROM documents) WHERE len(toks) >= 3),
       |g AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+2], ' ') AS gram
       |      FROM seq, unnest(generate_series(1, len(toks) - 2)) AS t(i)),
       |hx AS (SELECT doc_id, pos, ${h48("gram")} AS hv FROM g),
       |wm AS (SELECT doc_id, pos,
       |    MIN(struct_pack(h := hv, np := -pos)) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
       |  FROM hx)
       |SELECT DISTINCT doc_id, sel.h AS fp_hash, CAST(-sel.np AS INT) AS fp_pos
       |FROM wm WHERE pos >= 3""".stripMargin

  def hashSample: String =
    s"""SELECT doc_id, lang, source
       |FROM documents
       |WHERE ${h48("'sample:' || CAST(doc_id AS VARCHAR)")} % 10000
       |      < CASE WHEN lang = 'en' THEN 500 ELSE 2000 END""".stripMargin

  /** Exact-k per-stratum sample replay: rank by the raw 48-bit sampling
    * hash (ties by key — identical total order to TextQuality.topKByHash),
    * keep rank ≤ k. */
  def exactKSample: String =
    s"""WITH h AS (SELECT lang, doc_id,
       |  ${h48("'sample:' || CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
       |r AS (SELECT lang, doc_id,
       |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS sample_rank FROM h)
       |SELECT lang, doc_id, sample_rank FROM r WHERE sample_rank <= 20""".stripMargin

  /** Cross-doc duplicated 5-grams (exact-substring-dedup signal): distinct
    * per-doc 5-gram hash sets, corpus frequency, shared fraction in basis
    * points — replays Dedup.crossDocDupNgrams(n=5, minDocs=2) incl. the
    * fewer-than-n-tokens whole-text fallback shingle. */
  def crossDocDupNgrams: String =
    s"""WITH t0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(
       |         CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |              ELSE list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' ')) END)) AS g
       |       FROM t0 WHERE len(toks) > 0),
       |h AS (SELECT doc_id, ${h48("g")} AS h FROM sh),
       |freq AS (SELECT h, COUNT(*) AS ndocs FROM h GROUP BY h),
       |j AS (SELECT doc_id, ndocs FROM h JOIN freq USING (h)),
       |a AS (SELECT doc_id, COUNT(*) AS n_grams,
       |        CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_grams
       |      FROM j GROUP BY doc_id)
       |SELECT doc_id, n_grams, shared_grams,
       |  (shared_grams * 10000) // n_grams AS shared_bp FROM a""".stripMargin

  /** PII counts + redacted-text fingerprint over the deterministically
    * augmented text (every 7th doc gets planted email/IP/account-id). Same
    * Java-regex/RE2-agreeing patterns and replacement order as
    * TextQuality.redactPii; DuckDB needs the 'g' flag (Spark replaces all
    * occurrences by default). */
  def piiRedact: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val longId = "\\b\\d{9,}\\b"
    s"""WITH aug AS (
       |  SELECT doc_id, text || CASE WHEN doc_id % 7 = 0
       |    THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.org or 192.168.' ||
       |         CAST(doc_id % 200 AS VARCHAR) || '.3 acct 90000' || CAST(10000 + doc_id % 90000 AS VARCHAR)
       |    ELSE '' END AS text2
       |  FROM documents)
       |, seq AS (
       |  SELECT doc_id, text2,
       |    regexp_replace(text2, '$email', '<EMAIL>', 'g') AS t1
       |  FROM aug
       |), seq2 AS (
       |  SELECT doc_id, text2, t1, regexp_replace(t1, '$ipv4', '<IP>', 'g') AS t2 FROM seq)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text2, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$ipv4')) AS INT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(t2, '$longId')) AS INT) AS n_long_ids,
       |  md5(regexp_replace(t2, '$longId', '<ID>', 'g')) AS redacted_fp
       |FROM seq2""".stripMargin
  }

  /** Composed curation flow: C4 verdict → keep → exact dedup keep-one on the
    * 30-char-prefix fingerprint → deterministic 50% hash sample. Verifies the
    * COMPOSITION of three already-oracled operators. */
  def curationPipeline: String =
    s"""WITH cverdict AS (SELECT * FROM (
       |$c4Filter
       |)),
       |keep AS (SELECT doc_id FROM cverdict WHERE keep = 1),
       |dd AS (SELECT d.doc_id, d.lang, d.source,
       |         ROW_NUMBER() OVER (PARTITION BY md5(substr(d.text, 1, 30)) ORDER BY d.doc_id) AS rk
       |       FROM documents d JOIN keep USING (doc_id))
       |SELECT doc_id, lang, source FROM dd
       |WHERE rk = 1 AND ${h48("'curate:' || CAST(doc_id AS VARCHAR)")} % 10000 < 5000""".stripMargin

  /** Decontamination: distinct 3-grams of candidate docs (doc_id % 20 ≠ 0)
    * vs the reference slice's (doc_id % 20 = 0) distinct gram-hash set —
    * replays Dedup.contaminationCheck(n=3, flagBp=1000) incl. the
    * whole-text fallback shingle for <3-token docs. */
  def decontaminate: String = {
    def gramCte(src: String, name: String) =
      s"""${name}_t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks FROM $src),
         |$name AS (SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END)) AS g
         |  FROM ${name}_t WHERE len(toks) > 0)""".stripMargin
    s"""WITH cand0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
       |ref0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
       |${gramCte("cand0", "cg")},
       |${gramCte("ref0", "rg")},
       |refset AS (SELECT DISTINCT ${h48("g")} AS h FROM rg),
       |ch AS (SELECT doc_id, ${h48("g")} AS h FROM cg),
       |a AS (SELECT c.doc_id, COUNT(*) AS n_grams,
       |        CAST(SUM(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_grams
       |      FROM ch c LEFT JOIN refset r USING (h) GROUP BY c.doc_id)
       |SELECT doc_id, n_grams, contaminated_grams,
       |  (contaminated_grams * 10000) // n_grams AS contaminated_bp,
       |  CAST(CASE WHEN (contaminated_grams * 10000) // n_grams >= 1000 THEN 1 ELSE 0 END AS INT) AS flagged
       |FROM a""".stripMargin
  }

  /** Exact-substring span removal: tokens covered by a cross-doc duplicated
    * 5-gram are cut from the normalized token stream — replays
    * Dedup.removeDuplicateSpans(n=5, minDocs=2). Token indices: DuckDB list
    * lambdas are 1-based, the engine's filter() index is 0-based, hence the
    * i-1 shifts. */
  def dupSpanRemoval: String =
    s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
       |       FROM documents WHERE text IS NOT NULL),
       |g AS (SELECT doc_id, i - 1 AS start, array_to_string(toks[i:i+4], ' ') AS gram
       |      FROM t, unnest(range(1, len(toks) - 3)) AS u(i) WHERE len(toks) >= 5),
       |h AS (SELECT doc_id, start, ${h48("gram")} AS h FROM g),
       |freq AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM h GROUP BY h),
       |ds AS (SELECT doc_id, list(DISTINCT start) AS starts
       |       FROM h JOIN freq USING (h) WHERE ndocs >= 2 GROUP BY doc_id),
       |j AS (SELECT t.doc_id, t.toks, COALESCE(ds.starts, CAST([] AS BIGINT[])) AS starts
       |      FROM t LEFT JOIN ds USING (doc_id))
       |SELECT doc_id,
       |  COALESCE(array_to_string(list_filter(toks, (x, i) ->
       |    len(list_filter(starts, s -> s <= i - 1 AND i - 1 < s + 5)) = 0), ' '), '') AS clean_text,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(len(list_filter(toks, (x, i) ->
       |    len(list_filter(starts, s -> s <= i - 1 AND i - 1 < s + 5)) > 0)) AS INT) AS n_removed
       |FROM j""".stripMargin

  /** Exact per-language token-count percentiles by rank arithmetic
    * (percentile_disc semantics, tie-invariant) — replays
    * TextQuality.tokenLenPercentiles(ps = 50/90/99). */
  def lenPercentiles: String =
    s"""WITH c AS (SELECT lang AS grp, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |           FROM documents),
       |nn AS (SELECT * FROM c WHERE n_tokens IS NOT NULL),
       |r AS (SELECT grp, n_tokens,
       |        ROW_NUMBER() OVER (PARTITION BY grp ORDER BY n_tokens) AS rk,
       |        COUNT(*) OVER (PARTITION BY grp) AS n
       |      FROM nn)
       |SELECT grp, COUNT(*) AS n_docs,
       |  MIN(CASE WHEN rk * 100 >= n * 50 THEN n_tokens END) AS p50,
       |  MIN(CASE WHEN rk * 100 >= n * 90 THEN n_tokens END) AS p90,
       |  MIN(CASE WHEN rk * 100 >= n * 99 THEN n_tokens END) AS p99
       |FROM r GROUP BY grp""".stripMargin

  /** Corpus top-20 vocabulary with deterministic rank. */
  def vocabTopK: String =
    """SELECT tok, n, rk FROM (
      |  SELECT tok, COUNT(*) AS n,
      |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
      |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok FROM documents)
      |  GROUP BY tok)
      |WHERE rk <= 20""".stripMargin

  /** Bigram-LM surprise replay (TextQuality.lmPerplexity): same train slice
    * (48-bit hash bucket < 8000 bp, salt "lmtrain"), same `['<s>'] ++ tokens`
    * sequences, add-one bigram model, µ-log scoring. The log values come
    * from the aux `lm_logtab` — the engine's own floor(1e6·ln n) table — so
    * both sides share ONE log definition; everything downstream of the table
    * lookup is integer arithmetic (difference, sum, floor division). */
  /** The shared CTE chain up to per-pair costs — [[lmPerplexity]] aggregates
    * it per doc; [[pplBuckets]] additionally tiers the aggregate. */
  private def lmScoredCtes: String =
    s"""seqs AS (SELECT doc_id,
       |    list_concat(['<s>'], list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS seq
       |  FROM documents),
       |train AS (SELECT * FROM seqs WHERE ${h48("'lmtrain:' || CAST(doc_id AS VARCHAR)")} % 10000 < 8000),
       |logt AS (SELECT n, l FROM read_parquet('{{AUX}}/lm_logtab/*.parquet')),
       |uni0 AS (SELECT tok, COUNT(*) AS c1 FROM (SELECT unnest(seq) AS tok FROM train) GROUP BY tok),
       |vv AS (SELECT COUNT(*) AS v FROM uni0),
       |uni AS (SELECT tok, l AS lb FROM uni0, vv, logt WHERE logt.n = uni0.c1 + vv.v),
       |tp AS (SELECT seq[i] AS w1, seq[i+1] AS w2 FROM train, unnest(generate_series(1, len(seq)-1)) AS t(i)),
       |bi0 AS (SELECT w1, w2, COUNT(*) AS c2 FROM tp GROUP BY w1, w2),
       |bi AS (SELECT w1, w2, l AS la FROM bi0, logt WHERE logt.n = bi0.c2 + 1),
       |lv AS (SELECT l AS lbv FROM logt, vv WHERE logt.n = vv.v),
       |pairs AS (SELECT doc_id, seq[i] AS w1, seq[i+1] AS w2
       |  FROM seqs, unnest(generate_series(1, len(seq)-1)) AS t(i)),
       |scored AS (SELECT p.doc_id,
       |    COALESCE(u.lb, (SELECT lbv FROM lv)) - COALESCE(b.la, 0) AS cost
       |  FROM pairs p
       |  LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
       |  LEFT JOIN uni u ON p.w1 = u.tok)""".stripMargin

  def lmPerplexity: String =
    s"""WITH $lmScoredCtes
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(cost) AS BIGINT) AS nll_micro,
       |  CAST(SUM(cost) // COUNT(*) AS BIGINT) AS ppl_micro
       |FROM scored GROUP BY doc_id""".stripMargin

  /** CCNet head/middle/tail replay (TextQuality.pplBuckets): the same
    * per-doc ppl_micro as [[lmPerplexity]], joined to lang, then per-lang
    * percentile_disc tertile thresholds by rank arithmetic (t1 = smallest
    * value with 3·rank ≥ n, t2 with 3·rank ≥ 2n) and the ≤-threshold CASE. */
  def pplBuckets: String =
    s"""WITH $lmScoredCtes,
       |ppl AS (SELECT doc_id, CAST(SUM(cost) // COUNT(*) AS BIGINT) AS ppl_micro
       |        FROM scored GROUP BY doc_id),
       |pl AS (SELECT p.doc_id, d.lang, p.ppl_micro
       |       FROM ppl p JOIN documents d USING (doc_id)),
       |rkd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl_micro) AS rk,
       |               COUNT(*) OVER (PARTITION BY lang) AS n FROM pl),
       |thr AS (SELECT lang, MIN(CASE WHEN rk * 3 >= n THEN ppl_micro END) AS t1,
       |               MIN(CASE WHEN rk * 3 >= n * 2 THEN ppl_micro END) AS t2
       |        FROM rkd GROUP BY lang)
       |SELECT pl.doc_id, pl.lang, pl.ppl_micro,
       |  CASE WHEN pl.ppl_micro <= t.t1 THEN 'head'
       |       WHEN pl.ppl_micro <= t.t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM pl JOIN thr t USING (lang)""".stripMargin

  /** Sketch-thresholded CCNet tiers (TextQuality.pplBucketsSketch, sub=5):
    * the same per-doc ppl_micro as [[pplBuckets]], binned with the
    * [[quantileSketch]] log-linear arithmetic (length(bin(v)) octave +
    * linear sub-bucket), per-lang threshold BINS by the same ×3 rank rule
    * over the bin cumsum, and the bin-vs-threshold-bin CASE. */
  def pplBucketsSketch(sub: Int = 5): String = {
    val m = 1L << sub
    s"""WITH $lmScoredCtes,
       |ppl AS (SELECT doc_id, CAST(SUM(cost) // COUNT(*) AS BIGINT) AS ppl_micro
       |        FROM scored GROUP BY doc_id),
       |pl AS (SELECT p.doc_id, d.lang, p.ppl_micro, p.ppl_micro + 1 AS v1
       |       FROM ppl p JOIN documents d USING (doc_id)),
       |b AS (SELECT doc_id, lang, ppl_micro,
       |  CASE WHEN length(bin(v1)) - 1 < $sub THEN v1
       |       ELSE (length(bin(v1)) - $sub) * $m + (v1 >> (length(bin(v1)) - 1 - $sub)) - $m END AS bin
       |  FROM pl),
       |bc AS (SELECT lang, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
       |cum AS (SELECT lang, bin, SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
       |               SUM(cnt) OVER (PARTITION BY lang) AS n FROM bc),
       |thr AS (SELECT lang, MIN(CASE WHEN cum * 3 >= n THEN bin END) AS t1_bin,
       |               MIN(CASE WHEN cum * 3 >= n * 2 THEN bin END) AS t2_bin
       |        FROM cum GROUP BY lang)
       |SELECT b.doc_id, b.lang, b.ppl_micro,
       |  CASE WHEN b.bin <= t.t1_bin THEN 'head'
       |       WHEN b.bin <= t.t2_bin THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM b JOIN thr t USING (lang)""".stripMargin
  }

  /** DSIR importance-weight replay (TextQuality.dsirWeights, target
    * lang='en', B=1024, salt "dsir"): same tokenization, same 48-bit hash
    * buckets, add-one smoothed bucket models; every log value comes from
    * the aux `dsir_logtab` (the engine's own floor(1e6·ln n) table), so
    * downstream is pure integer arithmetic in both engines. */
  def dsirWeights(buckets: Int = 1024): String =
    s"""WITH toks AS (SELECT doc_id, lang = 'en' AS is_tgt,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS tok
       |  FROM documents),
       |bx AS (SELECT doc_id, is_tgt, ${h48("'dsir:' || tok")} % $buckets AS b FROM toks),
       |logt AS (SELECT n, l FROM read_parquet('{{AUX}}/dsir_logtab/*.parquet')),
       |dc AS (SELECT doc_id, is_tgt, b, COUNT(*) AS cnt FROM bx GROUP BY doc_id, is_tgt, b),
       |bc AS (SELECT b, SUM(cnt) AS cr,
       |         SUM(CASE WHEN is_tgt THEN cnt ELSE 0 END) AS ct FROM dc GROUP BY b),
       |tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bc),
       |k AS (SELECT lt.l - lr.l AS k FROM tot, logt lt, logt lr
       |      WHERE lt.n = tot.tt + $buckets AND lr.n = tot.tr + $buckets),
       |lam AS (SELECT bc.b, lt.l - lr.l AS lam FROM bc
       |        JOIN logt lt ON lt.n = bc.ct + 1
       |        JOIN logt lr ON lr.n = bc.cr + 1)
       |SELECT dc.doc_id, CAST(SUM(dc.cnt) AS BIGINT) AS n_tok,
       |  CAST(SUM(dc.cnt * lam.lam) - SUM(dc.cnt) * (SELECT k FROM k) AS BIGINT) AS logw_micro
       |FROM dc JOIN lam ON dc.b = lam.b
       |GROUP BY dc.doc_id""".stripMargin

  def cosineNearDup: String =
    """WITH planes AS (SELECT plane_id, plane FROM read_parquet('{{AUX}}/lsh_planes/*.parquet')),
      |e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
      |dots AS (SELECT e.id, p.plane_id,
      |  list_reduce(list_transform(range(1, len(p.plane)+1), j -> CAST(p.plane[j] AS DOUBLE) * CAST(e.vec[j] AS DOUBLE)), (a,b) -> a + b) AS d
      |  FROM e CROSS JOIN planes p),
      |sig AS (SELECT id, SUM(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << plane_id) ELSE CAST(0 AS BIGINT) END) AS sig FROM dots GROUP BY id),
      |mem AS (SELECT id, b AS band, (sig >> (b*4)) & 15 AS chunk FROM sig, unnest(generate_series(0, 7)) AS t(b)),
      |sized AS (SELECT band, chunk FROM mem GROUP BY band, chunk HAVING COUNT(*) BETWEEN 2 AND 512),
      |pairs AS (SELECT DISTINCT m1.id AS id_a, m2.id AS id_b
      |          FROM mem m1 JOIN mem m2 USING (band, chunk) JOIN sized USING (band, chunk) WHERE m1.id < m2.id)
      |SELECT id_a, id_b FROM pairs p JOIN e a ON a.id = p.id_a JOIN e b ON b.id = p.id_b
      |WHERE round(list_cosine_similarity(a.vec::DOUBLE[], b.vec::DOUBLE[]), 4) >= 0.3""".stripMargin

  /** SemDeDup replay: assignment from the identical aux centroids (same
    * CTE chain as [[annIvf]]), within-cell self-join gated by the 4096 cell
    * cap, smallest-id domination at round-4 cosine ≥ 0.3 — the same double
    * parity as [[cosineNearDup]]. */
  def semDedup: String = {
    def sq(v: String) =
      s"(CAST(ct.cent[j] AS DOUBLE) - CAST($v[j] AS DOUBLE)) * (CAST(ct.cent[j] AS DOUBLE) - CAST($v[j] AS DOUBLE))"
    s"""WITH cents AS (SELECT cell, cent FROM read_parquet('{{AUX}}/ivf_centroids/*.parquet')),
       |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 5),
       |cd AS (SELECT c.id, c.vec, ct.cell,
       |  list_reduce(list_transform(range(1, len(ct.cent)+1), j -> ${sq("c.vec")}), (a,b) -> a + b) AS d
       |  FROM c CROSS JOIN cents ct),
       |assign AS (SELECT id, vec, cell FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cell) AS rk FROM cd) WHERE rk = 1),
       |sz AS (SELECT cell, COUNT(*) AS csz FROM assign GROUP BY cell),
       |dom AS (SELECT DISTINCT b.id
       |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.id < b.id
       |  JOIN sz ON sz.cell = a.cell AND sz.csz BETWEEN 2 AND 4096
       |  WHERE round(list_cosine_similarity(a.vec::DOUBLE[], b.vec::DOUBLE[]), 4) >= 0.3)
       |SELECT a.id AS vec_id, a.cell, (dom.id IS NULL) AS kept
       |FROM assign a LEFT JOIN dom ON dom.id = a.id""".stripMargin
  }

  /** Shared CTE prologue for the full-BPE oracles: word frequencies, wrapped
    * initial state, and `n` unrolled (pairs → argmax → merge-apply) rounds.
    * State is a SENTINEL-WRAPPED string per word (`␂tok␃␂tok␃…`, sentinels
    * U+2402/U+2403, filtered out of the corpus symmetrically with the
    * engine): merge application is then plain `replace` of `␂a␃␂b␃` with
    * `␂ab␃` — non-overlapping left-to-right in both engines, which IS the
    * BPE merge semantic ([a,a,a] → [aa,a]); pair COUNTS (from the split
    * token list) include overlapping adjacents ([a,a,a] counts (a,a) twice).
    * Ties break on (cnt DESC, a, b) in binary UTF-8 order, identical to the
    * engine's orderBy. */
  private def bpeTrainCtes(n: Int): String = {
    val L = "␂"; val R = "␃"
    val rounds = (1 to n).map { k =>
      s"""t$k AS (SELECT string_split(trim(ws, '$L$R'), '$R$L') AS toks, freq FROM s${k - 1}),
         |p$k AS (SELECT toks[i] AS a, toks[i + 1] AS b, freq FROM t$k, UNNEST(range(1, len(toks))) AS u(i)),
         |m$k AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM p$k GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
         |s$k AS (SELECT replace(ws, '$L' || m.a || '$R$L' || m.b || '$R', '$L' || m.a || m.b || '$R') AS ws, freq FROM s${k - 1}, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS w FROM documents),
       |wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM w0
       |       WHERE strpos(w, '$L') = 0 AND strpos(w, '$R') = 0 GROUP BY w),
       |s0 AS (SELECT regexp_replace(w, '(.)', '$L\\1$R', 'g') AS ws, freq FROM wf),
       |$rounds""".stripMargin
  }

  /** Full BPE trainer replay: `n` unrolled merge rounds; the result is the
    * ordered merge table itself. */
  def bpeTrain(n: Int = 8): String =
    s"""${bpeTrainCtes(n)}
       |SELECT step, a, b, a || b AS merged, cnt FROM (
       |${(1 to n).map(k => s"  SELECT $k AS step, a, b, cnt FROM m$k").mkString("\n  UNION ALL\n")}
       |) ORDER BY step""".stripMargin

  /** BPE ENCODE replay: apply the n trained merges (in order) to every
    * document's words, count resulting tokens per doc. */
  def bpeSegment(n: Int = 8): String = {
    val L = "␂"; val R = "␃"
    val segs = (1 to n).map { k =>
      s"""g$k AS (SELECT doc_id, list_transform(wss, ws ->
         |  replace(ws, '$L' || m.a || '$R$L' || m.b || '$R', '$L' || m.a || m.b || '$R')) AS wss
         |  FROM g${k - 1}, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""${bpeTrainCtes(n)},
       |g0 AS (SELECT doc_id, list_transform(
       |    list_filter(string_split_regex(lower(text), '\\s+'),
       |      t -> t <> '' AND strpos(t, '$L') = 0 AND strpos(t, '$R') = 0),
       |    w -> regexp_replace(w, '(.)', '$L\\1$R', 'g')) AS wss FROM documents),
       |$segs
       |SELECT doc_id, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(wss, ws -> CAST(len(string_split(trim(ws, '$L$R'), '$R$L')) AS BIGINT))),
       |  (acc, x) -> acc + x) AS BIGINT) AS n_bpe_tokens
       |FROM g$n""".stripMargin
  }

  /** BPE merge-pair replay: word frequencies over whitespace tokens, then
    * adjacent char-pair counts weighted by word freq — substr is
    * character-based in both engines for BMP text. */
  def bpeMergePairs: String =
    """WITH w0 AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS w FROM documents),
      |wf AS (SELECT w, COUNT(*) AS freq FROM w0 WHERE length(w) >= 2 GROUP BY w),
      |p AS (SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, freq FROM wf),
      |pc AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM p GROUP BY pair)
      |SELECT pair, cnt, rk FROM (
      |  SELECT pair, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rk FROM pc)
      |WHERE rk <= 20""".stripMargin

  /** 64-bit wraparound polynomial hash + splitmix64 finalizer, replayed in SQL
    * via INT128 arithmetic mod 2^64 (products split into 32-bit halves so the
    * INT128 multiply never overflows). Matches graft.functions.PolyHash64. */
  def fingerprintPoly: String =
    """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
      |f AS (SELECT doc_id,
      |  CAST(list_reduce(
      |    list_prepend(CAST(1125899906842597 AS HUGEINT),
      |      list_transform(regexp_extract_all(norm, '.'), c -> CAST(unicode(c) AS HUGEINT))),
      |    (h, c) -> (31 * h + c) % 18446744073709551616) AS UBIGINT) AS h
      |  FROM n),
      |s1 AS (SELECT doc_id, CAST((CAST(h AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM f),
      |s1x AS (SELECT doc_id, xor(z, z >> 30) AS z FROM s1),
      |s2 AS (SELECT doc_id, CAST((
      |    ((CAST(z >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296
      |    + CAST(z & 4294967295 AS HUGEINT) * 13787848793156543929
      |  ) % 18446744073709551616 AS UBIGINT) AS z FROM s1x),
      |s2x AS (SELECT doc_id, xor(z, z >> 27) AS z FROM s2),
      |s3 AS (SELECT doc_id, CAST((
      |    ((CAST(z >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296
      |    + CAST(z & 4294967295 AS HUGEINT) * 10723151780598845931
      |  ) % 18446744073709551616 AS UBIGINT) AS z FROM s2x),
      |s4 AS (SELECT doc_id, xor(z, z >> 31) AS z FROM s3)
      |SELECT doc_id, CAST(CASE WHEN z >= 9223372036854775808 THEN CAST(z AS HUGEINT) - 18446744073709551616 ELSE CAST(z AS HUGEINT) END AS BIGINT) AS fp64
      |FROM s4""".stripMargin

  /** Mixture-plan replay (datapipe.Mix): per-stratum token stats joined with
    * the weight table, rendered as a VALUES literal from the SAME Map the
    * engine query uses (no hand-synced duplicate). */
  private def mixWeightsValues(weights: Map[String, Long]): String =
    weights.toSeq.sorted.map { case (s, w) => s"('$s', $w)" }.mkString(", ")

  private def mixCtes(budget: Long, weights: Map[String, Long]): String =
    s"""WITH stats AS (
       |  SELECT lang AS stratum, COUNT(*) AS n_docs,
       |    CAST(SUM(COALESCE(len(string_split_regex(trim(text), '\\s+')), 0)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang
       |), w(stratum, target_bp) AS (VALUES ${mixWeightsValues(weights)}),
       |p AS (
       |  SELECT s.stratum, s.n_docs, s.n_tokens, CAST(w.target_bp AS BIGINT) AS target_bp,
       |    CAST(($budget * w.target_bp) // 10000 AS BIGINT) AS desired_tokens
       |  FROM stats s JOIN w USING (stratum)
       |), pl AS (
       |  SELECT stratum, n_docs, n_tokens, target_bp, desired_tokens,
       |    CASE WHEN n_tokens = 0 THEN 10000
       |         ELSE LEAST(10000, (desired_tokens * 10000) // n_tokens) END AS rate_bp,
       |    CASE WHEN n_tokens = 0 THEN 0
       |         ELSE (n_tokens * LEAST(10000, (desired_tokens * 10000) // n_tokens)) // 10000 END AS planned_tokens,
       |    CASE WHEN desired_tokens > n_tokens THEN 1 ELSE 0 END AS capped
       |  FROM p)""".stripMargin

  def mixPlan(budget: Long, weights: Map[String, Long]): String =
    s"""${mixCtes(budget, weights)}
       |SELECT stratum, n_docs, n_tokens, target_bp, desired_tokens, rate_bp, planned_tokens, capped FROM pl""".stripMargin

  def mixApply(budget: Long, weights: Map[String, Long]): String =
    s"""${mixCtes(budget, weights)}
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN pl ON pl.stratum = d.lang
       |WHERE ${h48("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 10000 < pl.rate_bp""".stripMargin

  /** Per-doc sequence-packing manifest (Pack.concatChunks): the engine's
    * two-level prefix sum is replayed here as ONE global window cumsum —
    * identical integers, different execution shape. Window SUM over BIGINT
    * yields HUGEINT in DuckDB → cast back. */
  private def packManifestCtes(capacity: Long): String =
    s"""WITH c AS (
       |  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), nz AS (SELECT * FROM c WHERE n_tokens > 0),
       |o AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
       |  FROM nz),
       |m AS (
       |  SELECT doc_id, n_tokens, tok_offset,
       |    tok_offset // $capacity AS chunk_first,
       |    (tok_offset + n_tokens - 1) // $capacity AS chunk_last,
       |    (tok_offset + n_tokens - 1) // $capacity - tok_offset // $capacity + 1 AS chunks_spanned
       |  FROM o)""".stripMargin

  def packChunks(capacity: Long = 2048L): String =
    s"""${packManifestCtes(capacity)}
       |SELECT doc_id, n_tokens, tok_offset, chunk_first, chunk_last, chunks_spanned FROM m""".stripMargin

  def packFill(capacity: Long = 2048L): String =
    s"""${packManifestCtes(capacity)}
       |SELECT chunk_id, COUNT(*) AS n_docs, CAST(SUM(tokens_in_chunk) AS BIGINT) AS tokens_filled FROM (
       |  SELECT g.chunk_id,
       |    LEAST(m.tok_offset + m.n_tokens, (g.chunk_id + 1) * $capacity)
       |      - GREATEST(m.tok_offset, g.chunk_id * $capacity) AS tokens_in_chunk
       |  FROM m, unnest(generate_series(m.chunk_first, m.chunk_last)) AS g(chunk_id)
       |) GROUP BY chunk_id""".stripMargin

  /** Fixed-point integer PageRank (kg.PageRank.run) over the symmetrized
    * order–part graph, iterations unrolled as chained CTEs. All-integer
    * (scale 10⁶, truncating //) so both engines agree bit-for-bit; SUM and
    * 85·x arithmetic pass through HUGEINT and are cast back per iteration. */
  /** Symmetrize + verts/outdeg + k unrolled integer-PR iterations over a
    * previously defined CTE `<edgeCte>(src, dst)`. Starts with "," — appends
    * to the caller's CTE list (the name is a parameter because the cooc
    * closure chain already owns the name `e`). */
  private def prIterCtes(iterations: Int, edgeCte: String = "e",
                         p: String = ""): String = {
    // `p` prefixes every CTE this generator introduces, so it can be
    // appended to chains (like the cooc closure) that already use the
    // unprefixed names sym/verts/e
    val head =
      s""",
         |${p}sym AS (SELECT src, dst FROM $edgeCte UNION SELECT dst AS src, src AS dst FROM $edgeCte),
         |${p}verts AS (SELECT DISTINCT src AS node FROM ${p}sym),
         |${p}outdeg AS (SELECT src AS node, COUNT(*) AS deg FROM ${p}sym GROUP BY src),
         |${p}r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM ${p}verts)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",
         |${p}r$k AS (
         |  SELECT v.node, CAST(150000 + (85 * COALESCE(inc.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM ${p}verts v LEFT JOIN (
         |    SELECT y.dst AS node, SUM(p.pr // o.deg) AS s
         |    FROM ${p}sym y JOIN ${p}r${k - 1} p ON p.node = y.src JOIN ${p}outdeg o ON o.node = y.src
         |    GROUP BY y.dst) inc ON inc.node = v.node)""".stripMargin
    }.mkString
    head + iters
  }

  def pageRank(iterations: Int = 5): String = {
    val e =
      """WITH e AS (
        |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS src, CAST(l_partkey AS BIGINT) + 100000000 AS dst FROM lineitem
        |)""".stripMargin
    s"$e${prIterCtes(iterations)}\nSELECT node, pr FROM r$iterations"
  }

  /** k-core replay: the engine's fixed 3 peel rounds unrolled as CTEs (the
    * PageRank/LPA convention). Round 1's alive set is all vertices, so d1
    * runs over the raw symmetrized graph; each later round recomputes
    * degrees over the previous alive set's induced subgraph; the output is
    * the round-3 survivors' induced degrees. */
  def kcore: String =
    """WITH pp AS (
      |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS pa, CAST(b.l_partkey AS BIGINT) AS pb
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  WHERE a.l_partkey < 10000 AND b.l_partkey < 10000
      |),
      |sym AS (SELECT pa AS u, pb AS v FROM pp UNION ALL SELECT pb, pa FROM pp),
      |d1 AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY u),
      |a1 AS (SELECT u FROM d1 WHERE d >= 3),
      |e2 AS (SELECT s.u, s.v FROM sym s JOIN a1 x ON s.u = x.u JOIN a1 y ON s.v = y.u),
      |d2 AS (SELECT u, COUNT(*) AS d FROM e2 GROUP BY u),
      |a2 AS (SELECT u FROM d2 WHERE d >= 3),
      |e3 AS (SELECT s.u, s.v FROM sym s JOIN a2 x ON s.u = x.u JOIN a2 y ON s.v = y.u),
      |d3 AS (SELECT u, COUNT(*) AS d FROM e3 GROUP BY u),
      |a3 AS (SELECT u FROM d3 WHERE d >= 3),
      |e4 AS (SELECT s.u, s.v FROM sym s JOIN a3 x ON s.u = x.u JOIN a3 y ON s.v = y.u)
      |SELECT u AS node, COUNT(*) AS core_deg FROM e4 GROUP BY u""".stripMargin

  /** Per-node triangle counts (kg.Triangles.perNodeCounts) over the
    * part–part co-purchase graph: degree-ordered orientation (ties on id) +
    * wedge closure — the same unique a→b→c enumeration as the engine, so
    * counts hash-match exactly. */
  def triangleCount: String =
    """WITH pp AS (
      |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS pa, CAST(b.l_partkey AS BIGINT) AS pb
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  WHERE a.l_partkey < 10000 AND b.l_partkey < 10000
      |),
      |deg AS (SELECT node, COUNT(*) AS d FROM (SELECT pa AS node FROM pp UNION ALL SELECT pb FROM pp) GROUP BY node),
      |oe AS (
      |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pa < pb) THEN pa ELSE pb END AS u,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND pa < pb) THEN pb ELSE pa END AS v
      |  FROM pp JOIN deg da ON da.node = pa JOIN deg db ON db.node = pb),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM oe e1 JOIN oe e2 ON e2.u = e1.v
      |  JOIN oe e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT node, COUNT(*) AS n_tri FROM (
      |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
      |) GROUP BY node""".stripMargin

  /** Common-neighbor link prediction (kg.LinkPredict.commonNeighbors) over
    * the part–part co-purchase graph: capped-pivot wedge enumeration,
    * non-edge anti join, full-degree integer Jaccard — identical pair
    * algebra to the engine, so the score columns hash-match. */
  def linkPredict: String =
    """WITH pp AS (
      |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS pa, CAST(b.l_partkey AS BIGINT) AS pb
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  WHERE a.l_partkey < 10000 AND b.l_partkey < 10000
      |),
      |deg AS (SELECT node, COUNT(*) AS d FROM (SELECT pa AS node FROM pp UNION ALL SELECT pb AS node FROM pp) GROUP BY node),
      |adj AS (SELECT pa AS v, pb AS n FROM pp UNION ALL SELECT pb AS v, pa AS n FROM pp),
      |ok AS (SELECT node FROM deg WHERE d <= 100),
      |cand AS (
      |  SELECT a.n AS x, b.n AS y, COUNT(*) AS cn
      |  FROM adj a JOIN ok ON ok.node = a.v JOIN adj b ON a.v = b.v AND a.n < b.n
      |  GROUP BY a.n, b.n HAVING COUNT(*) >= 8),
      |ne AS (SELECT c.x, c.y, c.cn FROM cand c LEFT JOIN pp ON pp.pa = c.x AND pp.pb = c.y WHERE pp.pa IS NULL)
      |SELECT ne.x, ne.y, ne.cn, dx.d AS d_x, dy.d AS d_y,
      |  CAST(ne.cn * 10000 // (dx.d + dy.d - ne.cn) AS BIGINT) AS jaccard_bp
      |FROM ne JOIN deg dx ON dx.node = ne.x JOIN deg dy ON dy.node = ne.y""".stripMargin

  /** Inverted-index tf·idf top-k (datapipe.InvertedIndex.searchTopK): the
    * probe-query VALUES are generated from InvertedIndex.fixtureQueries —
    * one source of truth with the engine. Integer idf (N·10⁴ // df), rank
    * by (score DESC, doc_id). */
  def invIdxTopK: String = {
    val vals = graft.datapipe.InvertedIndex.fixtureQueries
      .map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS term FROM documents),
       |post AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |q(query_id, term) AS (VALUES $vals),
       |dft AS (SELECT term, COUNT(*) AS df FROM post WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |sc AS (
       |  SELECT q.query_id, p.doc_id, CAST(SUM(p.tf * ((n.n_docs * 10000) // d.df)) AS BIGINT) AS score
       |  FROM q JOIN post p ON p.term = q.term JOIN dft d ON d.term = q.term, n
       |  GROUP BY 1, 2)
       |SELECT query_id, doc_id, score, rk FROM (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk FROM sc)
       |WHERE rk <= 10""".stripMargin
  }

  /** Okapi BM25 replay (InvertedIndex.searchBM25, k1 = 6/5, b = 3/4,
    * Lucene idf): same postings/df, per-doc lengths from Σ tf, pre-truncated
    * nd_bp = (dl·10⁴·N) // S, idf_micro = L(2N+2) − L(2df+1) from the aux
    * `bm25_logtab` (the engine's own floor(1e6·ln n) values), and the
    * cleared-fraction weight (idf·440000·tf) // (200000·tf + 60000 +
    * 18·nd_bp) — every operand non-negative, so truncating and flooring
    * division agree. */
  def bm25TopK: String = {
    val vals = graft.datapipe.InvertedIndex.fixtureQueries
      .map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS term FROM documents),
       |post AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1),
       |stot AS (SELECT CAST(SUM(dl) AS BIGINT) AS s FROM dl),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |nd AS (SELECT doc_id, CAST((CAST(dl.dl AS HUGEINT) * 10000 * n.n_docs) // stot.s AS BIGINT) AS nd_bp
       |       FROM dl CROSS JOIN stot CROSS JOIN n),
       |q(query_id, term) AS (VALUES $vals),
       |logt AS (SELECT n, l FROM read_parquet('{{AUX}}/bm25_logtab/*.parquet')),
       |dft AS (SELECT term, COUNT(*) AS df FROM post WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |idf AS (SELECT dft.term, lc.l - lt.l AS idf_micro
       |        FROM dft CROSS JOIN n
       |        JOIN logt lt ON lt.n = 2 * dft.df + 1
       |        JOIN logt lc ON lc.n = 2 * n.n_docs + 2),
       |sc AS (
       |  SELECT q.query_id, p.doc_id,
       |    CAST(SUM((i.idf_micro * 440000 * p.tf) // (200000 * p.tf + 60000 + 18 * nd.nd_bp)) AS BIGINT) AS score
       |  FROM q JOIN post p ON p.term = q.term
       |  JOIN idf i ON i.term = q.term
       |  JOIN nd ON nd.doc_id = p.doc_id
       |  GROUP BY 1, 2)
       |SELECT query_id, doc_id, score, rk FROM (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk FROM sc)
       |WHERE rk <= 10""".stripMargin
  }

  /** Multi-source BFS replay (kg.Bfs.levels over the co-purchase graph,
    * seeds = parts ≡ 0 mod 997): a level-capped recursive CTE discovers
    * every (node, level) pair reachable within the cap; MIN(level) is the
    * hop distance — exactly the frontier iteration's first-discovery
    * round. */
  def bfsLevels(maxRounds: Int): String =
    s"""WITH RECURSIVE pp AS (
       |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS pa, CAST(b.l_partkey AS BIGINT) AS pb
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  WHERE a.l_partkey < 10000 AND b.l_partkey < 10000
       |),
       |sym AS (SELECT pa AS src, pb AS dst FROM pp UNION ALL SELECT pb, pa FROM pp),
       |seeds AS (SELECT CAST(p_partkey AS BIGINT) AS id FROM part
       |          WHERE p_partkey % 997 = 0 AND p_partkey < 10000),
       |bfs(id, level) AS (
       |  SELECT id, 0 FROM seeds
       |  UNION
       |  SELECT e.dst, b.level + 1 FROM bfs b JOIN sym e ON e.src = b.id
       |  WHERE b.level < $maxRounds
       |)
       |SELECT id, CAST(MIN(level) AS INT) AS level FROM bfs GROUP BY id""".stripMargin

  /** Leakage-safe split replay (TextQuality.leakageSafeSplit on source):
    * the same 48-bit "split:" salted hash of the GROUP, bucketed to 10⁴,
    * test < testBp ≤ val < testBp+valBp ≤ train. */
  def splitLeakage(valBp: Int, testBp: Int): String =
    s"""SELECT doc_id, source,
       |  CASE WHEN h < $testBp THEN 'test'
       |       WHEN h < ${testBp + valBp} THEN 'val'
       |       ELSE 'train' END AS split
       |FROM (SELECT doc_id, source, ${h48("'split:' || source")} % 10000 AS h
       |      FROM documents)""".stripMargin

  /** Reciprocal-rank-fusion replay (InvertedIndex.rrfFuse of the BM25 and
    * tf·idf top-10 rankings): each system's full replay rides as a nested-
    * WITH CTE subquery; contributions are the same integer
    * `1000000 // (k + rk)`, fused ties break on doc_id. */
  def hybridRrf(k: Int, topK: Int): String =
    s"""WITH a AS ($bm25TopK),
       |b AS ($invIdxTopK),
       |u AS (SELECT query_id, doc_id, 1000000 // ($k + rk) AS c FROM a
       |      UNION ALL
       |      SELECT query_id, doc_id, 1000000 // ($k + rk) AS c FROM b),
       |f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_micro
       |      FROM u GROUP BY 1, 2)
       |SELECT query_id, doc_id, score_micro, rk FROM (
       |  SELECT query_id, doc_id, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rk
       |  FROM f)
       |WHERE rk <= $topK""".stripMargin

  /** Per-domain triage replay (TextQuality.domainStats on source, prefix
    * fingerprint): corpus-wide fingerprint multiplicities, per-group doc and
    * token mass, short-doc and dup-doc counts, basis-point fractions with
    * flooring division on non-negatives. */
  def domainStats(shortTokens: Int): String =
    s"""WITH d AS (SELECT source AS grp, md5(substr(text, 1, 30)) AS fp,
       |    COALESCE(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 0) AS n_tok
       |  FROM documents),
       |m AS (SELECT fp, COUNT(*) AS fp_n FROM d GROUP BY fp),
       |g AS (SELECT grp, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens,
       |        SUM(CASE WHEN m.fp_n >= 2 THEN 1 ELSE 0 END) AS dup_docs,
       |        SUM(CASE WHEN d.n_tok < $shortTokens THEN 1 ELSE 0 END) AS short_docs
       |      FROM d JOIN m USING (fp) GROUP BY grp)
       |SELECT grp AS source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_tokens // n_docs AS BIGINT) AS mean_tokens,
       |  CAST(dup_docs AS BIGINT) AS dup_docs,
       |  CAST((dup_docs * 10000) // n_docs AS BIGINT) AS dup_bp,
       |  CAST(short_docs AS BIGINT) AS short_docs,
       |  CAST((short_docs * 10000) // n_docs AS BIGINT) AS short_bp
       |FROM g""".stripMargin

  /** HyperLogLog replay (datapipe.Sketch.hllDistinct, p=8): identical
    * hash48 → register/rank-window split → max(v & −v) registers →
    * exact-integer raw estimate in HUGEINT. The α constant is interpolated
    * from Sketch.alphaScaled, so the two engines share one source of truth. */
  /** KMV overlap replay: the engine's bounded-state custom aggregate equals
    * `ORDER BY hash LIMIT k` over distinct hashes (a pure function of the
    * input set), and the union/intersection estimators are exact integer
    * arithmetic — 2^48·(k−1) // h_(k), shared·union_est // k′ — identical
    * floor divisions in both engines. Tokenization mirrors the minhash
    * oracle (lower + split on \\s+ + drop empties). */
  def kmvOverlap: String = {
    val k = 128
    val twoP48 = 1L << 48
    s"""WITH w AS (SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS wd
       |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
       |h AS (SELECT DISTINCT source, ${h48("wd")} AS h FROM w),
       |r AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk FROM h),
       |kmv AS (SELECT source, array_agg(h ORDER BY h) AS kmv FROM r WHERE rk <= $k GROUP BY source),
       |p AS (SELECT a.source AS grp_a, b.source AS grp_b, a.kmv AS ka, b.kmv AS kb
       |      FROM kmv a JOIN kmv b ON a.source < b.source),
       |u0 AS (SELECT grp_a, grp_b, ka, kb,
       |        list_sort(list_distinct(list_concat(ka, kb)))[1:$k] AS u FROM p),
       |c AS (SELECT grp_a, grp_b, ka, kb, u,
       |        CAST(len(u) AS BIGINT) AS k2,
       |        CAST(len(list_intersect(list_intersect(u, ka), kb)) AS BIGINT) AS shared
       |      FROM u0),
       |e AS (SELECT grp_a, grp_b, k2, shared,
       |        CASE WHEN k2 < $k THEN k2
       |             ELSE CAST($twoP48 AS BIGINT) * ${k - 1} // u[CAST(k2 AS INT)] END AS union_est
       |      FROM c)
       |SELECT grp_a, grp_b, union_est, shared,
       |  shared * union_est // k2 AS inter_est,
       |  shared * 10000 // k2 AS jaccard_bp
       |FROM e""".stripMargin
  }

  def hllDistinct: String = {
    val p = 8
    val m = 1L << p
    val sentinel = 1L << (48 - p) // marks the all-zero rank window
    val contrib = 1L << 44        // 2^(A-1), A = 45
    val empty = 1L << 45          // 2^A: contribution of an empty register
    val num = (BigInt(graft.datapipe.Sketch.alphaScaled(p)) * m * m * (BigInt(1) << 45)).toString
    s"""WITH k AS (SELECT event_type,
       |  user_id || ':' || (epoch_us(ts) // 86400000000) AS key FROM events),
       |h AS (SELECT event_type, ${h48("key")} AS h FROM k),
       |r AS (SELECT event_type, h % $m AS reg, ((h // $m) | $sentinel) AS v FROM h),
       |l AS (SELECT event_type, reg, MAX(v & (-v)) AS maxl FROM r GROUP BY 1, 2),
       |s AS (SELECT event_type, SUM($contrib // maxl) AS sp, COUNT(*) AS present FROM l GROUP BY 1)
       |SELECT event_type,
       |  CAST(CAST($num AS HUGEINT)
       |    // (CAST(sp + ($m - present) * $empty AS HUGEINT) * ${graft.datapipe.Sketch.alphaDen}) AS BIGINT) AS hll_est
       |FROM s""".stripMargin
  }

  /** Quantile-histogram replay (datapipe.Sketch.qhPercentiles, sub=5 over
    * documents.n_chars by lang): identical log-linear bins via
    * length(bin(v)) — the minimal binary string both engines print for a
    * positive integer — window cumsum over bins, ⌈n·q/10⁴⌉ rank pick, and
    * the bin-lower-bound inverse. Pure integer end-to-end. */
  def quantileSketch: String = {
    val sub = 5
    val m = 1L << sub
    s"""WITH v AS (SELECT lang, CAST(n_chars AS BIGINT) + 1 AS v1 FROM documents),
       |b AS (SELECT lang,
       |  CASE WHEN length(bin(v1)) - 1 < $sub THEN v1
       |       ELSE (length(bin(v1)) - $sub) * $m + (v1 >> (length(bin(v1)) - 1 - $sub)) - $m END AS bin
       |  FROM v),
       |bc AS (SELECT lang, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
       |cum AS (SELECT lang, bin, SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM bc),
       |tot AS (SELECT lang, SUM(cnt) AS n FROM bc GROUP BY 1),
       |qs AS (SELECT unnest([2500, 5000, 7500, 9500, 9900]) AS q_bp),
       |hit AS (SELECT c.lang, q.q_bp, MIN(c.bin) AS bin, MIN(tot.n) AS n
       |  FROM cum c JOIN tot USING (lang) CROSS JOIN qs q
       |  WHERE c.cum * 10000 >= tot.n * q.q_bp
       |  GROUP BY 1, 2)
       |SELECT lang, q_bp, CAST(n AS BIGINT) AS n,
       |  CAST(CASE WHEN bin < $m THEN bin - 1
       |       ELSE (($m + (bin % $m)) << (CAST(bin // $m AS INT) - 1)) - 1 END AS BIGINT) AS est
       |FROM hit""".stripMargin
  }

  /** Deterministic synchronous label propagation (kg.LabelProp.run),
    * iterations unrolled as chained CTEs over a previously defined CTE
    * `<edgeCte>(src, dst)`: symmetrize, self-labels, then per round a
    * (vertex, neighbor-label) count and an argmax by (count DESC, label
    * ASC) — identical tie-break to the engine's max(struct(c, −lab)). */
  private def lpIterCtes(iterations: Int, edgeCte: String = "e"): String = {
    val head =
      s""",
         |lsym AS (SELECT src, dst FROM $edgeCte UNION SELECT dst AS src, src AS dst FROM $edgeCte),
         |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM lsym)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",
         |lc$k AS (SELECT y.dst AS node, p.lab, COUNT(*) AS c
         |  FROM lsym y JOIN l${k - 1} p ON p.node = y.src GROUP BY 1, 2),
         |l$k AS (SELECT node, lab FROM (
         |  SELECT node, lab, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rk FROM lc$k)
         |  WHERE rk = 1)""".stripMargin
    }.mkString
    head + iters
  }

  /** Label-propagation communities over the part–part co-purchase graph
    * (same bounded edge CTE as triangleCount/linkPredict). */
  def communities(iterations: Int = 3): String =
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  WHERE a.l_partkey < 10000 AND b.l_partkey < 10000
       |)${lpIterCtes(iterations)}
       |SELECT node, lab AS community FROM l$iterations""".stripMargin

  /** Count-Min replay (datapipe.Sketch.cmsTable/cmsLookup, 4×1024):
    * row-seeded hash48 buckets, counter groupBy, min-over-rows lookup. */
  def cmsFreq: String =
    s"""WITH rws AS (SELECT unnest(generate_series(0, 3)) AS r),
       |hb AS (SELECT r, ${h48("(r || ':' || user_id)")} % 1024 AS bucket FROM events CROSS JOIN rws),
       |cms AS (SELECT r, bucket, COUNT(*) AS cnt FROM hb GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT user_id FROM events WHERE user_id < 50),
       |kb AS (SELECT k.user_id, rws.r,
       |  ${h48("(rws.r || ':' || k.user_id)")} % 1024 AS bucket FROM keys k CROSS JOIN rws),
       |est AS (SELECT kb.user_id, MIN(cms.cnt) AS est_cnt
       |  FROM kb JOIN cms ON kb.r = cms.r AND kb.bucket = cms.bucket GROUP BY 1),
       |ex AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events WHERE user_id < 50 GROUP BY 1)
       |SELECT est.user_id, est.est_cnt, ex.exact_cnt FROM est JOIN ex USING (user_id)""".stripMargin
}
