package graft.schema

/** Core data model of the engine.
  *
  * The input table shape is fixed by the north rule (BASELINE.json.input_hint):
  * `doc_id: string, spans: array<struct<kind,text,media_ref,offset>>` — interleaved
  * text + media documents. Media spans are opaque passengers: they are carried
  * through every stage untouched (per-row invariant: span-sequence equality on
  * (kind, text, media_ref, order)).
  *
  * The output `Doc` mirrors the reference's richest response shape
  * (reference: schema.py:44-100 — Doc/Token/Morpheme pydantic models).
  */

/** One span of an interleaved document. kind ∈ {text, media}. */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** North-rule input row. */
case class InputDoc(doc_id: String, spans: Array[Span])

/** One edge of a morphological ambiguity (MA) lattice.
  * Reference lattice TSV columns: ID1 ID2 form lemma upostag xpostag feats token_id
  * (nemo.py:100-105). The lattice of one sentence is tiny (≤ ~10 nodes per token),
  * so it lives inside a row as an array<struct>, never as a distributed graph.
  */
case class LatticeEdge(
    id1: Int,
    id2: Int,
    form: String,
    lemma: String,
    upos: String,
    xpos: String,
    feats: String,
    tokenId: Int)

/** One morpheme after disambiguation (reference: schema.py Morpheme). */
case class Morpheme(
    form: String,
    lemma: String,
    pos: String,
    feats: String,
    tokenId: Int,
    nemoMorph: String,               // morph-level BIOSE label (scenario: morph_hybrid)
    nemoMultiAlignMorph: String,     // multi labels aligned onto morphemes (multi_align_hybrid)
    head: Int = 0,                   // dependency head (1-based morpheme id; 0 = root)
    deprel: String = "")             // dependency relation (C10 zip, api_main.py:338-351)

/** One surface token with all per-scenario label columns
  * (reference: schema.py Token — nemo_single / nemo_multi / aligned variants). */
case class Token(
    text: String,
    nemoSingle: String,              // token-single BIOSE
    nemoMulti: String,               // token-multi ^-joined BIOSE atoms
    nemoMultiAlignToken: String,     // fix_multi_biose(nemo_multi)
    nemoMorphAlignToken: String,     // morph labels fixed back to token level
    morphs: Array[Morpheme])

/** One sentence of a document (one text span of the input). */
case class Sentence(
    sent_id: Long,                   // DOC-LOCAL text-span index (0-based); only
                                     // (doc_id, sent_id) together are unique
    tokens: Array[Token])

/** A fully processed document (one input doc; sentences are the text spans). */
case class Doc(
    doc_id: String,
    spans: Array[Span],              // passenger copy — must equal input spans
    sents: Array[Sentence])

/** An extracted entity mention (reference: api_main.py:380-419 to_dict).
  * level ∈ {token, morph}; scenario names the label column it came from. */
case class Mention(
    doc_id: String,
    sent_id: Long,
    surface: String,
    category: String,
    start: Int,
    end: Int,
    level: String,
    scenario: String,
    occ: Int)                        // occurrence index within (sent, surface, cat)

/** Entity dictionary row (linking target / gazetteer). */
case class Entity(
    entity_id: Long,
    canonical: String,
    aliases: Array[String],
    category: String)

/** Output triple (north rule: subj, pred, obj + provenance). */
case class Triple(
    subj: String,
    pred: String,
    obj: String,
    doc_id: String)
