"""Search-box query DSL — the boolean front end of the engine.

Grammar (the Lucene/web-search-box subset every full-text engine ships):

    free terms          rank disjunctively (plain BM25)
    +term               MUST contain the term (and it ranks)
    -term               MUST NOT contain the term
    "quoted phrase"     MUST contain the exact consecutive phrase
                        (positions table required; its words rank too)

Everything compiles onto engine primitives already gated elsewhere —
this module adds NO new scoring or matching semantics:

  * ranking text  = free + required + phrase words, scored by
    ``bm25_topk_exact`` exactly as a plain query (same fold, same idf);
  * each ``+term``   → ``term_docs`` semi-join (filtered retrieval);
  * each phrase      → ``phrase_match`` doc set, semi-joined;
  * each ``-term``   → ``term_docs`` anti-join (``exclude_docs``).

Constraint sets are intersected as chained LEFT SEMI joins before the
before-top-k filter, so the result is the true top-k of the boolean
match set with unchanged BM25 scores. Scale: every constraint set is
bounded by one term's df (or a phrase's hit count via the positional
kernel), never the corpus; the ranking scan itself stays the
bucket-pruned exact plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..index.build import InvertedIndex
from .bm25 import RESULT_SCHEMA, bm25_topk_exact, term_docs

_PHRASE_RE = re.compile(r'"([^"]*)"')


@dataclass(frozen=True)
class ParsedQuery:
    free: list[str] = field(default_factory=list)
    required: list[str] = field(default_factory=list)
    excluded: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)

    @property
    def ranking_text(self) -> str:
        """What gets BM25-ranked: free + required + phrase words, in
        query order (the fold is order-sensitive, so this IS the spec)."""
        return " ".join(self.free + self.required
                        + [w for p in self.phrases for w in p.split()])


def parse_query(s: str) -> ParsedQuery:
    """Split a search-box string into DSL parts. Quoted spans are
    extracted first (a '+'/'-' inside quotes is literal text); remaining
    whitespace-split tokens route on their leading sigil. A bare '+'/'-'
    or an empty quote is dropped."""
    phrases = [p.strip() for p in _PHRASE_RE.findall(s) if p.strip()]
    rest = _PHRASE_RE.sub(" ", s)
    free, required, excluded = [], [], []
    for tok in rest.split():
        if tok.startswith("+"):
            if tok[1:]:
                required.append(tok[1:])
        elif tok.startswith("-"):
            if tok[1:]:
                excluded.append(tok[1:])
        else:
            free.append(tok)
    return ParsedQuery(free=free, required=required, excluded=excluded,
                       phrases=phrases)


def dsl_search(spark: SparkSession, index: InvertedIndex, query: str,
               k: int = 10,
               filter_docs: DataFrame | None = None,
               phrase_cap: int = 1_000_000) -> DataFrame:
    """Execute a DSL query string → (doc_id, score) top-k. ``filter_docs``
    composes an extra metadata filter (e.g. lang='en') with the boolean
    constraints. Phrases need the index root's positions table
    (``build_positions``); ``phrase_cap`` bounds how many phrase-matching
    docs are carried into the semi-join (top by occurrence count — a
    phrase matching more docs than this is effectively a ranking term)."""
    pq = parse_query(query)
    ranking = pq.ranking_text
    if not ranking:
        return spark.createDataFrame([], RESULT_SCHEMA)

    from ..functions.tokenize import tokenize_k1_py
    fd = filter_docs.select("doc_id") if filter_docs is not None else None
    # a sigiled word normalizes through the INDEX tokenizer ("+Wi-Fi" →
    # required tokens ['wi', 'fi']) so constraints match what was indexed
    for t in [tok for w in pq.required for tok in tokenize_k1_py(w)]:
        td = term_docs(spark, index, t)
        fd = td if fd is None else fd.join(td, "doc_id", "left_semi")
    if pq.phrases:
        from ..index.positions import phrase_match
        for p in pq.phrases:
            pd_ = phrase_match(spark, index, p, k=phrase_cap) \
                .select("doc_id")
            fd = pd_ if fd is None else fd.join(pd_, "doc_id", "left_semi")

    ex = None
    for t in [tok for w in pq.excluded for tok in tokenize_k1_py(w)]:
        td = term_docs(spark, index, t)
        ex = td if ex is None else ex.unionByName(td)

    if index.is_warm():
        # boolean queries at serving latency: constraints ship as sorted
        # allowed/blocked masks into the zero-shuffle shard kernel
        # (bitwise-identical to the exact route — tests/test_parser.py)
        from .bm25 import bm25_topk_served
        return bm25_topk_served(spark, index, ranking, k=k,
                                filter_docs=fd, exclude_docs=ex)
    return bm25_topk_exact(spark, index, ranking, k=k, filter_docs=fd,
                           exclude_docs=ex)
