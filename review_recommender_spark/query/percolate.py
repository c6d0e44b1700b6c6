"""Percolation — reverse search: match ONE document against MANY stored
queries (the ES percolator / alerting contract: "which saved searches /
alert rules does this new page trigger?").

At web scale the stored-query table is the big side (millions of alert
rules) and the document is one row — so the Spark shape inverts the
normal query plan: the DOC'S TOKEN SET broadcasts as a literal and the
engine SCANS THE QUERY TABLE, evaluating each rule with pure JVM array
expressions (no UDF, no shuffle — a map-only scan with a
whole-stage-codegen predicate). Adding a new document costs one pass
over the rules table regardless of corpus size; the corpus itself is
never touched.

Rule semantics per stored query (the exact predicate the code
implements — NOTE it is deliberately STRICTER than ``dsl_match_docs``
for mixed rules: here ``ranking`` holds only the rule's FREE K2 terms,
so a rule that mixes free terms with phrases/required words demands a
free-term hit, whereas ``dsl_search``'s ranking_text also counts
phrase/required words as ranking hits. For alerting, "mentions one of
my topic words" is the intended trigger; a rule that should fire on
constraints alone is written without free terms):

    match  =  (ranking ∩ doc_tokens ≠ ∅
               OR  ranking = ∅ ∧ (phrases ≠ ∅ ∨ required ≠ ∅))
            ∧ every required token present
            ∧ no excluded token present
            ∧ every phrase present as consecutive K1 tokens

Phrases match by padded-string containment over the space-joined token
stream — exact consecutive-token semantics (token boundaries guarded by
the padding), same contract as ``index.positions.phrase_match`` for a
single document. Wildcard/fuzzy rules are not supported in percolation
(they depend on a corpus vocabulary, which reverse search deliberately
does not consult); ``parse_queries_df`` rejects them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_k1_py, tokenize_k2_py
from .parser import parse_query

QUERIES_SCHEMA = ("query_id long, ranking array<string>, "
                  "required array<string>, excluded array<string>, "
                  "phrases array<string>")


def parse_queries_df(spark: SparkSession,
                     queries: list[tuple[int, str]]) -> DataFrame:
    """Compile (query_id, DSL string) rules into the stored-query table
    (pre-parsed token arrays — parse once at registration, evaluate
    forever). Ranking tokens use the K2 query tokenizer, constraint
    words the K1 index tokenizer and phrases the K1 stream — exactly
    like ``dsl_search``. Rules with wildcard/fuzzy syntax are rejected
    (vocabulary-dependent; see module docstring)."""
    rows = []
    for qid, q in queries:
        pq = parse_query(q)
        if (pq.wildcards or pq.required_wildcards
                or pq.excluded_wildcards or pq.fuzzies or pq.near):
            raise ValueError(
                f"query {qid}: wildcard/fuzzy/proximity not supported "
                f"in percolation")
        rows.append((
            int(qid),
            tokenize_k2_py(" ".join(pq.free)),
            [t for w in pq.required for t in tokenize_k1_py(w)],
            [t for w in pq.excluded for t in tokenize_k1_py(w)],
            [" ".join(tokenize_k1_py(p))
             for p in pq.phrases if tokenize_k1_py(p)],
        ))
    return spark.createDataFrame(rows, QUERIES_SCHEMA)


def percolate(spark: SparkSession, queries_df: DataFrame,
              text: str) -> DataFrame:
    """All stored queries the document ``text`` matches →
    (query_id, n_ranking_hits), ordered (n_ranking_hits DESC, query_id
    ASC). One map-only scan of the rules table; the doc's K1 token set
    and padded token stream ship as literals. Match semantics are the
    module-docstring predicate — mixed free+constraint rules require a
    free-term hit (stricter than ``dsl_match_docs``; see above)."""
    toks = tokenize_k1_py(text)
    tok_set = sorted(set(toks))
    stream = " " + " ".join(toks) + " "
    doc = F.array(*[F.lit(t) for t in tok_set]) if tok_set \
        else F.array().cast("array<string>")
    hits = F.size(F.array_intersect(F.col("ranking"), doc))
    # a rule with no free terms is pure-constraint (phrases and/or
    # required words): it matches on its constraints alone
    rank_ok = (hits > 0) | ((F.size("ranking") == 0)
                            & ((F.size("phrases") > 0)
                               | (F.size("required") > 0)))
    req_ok = F.size(F.array_except(F.col("required"), doc)) == 0
    exc_ok = F.size(F.array_intersect(F.col("excluded"), doc)) == 0
    phr_ok = F.forall(
        "phrases",
        lambda p: F.lit(stream).contains(
            F.concat(F.lit(" "), p, F.lit(" "))))
    return (queries_df
            .filter(rank_ok & req_ok & exc_ok & phr_ok)
            .select("query_id", hits.alias("n_ranking_hits"))
            .orderBy(F.desc("n_ranking_hits"), F.asc("query_id")))
