"""CLI mirroring the reference's ``python app/test.py`` entry point
(app/test.py:345-361) against the distributed engine.

Usage:
  python -m review_recommender_spark.cli build  --corpus <parquet|synth:N> --index <dir>
  python -m review_recommender_spark.cli search --index <dir> -q "..." [-k 10]
         [--rerank-k 50] [--gate-penalty 0.5] [--profile cli|app]
         [--w-dense .55 --w-bm25 .15 --w-rerank .15 --w-prior .10 --w-best .05]
  python -m review_recommender_spark.cli eval   --index <dir> --corpus synth:N
  python -m review_recommender_spark.cli delta-merge --index <dir> \
         --delta <parquet> --out <dir>   # fold new docs into an index
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="review_recommender_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True,
                   help="parquet path or synth:N for the synthetic corpus")
    b.add_argument("--index", required=True)
    b.add_argument("--chunks", type=int, default=1)
    b.add_argument("--cores", type=int, default=None)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--corpus", required=True)
    s.add_argument("-q", "--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--rerank-k", type=int, default=50)
    s.add_argument("--gate-penalty", type=float, default=0.5)
    s.add_argument("--profile", choices=["cli", "app"], default="cli")
    s.add_argument("--bm25-only", action="store_true",
                   help="skip the hybrid second pass (pure BM25 top-k)")
    s.add_argument("--after", default=None,
                   help="search-after cursor 'score:doc_id' — pass the "
                        "previous page's printed `next_after` VERBATIM "
                        "(it carries the unrounded score; a rounded "
                        "cursor duplicates or skips boundary docs) — "
                        "bm25-only mode")
    s.add_argument("--json-out", default=None)
    s.add_argument("--cores", type=int, default=None)

    e = sub.add_parser("eval")
    e.add_argument("--index", required=True)
    e.add_argument("--corpus", required=True)
    e.add_argument("--cores", type=int, default=None)

    d = sub.add_parser("delta-merge",
                       help="merge an epoch of docs into an existing "
                            "index (incremental maintenance; byte-equal "
                            "to a rebuild over the resulting corpus)")
    d.add_argument("--index", required=True, help="existing index root")
    d.add_argument("--delta", required=True,
                   help="parquet path (or synth:N) of the epoch's docs")
    d.add_argument("--out", required=True, help="merged index root")
    d.add_argument("--mode", choices=["insert", "upsert"], default="insert",
                   help="upsert re-indexes doc_ids already in the index "
                        "(delete+insert); insert rejects them")
    d.add_argument("--delete", default=None,
                   help="comma-separated doc_ids to tombstone")
    d.add_argument("--cores", type=int, default=None)

    bp = sub.add_parser("build-positions",
                        help="add the optional positional-postings table "
                             "to an existing index root (reads the Stage "
                             "A checkpoint; no re-tokenize)")
    bp.add_argument("--index", required=True)
    bp.add_argument("--cores", type=int, default=None)

    ph = sub.add_parser("phrase", help="exact consecutive-token phrase "
                                       "query over the positions table")
    ph.add_argument("--index", required=True)
    ph.add_argument("-q", "--query", required=True)
    ph.add_argument("-k", type=int, default=10)
    ph.add_argument("--rank-bm25", action="store_true",
                    help="rank phrase-matching docs by BM25 of the phrase "
                         "terms (composition with filtered retrieval) "
                         "instead of by occurrence count")
    ph.add_argument("--cores", type=int, default=None)

    dq = sub.add_parser("dsl", help='search-box DSL query: free +required '
                                    '-excluded "exact phrase" (phrases '
                                    'need build-positions)')
    dq.add_argument("--index", required=True)
    dq.add_argument("-q", "--query", required=True)
    dq.add_argument("-k", type=int, default=10)
    dq.add_argument("--snippets", action="store_true",
                    help="attach best-span snippets + hit offsets for the "
                         "top-k (needs the positions table)")
    dq.add_argument("--window", type=int, default=30)
    dq.add_argument("--facet", default=None,
                    help="metadata column to facet over the FULL boolean "
                         "match set (needs --corpus)")
    dq.add_argument("--corpus", default=None)
    dq.add_argument("--count", action="store_true",
                    help="also report the total boolean match count "
                         "('about N results')")
    dq.add_argument("--cores", type=int, default=None)

    bd = sub.add_parser("build-dictionary",
                        help="materialize the term-sorted dictionary "
                             "(prefix/fuzzy expansion gets parquet "
                             "min/max file skipping)")
    bd.add_argument("--index", required=True)
    bd.add_argument("--cores", type=int, default=None)

    sg = sub.add_parser("suggest", help="prefix autocomplete: df-top "
                                        "vocabulary completions")
    sg.add_argument("--index", required=True)
    sg.add_argument("-p", "--prefix", required=True)
    sg.add_argument("-n", type=int, default=8)
    sg.add_argument("--fuzzy", action="store_true",
                    help="treat the pattern as a fuzzy word "
                         "(Levenshtein-1 neighbours) instead of a prefix")
    sg.add_argument("--cores", type=int, default=None)

    ml = sub.add_parser("mlt", help="more-like-this: rank docs similar "
                                    "to a source doc's text")
    ml.add_argument("--index", required=True)
    ml.add_argument("--corpus", required=True)
    ml.add_argument("--doc", type=int, required=True,
                    help="source doc_id (excluded from results)")
    ml.add_argument("--terms", type=int, default=16,
                    help="max interesting terms (tf·idf-top)")
    ml.add_argument("-k", type=int, default=10)
    ml.add_argument("--cores", type=int, default=None)

    ex_ = sub.add_parser("explain", help="per-term score breakdown for "
                                         "one (query, doc) pair")
    ex_.add_argument("--index", required=True)
    ex_.add_argument("-q", "--query", required=True)
    ex_.add_argument("-d", "--doc", type=int, required=True)
    ex_.add_argument("--vectors", action="store_true",
                     help="also dump the doc's full term vectors "
                          "(term, tf, positions)")
    ex_.add_argument("--cores", type=int, default=None)

    nr = sub.add_parser("near", help='proximity query: all words within '
                                     'a token window ("sloppy phrase")')
    nr.add_argument("--index", required=True)
    nr.add_argument("-q", "--query", required=True)
    nr.add_argument("-w", "--window", type=int, required=True)
    nr.add_argument("-k", type=int, default=10)
    nr.add_argument("--cores", type=int, default=None)

    args = ap.parse_args(argv)

    from .config import EngineConfig, app_profile, bm25_north, cli_profile
    from .corpus.pages import page_meta_cols, pages_df
    from .index.build import InvertedIndex, build_index
    from .index.tableio import TableIO
    from .query.bm25 import bm25_topk_pruned
    from .query.encoder import embed_documents
    from .query.search import hybrid_search
    from .session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("rrs-cli", cores=args.cores)

    def load_corpus(spec: str):
        if spec.startswith("synth:"):
            return pages_df(spark, int(spec.split(":", 1)[1]))
        return spark.read.parquet(spec)

    cfg = EngineConfig(bm25=bm25_north())

    if args.cmd == "build":
        docs = load_corpus(args.corpus)
        idx = build_index(spark, docs, TableIO(args.index), cfg,
                          n_chunks=args.chunks)
        print(json.dumps({"n_docs": idx.n_docs, "vocab": idx.vocab_size,
                          "avgdl": idx.avgdl}))
        return 0

    idx = InvertedIndex.load(spark, TableIO(args.index), cfg)

    if args.cmd == "build-positions":
        from .index.positions import POSITIONS, build_positions
        build_positions(spark, idx.io, cfg)
        n_blocks = idx.io.read(spark, POSITIONS).count()
        print(json.dumps({"n_docs": idx.n_docs, "pos_blocks": int(n_blocks)}))
        return 0

    if args.cmd == "phrase":
        from .index.positions import phrase_match
        matches = phrase_match(spark, idx, args.query, k=max(args.k, 10000)
                               if args.rank_bm25 else args.k)
        if args.rank_bm25:
            from .query.bm25 import bm25_topk_exact
            rows = bm25_topk_exact(spark, idx, args.query, k=args.k,
                                   filter_docs=matches).collect()
            out = [{"doc_id": r["doc_id"], "score": round(r["score"], 4)}
                   for r in rows]
        else:
            out = [{"doc_id": r["doc_id"], "n_occ": int(r["n_occ"])}
                   for r in matches.collect()]
        print(json.dumps({"query": args.query, "results": out}))
        return 0

    if args.cmd == "dsl":
        from .query.parser import dsl_search, parse_query
        rows = dsl_search(spark, idx, args.query, k=args.k).collect()
        out = [{"doc_id": r["doc_id"], "score": round(r["score"], 4)}
               for r in rows]
        payload = {"query": args.query, "results": out}
        if args.snippets and out:
            from .query.snippets import snippet_spans
            ranking = parse_query(args.query).ranking_text
            spans = {r["doc_id"]: r for r in snippet_spans(
                spark, idx, ranking, [r["doc_id"] for r in out],
                window=args.window).collect()}
            for r in out:
                sp = spans.get(r["doc_id"])
                if sp is not None:
                    r["snippet_start"] = int(sp["snippet_start"])
                    r["hit_pos"] = sp["hit_pos"]
        if args.facet:
            if not args.corpus:
                print("--facet needs --corpus for the metadata scan",
                      file=sys.stderr)
                return 2
            from .query.facets import dsl_match_docs, facet_counts
            meta = load_corpus(args.corpus).select("doc_id", args.facet)
            payload["facets"] = {
                r["value"]: int(r["n_docs"]) for r in facet_counts(
                    dsl_match_docs(spark, idx, args.query), meta,
                    args.facet).collect()}
        if args.count:
            from .query.facets import dsl_match_count
            payload["n_hits"] = int(
                dsl_match_count(spark, idx, args.query)
                .collect()[0]["n_hits"])
        from .query.expand import did_you_mean
        from .query.parser import parse_query as _pq
        plain = " ".join(_pq(args.query).free)
        if plain:
            fixed = did_you_mean(spark, idx, plain)
            if fixed is not None:
                payload["did_you_mean"] = fixed
        print(json.dumps(payload))
        return 0

    if args.cmd == "build-dictionary":
        from .query.expand import TERM_DICT, build_term_dictionary
        build_term_dictionary(spark, idx)
        n = idx.io.read(spark, TERM_DICT).count()
        print(json.dumps({"terms": int(n)}))
        return 0

    if args.cmd == "suggest":
        from .query.expand import expand_fuzzy, expand_prefix
        terms = (expand_fuzzy(spark, idx, args.prefix, max_terms=args.n)
                 if args.fuzzy else
                 expand_prefix(spark, idx, args.prefix, max_terms=args.n))
        print(json.dumps({"pattern": args.prefix, "terms": terms}))
        return 0

    if args.cmd == "mlt":
        from .query.expand import mlt_terms, more_like_this_doc
        docs = load_corpus(args.corpus)
        rows = more_like_this_doc(spark, idx, docs, args.doc,
                                  max_terms=args.terms, k=args.k).collect()
        src = docs.filter(F.col("doc_id") == args.doc) \
            .select("text").limit(1).collect()
        terms = (mlt_terms(spark, idx, src[0]["text"] or "",
                           max_terms=args.terms) if src else [])
        print(json.dumps({
            "doc": args.doc, "terms": terms,
            "results": [{"doc_id": r["doc_id"],
                         "score": round(r["score"], 4)} for r in rows]}))
        return 0

    if args.cmd == "delta-merge":
        from .index.build import delta_merge_index
        deletes = ([int(x) for x in args.delete.split(",")]
                   if args.delete else None)
        merged = delta_merge_index(spark, idx, load_corpus(args.delta),
                                   TableIO(args.out), mode=args.mode,
                                   delete_doc_ids=deletes)
        print(json.dumps({"n_docs": merged.n_docs,
                          "vocab": merged.vocab_size,
                          "avgdl": merged.avgdl}))
        return 0

    if args.cmd == "explain":
        from .query.bm25 import explain_score, term_vectors
        rows = explain_score(spark, idx, args.query, args.doc).collect()
        payload = {
            "query": args.query, "doc": args.doc,
            "total": round(sum(r["contribution"] for r in rows), 4),
            "terms": [{"term": r["term"], "qtf": int(r["qtf"]),
                       "tf": int(r["tf"]), "dl": int(r["dl"]),
                       "idf": round(r["idf"], 4),
                       "contribution": round(r["contribution"], 4)}
                      for r in rows]}
        if args.vectors:
            payload["vectors"] = [
                {"term": r["term"], "tf": int(r["tf"]),
                 "positions": list(r["positions"])}
                for r in term_vectors(spark, idx, args.doc).collect()]
        print(json.dumps(payload))
        return 0

    if args.cmd == "near":
        from .index.positions import near_match
        rows = near_match(spark, idx, args.query, args.window,
                          k=args.k).collect()
        print(json.dumps({
            "query": args.query, "window": args.window,
            "results": [{"doc_id": r["doc_id"],
                         "min_span": int(r["min_span"])} for r in rows]}))
        return 0

    if args.cmd == "search":
        if args.bm25_only:
            after = None
            if args.after:
                sc, _, did = args.after.partition(":")
                after = (float(sc), int(did))
            rows = bm25_topk_pruned(spark, idx, args.query,
                                    k=args.k, after=after).collect()
            out = [{"doc_id": r["doc_id"], "score": round(r["score"], 4)}
                   for r in rows]
            if rows:
                # machine-readable cursor for the next page: --after needs
                # the UNROUNDED last-row score (a rounded cursor either
                # re-includes or skips boundary docs) — pass this value
                # verbatim as `search --bm25-only --after <next_after>`
                last = rows[-1]
                out_cursor = f"{last['score']!r}:{last['doc_id']}"
            else:
                out_cursor = None
        else:
            profile = cli_profile() if args.profile == "cli" else app_profile()
            profile = dataclasses.replace(profile, rerank_k=args.rerank_k,
                                          gate_penalty=args.gate_penalty)
            cfg2 = dataclasses.replace(cfg, second_pass=profile)
            idx = dataclasses.replace(idx, cfg=cfg2)
            docs = load_corpus(args.corpus)
            emb = embed_documents(docs.select("doc_id", "text")) \
                .select("doc_id", "embedding")
            meta = (docs.select("doc_id", F.col("text").alias("agg_text"))
                    .join(page_meta_cols(docs.select("doc_id")), "doc_id"))
            rows = hybrid_search(spark, idx, emb, meta, args.query,
                                 k=args.k).collect()
            out = [{"doc_id": r["doc_id"],
                    "score": round(float(r["_final"]), 4),
                    "dense": round(float(r["_dense"]), 4),
                    "bm25": round(float(r["_bm25"]), 4),
                    "rerank": round(float(r["_rerank"]), 4),
                    "prior": round(float(r["_prior"]), 4)}
                   for r in rows]
        print("\nTop results:")
        for i, r in enumerate(out, 1):
            extras = "  ".join(f"{k}={v}" for k, v in r.items()
                               if k not in ("doc_id", "score"))
            print(f"[{i}] doc {r['doc_id']}  score={r['score']}  {extras}")
        payload = {"query": args.query, "results": out}
        if args.bm25_only and out:
            # repr() keeps the full float: the displayed score is rounded,
            # but the cursor must be exact (ADVICE r6)
            payload["next_after"] = out_cursor
            print(f"next_after: {out_cursor}")
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(payload, f, indent=2)
            print(f"[ok] wrote {args.json_out}")
        return 0

    if args.cmd == "eval":
        from .evalx.run_eval import format_table, run_golden_eval
        docs = load_corpus(args.corpus)
        emb = embed_documents(docs.select("doc_id", "text")) \
            .select("doc_id", "embedding").cache()
        meta = (docs.select("doc_id", F.col("text").alias("agg_text"))
                .join(page_meta_cols(docs.select("doc_id")), "doc_id"))
        res = run_golden_eval(spark, idx, emb, meta, n_docs=idx.n_docs)
        print(format_table(res))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
