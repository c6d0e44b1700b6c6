"""Second-pass fusion: unit tests ported from the reference's
tests/test_utils.py semantics + distributed-vs-oracle parity of the full
hybrid pipeline."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from review_recommender_spark.config import (EngineConfig, app_profile,
                                             bm25_north, cli_profile)
from review_recommender_spark.corpus.pages import page_meta_cols, page_meta_py
from review_recommender_spark.oracle.search_oracle import hybrid_search_oracle
from review_recommender_spark.query.encoder import (cross_encoder_score,
                                                    embed_documents)
from review_recommender_spark.query.search import hybrid_search_batch
from review_recommender_spark.query.secondpass import (bayesian_prior,
                                                       build_gate_groups,
                                                       gate_factor, minmax,
                                                       score_pool,
                                                       trust_score)


# ---- unit tests (reference tests/test_utils.py semantics) ----

def test_minmax_constant_is_zeros():
    assert (minmax(np.array([3.0, 3.0, 3.0])) == 0).all()


def test_minmax_range_and_dtype():
    out = minmax(np.array([0.0, 5.0, 10.0]))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0], atol=1e-6)


def test_minmax_nonfinite_guard():
    assert (minmax(np.array([np.inf, 1.0])) == 0).all()
    assert (minmax(np.array([np.nan, 1.0])) == 0).all()


def test_gate_factor_penalty_per_missing_group():
    groups = [{"yellow"}, {"cat", "cats"}, {"sock", "socks"}]
    # text hits none of the 3 groups → 0.5^3
    assert gate_factor("blue dog shirt", groups, 0.5) == pytest.approx(0.125)
    # hits 'cat' only → 0.5^2
    assert gate_factor("a cat picture", groups, 0.5) == pytest.approx(0.25)
    assert gate_factor("yellow cat socks", groups, 0.5) == pytest.approx(1.0)


def test_gate_groups_colors_synonyms_literals():
    groups = build_gate_groups("yellow cat socks")
    assert {"yellow", "mustard", "lemon", "gold", "golden"} in groups
    assert {"cat", "cats", "kitten", "kittens", "kitty"} in groups
    # 'socks' is NOT a SYNONYMS key (only singular 'sock' is), so the
    # reference falls through to the literal-token branch (utils.py:78-81)
    assert {"socks"} in groups
    # 'yellow' also re-enters as a literal group (≥4 chars, distinct set)
    assert {"yellow"} in groups
    # short tokens (<4 chars, not synonyms) excluded
    assert {"cat"} not in groups
    assert len(groups) <= 6


def test_gate_groups_cap_six():
    groups = build_gate_groups(
        "alpha bravo charlie delta echo foxtrot golf hotel")
    assert len(groups) == 6


def test_bayesian_prior_shrinks_toward_global_mean():
    avg = np.array([5.0, 1.0])
    n = np.array([2.0, 2.0])
    out = bayesian_prior(avg, n, C=20.0)  # pool mean = 3.0
    assert out[0] < 5.0 and out[0] > 3.0
    assert out[1] > 1.0 and out[1] < 3.0
    # heavy-count items shrink less
    heavy = bayesian_prior(np.array([5.0, 1.0]), np.array([1000.0, 2.0]))
    assert heavy[0] > out[0]


def test_trust_monotone_and_saturates():
    n = np.array([0.0, 4.0, 8.0, 50.0, 500.0])
    t = trust_score(n, min_reviews=8, saturation=50)
    assert (np.diff(t) >= 0).all()
    assert t[-1] <= 1.0 + 1e-6
    assert t[0] == 0.0


def test_rerank_prefix_only_quirk_q5():
    """Rows beyond rerank_k get 0 BEFORE the minmax (quirk Q5)."""
    import dataclasses
    sp = dataclasses.replace(cli_profile(), rerank_k=2, pool_floor=4)
    pool = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "agg_text": ["alpha text here", "beta text here",
                     "alpha alpha alpha", "alpha beta alpha"],
        "n_reviews": [10, 10, 10, 10],
        "avg_stars": [4.0, 4.0, 4.0, 4.0],
        "_dense": [0.9, 0.8, 0.7, 0.6],
        "_bm25_raw": [1.0, 2.0, 3.0, 4.0],
    })
    top = score_pool(pool, "alpha", sp, rerank_fn=cross_encoder_score, k=4)
    rr = dict(zip(top["doc_id"], top["_rerank"]))
    assert rr[3] == 0.0 and rr[4] == 0.0  # beyond the rerank prefix


# ---- distributed vs oracle parity ----

@pytest.fixture(scope="module")
def hybrid_inputs(spark, small_pages, small_pages_pdf, small_index):
    emb = embed_documents(small_pages.select("doc_id", "text")).select(
        "doc_id", "embedding").cache()
    emb.count()
    meta = page_meta_cols(small_pages.select("doc_id")).withColumn(
        "agg_text", F.lit(""))  # agg_text joined from pages below
    meta = (small_pages.select("doc_id", F.col("text").alias("agg_text"))
            .join(page_meta_cols(small_pages.select("doc_id")), "doc_id"))
    return emb, meta


@pytest.fixture(scope="module")
def reviews_fixture(small_pages_pdf):
    """Review-level table with embeddings (the reviews_with_embeddings
    analogue, nlp/11:152-163): 2 deterministic review variants per page,
    embedded with the same encoder as the dense path so engine and oracle
    see byte-identical vectors."""
    from review_recommender_spark.query.encoder import encode_text
    rows = []
    rid = 0
    for doc_id, text in zip(small_pages_pdf["doc_id"],
                            small_pages_pdf["text"]):
        words = str(text).split()
        for vtext in (" ".join(words[:12]), " ".join(words[6:20])):
            if not vtext:
                continue
            rows.append({"doc_id": int(doc_id), "review_id": rid,
                         "text": vtext,
                         "stars": float(int(doc_id) % 5 + 1),
                         "embedding": encode_text(vtext).tolist()})
            rid += 1
    return pd.DataFrame(rows)


@pytest.mark.parametrize("profile_name", ["cli", "app"])
def test_hybrid_bestrev_parity(spark, small_pages_pdf, small_index,
                               hybrid_inputs, reviews_fixture, profile_name):
    """R6 end-to-end: with a reviews table the _bestrev signal is non-zero
    and the distributed pipeline matches the numpy oracle (which mirrors
    app/test.py:181-215, 273-289)."""
    import dataclasses
    emb, meta = hybrid_inputs
    profile = cli_profile() if profile_name == "cli" else app_profile()
    idx = dataclasses.replace(small_index, cfg=dataclasses.replace(
        small_index.cfg, second_pass=profile))
    reviews_df = spark.createDataFrame(
        reviews_fixture,
        schema=("doc_id long, review_id long, text string, stars double, "
                "embedding array<float>"))
    queries = ["wireless bluetooth headphones", "yellow cat socks"]
    got = (hybrid_search_batch(spark, idx, emb, meta, queries, k=10,
                               reviews_emb=reviews_df)
           .toPandas().sort_values(["query_id", "rank"]))

    texts = small_pages_pdf["text"].tolist()
    m = page_meta_py(small_pages_pdf["doc_id"].to_numpy())
    any_nonzero = False
    for qi, q in enumerate(queries):
        exp = hybrid_search_oracle(texts, m, q, profile, bm25_north(), k=10,
                                   reviews=reviews_fixture)
        g = got[got["query_id"] == qi]
        assert g["doc_id"].tolist() == exp["doc_id"].tolist(), q
        np.testing.assert_allclose(g["_final"].to_numpy(),
                                   exp["_final"].to_numpy(), rtol=1e-5,
                                   err_msg=q)
        np.testing.assert_allclose(g["_bestrev"].to_numpy(),
                                   exp["_bestrev"].to_numpy(), rtol=1e-5,
                                   err_msg=q)
        any_nonzero |= bool((exp["_bestrev"].to_numpy() > 0).any())
    assert any_nonzero, "bestrev signal must be non-zero somewhere"


def test_bestrev_first_max_wins(spark):
    """Tied best-review sims resolve to the smallest review_id — the
    reference's numpy argmax keeps the first max (app/test.py:212)."""
    from review_recommender_spark.query.encoder import encode_text
    from review_recommender_spark.query.search import bestrev_scores_batch
    vec = encode_text("dup text").tolist()
    reviews = spark.createDataFrame(
        [(7, 11, "dup text", 3.0, vec), (7, 5, "dup text", 4.0, vec),
         (7, 9, "dup text", 5.0, vec)],
        "doc_id long, review_id long, text string, stars double, "
        "embedding array<float>")
    pairs = spark.createDataFrame([(0, 7)], "query_id int, doc_id long")
    out = bestrev_scores_batch(spark, reviews, pairs, ["anything"]) \
        .toPandas()
    assert len(out) == 1
    assert out["best_stars"].iloc[0] == 4.0  # review_id 5 wins the tie


@pytest.mark.parametrize("profile_name", ["cli", "app"])
def test_hybrid_parity_vs_oracle(spark, small_pages_pdf, small_index,
                                 hybrid_inputs, profile_name):
    import dataclasses
    emb, meta = hybrid_inputs
    profile = cli_profile() if profile_name == "cli" else app_profile()
    cfg = dataclasses.replace(EngineConfig(bm25=bm25_north()),
                              second_pass=profile)
    idx = dataclasses.replace(small_index, cfg=dataclasses.replace(
        small_index.cfg, second_pass=profile))
    queries = ["wireless bluetooth headphones", "yellow cat socks",
               "organic green tea"]
    got = (hybrid_search_batch(spark, idx, emb, meta, queries, k=10)
           .toPandas().sort_values(["query_id", "rank"]))

    texts = small_pages_pdf["text"].tolist()
    m = page_meta_py(small_pages_pdf["doc_id"].to_numpy())
    for qi, q in enumerate(queries):
        exp = hybrid_search_oracle(texts, m, q, profile, bm25_north(), k=10)
        g = got[got["query_id"] == qi]
        assert g["doc_id"].tolist() == exp["doc_id"].tolist(), q
        np.testing.assert_allclose(g["_final"].to_numpy(),
                                   exp["_final"].to_numpy(), rtol=1e-5,
                                   err_msg=q)
        np.testing.assert_allclose(g["_gate"].to_numpy(),
                                   exp["_gate"].to_numpy(), rtol=1e-6)
