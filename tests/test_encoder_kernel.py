"""Bitwise parity gate for the vectorized hashing-encoder kernel.

``encode_text`` is the frozen scalar reference (per-token crc32 + dict
accumulate); ``encode_batch`` is the batch-vectorized kernel
(factorize + scatter-add, query/encoder.py). Any drift here would break
the frozen hybrid expectations in tests/test_secondpass.py, so the gate
is bitwise, not approx.
"""

import numpy as np

from review_recommender_spark.query.encoder import (DIM, encode_batch,
                                                    encode_text)


def _corpus():
    rng = np.random.default_rng(42)
    words = ["wireless", "earbuds", "battery", "sound", "bass", "yellow",
             "mustard", "cheap", "it's", "don't", "a", "the", "zz9",
             "headphone", "quality", "noise", "cancelling", "mic", "usb"]
    texts = []
    for i in range(300):
        k = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(words, size=k).tolist()))
    texts += ["", "   ", "the a of", "x" * 10000,
              "repeat " * 500, "'''", "UPPER case MiXeD",
              "unicode café naïve ß", "\x00nul byte", "tab\tsep\nnl"]
    return texts


def test_encode_batch_bitwise_equals_scalar():
    texts = _corpus()
    batch = encode_batch(texts)
    scalar = np.stack([encode_text(t) for t in texts])
    assert batch.dtype == np.float32 and batch.shape == (len(texts), DIM)
    assert np.array_equal(batch, scalar), (
        "vectorized kernel drifted from frozen scalar reference")


def test_encode_batch_empty_and_zero_rows():
    assert encode_batch([]).shape == (0, DIM)
    out = encode_batch(["", "the a of", ""])
    assert out.shape == (3, DIM) and not out.any()


def test_encode_batch_nondefault_dim():
    texts = _corpus()[:50]
    batch = encode_batch(texts, dim=64)
    scalar = np.stack([encode_text(t, dim=64) for t in texts])
    assert np.array_equal(batch, scalar)
