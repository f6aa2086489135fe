from __future__ import annotations

import random
import string

import pytest

from bm25_pagerank_rpi_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s


def make_corpus(
    n_docs: int = 60,
    vocab_size: int = 40,
    seed: int = 42,
    max_len: int = 30,
) -> dict[str, str]:
    """Deterministic synthetic corpus: doc_id -> text. Includes empty docs,
    punctuation-attached tokens, and repeated terms."""
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 7)))
        for _ in range(vocab_size)
    ]
    vocab += ["hello,", "world!", "a.b/c"]  # punctuation retained by T1
    texts = {}
    for i in range(n_docs):
        doc_id = f"conv_{i // 5:04d}:{i % 5}"
        if i % 17 == 0:
            texts[doc_id] = ""  # empty doc
        elif i % 13 == 0:
            texts[doc_id] = "   "  # whitespace-only doc
        else:
            n = rng.randint(1, max_len)
            texts[doc_id] = " ".join(rng.choices(vocab, k=n))
    return texts


@pytest.fixture(scope="session")
def corpus():
    return make_corpus()
