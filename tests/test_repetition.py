"""q_repetition_stats: Gopher-style repetition quality metrics.

Pins the metric math on hand-computable adversarial docs and the full
Ray-vs-DuckDB equality on a synthetic table (the sf sqlcheck covers the
real corpora; this covers the degenerate shapes it lacks: empty text,
single token, all-identical tokens, alternating template)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    textstats as T,
)


@pytest.fixture(scope="module")
def rep_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("rep_sf")
    rng = np.random.RandomState(11)
    docs = [
        (0, ""),                                   # empty
        (1, "  "),                                 # whitespace only
        (2, "solo"),                               # one token: no bigrams
        (3, "spam spam spam spam"),                # fully repeated
        (4, "a b a b a b a b"),                    # alternating template
        (5, "all tokens here are unique words"),   # no repetition
    ]
    docs += [(i, " ".join(rng.choice(["x", "y", "z", "w"], rng.randint(1, 40))))
             for i in range(6, 300)]
    pd.DataFrame({"doc_id": np.array([d[0] for d in docs], dtype=np.int64),
                  "text": [d[1] for d in docs]}).to_parquet(
        d / "documents.parquet", row_group_size=32)
    return str(d)


@pytest.fixture(scope="module")
def dup_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("dup_sf")
    base = "alpha beta gamma delta epsilon zeta eta theta"      # 8 tokens
    docs = [
        (0, ""),                                    # empty → all zeros
        (1, "only seven tokens live right here now"),  # <8 toks: no anchors
        (2, base + " iota kappa"),                  # shares base gram w/ 3
        (3, "prefix " + base),                      # ... at a different pos
        (4, base + " " + base),                     # within-doc repeat ONLY of
                                                    # the non-shared grams
        (5, "totally unique words that appear nowhere else in corpus x1 y2"),
    ]
    # filler docs sharing one long template passage pairwise
    tpl = "the quick brown fox jumps over the lazy dog again and again"
    docs += [(i, f"doc{i} intro {tpl} doc{i} outro") for i in range(6, 40)]
    pd.DataFrame({"doc_id": np.array([d[0] for d in docs], dtype=np.int64),
                  "text": [d[1] for d in docs]}).to_parquet(
        d / "documents.parquet", row_group_size=8)
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_dup_passages_vs_oracle(dup_sf):
    got = T.q_dup_passages(dup_sf).to_pandas()

    con = duckdb.connect()
    p = os.path.join(dup_sf, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(T.SQL_DUP_PASSAGES).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)

    by = got.set_index("doc_id")
    assert (by.loc[0] == 0).all()                       # empty
    assert by.loc[1, "dup_positions"] == 0              # too short to anchor
    # docs 2 and 3 share exactly the 8-token base gram (different offsets)
    assert by.loc[2, "dup_positions"] == 1 and by.loc[2, "dup_cov_tokens"] == 8
    assert by.loc[3, "dup_positions"] == 1 and by.loc[3, "dup_cov_tokens"] == 8
    # doc 4 = base+base: its cross-doc anchors are the two base occurrences
    # (pos 0 and 8); the straddling within-doc-only grams must NOT flag
    assert by.loc[4, "dup_positions"] == 2 and by.loc[4, "dup_cov_tokens"] == 16
    assert by.loc[5, "dup_positions"] == 0              # unique text
    # template docs: the shared passage is covered, the doc-unique
    # intro/outro tokens are not → coverage strictly between 0 and total
    t6 = by.loc[6]
    assert 0 < t6["dup_cov_tokens"] < t6["n_tokens"]


@pytest.fixture(scope="module")
def bpe_sf(tmp_path_factory):
    """Engine-agreement edge cases: contractions, digit runs, symbol
    runs, Devanagari/Gujarati (symbol-run branch), empty text."""
    d = tmp_path_factory.mktemp("bpe_sf")
    texts = ["Hello world, it's 2026!", "", "  leading space",
             "don't we'll they're I'm", "₹5,25,000 (tax incl.)",
             "डीलर नाम: शर्मा ट्रैक्टर्स", "મોડેલ 744", "café naïve",
             "a\tb\nc", "ABCdef 12.5x mixed-case"]
    pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts}).to_parquet(
        d / "documents.parquet", row_group_size=4)
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_bpe_tokens_vs_oracle(bpe_sf):
    got = T.q_bpe_tokens(bpe_sf).to_pandas()
    con = duckdb.connect()
    p = os.path.join(bpe_sf, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(T.SQL_BPE_TOKENS).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    by = got.set_index("doc_id")
    assert by.loc[1, "n_bpe_tokens"] == 0              # empty text
    assert by.loc[3, "n_bpe_tokens"] == 8              # 4 contractions split


def _hh_oracle(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    p = os.path.join(sf, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    return con.execute(T.SQL_TOKEN_HEAVY_HITTERS).df()


@pytest.fixture(scope="module")
def zipf_sf(tmp_path_factory):
    """Skewed (Zipf-ish) token corpus: the certificate path must engage."""
    d = tmp_path_factory.mktemp("zipf_sf")
    rng = np.random.RandomState(7)
    vocab = np.array([f"w{i:04d}" for i in range(3000)])
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.2
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, rng.randint(20, 120), p=probs))
             for _ in range(400)]
    pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                  "text": texts}).to_parquet(
        d / "documents.parquet", row_group_size=32)
    return str(d)


@pytest.fixture(scope="module")
def uniform_sf(tmp_path_factory):
    """Near-uniform token corpus over a vocabulary far larger than the
    sketch: the certificate MISSES and the exact fallback must engage —
    the result must still equal the oracle."""
    d = tmp_path_factory.mktemp("uniform_sf")
    rng = np.random.RandomState(13)
    vocab = np.array([f"u{i:05d}" for i in range(20000)])
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(300)]
    pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                  "text": texts}).to_parquet(
        d / "documents.parquet", row_group_size=16)
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_certified_path(zipf_sf):
    got = T.q_token_heavy_hitters(zipf_sf)
    want = _hh_oracle(zipf_sf)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_fallback_path(uniform_sf):
    got = T.q_token_heavy_hitters(uniform_sf)
    want = _hh_oracle(uniform_sf)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_vs_oracle(rep_sf):
    got = T.q_repetition_stats(rep_sf).to_pandas()

    con = duckdb.connect()
    p = os.path.join(rep_sf, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(T.SQL_REPETITION_STATS).df()

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)

    by = got.set_index("doc_id")
    # empty / whitespace-only: all zeros
    assert (by.loc[0] == 0).all() and (by.loc[1] == 0).all()
    # one token: no bigrams, token fully dominant
    assert tuple(by.loc[2]) == (1, 1, 1000, 0, 0)
    # 4x the same token: 3 bigrams all identical
    assert tuple(by.loc[3]) == (4, 1, 1000, 666, 1000)
    # alternating a b: 7 bigrams, 2 distinct ('a b' x4 dominant)
    assert tuple(by.loc[4]) == (8, 2, 500, 714, 571)
    # all-unique: no duplicate mass anywhere
    assert by.loc[5, "dup_bigram_milli"] == 0
    assert by.loc[5, "distinct_tokens"] == by.loc[5, "n_tokens"]


def test_token_pmi_brute_force(ray_session) -> None:
    """Top-50 PMI rows must equal a single-process brute-force of the
    identical integer formula (two-step floor), same ordering."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        _PMI_MIN_COUNT,
        _PMI_TOPK,
        q_token_pmi,
    )

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    from collections import Counter
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n1, n2 = sum(uni.values()), sum(bi.values())
    rows = []
    for (a, b), c2 in bi.items():
        if c2 < _PMI_MIN_COUNT:
            continue
        pmi = ((1000 * c2 * n1 // uni[a]) * n1) // (uni[b] * n2)
        rows.append((pmi, a, b, c2))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = [(i + 1, a, b, c2, pmi)
            for i, (pmi, a, b, c2) in enumerate(rows[:_PMI_TOPK])]

    got = list(q_token_pmi(sf)[["rank", "a", "b", "c2", "pmi_scaled"]]
               .itertuples(index=False, name=None))
    assert got == want
