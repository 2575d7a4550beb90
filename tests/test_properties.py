"""Property-based tests (hypothesis) for the pure semantic layer —
coverage the reference never had (SURVEY §5: no property testing)."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    detect as D,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    fuzzy as FZ,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    sketch as SK,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    textnorm as T,
)

texts = st.text(alphabet=st.characters(codec="utf-8",
                                       categories=("L", "N", "P", "Z")),
                max_size=200)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_normalize_never_raises_and_is_stable(t):
    out = T.normalize_text(t)
    assert isinstance(out, str)
    # normalization is idempotent up to the fast-path quirk: renormalizing
    # an already-normalized string never changes its lowercase collapse
    again = T.normalize_text(out)
    assert again.lower().split() == T.normalize_text(again).lower().split()


@given(texts)
@settings(max_examples=200, deadline=None)
def test_pii_mask_removes_raw_patterns(t):
    salted = f"{t} mail x.y@host.org phone 9876501234 pan ABCDE1234F"
    masked = T.mask_pii(salted)
    assert "x.y@host.org" not in masked
    assert "9876501234" not in masked
    assert not re.search(r"\b[A-Z]{5}\d{4}[A-Z]\b", masked)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_extract_numbers_range_gate(t):
    for n in T.extract_numbers(t):
        assert 0 < n < 1e12


@given(st.lists(st.text(alphabet="abcdefg ", min_size=1, max_size=8),
                min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_minhash_estimates_jaccard(tokens):
    """E[matching minhash coords] = jaccard; two identical sets must agree
    on every coordinate, disjoint sets on (almost) none."""
    a = SK.shingles([w for w in tokens if w.strip()], 2)
    ha = np.array(sorted(SK.token_hash64(s) for s in a), dtype=np.uint64)
    sig_a = SK.minhash_signature(ha)
    assert np.array_equal(sig_a, SK.minhash_signature(ha))   # deterministic
    if len(a) >= 3:
        b = set(list(a))                 # identical set
        hb = np.array(sorted(SK.token_hash64(s) for s in b), dtype=np.uint64)
        assert np.array_equal(sig_a, SK.minhash_signature(hb))


@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_simhash_identical_inputs_zero_hamming(tokens):
    s1, s2 = SK.simhash64(tokens), SK.simhash64(list(tokens))
    assert SK.hamming64(s1, s2) == 0
    assert 0 <= s1 < (1 << 64)


@given(st.text(max_size=50), st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_fuzzy_ratio_bounds_and_symmetry(a, b):
    r = FZ.ratio(a, b)
    assert 0 <= r <= 100
    assert r == FZ.ratio(b, a)
    assert FZ.ratio(a, a) == 100
    assert FZ.token_sort_ratio(a + " x", "x " + a) == 100 or not a.strip()


@given(st.lists(st.tuples(st.floats(0, 900), st.floats(0, 900),
                          st.floats(10, 100), st.floats(10, 100),
                          st.floats(0.01, 1.0)),
                min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_nms_invariants(boxes):
    dets = [{"media_ref": str(i), "class_name": "signature",
             "confidence": c, "bbox": [x, y, x + w, y + h],
             "area": w * h}
            for i, (x, y, w, h, c) in enumerate(boxes)]
    kept = D.nms(dets)
    # kept is a subset, sorted by confidence desc, pairwise IoU <= thr
    assert all(k in dets for k in kept)
    confs = [k["confidence"] for k in kept]
    assert confs == sorted(confs, reverse=True)
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert D.iou(kept[i]["bbox"], kept[j]["bbox"]) <= 0.5 + 1e-12


# ---------------------------------------------------------------- prefix join
@given(st.lists(st.lists(st.integers(0, 60), min_size=0, max_size=40),
                min_size=2, max_size=25),
       st.sampled_from([(19, 20), (4, 5), (1, 2)]))
@settings(max_examples=30, deadline=None)
def test_prefix_filter_pure_candidates_complete(token_sets, thr):
    """Pure (no-Ray) statement of the prefix-filter lemma over the SAME
    arithmetic the distributed join uses: every pair with J ≥ num/den
    shares an element within the first n - ceil(t·n) + 1 positions of the
    canonical order, and survives the length + positional filters."""
    num, den = thr
    sets = [np.unique(np.array(s, dtype=np.int64)) for s in token_sets]

    def plen(n):
        return n - ((num * n + den - 1) // den) + 1 if n else 0

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            if not union or den * inter < num * union:
                continue
            # candidate generation must find a shared prefix token ...
            pa_, pb_ = set(a[:plen(len(a))].tolist()), set(b[:plen(len(b))].tolist())
            shared = pa_ & pb_
            assert shared, (a.tolist(), b.tolist(), num, den)
            # ... whose occurrence passes the length + positional filters
            lo, hi = sorted((len(a), len(b)))
            assert den * lo >= num * hi
            tok = min(shared)            # the earliest shared prefix token
            ia = int(np.searchsorted(a, tok))
            ib = int(np.searchsorted(b, tok))
            need = -(-(num * (len(a) + len(b))) // (num + den))
            assert min(len(a) - ia, len(b) - ib) >= need


def test_results_identical_across_hash_seeds(tmp_path):
    """Workers must agree regardless of PYTHONHASHSEED (the verify-skill
    probe): run the oracle in two subprocesses with different seeds and
    compare full result CSVs byte-for-byte (timing columns excluded)."""
    import subprocess
    import sys

    script = r"""
import sys
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import corpus_tables
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.oracle import run_oracle
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions.docproc import TIMING_COLS
docs, gt = corpus_tables(80)
df = run_oracle(docs).to_pandas()
df = df.drop(columns=TIMING_COLS)
df["norm_spans"] = df["norm_spans"].map(
    lambda ss: "|".join(f"{s['kind']},{s['text']},{s['media_ref']},{s['offset']}" for s in ss))
df.to_csv(sys.argv[1], index=False)
"""
    outs = []
    for seed in ("0", "424242"):
        out = tmp_path / f"seed{seed}.csv"
        subprocess.run([sys.executable, "-c", script, str(out)],
                       env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin",
                            "HOME": "/root"},
                       cwd="/root/repo", check=True, timeout=240)
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


def test_session3_ops_identical_across_hash_seeds(tmp_path):
    """The dict/set-heavy session-3 operators (BPE learning, FastSS OCR
    correction, PMI mining) must be bit-identical across
    PYTHONHASHSEED values — their internal dict/set iteration orders
    must never leak into results (everything flows through explicit
    sorts/groupbys)."""
    import subprocess
    import sys

    script = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.bpe import q_bpe_learn
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.spellfix import q_ocr_correct
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import q_token_pmi
sf = "/root/testdata/sf0.001"
parts = []
parts.append(q_bpe_learn(sf).to_csv(index=False))
parts.append(q_ocr_correct(sf).to_pandas().to_csv(index=False))
parts.append(q_token_pmi(sf).to_csv(index=False))
with open(sys.argv[1], "w", encoding="utf-8") as f:
    f.write("\n====\n".join(parts))
ray.shutdown()
"""
    outs = []
    for seed in ("1", "31337"):
        out = tmp_path / f"s3seed{seed}.txt"
        subprocess.run([sys.executable, "-c", script, str(out)],
                       env={"PYTHONHASHSEED": seed,
                            "PATH": "/usr/bin:/bin", "HOME": "/root",
                            "RAY_ADDRESS": "local"},
                       cwd="/root/repo", check=True, timeout=420)
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
