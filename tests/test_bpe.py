"""Pins for BPE merge learning (pipelines/bpe.py).  The driver gate
compares against the unrolled SQL oracle; these pin the semantics with
an INDEPENDENT list-based reference (no string replace), so the
double-separator representation is validated against textbook BPE."""

from __future__ import annotations

from collections import Counter

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE on symbol LISTS: count adjacencies weighted, merge
    the max pair greedily left-to-right, repeat."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        (l, r), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_consecutive_pair_replace_representation() -> None:
    """'abab' under merge (a,b) must become [ab, ab] in BOTH the
    double-separator string representation and the list reference —
    the exact case plain single-separator replace gets wrong."""
    seq = "||" + "||".join("abab") + "||"
    replaced = seq.replace("|a||b|", "|ab|")
    assert replaced == "||ab||ab||"
    assert _ref_bpe({"abab": 1}, 1) == [("a", "b", 2)]


def test_bpe_learn_matches_list_reference(ray_session) -> None:
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.bpe import (
        N_MERGES,
        q_bpe_learn,
    )

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    wc: Counter = Counter()
    for t in texts:
        wc.update(t.lower().split())
    want = _ref_bpe(dict(wc), N_MERGES)

    got = q_bpe_learn(SF)
    assert len(got) == len(want)
    got_rows = list(got[["lsym", "rsym", "pair_count"]]
                    .itertuples(index=False, name=None))
    assert got_rows == want
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_bpe_vocab_apply_matches_list_reference(ray_session) -> None:
    """Final segmentation (not just the merge table) must equal the
    independent list-based reference for every vocabulary word."""
    from collections import Counter

    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.bpe import (
        N_MERGES,
        q_bpe_vocab_apply,
    )

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    wc: Counter = Counter()
    for t in texts:
        wc.update(t.lower().split())

    # independent application: learn with the list reference, then
    # re-segment each word with the learned merges greedily
    merges = _ref_bpe(dict(wc), N_MERGES)
    def segment(word: str) -> list[str]:
        syms = list(word)
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i+1] == r:
                    out.append(l + r); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms

    got = q_bpe_vocab_apply(SF).to_pandas()
    assert set(got.word) == set(wc)
    for row in got.itertuples(index=False):
        want = segment(row.word)
        assert row.seq == "||" + "||".join(want) + "||", row.word
        assert row.n_syms == len(want)
        assert row.cnt == wc[row.word]
