"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Every document is a pure function of ``(corpus_seed, doc index)``: the same
index always yields the same spans, ground truth and chunking, at any
scale, in any process.  Content draws on the reference's own vocabulary
(brands/suffixes/patterns, utils/extractor.py:31-54,761-820) so every
extraction code path is exercised: lakh/crore costs, kW horsepower,
Hindi/Gujarati lines, PII strings, noise/empty spans, media spans,
media-heavy skew docs, and documents *chunked across multiple input rows*
with shuffled span order — the case that makes groupby(doc_id)+sort(offset)
reassembly semantically necessary.

Generation runs as a Ray ``map_batches`` over ``ray.data.range(n)`` (see
``pipelines.extract.generate_corpus``) so even a 10^12-doc corpus would be
produced distributively; tests call ``corpus_tables`` directly.
"""

from __future__ import annotations

import random

import pyarrow as pa

from ..functions import detect as D
from ..functions import fieldex as F
from ..schema import DOC_SCHEMA, GROUND_TRUTH_SCHEMA

_FIRST = ["Mahindra", "Rajesh", "Kumar", "Singh", "Patel", "Sharma",
          "Shree", "Balaji", "Ganesh", "Krishna", "Om", "Jay"]
_MID = ["Tractors", "Motors", "Automobiles", "Agencies", "Enterprises", "Sales"]
_SUFFIX = ["Pvt Ltd", "Private Limited", "Ltd", "Limited", "And Services", "Traders"]
_BRANDS = ["Mahindra", "SWARAJ", "New Holland", "Sonalika", "John Deere",
           "Eicher", "Powertrac", "Farmtrac"]
_MODEL_NUMS = ["575 DI", "744 FE", "3630", "475 DI", "735", "855", "963",
               "595 DI", "485", "605"]
_VILLAGES = ["Rampur", "Alipur", "Baroda", "Nashik", "Meerut", "Karnal"]
_HINDI = ["विक्रेता: ABC ट्रैक्टर्स", "मूल्य: रु 3,00,000", "हॉर्स पावर 50",
          "कुल राशि"]
_GUJARATI = ["ડીલર: XYZ ટ્રેક્ટર્સ", "કિંમત: રૂ 2,50,000", "કુલ રકમ"]
_PII = ["Contact: dealer@email.com Phone: 9876543210",
        "PAN: ABCDE1234F GST: 27ABCDE1234F1Z5",
        "Aadhar: 1234 5678 9012", "Date: 15/01/2024"]
_NOISE = ["|||", "___", "~~^", "....", "-----"]
_TERMS = ["Terms and Conditions apply", "Authorized Signatory",
          "Subject to jurisdiction", "E & OE"]

SKEW_EVERY = 613        # doc index stride for media-heavy skew docs
SKEW_FACTOR = 60
CHUNK_EVERY = 7         # every 7th doc is split across input rows
EMPTY_EVERY = 149       # docs with no usable text -> 'failed' rows


def _indian_commas(n: int) -> str:
    s = str(n)
    if len(s) <= 3:
        return s
    head, tail = s[:-3], s[-3:]
    parts = []
    while len(head) > 2:
        parts.insert(0, head[-2:])
        head = head[:-2]
    if head:
        parts.insert(0, head)
    return ",".join(parts + [tail])


def doc_id_of(index: int) -> str:
    return f"invoice_{index:08d}"


def generate_document(index: int, seed: int = 42) -> tuple[list[dict], dict]:
    """Returns (input rows for this doc, ground-truth row)."""
    rng = random.Random((seed << 32) ^ index)
    doc_id = doc_id_of(index)

    dealer = f"{rng.choice(_FIRST)} {rng.choice(_MID)} {rng.choice(_SUFFIX)}"
    brand = rng.choice(_BRANDS)
    model = f"{brand} {rng.choice(_MODEL_NUMS)}"
    hp = rng.choice([35, 40, 42, 45, 48, 50, 55, 60, 63, 75, 90])
    cost = rng.randrange(250_000, 1_500_000, 5_000)

    texts: list[str] = []
    if index % EMPTY_EVERY == 0 and index > 0:
        texts = ["", "   ", ""]          # no usable text -> failed row
    else:
        texts.append(rng.choice([
            f"M/s {dealer}", dealer, f"Dealer Name: {dealer}",
            f"QUOTATION FROM: {dealer}",
        ]))
        texts.append(f"Village: {rng.choice(_VILLAGES)}, Dist: {rng.choice(_VILLAGES)}")
        texts.append(rng.choice(["QUOTATION", "PROFORMA INVOICE", "TAX INVOICE"]))
        texts.append(rng.choice(_PII))
        texts.append(rng.choice([
            f"Model: {model}", f"Tractor Model: {model}", model,
        ]))
        texts.append("Engine Specifications")
        hp_style = rng.randrange(4)
        if hp_style == 0:
            texts.append(f"Horse Power: {hp} HP")
        elif hp_style == 1:
            texts.append(f"Power: {hp} HP")
        elif hp_style == 2:
            texts.append(f"{round(hp / 1.34, 1)} kW engine")
        else:
            texts.append(f"Engine Capacity: {hp} HP")
        texts.append("Financial Details")
        cost_style = rng.randrange(4)
        if cost_style == 0:
            texts.append(f"Ex-showroom Price: ₹{_indian_commas(cost)}")
            texts.append(f"Grand Total: ₹{_indian_commas(cost)}")
        elif cost_style == 1:
            texts.append(f"Total Amount: Rs. {_indian_commas(cost)}/-")
        elif cost_style == 2:
            lakh = cost / 100_000
            texts.append(f"Price: {lakh:g} Lakh")
            texts.append(f"Grand Total: {lakh:g} Lakh")
        else:
            texts.append(f"Amount Payable: {_indian_commas(cost)}")
        if rng.random() < 0.4:
            texts.append(rng.choice(_HINDI))
        if rng.random() < 0.3:
            texts.append(rng.choice(_GUJARATI))
        if rng.random() < 0.5:
            texts.append(rng.choice(_NOISE))
        if rng.random() < 0.3:
            texts.append("")             # dropped by the empty-text filter
        texts.append(rng.choice(_TERMS))

    n_media = rng.randrange(1, 4)
    is_skew = index % SKEW_EVERY == 0 and index > 0
    if is_skew:
        n_media = SKEW_FACTOR
        texts = texts + [f"line item {k} qty {k % 9 + 1}" for k in range(SKEW_FACTOR * 4)]

    media_refs = [f"m://{doc_id}/{k}" for k in range(n_media)]

    # interleave: media spans spread evenly through the reading order
    spans: list[dict] = []
    total = len(texts) + n_media
    media_positions = {((k + 1) * total // (n_media + 1)) for k in range(n_media)}
    # ensure unique positions even when total is small
    while len(media_positions) < n_media:
        media_positions.add(rng.randrange(total))
    media_positions = sorted(media_positions)[:n_media]
    mp = set(media_positions)
    ti = mi = 0
    for off in range(total):
        if off in mp and mi < n_media:
            spans.append({"kind": "media", "text": "", "media_ref": media_refs[mi],
                          "offset": off})
            mi += 1
        elif ti < len(texts):
            spans.append({"kind": "text", "text": texts[ti], "media_ref": "",
                          "offset": off})
            ti += 1
        else:
            spans.append({"kind": "media", "text": "", "media_ref": f"m://{doc_id}/x{off}",
                          "offset": off})

    # ground truth from planted values; media presence from the deterministic
    # classifier applied to the *planted* refs (the "true" classes)
    det = D.classify_document_media([s["media_ref"] for s in spans if s["kind"] == "media"])
    gt = {
        "doc_id": doc_id,
        "dealer_name": F.clean_dealer_name(dealer),
        "model_name": model.upper(),
        "horse_power": float(hp),
        "asset_cost": float(cost),
        "signature_present": det["signature"]["present"],
        "signature_bbox": det["signature"]["bbox"],
        "stamp_present": det["stamp"]["present"],
        "stamp_bbox": det["stamp"]["bbox"],
    }

    # chunking: split some docs across several input rows, rows emitted in
    # non-reading order (the reassembly stress case)
    if index % CHUNK_EVERY == 3 and len(spans) > 4:
        cut1, cut2 = len(spans) // 3, 2 * len(spans) // 3
        chunks = [spans[cut1:cut2], spans[cut2:], spans[:cut1]]
        rows = [{"doc_id": doc_id, "spans": ch} for ch in chunks if ch]
    else:
        rows = [{"doc_id": doc_id, "spans": spans}]
    return rows, gt


def generate_rows(indices, seed: int = 42) -> tuple[list[dict], list[dict]]:
    doc_rows, gt_rows = [], []
    for i in indices:
        rows, gt = generate_document(int(i), seed)
        doc_rows.extend(rows)
        gt_rows.append(gt)
    return doc_rows, gt_rows


def corpus_tables(n_docs: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Small-scale driver-side generation (tests / oracle)."""
    doc_rows, gt_rows = generate_rows(range(n_docs), seed)
    docs = pa.Table.from_pylist(doc_rows, schema=DOC_SCHEMA)
    gt = pa.Table.from_pylist(gt_rows, schema=GROUND_TRUTH_SCHEMA)
    return docs, gt


def structured_embeddings(n: int, dim: int = 64, n_clusters: int = 8,
                          subspaces: int = 8, palette: int = 8,
                          alpha: float = 0.6, beta: float = 0.8,
                          noise: float = 0.005, seed: int = 11):
    """Deterministic STRUCTURED embedding table — the intended-regime ANN
    recall counterpart to the testdata's i.i.d.-random vectors (on which
    product quantization has no subspace structure to exploit and recall
    is provably near its worst case).  Two-level structure of the kind
    IVF-PQ is built for:

    - a dominant CLUSTER component (``alpha`` · center) so the coarse
      quantizer recovers the clusters and true NNs co-locate in probed
      lists (IVF pruning ≈ lossless);
    - a per-SUBSPACE palette residual: each dim/``subspaces`` slice takes
      one of ``palette`` codewords (±orthonormal frame columns, scaled
      ``beta``), so vectors occupy ≤ n_clusters·palette distinct values
      per subspace — inside the PQ codebook budget ⇒ near-zero
      quantization error.  Geometric per-subspace weights make every
      distinct palette-match SET a distinct similarity (unique binary
      subset sums), so recall@1 is decided by structure, not noise ties;
    - centers live on frame column 0, palettes on columns 1.. ⇒ centers ⟂
      residuals exactly and every vector is unit-norm up to ``noise`` —
      no per-vector norm smear to scatter the codeword clouds;
    - gaussian ``noise`` keeps the corpus honest (ties broken, clouds
      have nonzero radius).

    Returns a pyarrow Table (vec_id int64, embedding list<float32>,
    label int32 = generating cluster) matching embeddings.parquet."""
    import numpy as np

    rng = np.random.RandomState(seed)
    dsub = dim // subspaces
    if palette > 2 * (dsub - 1):
        raise ValueError(f"palette {palette} exceeds ±(dsub-1)={2*(dsub-1)}")
    weights = np.sqrt(2.0 ** np.arange(subspaces))
    frames = np.stack([np.linalg.qr(rng.randn(dsub, dsub))[0]
                       for _ in range(subspaces)])
    g = rng.randn(n_clusters, subspaces)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    centers = np.zeros((n_clusters, dim))
    for s in range(subspaces):
        centers[:, s * dsub:(s + 1) * dsub] = (
            g[:, s:s + 1] * frames[s][:, 0][None, :])
    sign = np.where(np.arange(palette) % 2 == 0, 1.0, -1.0)
    ncols = (palette + 1) // 2
    pal = np.stack([frames[s][:, 1:1 + ncols].T
                    .repeat(2, axis=0)[:palette] * sign[:, None]
                    for s in range(subspaces)])
    label = rng.randint(0, n_clusters, size=n)
    choice = rng.randint(0, palette, size=(n, subspaces))
    resid = pal[np.arange(subspaces)[None, :], choice] * weights[None, :, None]
    pts = (alpha * centers[label]
           + beta * resid.reshape(n, dim) / np.sqrt((weights ** 2).sum())
           + noise * rng.randn(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([row.astype("float32").tolist() for row in pts],
                              type=pa.list_(pa.float32())),
        "label": pa.array(label.astype("int32"), type=pa.int32()),
    })
