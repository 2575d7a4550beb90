"""Multimodal stub stages + low-confidence fallback branch."""

import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    fallback as FB,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    media as M,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.extract import (
    ExtractConfig,
    build_extraction,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
    corpus_tables,
)


def _no_tensor_casting():
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False


def test_payload_synthesis_deterministic():
    k1, p1, m1 = M.synthesize_payload("m://doc/0")
    k2, p2, m2 = M.synthesize_payload("m://doc/0")
    assert (k1, p1, m1) == (k2, p2, m2)
    assert k1 in M.MEDIA_KINDS and len(p1) >= 256


def test_feature_extractor_stub_contract():
    feats = M.MediaFeatureExtractor._fake_decode(b"\x00\x10\x20\xff")
    assert feats.shape == (16,)
    assert abs(feats.sum() - 1.0) < 1e-9
    with pytest.raises(NotImplementedError):
        M.MediaFeatureExtractor(real_codecs=True)


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_stages():
    _no_tensor_casting()
    docs, _ = corpus_tables(40)
    ds = rd.from_arrow(docs)
    media = M.media_table_from_docs(ds).materialize()
    mdf = media.to_pandas()
    assert len(mdf) > 40                       # ≥1 media span per doc
    assert set(mdf.media_kind) <= set(M.MEDIA_KINDS)
    assert all(isinstance(p, bytes) and len(p) >= 256 for p in mdf.payload)

    feats = M.build_media_features(ds, concurrency=2, batch_size=64).to_pandas()
    assert len(feats) == len(mdf)
    assert all(len(f) == 16 for f in feats.features)

    resized = media.map_batches(M.ImageResizer, batch_format="pyarrow",
                                concurrency=2, batch_size=64).to_pandas()
    img = resized[resized.media_kind == "image"]
    assert (img.out_width == 224).all() and (img.resized_digest != "").all()
    nonimg = resized[resized.media_kind != "image"]
    assert (nonimg.out_width == 0).all()

    sampled = media.map_batches(M.FrameSampler, batch_format="pyarrow",
                                concurrency=2, batch_size=64).to_pandas()
    if len(sampled):
        assert (sampled.media_kind != "image").all()
        assert (sampled.sample_ms > 0).all()


def test_fallback_trigger_predicate():
    base = {f: "x" for f in FB.CRITICAL}
    base.update({f + "_confidence": 0.9 for f in FB.CRITICAL})
    assert FB.needs_fallback_row({**base, "overall_confidence": 0.5})
    assert not FB.needs_fallback_row({**base, "overall_confidence": 0.9})
    # two low-confidence critical fields trigger even with high overall
    low2 = dict(base)
    low2["dealer_name"] = None
    low2["model_name_confidence"] = 0.3
    assert FB.needs_fallback_row({**low2, "overall_confidence": 0.9})


def test_merge_policies():
    fx = FB.FallbackExtractor()
    # fill-missing
    row = {"model_name": None, "model_name_confidence": 0.0}
    fx._merge_field(row, "model_name", "575 DI")
    assert row["model_name"] == "575 DI"
    assert row["model_name_confidence"] == FB.FALLBACK_CONFIDENCE
    # agreement boost x1.25 capped 0.95
    row = {"model_name": "575 DI", "model_name_confidence": 0.6}
    fx._merge_field(row, "model_name", "575di")
    assert row["model_name_confidence"] == pytest.approx(0.75)
    assert row["model_name_source"] == "rule+fallback_confirmed"
    # disagreement: higher confidence wins
    row = {"model_name": "575 DI", "model_name_confidence": 0.4}
    fx._merge_field(row, "model_name", "744 FE")
    assert row["model_name"] == "744 FE"
    assert row["model_name_source"] == "fallback_override"
    # disagreement with confident rule: rule kept
    row = {"model_name": "575 DI", "model_name_confidence": 0.9}
    fx._merge_field(row, "model_name", "744 FE")
    assert row["model_name"] == "575 DI"


@pytest.mark.usefixtures("ray_session")
def test_fallback_branch_end_to_end():
    _no_tensor_casting()
    docs, _ = corpus_tables(150)     # includes the no-text doc 149 (conf 0)
    cfg = ExtractConfig(num_partitions=4, salt_buckets=8, classify_concurrency=2)
    results = build_extraction(rd.from_arrow(docs), cfg)
    merged = FB.with_fallback(results, concurrency=2).to_pandas()
    assert len(merged) == 150
    assert "norm_spans" not in merged.columns
    assert set(merged.columns) >= {f + "_source" for f in FB.CRITICAL}
    # the failed doc went through the fallback branch
    failed = merged[merged.doc_id == "invoice_00000149"].iloc[0]
    assert failed.status == "failed"
    # high-confidence docs keep source 'rule'
    assert (merged[merged.overall_confidence >= 0.9].model_name_source
            .isin(["rule", "rule+fallback_confirmed"])).all()


@pytest.mark.usefixtures("ray_session")
def test_fallback_pluggable_extractor():
    """§2.10: the second-opinion extractor is pluggable (the reference's
    create_llm_extraction_prompt surface) — a custom callable replaces
    the scalar bank and its values flow through the merge policies."""
    import ray.data as rd

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.oracle import (
        run_oracle,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.fallback import (
        with_fallback,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
        corpus_tables,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False
    docs, _ = corpus_tables(160)   # includes the no-text 'failed' doc
    res = rd.from_arrow(run_oracle(docs))

    def my_llm(text: str) -> dict:
        return {"dealer_name": "PLUGGED DEALER", "model_name": None,
                "horse_power": None, "asset_cost": None}

    out = with_fallback(res, concurrency=2, extract_fn=my_llm).to_pandas()
    plugged = out[out.dealer_name == "PLUGGED DEALER"]
    assert len(plugged) > 0
    assert (plugged.dealer_name_source == "fallback_fill").all()
