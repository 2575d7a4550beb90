"""Multimodal real-decode stages + low-confidence fallback branch."""

import hashlib

import numpy as np
import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    rawmedia as rm,
)
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


def test_ppm_roundtrip_and_resize():
    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, size=(13, 21, 3)).astype(np.uint8)
    buf = rm.encode_ppm(pix)
    assert buf[:2] == b"P6" and rm.sniff_kind(buf) == "image"
    assert np.array_equal(rm.decode_ppm(buf), pix)
    # comment lines in the header are legal PPM
    commented = b"P6\n# made by a test\n21 13\n255\n" + pix.tobytes()
    assert np.array_equal(rm.decode_ppm(commented), pix)
    small = rm.resize_nearest(pix, 5, 4)
    assert small.shape == (4, 5, 3)
    # nearest-neighbor: every output pixel exists in the input
    assert small[0, 0] in pix.reshape(-1, 3)
    same = rm.resize_nearest(pix, 21, 13)
    assert np.array_equal(same, pix)


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 30, 4000)) * 12000).astype(np.int16)
    buf = rm.encode_wav(samples, rate=4000)
    assert rm.sniff_kind(buf) == "audio"
    rate, back = rm.decode_wav(buf)
    assert rate == 4000 and np.array_equal(back, samples)


def test_vid_container_seek():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(6, 8, 3)).astype(np.uint8)
              for _ in range(5)]
    buf = rm.encode_vid(frames, fps_milli=10_000)
    assert rm.sniff_kind(buf) == "video"
    assert rm.vid_info(buf) == (5, 10_000)
    for i in (0, 2, 4):
        assert np.array_equal(rm.decode_vid_frame(buf, i), frames[i])
    with pytest.raises(IndexError):
        rm.decode_vid_frame(buf, 5)


def test_synthesized_metadata_matches_decode():
    """The typed metadata columns ARE what decoding the payload yields."""
    seen = set()
    for i in range(60):
        kind, payload, meta = M.synthesize_payload(f"m://probe/{i}")
        seen.add(kind)
        assert rm.sniff_kind(payload) == kind
        if kind == "image":
            pix = rm.decode_ppm(payload)
            assert pix.shape == (meta["height"], meta["width"], 3)
        elif kind == "audio":
            rate, samples = rm.decode_wav(payload)
            assert len(samples) * 1000 // rate == meta["duration_ms"]
        else:
            n, fps_milli = rm.vid_info(payload)
            f0 = rm.decode_vid_frame(payload, 0)
            assert f0.shape == (meta["height"], meta["width"], 3)
            assert n * (1_000_000 // fps_milli) == meta["duration_ms"]
    assert seen == set(M.MEDIA_KINDS)


def test_feature_extractor_contract():
    # unknown-format fallback: byte histogram
    feats = M.MediaFeatureExtractor._fake_decode(b"\x00\x10\x20\xff")
    assert feats.shape == (16,)
    assert abs(feats.sum() - 1.0) < 1e-9
    # external compressed codecs remain an honest seam
    with pytest.raises(NotImplementedError):
        M.MediaFeatureExtractor(real_codecs=True)
    # image features are the exact luma histogram of the decoded pixels
    _, payload, meta = M.synthesize_payload("m://img-probe/2")  # any ref
    kind = rm.sniff_kind(payload)
    feat, w, h, n_frames = M.MediaFeatureExtractor._decode_one(payload)
    assert abs(feat.sum() - 1.0) < 1e-9
    if kind == "image":
        lum = rm.luminance(rm.decode_ppm(payload))
        want = np.bincount((lum >> 4).ravel(), minlength=16) / lum.size
        assert np.allclose(feat, want)
        assert (w, h, n_frames) == (meta["width"], meta["height"], 1)


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
    # decoded geometry equals the typed metadata columns, per kind
    merged = feats.merge(mdf[["media_ref", "width", "height"]],
                         on="media_ref")
    vis = merged[merged.media_kind != "audio"]
    assert (vis.dec_width == vis.width).all()
    assert (vis.dec_height == vis.height).all()
    assert (merged[merged.media_kind == "image"].n_frames == 1).all()
    assert (merged[merged.media_kind == "video"].n_frames >= 2).all()
    assert (merged[merged.media_kind == "audio"].dec_width == 0).all()

    resized = media.map_batches(M.ImageResizer, batch_format="pyarrow",
                                concurrency=2, batch_size=64).to_pandas()
    img = resized[resized.media_kind == "image"]
    assert (img.out_width == 224).all() and (img.resized_digest != "").all()
    nonimg = resized[resized.media_kind != "image"]
    assert (nonimg.out_width == 0).all()
    # the digest is of the ACTUAL resized raster
    ref0 = img.iloc[0].media_ref
    _, payload0, _ = M.synthesize_payload(ref0)
    want = hashlib.blake2b(
        rm.resize_nearest(rm.decode_ppm(payload0), 224, 224).tobytes(),
        digest_size=8).hexdigest()
    assert img.iloc[0].resized_digest == want

    sampled = media.map_batches(M.FrameSampler, batch_format="pyarrow",
                                concurrency=2, batch_size=64).to_pandas()
    n_av = (mdf.media_kind != "image").sum()
    assert len(sampled) == 4 * n_av          # n_samples per audio/video row
    assert (sampled.media_kind != "image").all()
    assert (sampled.sample_ms > 0).all()
    assert sampled.frame_stat_milli.between(0, 1000).all()
    # synth audio is a loud sine: its RMS stat should be well off zero
    assert (sampled[sampled.media_kind == "audio"]
            .frame_stat_milli > 10).any()


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
