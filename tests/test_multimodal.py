"""Multimodal plumbing: classification, stubbed decode (fake decoder),
frame sampling — schema and determinism."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from text2mc_dataprocessor_spark.functions import multimodal as M


def test_classify_by_magic_bytes(spark):
    assets = M.synthetic_assets(spark, 40)
    out = M.classify_assets(assets).select("asset_id", "detected_kind").toPandas()
    for r in out.itertuples(index=False):
        want = {0: "image/png", 1: "image/jpeg", 2: "audio/wav", 3: "archive/zip"}[
            r.asset_id % 4
        ]
        assert r.detected_kind == want


def test_decode_stub_raises_without_fake(spark):
    assets = M.synthetic_assets(spark, 4)
    with pytest.raises(PythonException, match="NotImplementedError|codecs"):
        M.decode_assets(assets, fake=False).collect()


def test_fake_decode_deterministic_schema(spark):
    assets = M.synthetic_assets(spark, 50)
    a = M.decode_assets(assets, fake=True).toPandas().sort_values("asset_id")
    b = M.decode_assets(assets, fake=True).toPandas().sort_values("asset_id")
    assert list(a.columns) == ["asset_id", "kind", "width", "height", "mean", "features"]
    assert len(a) == 50
    assert all(len(f) == 8 for f in a.features)
    assert a.drop(columns="features").equals(b.drop(columns="features"))
    assert a.features.map(tuple).tolist() == b.features.map(tuple).tolist()


def test_frame_sample(spark):
    assets = M.synthetic_assets(spark, 30)
    out = M.frame_sample(assets, every_n_bytes=16, max_frames=4).toPandas()
    assert (out.n_frames <= 4).all()
    big = out[out.payload.map(len) >= 64]
    assert (big.n_frames == 4).all()
    for r in out.itertuples(index=False):
        for fr in r.frames:
            assert len(fr) == 4
