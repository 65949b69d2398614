"""Multimodal plumbing stages (stub kernels)."""

import pyarrow as pa
import pytest

def test_audio_resample_stub(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.multimodal import AudioResample

    tab = pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([b"aaa", b"bbbb"], type=pa.binary()),
    })
    out = AudioResample.apply(rd.from_arrow(tab), fake=True).to_pandas()
    assert list(out.columns) == ["media_id", "sample_rate", "window_energy"]
    assert out["sample_rate"].tolist() == [16000, 16000]
    assert all(len(w) == 8 for w in out["window_energy"])
    # deterministic: same payload -> same features
    out2 = AudioResample.apply(rd.from_arrow(tab), fake=True).to_pandas()
    for a, b in zip(out["window_energy"], out2["window_energy"]):
        assert list(a) == list(b)
    with pytest.raises(Exception):
        AudioResample(fake=False)
