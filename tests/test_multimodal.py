"""Multimodal media-column plumbing (operators/multimodal.py): Arrow
mapInPandas decode with the optional real backend (Pillow, gated behind an
import-try — absent in this container, so the real path is exercised with
a deterministic stub image module) and the declared fake fallback."""

from __future__ import annotations

import pytest

from rdfrules_spark.operators import multimodal as mm


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", [("text", "hello", None, 0),
                    ("image", None, "img://a", 1)]),
            ("d2", [("audio", None, "aud://b", 0)]),
        ],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )


def test_media_table_and_fake_features(spark):
    media = mm.media_from_documents(_docs(spark))
    rows = {(r.doc_id, r.kind, r.media_ref) for r in media.collect()}
    assert rows == {("d1", "image", "img://a"), ("d2", "audio", "aud://b")}

    feats = mm.extract_features(media, dim=4).collect()
    assert len(feats) == 2
    by_ref = {r.media_ref: r.feature for r in feats}
    # deterministic fake: same content -> same feature, right width
    # (the Spark column is float32, so compare approximately)
    assert by_ref["img://a"] == pytest.approx(
        mm._fake_feature(b"img://a", 4), rel=1e-6
    )
    assert all(len(f) == 4 for f in by_ref.values())


def test_strict_raises_without_decoder(spark):
    media = mm.media_from_documents(_docs(spark))
    with pytest.raises(Exception, match="no real decoder"):
        mm.extract_features(media, dim=4, strict=True).collect()


def test_backend_pil_raises_when_absent(spark):
    media = mm.media_from_documents(_docs(spark))
    with pytest.raises(Exception, match="requires Pillow"):
        mm.extract_features(media, dim=4, backend="pil").collect()


def test_backend_validation(spark):
    media = mm.media_from_documents(_docs(spark))
    with pytest.raises(ValueError, match="unknown media backend"):
        mm.extract_features(media, backend="nope")


class _StubImage:
    """Deterministic stand-in for PIL.Image: 'decodes' any payload into a
    gradient whose values depend only on the requested thumbnail size."""

    def open(self, bio):
        return self

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, wh):
        self._wh = wh
        return self

    def getdata(self):
        w, h = self._wh
        return [(i * 17) % 256 for i in range(w * h)]


def test_pil_feature_path_with_stub_module():
    feat = mm._pil_feature(_StubImage(), b"\x89PNG...", dim=16)
    assert len(feat) == 16
    assert feat == [((i * 17) % 256) / 255.0 for i in range(16)]
    # non-square dim pads with zeros
    feat5 = mm._pil_feature(_StubImage(), b"x", dim=5)
    assert len(feat5) == 5 and feat5[-1] == 0.0
