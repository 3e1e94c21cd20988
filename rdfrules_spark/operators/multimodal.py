"""Multimodal (image/audio/video) column plumbing.

Media content is carried as opaque binary alongside typed metadata:
  media(doc_id string, media_ref string, kind string, content binary,
        meta struct<width int, height int, duration_ms int, codec string>)

The *Spark-side* machinery — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual decode/resize/
frame-sample bodies are STUBS (this container has no image/audio libs):
they raise NotImplementedError when `strict`, else apply a deterministic
fake transform so pipelines remain end-to-end testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Pull media spans out of the interleaved documents table into the
    typed media table; content is a deterministic placeholder payload."""
    m = documents.select(
        "doc_id", F.explode("spans").alias("sp")
    ).where(F.col("sp.kind") != "text")
    return m.select(
        "doc_id",
        F.col("sp.media_ref").alias("media_ref"),
        F.col("sp.kind").alias("kind"),
        F.encode(F.col("sp.media_ref"), "utf-8").alias("content"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.crc32(F.col("sp.media_ref")) % 60000).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _fake_feature(content: bytes, dim: int) -> list[float]:
    # deterministic stand-in for a real image/audio encoder
    h = sum(content) if content else 0
    return [((h * (i + 1)) % 997) / 997.0 for i in range(dim)]


def _pil_image_module():
    """The optional real decoder — Pillow if importable, else None. Kept a
    function so tests can monkeypatch a stub module in."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pil_feature(image_mod, content: bytes, dim: int) -> list[float]:
    """Real image decode path: grayscale thumbnail of ~dim pixels,
    normalized to [0, 1] — a genuine (if simple) content feature. Runs per
    Arrow batch inside mapInPandas; the lib does the heavy lifting in C."""
    import io  # noqa: PLC0415
    import math  # noqa: PLC0415

    side = max(1, int(math.isqrt(dim)))
    img = image_mod.open(io.BytesIO(content)).convert("L").resize((side, side))
    px = [v / 255.0 for v in img.getdata()][:dim]
    return px + [0.0] * (dim - len(px))


def extract_features(
    media: DataFrame,
    dim: int = 16,
    strict: bool = False,
    backend: str = "auto",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary).

    ``backend``: 'auto' uses Pillow for ``kind == 'image'`` rows when it is
    importable on the executors and the deterministic fake otherwise;
    'fake' forces the stub; 'pil' requires Pillow (raises per batch if
    missing). With no real decoder available, ``strict=True`` surfaces the
    NotImplementedError instead of silently faking.
    """
    if backend not in ("auto", "fake", "pil"):
        raise ValueError(f"unknown media backend: {backend}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil_image_module() if backend in ("auto", "pil") else None
        if backend == "pil" and image_mod is None:
            raise NotImplementedError(
                "backend='pil' requires Pillow, which is not importable "
                "on this executor"
            )

        def feat(kind: str, content: bytes) -> list[float]:
            if image_mod is not None and kind == "image":
                return _pil_feature(image_mod, content, dim)
            if strict:
                raise NotImplementedError(
                    f"no real decoder for kind={kind!r}: media decode "
                    "requires image/audio libs not present in this container"
                )
            return _fake_feature(content, dim)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": [
                        feat(k, c)
                        for k, c in zip(pdf["kind"], pdf["content"])
                    ],
                }
            )

    # repartition by doc so media of one doc co-locate (decode cache locality)
    return media.repartition("doc_id").mapInPandas(run, schema=FEATURE_SCHEMA)
