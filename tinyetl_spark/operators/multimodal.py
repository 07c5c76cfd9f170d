"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct — the same pattern as ``html:binary`` in the CDC table.
The decode/feature steps run as Arrow-batched ``mapInPandas`` so each
task processes whole record batches. Codec calls route through
``DecoderRegistry``: formats needing external libraries (jpeg, mp4 —
not in this container) stay STUBBED with deterministic fakes, while PPM
images and PCM WAV audio have REAL dependency-free codecs
(``media_codecs.py``, registered via ``register_builtin_decoders``), so
the whole pipeline — binary payload → parse → typed features/resize —
runs genuinely end-to-end and is oracle-verified.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StringType,
                               StructField, StructType)

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("byte_len", LongType(), True),
    StructField("sha", StringType(), True),
])

FEATURE_SCHEMA = StructType(MEDIA_META_SCHEMA.fields + [
    StructField("feature", StringType(), True),      # decoder output (stub: digest)
])


class DecoderRegistry:
    """kind -> batch decoder ``(pd.Series of bytes) -> pd.Series``.

    Real deployments register e.g. an image resize+embed function here.
    The default is a deterministic fake so pipelines are testable without
    codec libraries; an unknown kind raises, marking where the real
    implementation goes.
    """
    _decoders: dict[str, Callable[[pd.Series], pd.Series]] = {}

    @classmethod
    def register(cls, kind: str, fn: Callable[[pd.Series], pd.Series]) -> None:
        cls._decoders[kind] = fn

    @classmethod
    def decode(cls, kind: str, payloads: pd.Series) -> pd.Series:
        if kind in cls._decoders:
            return cls._decoders[kind](payloads)
        if kind in ("image", "audio", "video"):
            # STUB: deterministic fake "feature" = sha1 prefix of payload.
            # Replace via DecoderRegistry.register(kind, real_fn).
            return payloads.map(lambda b: None if b is None
                                else f"{kind}-feat-" + hashlib.sha1(b).hexdigest()[:16])
        raise NotImplementedError(f"no decoder registered for media kind {kind!r}")


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata derived JVM-side (no Python): byte length + digest."""
    p = F.col(payload_col)
    return (df.withColumn("byte_len", F.octet_length(p).cast("long"))
              .withColumn("sha", F.sha1(p)))


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas. Partitioning by
    kind keeps each batch homogeneous so one decoder handles it."""
    out_schema = FEATURE_SCHEMA
    # snapshot the registry at PLAN time: executors re-import this module
    # and would otherwise see an empty class-level dict; the snapshot rides
    # in the (cloudpickled) closure instead.
    decoders = dict(DecoderRegistry._decoders)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import pandas as pd

        def decode(kind, payloads):
            if kind in decoders:
                return decoders[kind](payloads)
            if kind in ("image", "audio", "video"):
                return payloads.map(lambda b: None if b is None
                                    else f"{kind}-feat-" + _hl.sha1(bytes(b)).hexdigest()[:16])
            raise NotImplementedError(f"no decoder registered for media kind {kind!r}")

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for kind, grp in pdf.groupby("kind", sort=False):
                s = decode(kind, grp["payload"])
                feats.append(pd.Series(s.values, index=grp.index))
            pdf = pdf.copy()
            pdf["feature"] = pd.concat(feats).reindex(pdf.index) if feats else None
            yield pdf

    cols = [f.name for f in MEDIA_META_SCHEMA.fields]
    return (df.select(*cols)
              .repartition("kind")
              .mapInPandas(run, schema=out_schema))


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),      # resized bytes
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
])


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: Arrow-batched, homogeneous batches, typed
    output. The pixel work is a registered decoder under the key
    ``image/resize`` — absent codec libs, the stub emits a deterministic
    fake payload (a marker header + the source digest) so the batch
    shape, schema, and null propagation are fully testable; a pillow
    implementation is a one-line registration."""
    decoders = dict(DecoderRegistry._decoders)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import pandas as pd

        def resize(payloads: pd.Series) -> pd.Series:
            if "image/resize" in decoders:
                return decoders["image/resize"](payloads, width, height)
            return payloads.map(
                lambda b: None if b is None else
                f"RESIZED:{width}x{height}:".encode()
                + _hl.sha1(bytes(b)).digest())

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[pdf["kind"] == "image"].copy()
            if len(out) == 0:
                continue
            out["payload"] = resize(out["payload"])
            out["width"] = pd.array(
                [None if v is None else width for v in out["payload"]],
                dtype="Int64")
            out["height"] = pd.array(
                [None if v is None else height for v in out["payload"]],
                dtype="Int64")
            yield out[["media_id", "kind", "payload", "width", "height"]]

    return (df.select("media_id", "kind", "payload")
              .repartition("kind")
              .mapInPandas(run, schema=RESIZED_SCHEMA))


FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_no", LongType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(df: DataFrame, num_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: a 1→N row expansion inside
    mapInPandas (each video row yields ``num_frames`` frame rows). The
    frame decode is the registered ``video/frames`` decoder; the stub
    derives deterministic fake frames from the payload digest so the
    expansion shape and ordering are testable without codecs."""
    decoders = dict(DecoderRegistry._decoders)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import pandas as pd

        def frames(b: bytes) -> list[bytes]:
            if "video/frames" in decoders:
                return decoders["video/frames"](b, num_frames)
            d = _hl.sha1(bytes(b)).digest()
            return [b"FRAME:%d:" % i + d for i in range(num_frames)]

        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if len(vids) == 0:
                continue
            rows = []
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                if payload is None:
                    continue
                for i, fr in enumerate(frames(payload)):
                    rows.append((int(mid), i, fr))
            if rows:
                yield pd.DataFrame(rows,
                                   columns=["media_id", "frame_no", "frame"])

    return (df.select("media_id", "kind", "payload")
              .repartition("kind")
              .mapInPandas(run, schema=FRAMES_SCHEMA))


# ------------------------------------------------------- real codec paths
# PPM images and PCM WAV audio decode with stdlib struct + numpy only
# (operators/media_codecs.py), so these two stats operators run a REAL
# decoder through the same Arrow-batched plumbing the stubs exercise.

IMAGE_STATS_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("maxval", LongType(), True),
    StructField("mean_r", DoubleType(), True),
    StructField("mean_g", DoubleType(), True),
    StructField("mean_b", DoubleType(), True),
])

AUDIO_STATS_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("channels", LongType(), True),
    StructField("sample_rate", LongType(), True),
    StructField("bits", LongType(), True),
    StructField("n_frames", LongType(), True),
    StructField("rms", DoubleType(), True),
    StructField("peak", LongType(), True),
])


def _stats_operator(df: DataFrame, stats_fn, fields, schema) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((int(mid),) + (None,) * len(fields))
                    continue
                s = stats_fn(bytes(payload))
                rows.append((int(mid),) + tuple(s[f] for f in fields))
            yield pd.DataFrame(rows, columns=["media_id", *fields])

    return (df.select("media_id", "payload")
              .mapInPandas(run, schema=schema))


def image_stats(df: DataFrame) -> DataFrame:
    """Decode PPM payloads (REAL parser) into typed features: dimensions
    + exact per-channel means. Arrow-batched; no repartition needed —
    batches are homogeneous by construction (payload column only)."""
    from tinyetl_spark.operators.media_codecs import ppm_stats
    return _stats_operator(df, ppm_stats,
                           ["width", "height", "maxval",
                            "mean_r", "mean_g", "mean_b"],
                           IMAGE_STATS_SCHEMA)


def audio_stats(df: DataFrame) -> DataFrame:
    """Decode PCM WAV payloads (REAL RIFF chunk walker) into amplitude
    features."""
    from tinyetl_spark.operators.media_codecs import wav_stats
    return _stats_operator(df, wav_stats,
                           ["channels", "sample_rate", "bits",
                            "n_frames", "rms", "peak"],
                           AUDIO_STATS_SCHEMA)


def register_builtin_decoders() -> None:
    """Swap the stub decoders for the real PPM/WAV codecs: feature
    strings for image/audio kinds, true nearest-neighbor pixel resize
    for ``image/resize``. Video stays a stub (no container parser)."""
    from tinyetl_spark.operators import media_codecs as MC

    def image_feat(payloads: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            b = bytes(b)
            # magic-byte sniff: a real crawl column mixes formats
            if b.startswith(b"\x89PNG"):
                s = MC.png_stats(b)
                return (f"png:{s['width']}x{s['height']}"
                        f":mean={s['mean_r']:.2f}/{s['mean_g']:.2f}"
                        f"/{s['mean_b']:.2f}")
            s = MC.ppm_stats(b)
            return (f"ppm:{s['width']}x{s['height']}"
                    f":mean={s['mean_r']:.2f}/{s['mean_g']:.2f}/{s['mean_b']:.2f}")
        return payloads.map(one)

    def audio_feat(payloads: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            s = MC.wav_stats(bytes(b))
            return (f"wav:{s['channels']}ch:{s['sample_rate']}hz"
                    f":{s['n_frames']}f:rms={s['rms']:.2f}")
        return payloads.map(one)

    def image_resize(payloads: pd.Series, width: int, height: int) -> pd.Series:
        def one(b):
            if b is None:
                return None
            b = bytes(b)
            if b.startswith(b"\x89PNG"):
                return MC.resize_png(b, width, height)
            return MC.resize_ppm(b, width, height)
        return payloads.map(one)

    DecoderRegistry.register("image", image_feat)
    DecoderRegistry.register("audio", audio_feat)
    DecoderRegistry.register("image/resize", image_resize)


def register_pillow_codecs() -> bool:
    """Optional-dependency image codecs (round-5 verdict #4): when Pillow
    is importable, register an ``image`` feature decoder and an
    ``image/resize`` decoder that open ANY Pillow-supported format
    (JPEG/PNG/WebP/...) — a real crawl is ~0% PPM. Returns False (and
    registers nothing) when Pillow is absent, so the dependency-free
    PPM/PNG codecs stay in charge; the registry seam and batch shapes
    are identical either way. Output strings deliberately match
    ``register_builtin_decoders``'s ``<fmt>:<w>x<h>:mean=...`` shape."""
    try:
        from PIL import Image
    except ImportError:
        return False
    import io

    import numpy as np

    def image_feat(payloads: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            im = Image.open(io.BytesIO(bytes(b)))
            arr = np.asarray(im.convert("RGB"), dtype=np.float64)
            m = arr.reshape(-1, 3).mean(axis=0)
            fmt = (im.format or "img").lower()
            return (f"{fmt}:{im.width}x{im.height}"
                    f":mean={m[0]:.2f}/{m[1]:.2f}/{m[2]:.2f}")
        return payloads.map(one)

    def image_resize(payloads: pd.Series, width: int, height: int) -> pd.Series:
        def one(b):
            if b is None:
                return None
            im = Image.open(io.BytesIO(bytes(b)))
            out = io.BytesIO()
            im.resize((width, height), Image.NEAREST).save(
                out, format=im.format or "PNG")
            return out.getvalue()
        return payloads.map(one)

    DecoderRegistry.register("image", image_feat)
    DecoderRegistry.register("image/resize", image_resize)
    return True
