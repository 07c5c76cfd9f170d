"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct — the same pattern as ``html:binary`` in the CDC table.
The decode/feature steps run as Arrow-batched ``mapInPandas`` so each
task processes whole record batches; the actual codec calls are STUBBED
(pillow/librosa are not in this container) behind ``DecoderRegistry`` —
the Spark-side contract (schema, batch shape, partitioning) is real and
tested, and a real decoder drops in as a one-line registration.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

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
                return decoders["image/resize"](payloads)
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
