"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode/feature kernels require codec libraries that are not in this
container, so the *kernels* are stubbed behind ``try``-imports /
deterministic fakes — but the Ray-side plumbing (schemas, actor-pool
stage shape, small batch sizes for large payloads, output layout) is
real and tested (driver instruction: stub the decode, make the
plumbing real).
"""

from __future__ import annotations

import hashlib
import struct

import pyarrow as pa

import ray
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded pseudo-random
    bytes with a magic header so the fake 'decoder' can validate)."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = b"FAKE" + kind[:2].upper().encode() + h * 8
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        )
        rows["width"].append(64 + (i % 8) * 16 if kind != "audio" else -1)
        rows["height"].append(64 + (i % 5) * 16 if kind != "audio" else -1)
        rows["duration_ms"].append(-1 if kind == "image" else 1000 + i * 10)
    return pa.Table.from_pydict(dict(rows), schema=MEDIA_SCHEMA)


def _try_real_decoder():
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


class MediaFeatureStage:
    """Actor-pool decode/feature stage.

    Real deployment: ``__init__`` loads the codec/model once; here the
    decode is a deterministic fake (payload hash -> pseudo-features)
    unless a real codec library is importable.  Batch size MUST be kept
    small by the caller (large binary payloads; see ``extract_features``).
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.has_real_codec = _try_real_decoder()

    def _fake_features(self, payload: bytes) -> list[float]:
        d = hashlib.sha256(payload).digest()
        vals = struct.unpack("<%dH" % (len(d) // 2), d)[: self.feature_dim]
        return [round(v / 65535.0, 6) for v in vals]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload in batch.column("payload").to_pylist():
            if payload is None or not payload.startswith(b"FAKE"):
                if self.has_real_codec:
                    raise NotImplementedError(
                        "real decode path requires codec libs absent here"
                    )
                feats.append(None)
                ok.append(False)
                continue
            feats.append(self._fake_features(payload))
            ok.append(True)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "decoded_ok": pa.array(ok, pa.bool_()),
            }
        )


def extract_features(media: Dataset, feature_dim: int = 16) -> Dataset:
    """Decode + featurize media rows.  batch_size is deliberately small
    (binary payloads; batch x concurrency must fit worker heaps)."""
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )
