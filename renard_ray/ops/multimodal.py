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
        # pure function of the payload BYTES, phrased so a DuckDB twin
        # can reproduce it exactly: hash the UPPERCASE HEX form (DuckDB's
        # sha256 only accepts VARCHAR, and hex(blob) is uppercase), and
        # scale each little-endian uint16 by 2^-16 — exactly
        # representable in a double, so no rounding-mode drift between
        # Python round() and SQL ROUND() can creep in
        d = hashlib.sha256(payload.hex().upper().encode()).digest()
        vals = struct.unpack("<%dH" % (len(d) // 2), d)[: self.feature_dim]
        return [v / 65536.0 for v in vals]

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


class MediaResizeStage:
    """Actor-pool image-resize stage (the preprocess step in front of
    any vision model): codec handle belongs in ``__init__`` (stubbed —
    real path raises ``NotImplementedError`` per the driver
    instruction), ``__call__`` rewrites payload + dims per batch.  The
    fake 'resize' derives a deterministic payload from (source payload
    digest, target dims) so downstream stages see realistic binary
    churn; non-image rows pass through untouched.  ``resized_ok`` is
    False ONLY for image rows whose payload could not be decoded (the
    ``MediaFeatureStage.decoded_ok`` convention — a downstream vision
    stage assuming uniform target dims filters on it instead of
    silently receiving unresized images)."""

    def __init__(self, width: int = 224, height: int = 224):
        assert width > 0 and height > 0
        self.width, self.height = width, height
        self.has_real_codec = _try_real_decoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_pay, out_w, out_h, ok = [], [], [], []
        for k, p, w, h in zip(
            kinds,
            payloads,
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if k != "image" or p is None or not p.startswith(b"FAKE"):
                if k == "image" and p is not None and self.has_real_codec:
                    raise NotImplementedError(
                        "real resize path requires codec libs absent here"
                    )
                out_pay.append(p)
                out_w.append(w)
                out_h.append(h)
                ok.append(k != "image")  # undecodable image -> False
                continue
            # derivation hashes the ASCII (hex payload + dims) form so
            # the DuckDB twin can reproduce it (sha256 there is
            # VARCHAR-only); still a pure function of (payload, w, h)
            d = hashlib.sha256(
                (p.hex().upper() + f":{self.width}:{self.height}").encode()
            ).digest()
            out_pay.append(b"FAKE" + b"IM" + d * 8)
            out_w.append(self.width)
            out_h.append(self.height)
            ok.append(True)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(out_pay, pa.binary()),
                "mime": batch.column("mime"),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "duration_ms": batch.column("duration_ms"),
                "resized_ok": pa.array(ok, pa.bool_()),
            }
        )


def resize_images(media: Dataset, width: int = 224, height: int = 224) -> Dataset:
    """Resize every image row to (width, height) — actor pool, small
    batches (binary payloads)."""
    return media.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )


class FrameSampleStage:
    """Actor-pool video frame sampler — the 1->N row fan-out plumbing
    (one output row PER SAMPLED FRAME, binary frame payload): frames
    at ``interval_ms`` steps from 0 while inside the clip, capped at
    ``max_frames``.  Decode is the deterministic fake; the real
    decoder slot follows the house ``__init__`` convention."""

    def __init__(self, interval_ms: int = 500, max_frames: int = 8):
        assert interval_ms > 0 and max_frames > 0
        self.interval_ms, self.max_frames = interval_ms, max_frames
        self.has_real_codec = _try_real_decoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ts, pay, ws, hs = [], [], [], [], [], []
        for mid, k, p, w, h, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if k != "video" or p is None or dur is None or dur <= 0:
                continue
            if not p.startswith(b"FAKE"):
                if self.has_real_codec:
                    raise NotImplementedError(
                        "real frame decode requires codec libs absent here"
                    )
                continue
            n = min(self.max_frames, 1 + (dur - 1) // self.interval_ms)
            for i in range(n):
                t = i * self.interval_ms
                # ASCII-form derivation for SQL reproducibility (see
                # MediaResizeStage note)
                d = hashlib.sha256(
                    (p[:32].hex().upper() + f":{mid}:{t}").encode()
                ).digest()
                ids.append(mid)
                fidx.append(i)
                ts.append(t)
                pay.append(b"FAKE" + b"FR" + d * 4)
                ws.append(w)
                hs.append(h)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int32()),
                "frame": pa.array(pay, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )


def sample_frames(
    media: Dataset, interval_ms: int = 500, max_frames: int = 8
) -> Dataset:
    """One row per sampled video frame (small batches: the fan-out
    multiplies binary payloads, so batch x max_frames x concurrency
    must fit worker heaps)."""
    return media.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={
            "interval_ms": interval_ms, "max_frames": max_frames,
        },
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 4),
    )


class AudioChunkStage:
    """Actor-pool audio chunker: fixed ``chunk_ms`` windows over the
    clip (last window truncates at the clip end), one output row per
    chunk with a deterministic fake waveform payload."""

    def __init__(self, chunk_ms: int = 1000, max_chunks: int = 16):
        assert chunk_ms > 0 and max_chunks > 0
        self.chunk_ms, self.max_chunks = chunk_ms, max_chunks
        self.has_real_codec = _try_real_decoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, cidx, st, en, pay = [], [], [], [], []
        for mid, k, p, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if k != "audio" or p is None or dur is None or dur <= 0:
                continue
            if not p.startswith(b"FAKE"):
                if self.has_real_codec:
                    raise NotImplementedError(
                        "real audio decode requires codec libs absent here"
                    )
                continue
            n = min(self.max_chunks, 1 + (dur - 1) // self.chunk_ms)
            for i in range(n):
                s = i * self.chunk_ms
                e = min(dur, s + self.chunk_ms)
                # ASCII-form derivation for SQL reproducibility (see
                # MediaResizeStage note)
                d = hashlib.sha256(
                    (p[:32].hex().upper() + f":{mid}:{s}:{e}").encode()
                ).digest()
                ids.append(mid)
                cidx.append(i)
                st.append(s)
                en.append(e)
                pay.append(b"FAKE" + b"AU" + d * 4)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(cidx, pa.int32()),
                "start_ms": pa.array(st, pa.int32()),
                "end_ms": pa.array(en, pa.int32()),
                "chunk": pa.array(pay, pa.binary()),
            }
        )


def chunk_audio(
    media: Dataset, chunk_ms: int = 1000, max_chunks: int = 16
) -> Dataset:
    """One row per fixed-width audio window — actor pool, small
    batches (binary fan-out)."""
    return media.map_batches(
        AudioChunkStage,
        fn_constructor_kwargs={
            "chunk_ms": chunk_ms, "max_chunks": max_chunks,
        },
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 4),
    )
