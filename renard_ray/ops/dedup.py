"""Deduplication operators over the ``documents`` table.

Five families, each a Ray-Data-native pipeline (SURVEY-mandated
training-data operators):

- exact: md5 of normalized text -> hash-partitioned groupby -> keep the
  min doc_id per hash (the classic hash-partition + per-group-first).
- minhash + LSH: word-shingle minhash signatures -> band buckets ->
  groupby(band, bucket) -> candidate pairs -> union-find components.
- simhash: 64-bit simhash over word features; near-dups = same value
  after masking k rotations (banding on bit chunks).
- n-gram Jaccard: verification kernel used on LSH candidates (exact
  Jaccard over shingle sets, computed per candidate pair).
- embedding cosine: near-dup pairs over the ``embeddings`` table via
  LSH-free blockwise cosine (delegates to ``ops.similarity``).

At 100 TB scale the shuffles are all keyed on short hashes (no text
moves after the signature stage), and signatures are computed in one
streaming pass.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

_WS_RE = re.compile(r"\s+")


def _read_documents(sf_dir: str, columns: list[str]) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _normalize(t: str | None) -> str:
    return " ".join(_WS_RE.split((t or "").strip().lower()))


# ---------------------------------------------------------------- exact


def exact_dedup_groups(sf_dir: str) -> Dataset:
    """One row per distinct text hash: (text_md5, keeper_doc_id,
    n_copies).  SQL-oracle-checkable."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(_normalize(t).encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "text_md5": pa.array(md5s, pa.string()),
                "doc_id": batch.column("doc_id"),
            }
        )

    return (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(
            Min("doc_id", alias_name="keeper_doc_id"),
            Count(alias_name="n_copies"),
        )
    )


def exact_dedup_keep(sf_dir: str) -> Dataset:
    """The surviving documents after exact dedup (keeper rows only)."""
    groups = exact_dedup_groups(sf_dir).select_columns(["keeper_doc_id"])
    docs = _read_documents(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
    return docs.join(
        groups,
        join_type="inner",
        num_partitions=16,
        on=("doc_id",),
        right_on=("keeper_doc_id",),
    ).select_columns(["doc_id", "lang", "source", "n_chars"])


# -------------------------------------------------------------- minhash


def _shingles(text: str, k: int = 5) -> set[bytes]:
    words = _normalize(text).split()
    if len(words) < k:
        return {(" ".join(words)).encode()} if words else set()
    return {(" ".join(words[i : i + k])).encode() for i in range(len(words) - k + 1)}


_MERSENNE = (1 << 61) - 1


def _minhash_params(n_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    text: str, a: np.ndarray, b: np.ndarray, k: int = 5
) -> np.ndarray:
    sh = _shingles(text, k)
    if not sh:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    hv = np.array(
        [zlib.crc32(s) for s in sh], dtype=np.uint64
    )  # base hashes
    # (a * h + b) mod p, vectorized over permutations x shingles
    prod = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


class MinHashStage:
    """Actor-pool stage: per-doc minhash signature + LSH band keys.

    Permutation params are built once per actor (``__init__``), the
    per-batch work is vectorized numpy.
    """

    def __init__(self, n_perm: int = 128, n_bands: int = 32, shingle_k: int = 5):
        assert n_perm % n_bands == 0
        self.a, self.b = _minhash_params(n_perm)
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        bands: list[int] = []
        buckets: list[int] = []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = minhash_signature(t, self.a, self.b, self.k)
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bucket = zlib.crc32(chunk.tobytes()) & 0x7FFFFFFF
                doc_ids.append(doc_id)
                bands.append(band)
                buckets.append(bucket)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )


def minhash_candidate_pairs(
    sf_dir: str,
    n_perm: int = 128,
    n_bands: int = 32,
    shingle_k: int = 5,
    max_bucket: int = 200,
) -> Dataset:
    """LSH candidate pairs: documents sharing any (band, bucket).

    Implemented as a vectorized SELF-JOIN on (band, bucket) — one hash
    shuffle, no per-group Python calls (a ``map_groups`` over the ~#docs
    x bands tiny groups is framework-overhead-bound).  Buckets larger
    than ``max_bucket`` (boilerplate/empty-text collisions) are dropped
    before the join to cap the pair blowup — standard LSH practice; the
    drop is logged via the returned pair counts being bounded.
    Output: distinct (a, b) with a < b.
    """
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "n_perm": n_perm,
            "n_bands": n_bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).materialize()

    # oversized buckets out (their membership set is small: one row per
    # oversized (band, bucket))
    from ray.data.aggregate import Count

    sizes = sigs.groupby(["band", "bucket"]).aggregate(Count(alias_name="n"))
    big_set = {
        (r["band"], r["bucket"])
        for r in sizes.filter(expr=f"n > {max_bucket}").take_all()
    }
    if big_set:
        big_ref = ray.put(big_set)

        def drop_big(batch: pa.Table) -> pa.Table:
            bs = ray.get(big_ref)
            mask = [
                (band, bucket) not in bs
                for band, bucket in zip(
                    batch.column("band").to_pylist(),
                    batch.column("bucket").to_pylist(),
                )
            ]
            return batch.filter(pa.array(mask, pa.bool_()))

        sigs = sigs.map_batches(drop_big, batch_format="pyarrow")

    rhs = sigs.map_batches(
        lambda b: pa.table(
            {"band": b.column("band"), "bucket": b.column("bucket"), "b_id": b.column("doc_id")}
        ),
        batch_format="pyarrow",
    )
    joined = sigs.join(
        rhs,
        join_type="inner",
        num_partitions=8,
        on=("band", "bucket"),
    )

    def ordered(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = batch.column("doc_id")
        b = batch.column("b_id")
        keep = pc.less(a, b)
        t = pa.table({"a": pc.filter(a, keep), "b": pc.filter(b, keep)})
        if t.num_rows:
            t = t.group_by(["a", "b"]).aggregate([]).select(["a", "b"])
        return t

    cand = joined.map_batches(ordered, batch_format="pyarrow")
    return cand.groupby(["a", "b"]).count().select_columns(["a", "b"])


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    n_perm: int = 128,
    n_bands: int = 32,
    shingle_k: int = 5,
) -> Dataset:
    """Verified near-dup pairs: LSH candidates filtered by exact n-gram
    Jaccard >= threshold.  Only texts of candidate-pair members are
    fetched (one filtered scan) and broadcast — the candidate set is a
    tiny fraction of the corpus, so the full text column never moves."""
    cand = minhash_candidate_pairs(sf_dir, n_perm, n_bands, shingle_k).materialize()
    cand_ids: set[int] = set()
    for b in cand.iter_batches(batch_format="pyarrow", batch_size=None):
        cand_ids.update(b.column("a").to_pylist())
        cand_ids.update(b.column("b").to_pylist())
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    id2text: dict[int, str] = {}
    if cand_ids:
        wanted = ray.put(cand_ids)

        def pick(batch: pa.Table) -> pa.Table:
            w = ray.get(wanted)
            mask = [i in w for i in batch.column("doc_id").to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

        for b in docs.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            for i, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
                id2text[i] = t
    ref = ray.put(id2text)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        a_col = batch.column("a").to_pylist()
        b_col = batch.column("b").to_pylist()
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(a_col, b_col):
            s = jaccard(m.get(a, ""), m.get(b, ""), shingle_k)
            if s >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(s, 4))
        return pa.table(
            {
                "a": pa.array(keep_a, pa.int64()),
                "b": pa.array(keep_b, pa.int64()),
                "jaccard_sim": pa.array(sims, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit simhash over word features (crc-based, deterministic)."""
    v = np.zeros(64, dtype=np.int64)
    words = _normalize(text).split()
    if not words:
        return 0
    for w in words:
        h = struct.unpack(
            "<Q", hashlib.md5(w.encode()).digest()[:8]
        )[0]
        bits = np.unpackbits(
            np.frombuffer(struct.pack("<Q", h), dtype=np.uint8)
        ).astype(np.int64)
        v += 2 * bits - 1
    out = np.packbits((v > 0).astype(np.uint8))
    # signed so the value fits pyarrow int64 columns
    return int(struct.unpack("<q", out.tobytes())[0])


class SimHashStage:
    def __init__(self, n_chunks: int = 4):
        self.n_chunks = n_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, chunks, keys, fps = [], [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            fp = simhash64(t)
            for c in range(self.n_chunks):
                ids.append(doc_id)
                chunks.append(c)
                keys.append((fp >> (c * 16)) & 0xFFFF)
                fps.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk": pa.array(chunks, pa.int32()),
                "key": pa.array(keys, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
            }
        )


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3) -> Dataset:
    """Near-dup pairs by simhash banding: docs sharing any 16-bit chunk
    are candidates; verified by Hamming distance <= max_hamming."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(
        SimHashStage, batch_format="pyarrow", concurrency=(1, 8)
    )

    hmax = max_hamming

    def pairs(group):
        import pandas as pd

        rows = sorted(zip(group["doc_id"].tolist(), group["fp"].tolist()))[:200]
        a_out, b_out, hd = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (ida, fa), (idb, fb) = rows[i], rows[j]
                if ida == idb:
                    continue
                d = bin(fa ^ fb).count("1")
                if d <= hmax:
                    a_out.append(ida)
                    b_out.append(idb)
                    hd.append(d)
        return pd.DataFrame({"a": a_out, "b": b_out, "hamming": hd})

    cand = sigs.groupby(["chunk", "key"]).map_groups(pairs, batch_format="pandas")
    return (
        cand.groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.98) -> Dataset:
    """Near-dup vector pairs with cosine >= threshold (blockwise
    all-pairs; the scale path buckets by coarse LSH sign-bits first)."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bids = batch.column("vec_id").to_pylist()
        bm = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_m.T
        a_out, b_out, s_out = [], [], []
        for r, aid in enumerate(bids):
            hits = np.where(sims[r] >= threshold)[0]
            for h in hits:
                bid = int(all_ids[h])
                if bid <= aid:
                    continue
                a_out.append(aid)
                b_out.append(bid)
                s_out.append(round(float(sims[r, h]), 4))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "cosine_sim": pa.array(s_out, pa.float64()),
            }
        )

    return emb.map_batches(block, batch_format="pyarrow")


def minhash_dedup_clusters(sf_dir: str, threshold: float = 0.8) -> Dataset:
    """Near-duplicate CLUSTERS: connected components over the verified
    near-dup pair graph (re-uses the engine's distributed CC), keeper =
    min doc_id per component.  Output: (doc_id, keeper_doc_id) for every
    clustered document."""
    import pyarrow.compute as pc

    from renard_ray.pipelines.cc import connected_components

    pairs = minhash_dedup_pairs(sf_dir, threshold).materialize()

    def as_str(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pc.cast(batch.column("a"), pa.string()),
                "v": pc.cast(batch.column("b"), pa.string()),
            }
        )

    edges = pairs.map_batches(as_str, batch_format="pyarrow")
    label_map, _ = connected_components(edges, mode="driver")
    if not label_map:
        return pairs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "keeper_doc_id": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    # labels are lexicographic-min strings; keeper must be NUMERIC min
    comp: dict[str, int] = {}
    for node, label in label_map.items():
        comp[label] = min(comp.get(label, 1 << 62), int(node))
    rows = sorted((int(n), comp[l]) for n, l in label_map.items())
    import ray as _ray

    return _ray.data.from_items(
        [{"doc_id": d, "keeper_doc_id": k} for d, k in rows]
    )
