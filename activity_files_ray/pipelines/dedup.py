"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup (task brief: first-class
training-data-pipeline operators).

All public-knowledge algorithms (Broder MinHash, Charikar SimHash,
banded LSH). Ray-Data-first shape:

* signatures are computed per batch (vectorized numpy over token
  hashes) — the only full-corpus pass;
* LSH bucketing emits (band_key, doc_id) rows; buckets with ≥2 docs
  become candidate pairs. Candidate generation AUTO-selects its plan
  (``SHUFFLE_THRESHOLD_DOCS``): small corpora fold the bucket table
  on the driver, larger ones run a real ``groupby(band_key)`` shuffle
  so the driver only ever sees pairs — both plans emit identical
  pairs (tested);
* candidate pairs are VERIFIED with the exact measure (Jaccard on
  shingle sets / Hamming on simhash / cosine on vectors) — LSH only
  proposes;
* clusters = union-find over verified pairs (candidate graph is
  tiny relative to the corpus by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _fnv1a64(s: str) -> int:
    """Deterministic 64-bit FNV-1a. Python's builtin ``hash`` is
    per-process salted (PYTHONHASHSEED) — using it would give every
    Ray worker different LSH buckets."""
    h = 0xCBF29CE484222325
    for byte in s.encode():
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a64_many(tokens: list[str]) -> np.ndarray:
    """Vectorized FNV-1a over a token list — bit-identical to
    :func:`_fnv1a64` but the Python-level loop runs per BYTE COLUMN
    (longest-token length, ~10 iterations) instead of per byte
    (was the minhash hot spot: ~10-30× fewer interpreter steps).

    Tokens are packed into one contiguous byte buffer, scattered into
    a padded (n × maxlen) uint8 matrix with one fancy-index, then the
    sequential FNV recurrence runs down the columns with a mask for
    finished tokens."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    enc = [t.encode() for t in tokens]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.full(n, _FNV_OFFSET, dtype=np.uint64)
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    mask = np.arange(maxlen)[None, :] < lens[:, None]
    buf[mask] = np.frombuffer(b"".join(enc), dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            live = lens > j
            h[live] = (h[live] ^ buf[live, j].astype(np.uint64)) * _FNV_PRIME
    return h



_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique shingle hashes of a document (exact-Jaccard
    ground truth and MinHash input).

    Token hashes are FNV-1a (deterministic across processes); k-token
    shingle hashes combine them with a vectorized rolling mix — the
    per-character Python loop runs once per TOKEN, not per shingle
    (was the minhash hot spot: 25× fewer Python-level hash bytes).
    """
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    th = _fnv1a64_many(toks)
    if len(toks) < k:
        acc = th[0]
        for x in th[1:]:
            acc = (acc * _SHINGLE_MIX) ^ x
        out = np.asarray([acc & np.uint64(0x7FFFFFFFFFFFFFFF)], dtype=np.uint64)
        return out
    n = len(toks) - k + 1
    acc = th[:n].copy()
    for j in range(1, k):
        acc = (acc * _SHINGLE_MIX) ^ th[j : j + n]
    return np.unique(acc & np.uint64(0x7FFFFFFFFFFFFFFF))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique hash sets."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def _fast_minhash_matrix(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a_i·x + b_i) mod p for all permutations × shingles, overflow-
    safe in uint64: operands are split into 31-bit halves so every
    intermediate product stays below 2^62 before reduction mod the
    Mersenne prime p = 2^61 − 1."""
    P = np.uint64(_MERSENNE)
    x = shingles.astype(np.uint64) % P
    xh = (x >> np.uint64(31))[None, :]
    xl = (x & np.uint64((1 << 31) - 1))[None, :]
    t2_31 = np.uint64(1 << 31) % P
    t2_62 = (t2_31 * t2_31) % P
    ai = (a % P)[:, None]
    aih = ai >> np.uint64(31)
    ail = ai & np.uint64((1 << 31) - 1)
    # fully broadcast (n_perm × n_shingles): each product < 2^62
    p1 = (aih * xh) % P
    p2 = (aih * xl + ail * xh) % P
    p3 = (ail * xl) % P
    t = (p1 * t2_62) % P
    t = (t + (p2 * t2_31) % P) % P
    t = (t + p3) % P
    return (t + (b % P)[:, None]) % P


class FastMinHasher:
    """Deterministic vectorized MinHash (the production path)."""

    def __init__(self, n_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.n_perm = n_perm
        self.a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        m = _fast_minhash_matrix(shingles, self.a, self.b)
        return m.min(axis=1).astype(np.int64)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Split a signature into ``bands`` row-groups; each band hashes
    to one bucket key (band index folded in so bands never collide)."""
    r = sig.size // bands
    keys = []
    for bnd in range(bands):
        chunk = sig[bnd * r : (bnd + 1) * r]
        h = 1469598103934665603
        for v in chunk.tolist():
            h = ((h ^ (v & 0xFFFFFFFFFFFFFFFF)) * 1099511628211) % (1 << 64)
        keys.append((bnd << 56) ^ (h & 0x00FFFFFFFFFFFFFF))
    return keys


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_VALUES = (np.uint64(1) << _BIT_SHIFTS)


def simhash64(text: str) -> int:
    """Charikar 64-bit SimHash over whitespace tokens (vectorized:
    one (tokens × 64) bit matrix per document, no per-token loop)."""
    toks = text.split()
    if not toks:
        return 0
    th = _fnv1a64_many(toks)
    bits = (th[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = _BIT_VALUES[acc > 0].sum(dtype=np.uint64)
    return int(out.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


# above this corpus size, candidate generation defaults to the real
# groupby(band_key) shuffle: the driver-side bucket fold materializes
# O(corpus × bands) rows, fine for test corpora, wrong at scale
SHUFFLE_THRESHOLD_DOCS = 150_000


def _auto_shuffle(ds, use_shuffle: bool | None) -> bool:
    if use_shuffle is not None:
        return use_shuffle
    try:
        return ds.count() > SHUFFLE_THRESHOLD_DOCS
    except Exception:  # noqa: BLE001 — count unavailable → safe default
        return True


def _coalesce_small(ds, target_rows_per_block: int = 512):
    """Right-size blocks for the signature pass (see pipelines/tune.py)."""
    from .tune import coalesce_small

    return coalesce_small(ds, target_rows_per_block)


def _pairs_via_shuffle(
    bucket_rows, max_bucket: int = 64, carry: str | None = None
) -> pd.DataFrame:
    """(doc_id, band_key[, carry]) Dataset → candidate-pair DataFrame
    through a real ``groupby(band_key)`` shuffle — the corpus-scale
    plan: each band bucket is co-located on one worker and emits its
    pairs there; the driver only ever sees PAIRS, never the bucket
    table. ``carry`` duplicates a per-doc column onto both pair sides
    (e.g. simhash fingerprints) so verification needs no second
    corpus pass."""
    cols = ["a", "b"] + ([f"{carry}_a", f"{carry}_b"] if carry else [])

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame(columns=cols)
        ids = g["doc_id"].tolist()
        cv = g[carry].tolist() if carry else None
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append(
                    (ids[i], ids[j], cv[i], cv[j]) if carry else (ids[i], ids[j])
                )
        return pd.DataFrame(rows, columns=cols)

    return (
        bucket_rows.groupby("band_key")
        .map_groups(pairs_of_group, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )


def _pairs_from_buckets(bucket_df: pd.DataFrame, max_bucket: int = 64) -> set[tuple]:
    """(band_key, doc_id) rows → candidate pairs. Buckets larger than
    ``max_bucket`` are skipped with the cap logged by the caller
    (degenerate buckets are hash-collision storms, not near-dups)."""
    pairs: set[tuple] = set()
    # prune to multi-member buckets BEFORE the Python group loop —
    # almost all buckets are singletons and iterating them dominated
    # the driver fold
    counts = bucket_df["band_key"].value_counts()
    multi = counts[(counts >= 2) & (counts <= max_bucket)].index
    if len(multi) == 0:
        return pairs
    sub = bucket_df[bucket_df["band_key"].isin(multi)]
    for _, g in sub.groupby("band_key"):
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2 or len(ids) > max_bucket:
            continue
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def cluster_pairs_distributed(
    pairs: pd.DataFrame, max_iters: int = 30
) -> pd.DataFrame:
    """Connected components over verified pairs WITHOUT a driver-side
    union-find: the alternating large-star / small-star plan (Kiveris
    et al., "Connected Components in MapReduce and Beyond" — public
    algorithm), each pass a ``groupby(node).map_groups`` shuffle, so
    the edge set never has to fit in driver memory. Converges in
    O(log n) rounds to a star forest rooted at each component's MIN
    member — the same cluster ids the driver union-find produces
    (``clusters == union-find`` is tested).

    The default dedup paths keep the driver union-find (verified
    pairs ≪ corpus by construction); use this when cluster graphs are
    themselves corpus-scale (e.g. aggressive thresholds)."""
    import ray.data as rd

    if not len(pairs):
        return pd.DataFrame(columns=["doc_id", "cluster_id"])

    def _hash_sum(ds) -> tuple[int, int]:
        """Order/duplication-insensitive fingerprint of the edge SET:
        xor of row hashes + row count after a global pair dedup."""
        from ray.data.aggregate import Count

        uniq = ds.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))

        def hb(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(
                df[["a", "b"]], index=False
            ).to_numpy(np.uint64)
            acc = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
            return pd.DataFrame({"x": [int(acc)], "n": [len(h)]})

        parts = uniq.map_batches(hb, batch_format="pandas", batch_size=None).to_pandas()
        return (
            int(np.bitwise_xor.reduce(parts["x"].to_numpy(np.uint64))) if len(parts) else 0,
            int(parts["n"].sum()),
        )

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"u": pd.concat([df["a"], df["b"]]), "v": pd.concat([df["b"], df["a"]])}
        )

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].iloc[0]
        nbrs = g["v"]
        m = min(nbrs.min(), u)
        bigger = nbrs[nbrs > u].unique()
        return pd.DataFrame({"a": bigger, "b": m})

    def to_max_min(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df["a"], df["b"]
        return pd.DataFrame({"u": np.maximum(a, b), "v": np.minimum(a, b)})

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].iloc[0]
        nbrs = g["v"]
        m = min(nbrs.min(), u)
        members = sorted((set(nbrs.tolist()) | {u}) - {m})
        return pd.DataFrame({"a": members, "b": m})

    edges = rd.from_pandas(pairs[["a", "b"]].drop_duplicates())
    prev = None
    for _ in range(max_iters):
        sym = edges.map_batches(symmetrize, batch_format="pandas", batch_size=None)
        ls = sym.groupby("u").map_groups(large_star, batch_format="pandas")
        ss = (
            ls.map_batches(to_max_min, batch_format="pandas", batch_size=None)
            .groupby("u")
            .map_groups(small_star, batch_format="pandas")
        )
        ss = ss.materialize()
        cur = _hash_sum(ss)
        edges = ss
        if cur == prev:
            break
        prev = cur
    stars = edges.to_pandas().drop_duplicates()  # (member, root) — tiny: one row per clustered doc
    roots = stars["b"].drop_duplicates()
    out = pd.concat(
        [
            stars.rename(columns={"a": "doc_id", "b": "cluster_id"}),
            pd.DataFrame({"doc_id": roots, "cluster_id": roots}),
        ],
        ignore_index=True,
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    shingle_k: int = 3,
    seed: int = 42,
    use_shuffle: bool | None = None,
):
    """MinHash+LSH near-dup detection over a Dataset of documents.

    Returns (clusters_df(doc_id, cluster_id) for docs in any
    near-dup cluster, verified_pairs_df(a, b, jaccard)).
    ``use_shuffle`` routes candidate generation through a real
    ``groupby(band_key)`` shuffle (the corpus-scale plan — the driver
    only sees candidate pairs); the driver-fold is faster at bench
    scale. Default (None) picks the shuffle automatically above
    ``SHUFFLE_THRESHOLD_DOCS``. Both produce identical pairs.
    """
    use_shuffle = _auto_shuffle(ds, use_shuffle)
    ds = _coalesce_small(ds)
    hasher = FastMinHasher(n_perm, seed)

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_key = [], []
        for did, txt in zip(df[id_col], df[text_col].fillna("")):
            sig = hasher.signature(shingle_set(txt, shingle_k))
            for k in band_keys(sig, bands):
                rows_id.append(did)
                rows_key.append(k)
        return pd.DataFrame({"doc_id": rows_id, "band_key": np.asarray(rows_key, dtype=np.int64)})

    bucket_rows = ds.map_batches(sig_batch, batch_format="pandas", batch_size=None)
    if use_shuffle:
        pair_df = _pairs_via_shuffle(bucket_rows)
        pairs = set(zip(pair_df["a"], pair_df["b"]))
    else:
        pairs = _pairs_from_buckets(bucket_rows.to_pandas())
    if not pairs:
        return (
            pd.DataFrame(columns=[id_col, "cluster_id"]),
            pd.DataFrame(columns=["a", "b", "jaccard"]),
        )
    # verify candidates with exact Jaccard: fetch only candidate texts
    cand_ids = sorted({d for p in pairs for d in p})
    texts = _fetch_texts(ds, id_col, text_col, cand_ids)
    sh = {d: shingle_set(texts[d], shingle_k) for d in cand_ids if d in texts}
    uf = _UnionFind()
    verified = []
    for a, b in sorted(pairs):
        if a not in sh or b not in sh:
            continue
        j = jaccard(sh[a], sh[b])
        if j >= threshold:
            verified.append((a, b, j))
            uf.union(a, b)
    members = sorted({d for a, b, _ in verified for d in (a, b)})
    clusters = pd.DataFrame(
        {id_col: members, "cluster_id": [uf.find(d) for d in members]}
    )
    vp = pd.DataFrame(verified, columns=["a", "b", "jaccard"])
    return clusters, vp


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    use_shuffle: bool | None = None,
):
    """SimHash near-dup: 64-bit fingerprints, banded 16-bit buckets
    for candidates, exact Hamming verification.

    The shuffle path (auto above ``SHUFFLE_THRESHOLD_DOCS``) emits
    (doc_id, fp, band_key) rows and generates candidates inside a
    real ``groupby(band_key)`` — fingerprints ride along on both pair
    sides, so the driver never materializes the fingerprint table."""
    use_shuffle = _auto_shuffle(ds, use_shuffle)
    ds = _coalesce_small(ds)
    width = 64 // bands

    def fp_band_batch(df: pd.DataFrame) -> pd.DataFrame:
        fps = np.asarray(
            [simhash64(t) for t in df[text_col].fillna("")], dtype=np.int64
        )
        frames = []
        for bnd in range(bands):
            key = (
                (fps.view(np.uint64) >> np.uint64(bnd * width))
                & np.uint64((1 << width) - 1)
            ).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": df[id_col],
                        "fp": fps,
                        "band_key": (np.int64(bnd) << np.int64(58)) ^ key,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    buckets = ds.map_batches(fp_band_batch, batch_format="pandas", batch_size=None)
    if use_shuffle:
        pair_df = _pairs_via_shuffle(buckets, carry="fp")
        cand = {
            (a, b): (fa, fb)
            for a, b, fa, fb in zip(
                pair_df["a"], pair_df["b"], pair_df["fp_a"], pair_df["fp_b"]
            )
        }
    else:
        bpd = buckets.to_pandas()
        pairs = _pairs_from_buckets(bpd[["doc_id", "band_key"]])
        fp_of = dict(zip(bpd["doc_id"], bpd["fp"]))
        cand = {(a, b): (fp_of[a], fp_of[b]) for a, b in pairs}
    uf = _UnionFind()
    verified = []
    for (a, b), (fa, fb) in sorted(cand.items()):
        hd = hamming64(int(fa), int(fb))
        if hd <= max_hamming:
            verified.append((a, b, hd))
            uf.union(a, b)
    members = sorted({d for a, b, _ in verified for d in (a, b)})
    clusters = pd.DataFrame(
        {id_col: members, "cluster_id": [uf.find(d) for d in members]}
    )
    return clusters, pd.DataFrame(verified, columns=["a", "b", "hamming"])


def embedding_near_dup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    use_shuffle: bool | None = None,
):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets +
    exact cosine verification. The shuffle path (auto above
    ``SHUFFLE_THRESHOLD_DOCS``) generates candidates inside a real
    ``groupby(band_key)``; only candidate vectors are then fetched."""
    use_shuffle = _auto_shuffle(ds, use_shuffle)
    first = ds.take(1)
    dim = len(first[0][vec_col]) if first else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_batch(df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        signs = (emb @ planes.T) > 0
        keys = np.zeros(len(df), dtype=np.int64)
        for i in range(n_planes):
            keys |= signs[:, i].astype(np.int64) << i
        return pd.DataFrame({"doc_id": df[id_col], "band_key": keys})

    buckets_ds = ds.map_batches(bucket_batch, batch_format="pandas", batch_size=None)
    if use_shuffle:
        pair_df = _pairs_via_shuffle(buckets_ds, max_bucket=256)
        pairs = set(zip(pair_df["a"], pair_df["b"]))
    else:
        pairs = _pairs_from_buckets(buckets_ds.to_pandas(), max_bucket=256)
    cand_ids = sorted({d for p in pairs for d in p})
    if not cand_ids:
        return (
            pd.DataFrame(columns=[id_col, "cluster_id"]),
            pd.DataFrame(columns=["a", "b", "cos"]),
        )
    vecs = _fetch_vecs(ds, id_col, vec_col, cand_ids)
    uf = _UnionFind()
    verified = []
    for a, b in sorted(pairs):
        va, vb = vecs.get(a), vecs.get(b)
        if va is None or vb is None:
            continue
        cos = float(
            va @ vb / ((np.linalg.norm(va) * np.linalg.norm(vb)) + 1e-30)
        )
        if cos >= threshold:
            verified.append((a, b, cos))
            uf.union(a, b)
    members = sorted({d for a, b, _ in verified for d in (a, b)})
    clusters = pd.DataFrame(
        {id_col: members, "cluster_id": [uf.find(d) for d in members]}
    )
    return clusters, pd.DataFrame(verified, columns=["a", "b", "cos"])


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
    max_docs: int = 20_000,
):
    """Exact all-pairs n-gram Jaccard (the brute-force oracle for the
    LSH paths; bounded input by construction — use minhash_dedup for
    open-ended corpora)."""
    df = ds.to_pandas()
    assert len(df) <= max_docs, "ngram_jaccard_pairs is the small-corpus oracle"
    ids = df[id_col].tolist()
    sets = [shingle_set(t, shingle_k) for t in df[text_col].fillna("")]
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = jaccard(sets[i], sets[j])
            if jac >= threshold:
                out.append((ids[i], ids[j], jac))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


def _fetch_column(ds, id_col: str, val_col: str, ids: list):
    """Broadcast-id-set semi-join: stream the corpus, keep only the
    candidate rows (Arrow-native filter — zero-copy, and empty result
    blocks keep a real schema instead of object-dtype pandas)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    idset = pa.array(list(ids))

    def pick(t: pa.Table) -> pa.Table:
        sub = t.select([id_col, val_col])
        return sub.filter(pc.is_in(sub[id_col], value_set=idset))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None).to_pandas()


def _fetch_texts(ds, id_col: str, text_col: str, ids: list) -> dict:
    got = _fetch_column(ds, id_col, text_col, ids)
    return dict(zip(got[id_col], got[text_col]))


def _fetch_vecs(ds, id_col: str, vec_col: str, ids: list) -> dict:
    got = _fetch_column(ds, id_col, vec_col, ids)
    return {
        i: np.asarray(v, dtype=np.float64) for i, v in zip(got[id_col], got[vec_col])
    }
