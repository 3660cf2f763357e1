"""Mixed-height batched Merkle tree commitment (MMCS) with Keccak-256.

Plays the role of p3-merkle-tree's FieldMerkleTreeMmcs + SerializingHasher32 +
CompressionFunctionFromHasher (`basic/src/bin/valida.rs:367-372`): commits a
batch of row-major matrices whose power-of-two heights may differ; matrices
are injected into the tree at the level matching their height.

Digest = 8 x u32.  Leaf hashing is fully batched on device (one Keccak call
per level); path verification is host-side python (cheap: 40 queries).

Injection rule (self-consistent, checked by prover & verifier here):
  level log_max:  d(i) = H(rows of all max-height matrices at i)
  level k < max:  d(i) = C(d(2i), d(2i+1))
                  then, if matrices of height 2^k exist:
                  d(i) = C(d(i), H(rows at i))
where H = Keccak-256 of the LE u32 word stream, C = Keccak-256 of 16 words.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..backend import asarray
from .keccak import keccak256_words, keccak256_words_host

DIGEST_WORDS = 8


class Hasher:
    """Digest hasher for the MMCS: batched u32-word-row hashing."""

    def __init__(self, name, hash_words, hash_words_host):
        self.name = name
        self.hash_words = hash_words
        self.hash_words_host = hash_words_host


KECCAK = Hasher("keccak", keccak256_words, keccak256_words_host)


def _poseidon2_hasher():
    from . import poseidon2 as p2

    return Hasher("poseidon2", p2.hash_words, p2.hash_words_host)


_HASHERS = {"keccak": lambda: KECCAK, "poseidon2": _poseidon2_hasher}


def get_hasher(name) -> Hasher:
    if isinstance(name, Hasher):
        return name
    return _HASHERS[name]()


def _hash_rows(mats_at_level, hasher=KECCAK):
    """mats: list of [n, w] uint32 canonical -> [n, 8] digests."""
    from ..backend import xp_of

    xp = xp_of(mats_at_level[0])
    cat = xp.concatenate([m.astype(np.uint32) for m in mats_at_level], axis=1)
    return hasher.hash_words(cat)


def _compress(left, right, hasher=KECCAK):
    """left/right [n, 8] -> [n, 8]."""
    from ..backend import xp_of

    xp = xp_of(left)
    return hasher.hash_words(xp.concatenate([left, right], axis=1))


class MerkleTree:
    def __init__(self, matrices, hasher=KECCAK):
        """matrices: list of uint32 arrays [h_i, w_i], canonical values,
        h_i a power of two.  Order is preserved for openings."""
        hasher = get_hasher(hasher)
        self.hasher = hasher
        self.matrices = [asarray(m) for m in matrices]
        heights = [int(m.shape[0]) for m in self.matrices]
        assert all(h & (h - 1) == 0 for h in heights)
        self.log_max = max(h.bit_length() - 1 for h in heights)
        self._by_level: dict[int, list] = {}
        for m in self.matrices:
            k = int(m.shape[0]).bit_length() - 1
            self._by_level.setdefault(k, []).append(m)

        # build levels top (leaves) down to root
        self.levels: dict[int, jnp.ndarray] = {}
        k = self.log_max
        d = _hash_rows(self._by_level[k], hasher)
        self.levels[k] = d
        while k > 0:
            k -= 1
            d = _compress(d[0::2], d[1::2], hasher)
            if k in self._by_level:
                d = _compress(d, _hash_rows(self._by_level[k], hasher), hasher)
            self.levels[k] = d
        self.root_array = np.asarray(self.levels[0][0])

    def root(self) -> np.ndarray:
        return self.root_array

    def open(self, index: int):
        """Open leaf `index` (in [0, 2^log_max)).

        Returns (opened_rows, path): opened_rows[i] = row of matrix i at
        index >> (log_max - log_h_i) as np.uint32 array; path = list of
        sibling digests (np.uint32[8]) from level log_max down to 1.
        """
        rows = []
        for m in self.matrices:
            h = int(m.shape[0]).bit_length() - 1
            rows.append(np.asarray(m[index >> (self.log_max - h)]))
        path = []
        idx = index
        for k in range(self.log_max, 0, -1):
            path.append(np.asarray(self.levels[k][idx ^ 1]))
            idx >>= 1
        return rows, path

    def open_many(self, indices):
        """Batched `open`: one device gather + ONE host fetch for ALL
        queries (per-query `open` costs a high-latency device->host
        round trip per matrix row and per path node — ~7000 round trips
        for a 40-query 14-chip proof, measured at ~25 min through the
        tunnel).  Returns [(rows, path)] with entries identical to
        `open(i)` for each i."""
        from ..backend import xp_of

        q = len(indices)
        if q == 0:
            return []
        xp = xp_of(self.matrices[0])
        if xp is np:  # host arrays: per-query opens are already cheap
            return [self.open(int(i)) for i in indices]
        import jax.numpy as jnp

        idx = np.asarray(indices, dtype=np.int64)
        pieces = []  # device [q, k] blocks, flattened host-side below
        widths = []
        for m in self.matrices:
            h = int(m.shape[0]).bit_length() - 1
            pieces.append(m[jnp.asarray(idx >> (self.log_max - h))])
            widths.append(int(m.shape[1]))
        lvl = idx
        for k in range(self.log_max, 0, -1):
            pieces.append(self.levels[k][jnp.asarray(lvl ^ 1)])
            lvl >>= 1
        flat = jnp.concatenate(
            [p.reshape(q, -1).astype(jnp.uint32) for p in pieces], axis=1
        )
        host = np.asarray(flat)  # the single fetch
        out = []
        for qi in range(q):
            off = 0
            rows = []
            for w in widths:
                rows.append(host[qi, off:off + w].copy())
                off += w
            path = []
            for _ in range(self.log_max):
                path.append(host[qi, off:off + DIGEST_WORDS].copy())
                off += DIGEST_WORDS
            out.append((rows, path))
        return out


def verify_openings(root, dims, indices, opened_rows, paths,
                    hasher=KECCAK) -> bool:
    """Batched host-side path verification: all queries of one tree in
    one lane-parallel hash chain (the vectorized `hash_words` dispatches
    on numpy inputs, so Q paths cost ~one path of vector work).

    indices: int array [q]; opened_rows[mi]: uint32 [q, w_mi];
    paths: uint32 [q, log_max, 8] sibling digests leaf->root.
    Returns True iff every query's recomputed root equals `root`.
    """
    hasher = get_hasher(hasher)
    log_max = max(int(h).bit_length() - 1 for h, _ in dims)
    # copy: the in-place shifts below must not alias the caller's array
    idx = np.array(indices, dtype=np.int64, copy=True)
    paths = np.asarray(paths, dtype=np.uint32)
    by_level: dict[int, list] = {}
    for (h, _w), rows in zip(dims, opened_rows):
        k = int(h).bit_length() - 1
        by_level.setdefault(k, []).append(np.asarray(rows, dtype=np.uint32))

    def h_rows(k):
        return np.asarray(hasher.hash_words(np.concatenate(by_level[k], axis=1)))

    def c(a, b):
        return np.asarray(hasher.hash_words(np.concatenate([a, b], axis=1)))

    d = h_rows(log_max)
    for step, k in enumerate(range(log_max, 0, -1)):
        sib = paths[:, step]
        odd = (idx & 1).astype(bool)[:, None]
        d = c(np.where(odd, sib, d), np.where(odd, d, sib))
        idx >>= 1
        if (k - 1) in by_level:
            d = c(d, h_rows(k - 1))
    return bool(np.array_equal(d, np.broadcast_to(
        np.asarray(root, dtype=np.uint32), d.shape)))


def verify_opening(root, dims, index: int, opened_rows, path,
                   hasher=KECCAK) -> bool:
    """Host-side path verification.

    dims: list of (height, width) per matrix (commitment shape metadata);
    opened_rows: list of uint32 arrays; path: sibling digests leaf->root.
    """
    hasher = get_hasher(hasher)
    log_max = max(int(h).bit_length() - 1 for h, _ in dims)
    by_level: dict[int, list] = {}
    for (h, _w), row in zip(dims, opened_rows):
        k = int(h).bit_length() - 1
        by_level.setdefault(k, []).append(row)

    def h_rows(k):
        words = np.concatenate([np.asarray(r, dtype=np.uint32) for r in by_level[k]])
        return hasher.hash_words_host(words)

    def c(a, b):
        return hasher.hash_words_host(list(a) + list(b))

    d = h_rows(log_max)
    idx = index
    for step, k in enumerate(range(log_max, 0, -1)):
        sib = path[step]
        if idx & 1:
            d = c(sib, d)
        else:
            d = c(d, sib)
        idx >>= 1
        if (k - 1) in by_level:
            d = c(d, h_rows(k - 1))
    return bool(np.array_equal(np.asarray(d), np.asarray(root)))
