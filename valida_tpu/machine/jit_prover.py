"""Device-resident jitted prover.

Same transcript and proof format as machine/prover.py, but every bulk stage
is one compiled XLA call and all large arrays stay on the device:

  stage_commit    traces -> coeffs/LDEs/bitrev rows + full Merkle levels + root
  stage_perm      main traces + challenges -> perm traces (flat) + cum sums
  stage_quotient  LDEs + challenges + alpha -> quotient chunk matrices
  stage_openings  coeffs + zeta -> opened values at {zeta, zeta*g, zeta^2^qd}
  stage_reduced   LDEs + alpha + opened values -> per-height reduced openings
  FRI             per-layer jitted commit + fold; device PoW grind
  query opens     one batched gather per tree (40 indices at once)

Only Merkle roots, opened values, and query openings are ever transferred
to the host — the Fiat–Shamir challenger consumes roots (32 B) between
stages.  Compiled stages are keyed by trace shapes, and challenges enter as
traced arrays, so proving a second execution of the same program reuses
every compiled stage.
"""

from __future__ import annotations

import functools
import os
import sys
import threading
import uuid

import numpy as np
import jax
import jax.numpy as jnp

# (persistent compilation cache is configured in valida_tpu.backend)

from ..field import babybear as bb
from ..field import ext as extf
from ..poly import ntt as nttm
from ..poly.ntt import bitrev_indices
from ..crypto.keccak import keccak256_words
from ..air.quotient import (
    get_log_quotient_degree, quotient_values, decompose_and_flatten,
)
from ..air.lookup import generate_permutation_trace
from ..commit import fri as frim
from ..commit.pcs import (PcsProof, PcsQueryProof, BatchOpening,
                          observe_direct_polys)
from ..core.proof import MachineProof, Commitments, ChipProof, OpenedValues


# ---------------------------------------------------------------------------
# device merkle forest (mixed heights, like crypto/merkle.MerkleTree)
# ---------------------------------------------------------------------------


def _build_levels(mats):
    """mats: list of canonical [h, w] arrays -> (root [8], levels dict)."""
    by_level = {}
    for m in mats:
        k = int(m.shape[0]).bit_length() - 1
        by_level.setdefault(k, []).append(m)
    log_max = max(by_level)
    levels = {}
    d = keccak256_words(jnp.concatenate(by_level[log_max], axis=1))
    levels[log_max] = d
    k = log_max
    while k > 0:
        k -= 1
        d = keccak256_words(jnp.concatenate([d[0::2], d[1::2]], axis=1))
        if k in by_level:
            inj = keccak256_words(jnp.concatenate(by_level[k], axis=1))
            d = keccak256_words(jnp.concatenate([d, inj], axis=1))
        levels[k] = d
    return levels[0][0], levels


class DeviceTree:
    """Device-resident Merkle tree over committed matrices with batched
    query opening (one gather per level, one host fetch per tree)."""

    def __init__(self, mats, root, levels, exported=True, ctx=None):
        self.mats = mats  # device canonical [h, w]
        self._root = root  # np OR device [8] — fetched lazily (.root):
        # the FRI ladder with the device challenger never needs roots on
        # the host until the final batched fetch
        self.levels = levels
        self.log_max = max(levels)
        self.exported = exported
        self.ctx = ctx

    @property
    def root(self):
        if not isinstance(self._root, np.ndarray):
            self._root = np.asarray(self._root)
        return self._root

    def open_batch(self, indices: np.ndarray, fetch: bool = True):
        """indices: [q] leaf indices -> (rows per mat: list of [q, w],
        paths: [q, log_max, 8]).  One jitted (exported) stage per tree
        signature — not a chain of eager gathers, each of which would be
        its own device compile.  fetch=False returns device arrays so the
        caller can combine MANY trees' openings into one host fetch
        (`_fetch_all`) instead of paying tunnel latency per tree."""
        if self.log_max == 0:
            rows = [m[np.zeros(len(indices), dtype=np.int64)]
                    for m in self.mats]
            paths = np.zeros((len(indices), 0, 8), dtype=np.uint32)
            if fetch:
                rows = [np.asarray(r) for r in rows]
            return rows, paths
        mat_shapes = tuple(tuple(int(x) for x in m.shape) for m in self.mats)
        level_arrays = tuple(self.levels[k]
                             for k in range(self.log_max, 0, -1))
        level_shapes = tuple(tuple(int(x) for x in a.shape)
                             for a in level_arrays)
        fn = _open_batch_stage(mat_shapes, level_shapes, self.log_max,
                               len(indices), self.exported, self.ctx)
        rows, paths = fn(tuple(self.mats), level_arrays,
                        jnp.asarray(indices.astype(np.int32)))
        if not fetch:
            return list(rows), paths
        return [np.asarray(r) for r in rows], np.asarray(paths)


# ---------------------------------------------------------------------------
# persistent exported-stage cache
#
# Tracing a BasicMachine quotient stage costs 30-70s of pure-python jaxpr
# building (tens of thousands of field ops), times 14 chips, in EVERY
# prover process.  jax.export lets us pay it once per source version: the
# traced+lowered StableHLO is serialized to disk keyed by (stage key,
# source fingerprint, jax version, platform); later processes deserialize
# and call — no tracing, and XLA compilation of the module goes through
# the persistent compilation cache.
# ---------------------------------------------------------------------------

def _stage_cache_dir() -> str:
    return os.path.expanduser(
        os.environ.get("VALIDA_TPU_STAGE_CACHE", "~/.cache/valida_tpu_stages")
    )


@functools.lru_cache(maxsize=None)
def _source_fingerprint() -> str:
    """Hash of the package's .py sources — stale exported stages must
    never survive a code change."""
    import hashlib

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
        dirnames.sort()
        for fname in sorted(filenames):
            if fname.endswith(".py"):
                p = os.path.join(dirpath, fname)
                # RELATIVE path: snapshot worktrees with identical
                # sources must share the cache (an absolute path here
                # made every new checkout location a full re-trace)
                h.update(os.path.relpath(p, pkg).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def _stage_cache_enabled() -> bool:
    return os.environ.get("VALIDA_TPU_STAGE_CACHE_OFF", "0") != "1"


# A "ctx" is (mesh, row_axis) or None.  Under a mesh, every inter-stage
# array follows ONE canonical layout rule: leading (row) dimension sharded
# over `row_axis` when divisible, replicated otherwise.  Inputs are placed
# to the rule before each stage call and outputs are constrained to it
# inside the stage, so exported modules (whose argument shardings are
# fixed at export time) always see matching layouts, and mesh-sharded
# stages hit the same persistent exported-stage cache as single-device
# ones.


def _shard_of(ctx, shape):
    from jax.sharding import NamedSharding, PartitionSpec

    mesh, axis = ctx
    d = mesh.shape[axis]
    if len(shape) >= 1 and shape[0] >= d and shape[0] % d == 0:
        return NamedSharding(
            mesh, PartitionSpec(axis, *([None] * (len(shape) - 1)))
        )
    return NamedSharding(mesh, PartitionSpec())


def _constrain_outputs(stage_fn, ctx):
    if ctx is None:
        return stage_fn

    def wrapped(*args):
        out = stage_fn(*args)
        return jax.tree.map(
            lambda y: jax.lax.with_sharding_constraint(
                y, _shard_of(ctx, tuple(int(s) for s in y.shape))
            ),
            out,
        )

    return wrapped


def _place_calls(fn, ctx):
    """Wrap a compiled stage so every array argument is placed to the
    canonical layout first (no-op when already there).

    With no mesh ctx, arguments are still COMMITTED to the default
    device: jnp.zeros / jnp.asarray produce uncommitted arrays
    (UnspecifiedValue sharding) while stage outputs are committed, and
    the jit cache keys on that difference — warmup's zeros-input
    executions would otherwise compile every stage a SECOND time when
    the prove feeds committed arrays (measured: 46/51 stages, ~760 s of
    the 2^13 BasicMachine first prove)."""
    if ctx is None:
        def call0(*args):
            dev = jax.devices()[0]
            placed = jax.tree.map(
                lambda a: (jax.device_put(a, dev)
                           if isinstance(a, (jax.Array, np.ndarray)) else a),
                args,
            )
            return fn(*placed)

        return call0

    def call(*args):
        placed = jax.tree.map(
            lambda a: (
                jax.device_put(a, _shard_of(ctx, tuple(int(s)
                                                       for s in a.shape)))
                if isinstance(a, jax.Array) else a
            ),
            args,
        )
        return fn(*placed)

    return call


def _ctx_key(ctx) -> str:
    if ctx is None:
        return ""
    mesh, axis = ctx
    return f"|mesh:{tuple(mesh.shape.items())}:{axis}"


def _exported_stage(key: str, stage_fn, abstract_args, exported=True,
                    ctx=None):
    """stage_fn (python) + abstract args -> a callable.

    Loads the serialized export when present; otherwise traces, exports,
    serializes.  Falls back to plain jit on any export limitation."""
    stage_fn = _constrain_outputs(stage_fn, ctx)
    if not exported or not _stage_cache_enabled():
        return _place_calls(jax.jit(stage_fn), ctx)
    import hashlib
    from jax import export as jexport

    full_key = "|".join(
        [key + _ctx_key(ctx), _source_fingerprint(), jax.__version__,
         jax.default_backend()]
    )
    kh = hashlib.sha256(full_key.encode()).hexdigest()[:32]
    cache_dir = _stage_cache_dir()
    path = os.path.join(cache_dir, kh + ".jaxexp")
    # NB: Exported.call builds a fresh eager wrapper on EVERY invocation
    # (no dispatch cache, per-call lowering).  Wrapping it in one stable
    # jax.jit gives the C++ fastpath after the first call.
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                loaded = jax.jit(jexport.deserialize(bytearray(f.read())).call)
                return _place_calls(loaded, ctx)
        except Exception:
            pass  # stale/corrupt: re-export below
    if os.environ.get("VALIDA_TPU_STAGE_LOG", "0") == "1":
        print(f"[stage MISS] {key + _ctx_key(ctx)}", file=sys.stderr,
              flush=True)
    try:
        exp = jexport.export(jax.jit(stage_fn))(*abstract_args)
        blob = exp.serialize()
    except Exception:
        return _place_calls(jax.jit(stage_fn), ctx)  # unexportable: jit
    # A cache write must never fail a prove.  _par_map fans stages out on
    # a ThreadPoolExecutor, so two threads can race to export the same key
    # (same pid!); the tmp name must be unique per writer and any replace
    # failure is benign when a winner already published the blob.
    tmp = None  # makedirs may raise before tmp is assigned (ADVICE r4)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except OSError:
        try:
            if tmp is not None and os.path.exists(tmp):
                os.unlink(tmp)
        except OSError:
            pass
    return _place_calls(jax.jit(exp.call), ctx)


def _sds(*shape, ctx=None):
    if ctx is not None:
        return jax.ShapeDtypeStruct(shape, jnp.uint32,
                                    sharding=_shard_of(ctx, shape))
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


def _sds_i32(shape, ctx=None):
    if ctx is not None:
        return jax.ShapeDtypeStruct(shape, jnp.int32,
                                    sharding=_shard_of(ctx, shape))
    return jax.ShapeDtypeStruct(shape, jnp.int32)


def _pow2_chunk(env_name: str, default: int) -> int:
    """Resolved row-tile size for the chunked stages: env override rounded
    DOWN to a power of two (tiles must divide the power-of-two domain —
    ADVICE r4: a non-power value used to fail with an opaque reshape
    error); 0 disables chunking.  Call sites pass the RESOLVED value into
    the lru-cached stage factories so the in-process and persistent cache
    layers key consistently (ADVICE r4)."""
    v = int(os.environ.get(env_name, default))
    if v <= 0:
        return 0
    return 1 << (v.bit_length() - 1)


# ---------------------------------------------------------------------------
# jitted stage factories (cached per static signature)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _open_batch_stage(mat_shapes, level_shapes, log_max, q, exported=True,
                      ctx=None):
    """Batched Merkle query opening for one tree signature: gathers the
    opened rows of every matrix and the sibling-digest paths in one call."""

    def stage(mats, levels, idx):
        rows = tuple(
            m[idx >> np.int32(log_max - (int(m.shape[0]).bit_length() - 1))]
            for m in mats
        )
        sibs = []
        cur = idx
        for li in range(log_max):
            sibs.append(levels[li][cur ^ np.int32(1)])
            cur = cur >> np.int32(1)
        paths = jnp.stack(sibs, axis=1)
        return rows, paths

    return _exported_stage(
        f"openbatch:{mat_shapes}:{level_shapes}:{log_max}:{q}", stage,
        (tuple(_sds(*s, ctx=ctx) for s in mat_shapes),
         tuple(_sds(*s, ctx=ctx) for s in level_shapes),
         _sds_i32((q,), ctx)), exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _leaf_hash_jit(shapes, hasher_name, exported=True, ctx=None):
    """Hash the row-wise concatenation of `shapes` matrices in ONE stage.
    The concat lives inside the export: an eager jnp.concatenate at big
    shapes is its own one-time per-shape XLA compile (a round trip through
    the remote-compile service per Merkle level — the dominant first-call
    cost of a cold big prove)."""
    from ..crypto.merkle import get_hasher

    h = get_hasher(hasher_name)

    def stage(mats):
        cat = jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]
        return h.hash_words(cat)

    return _exported_stage(
        f"hashcat:{shapes}:{hasher_name}", stage,
        (tuple(_sds(*s, ctx=ctx) for s in shapes),), exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _pair_hash_jit(n, hasher_name, exported=True, ctx=None):
    """One Merkle compression level: [n, 8] digests -> [n//2, 8] by
    hashing (even, odd) row pairs — pairing slices fused into the stage."""
    from ..crypto.merkle import get_hasher

    h = get_hasher(hasher_name)

    def stage(d):
        return h.hash_words(jnp.concatenate([d[0::2], d[1::2]], axis=1))

    return _exported_stage(
        f"hashpair:{n}:{hasher_name}", stage, (_sds(n, 8, ctx=ctx),),
        exported, ctx,
    )


def _hash_level(mats, hasher_name="keccak", exported=True, ctx=None):
    shapes = tuple(tuple(int(x) for x in m.shape) for m in mats)
    return _leaf_hash_jit(shapes, hasher_name, exported, ctx)(tuple(mats))


def _tree_fuse_max() -> int:
    """Trees up to this many leaves build ALL levels in ONE stage (one
    compile, one device dispatch, instead of ~2·log_n per-level calls —
    dispatch latency over the device tunnel dominates small commits).
    Bigger trees keep per-level stages: their hash shapes are shared
    across trees and their compiles parallelize in warmup."""
    return int(os.environ.get("VALIDA_TPU_TREE_FUSE_MAX", 1 << 13))


@functools.lru_cache(maxsize=None)
def _tree_stage(mat_shapes, hasher_name, exported=True, ctx=None):
    """Whole Merkle forest build (mixed heights with level injection) as
    one stage: leaf matrices in, every digest level out (log_max..0)."""
    from ..crypto.merkle import get_hasher

    h = get_hasher(hasher_name)
    by_level = {}
    for mi, (rows, _w) in enumerate(mat_shapes):
        by_level.setdefault(int(rows).bit_length() - 1, []).append(mi)
    log_max = max(by_level)

    def cat(ms):
        return jnp.concatenate(ms, axis=1) if len(ms) > 1 else ms[0]

    def stage(mats):
        out = []
        d = h.hash_words(cat([mats[i] for i in by_level[log_max]]))
        out.append(d)
        k = log_max
        while k > 0:
            k -= 1
            d = h.hash_words(cat([d[0::2], d[1::2]]))
            if k in by_level:
                inj = h.hash_words(cat([mats[i] for i in by_level[k]]))
                d = h.hash_words(cat([d, inj]))
            out.append(d)
        return tuple(out)

    return _exported_stage(
        f"tree:{mat_shapes}:{hasher_name}", stage,
        (tuple(_sds(*s, ctx=ctx) for s in mat_shapes),), exported, ctx,
    )


def _build_levels_jit(mats, hasher_name="keccak", exported=True, ctx=None,
                      fetch_root=True):
    """Like _build_levels, but jitted: one fused stage for small trees,
    per-level jitted hash calls (small compiles, shared across trees of
    the same shapes) for big ones.  fetch_root=False returns the root as
    a DEVICE array (the FRI ladder batches all its root fetches into one
    at the end)."""
    shapes = tuple(tuple(int(x) for x in m.shape) for m in mats)
    by_level = {}
    for m in mats:
        k = int(m.shape[0]).bit_length() - 1
        by_level.setdefault(k, []).append(m)
    log_max = max(by_level)
    if (1 << log_max) <= _tree_fuse_max():
        outs = _tree_stage(shapes, hasher_name, exported, ctx)(tuple(mats))
        levels = {log_max - i: a for i, a in enumerate(outs)}
        if fetch_root:  # fetch [1,8] and index on host: no eager slice op
            return np.asarray(levels[0])[0], levels
        return levels[0][0], levels
    levels = {}
    d = _hash_level(by_level[log_max], hasher_name, exported, ctx)
    levels[log_max] = d
    k = log_max
    while k > 0:
        k -= 1
        d = _pair_hash_jit(1 << (k + 1), hasher_name, exported, ctx)(d)
        if k in by_level:
            inj = _hash_level(by_level[k], hasher_name, exported, ctx)
            d = _hash_level([d, inj], hasher_name, exported, ctx)
        levels[k] = d
    if fetch_root:
        return np.asarray(levels[0])[0], levels
    return levels[0][0], levels


def _dist_dif_applies(log_h: int, mesh, row_axis: str) -> bool:
    """dist_dif preconditions: radix-128 leading step, whole blocks and
    whole column slices per device (parallel/dist_ntt.py)."""
    if mesh is None or row_axis not in mesh.shape:
        return False
    d = mesh.shape[row_axis]
    return (
        log_h >= 7 and 128 % d == 0 and ((1 << log_h) >> 7) % d == 0
    )


@functools.lru_cache(maxsize=None)
def _lde_stage(shape, dshift, log_blowup, shift, exported=True, ctx=None):
    """Coeffs + LDE + bitrev committed rows for one trace matrix.  Under a
    mesh, transforms big enough for the four-step schedule run as the
    explicit one-all_to_all-round distributed NTT (parallel/dist_ntt.py)
    with rows sharded over the ctx row axis; identical values either way."""
    log_h = shape[0].bit_length() - 1
    use_dist = ctx is not None and _dist_dif_applies(log_h, ctx[0], ctx[1])

    def stage(mat):
        m = bb.to_monty(mat)
        coeffs = nttm.intt(m) if dshift == 1 else nttm.coset_intt(m, dshift)
        padded = jnp.concatenate(
            [coeffs] + [jnp.zeros_like(coeffs)] * ((1 << log_blowup) - 1),
            axis=0,
        )
        lde = nttm.coset_eval_from_coeffs(padded, shift)
        committed = bb.from_monty(lde[bitrev_indices(log_h + log_blowup)])
        return coeffs, lde, committed

    def stage_dist(mat):
        from ..parallel.dist_ntt import dist_dif

        mesh, row_axis = ctx
        m = bb.to_monty(mat)
        coeffs_rev = dist_dif(m, mesh, row_axis, inverse=True)
        coeffs = coeffs_rev[bitrev_indices(log_h)]
        coeffs = nttm._scale_inv_n(coeffs, log_h)
        if dshift != 1:
            sp_inv = nttm.shift_powers(bb.h_inv(dshift % bb.P), log_h)
            coeffs = bb.mul(coeffs, sp_inv[:, None])
        padded = jnp.concatenate(
            [coeffs] + [jnp.zeros_like(coeffs)] * ((1 << log_blowup) - 1),
            axis=0,
        )
        sp = nttm.shift_powers(shift, log_h + log_blowup)
        scaled = bb.mul(padded, sp[:, None])
        lde_rev = dist_dif(scaled, mesh, row_axis, inverse=False)
        committed = bb.from_monty(lde_rev)
        # dif is bitrev-out: natural order = gather by the bitrev map
        lde = lde_rev[bitrev_indices(log_h + log_blowup)]
        return coeffs, lde, committed

    return _exported_stage(
        f"lde:{shape}:{dshift}:{log_blowup}:{shift}:{use_dist}",
        stage_dist if use_dist else stage, (_sds(*shape, ctx=ctx),),
        exported, ctx,
    )


def _ext_powers_dyn(z, n: int):
    """[n, 5] monty powers of a [5] monty ext value (traced)."""
    one = np.zeros((1, 5), dtype=np.uint32)
    one[0, 0] = bb.ONE
    arr = jnp.asarray(one)
    cur = z[None, :]
    length = 1
    while length < n:
        nxt = extf.ext_mul(arr, jnp.broadcast_to(cur, arr.shape))
        arr = jnp.concatenate([arr, nxt], axis=0)
        cur = extf.ext_mul(cur, cur)
        length *= 2
    return arr[:n]


def _points_for(zeta_m, kind):
    tag, param = kind
    if tag == "pair":
        g = bb.monty_scalar(bb.two_adic_generator(param))
        return [zeta_m, extf.ext_mul_base(zeta_m[None, :], np.uint32(g))[0]]
    zq = zeta_m
    for _ in range(param):
        zq = extf.ext_mul(zq, zq)
    return [zq]


@functools.lru_cache(maxsize=None)
def _openings_stage(shapes, kind, chunk, exported=True, ctx=None):
    """Open ALL matrices of one (height, point-kind) group at the kind's
    points.  kind: ('pair', log_h) -> {z, z*g_h}; ('pow', qd) -> z^2^qd.

    shapes: tuple of member coeff shapes (same height); the column concat
    happens INSIDE the stage (no eager big-shape concat compile).  Rows
    are lax.map-tiled for large heights: the one-shot graph materializes
    [h, w] products per ext coordinate (the 2^20-prove compile-OOM suspect
    named in VERDICT r4 weak #1); partial modular sums per tile are exact,
    so tiling is bit-identical."""
    h = shapes[0][0]

    def stage(mats, zeta_m):
        coeffs = jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]
        w = int(coeffs.shape[1])
        mat_vals = []
        for z in _points_for(zeta_m, kind):
            zp = _ext_powers_dyn(z, h)
            if chunk and h > chunk:
                part = jax.lax.map(
                    lambda o: nttm.eval_at_ext_point(o[0], o[1]),
                    (coeffs.reshape(h // chunk, chunk, w),
                     zp.reshape(h // chunk, chunk, 5)),
                )
                mat_vals.append(nttm._mod_sum(part, axis=0))
            else:
                mat_vals.append(nttm.eval_at_ext_point(coeffs, zp))
        return tuple(mat_vals)

    return _exported_stage(
        f"open:{shapes}:{kind}:c{chunk}", stage,
        (tuple(_sds(*s, ctx=ctx) for s in shapes), _sds(5, ctx=ctx)),
        exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _reduced_stage(shapes, kind, log_lde, col_offs, shift, chunk,
                   exported=True, ctx=None):
    """Reduced-opening contribution of ALL matrices sharing one
    (height, point-kind): their LDEs are concatenated along columns
    (INSIDE the stage — no eager big-shape concat compile) and
    `col_offs[c]` is column c's absolute alpha-power index in the global
    matrix order.  Values are bit-identical to per-matrix accumulation
    (products distribute over modular sums; inverses are unique), but the
    alpha powers and the per-point denominator inverse batch are computed
    once per group instead of once per matrix — and one stage compiles
    instead of one per matrix."""
    w = sum(s[1] for s in shapes)
    offs = np.asarray(col_offs, dtype=np.int32)
    n_pows = int(offs.max()) + 1 if w else 1

    def stage(ldes, vals, zeta_m, alpha_m):
        lde = jnp.concatenate(ldes, axis=1) if len(ldes) > 1 else ldes[0]
        apows = _ext_powers_dyn(alpha_m, n_pows)[offs]
        points = _points_for(zeta_m, kind)
        comb_ys = [nttm._mod_sum(extf.ext_mul(apows, y), axis=0)
                   for y in vals]
        lde_rev = lde[bitrev_indices(log_lde)]
        xs = jnp.asarray(_coset_points_bitrev_cached(log_lde, shift))

        def rows_fn(lde_c, xs_c):
            combined_l = []
            for d in range(5):
                prod = bb.mul(lde_c, apows[None, :, d])
                combined_l.append(nttm._mod_sum(prod, axis=1))
            combined = jnp.stack(combined_l, axis=-1)
            # one batched inverse across all points' denominators
            denoms = jnp.stack(
                [bb.sub(extf.ext_from_base(xs_c), z[None, :])
                 for z in points]
            )
            inv_denoms = extf.ext_inv(denoms)
            acc = None
            for pi in range(len(points)):
                num = bb.sub(combined, comb_ys[pi][None, :])
                quot = extf.ext_mul(num, inv_denoms[pi])
                acc = quot if acc is None else bb.add(acc, quot)
            return acc

        # Row-chunked evaluation for large domains (same rationale as
        # air/quotient.py): the one-shot graph holds [Q, w] alpha-combine
        # products and [Q, 5, 5] ext-mul partials live — the 2^20 prove
        # OOM'd XLA compile at 15.91G/15.75G HBM in this stage.  All ops
        # are row-wise, so lax.map tiles are bit-identical.
        q = 1 << log_lde
        if chunk and q > chunk:
            out = jax.lax.map(
                lambda o: rows_fn(o[0], o[1]),
                (lde_rev.reshape(q // chunk, chunk, w),
                 xs.reshape(q // chunk, chunk)),
            )
            return out.reshape(q, 5)
        return rows_fn(lde_rev, xs)

    n_points = 2 if kind[0] == "pair" else 1
    return _exported_stage(
        f"red:{shapes}:{kind}:{log_lde}:{col_offs}:{shift}:c{chunk}", stage,
        (tuple(_sds(1 << log_lde, s[1], ctx=ctx) for s in shapes),
         tuple(_sds(w, 5, ctx=ctx) for _ in range(n_points)),
         _sds(5, ctx=ctx), _sds(5, ctx=ctx)),
        exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _coset_points_bitrev_cached(log_n, shift):
    from ..commit.pcs import _coset_points_bitrev

    return _coset_points_bitrev(log_n, shift)


@functools.lru_cache(maxsize=None)
def _fri_pair_mat(log_m, exported=True, ctx=None):
    def stage(current):
        m = current.shape[0]
        return bb.from_monty(current).reshape(m // 2, 10)

    return _exported_stage(
        f"fripair:{log_m}", stage, (_sds(1 << log_m, 5, ctx=ctx),),
        exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _fri_fold(log_m, shift_layer, inject=False, exported=True, ctx=None):
    """FRI arity-2 fold; with inject=True the next height's reduced
    opening is added INSIDE the stage (the eager per-layer bb.add used to
    be its own one-time per-shape compile)."""
    x0inv = frim._x0_inv_table(log_m, shift_layer)

    if inject:
        def stage(current, beta_m, inj):
            return bb.add(
                frim.fold_device(current, beta_m, jnp.asarray(x0inv)), inj
            )

        args = (_sds(1 << log_m, 5, ctx=ctx), _sds(5, ctx=ctx),
                _sds(1 << (log_m - 1), 5, ctx=ctx))
    else:
        def stage(current, beta_m):
            return frim.fold_device(current, beta_m, jnp.asarray(x0inv))

        args = (_sds(1 << log_m, 5, ctx=ctx), _sds(5, ctx=ctx))

    return _exported_stage(
        f"frifold:{log_m}:{shift_layer}:i{int(inject)}", stage, args,
        exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _add_stage(shape, exported=True, ctx=None):
    """Jitted elementwise modular add (merging reduced openings of groups
    that share a height)."""
    return _exported_stage(
        f"addmod:{shape}", bb.add,
        (_sds(*shape, ctx=ctx), _sds(*shape, ctx=ctx)), exported, ctx,
    )


@functools.lru_cache(maxsize=None)
def _ladder_challenge_stage(k0, exported=True, ctx=None):
    """One FRI-ladder Fiat-Shamir round ON DEVICE (VERDICT r4 #2): absorb
    an 8-word Merkle root into the duplex sponge state with
    DuplexChallenger.observe semantics, then sample one ext challenge
    (5 coefficients popped from the end of the permuted state).

    k0 = input-buffer length at entry (static; 0 for every layer after the
    first — the first sample's duplex always drains the buffer).  State
    in/out is CANONICAL u32[16]; returns (state', beta_monty[5]).  The
    stage key carries the active Poseidon PARAM_SET because
    permute_device bakes the round constants in at trace time (same rule
    as the grind jit).  Bit-identical to the host DuplexChallenger
    (tests/test_jit_prover.py::test_ladder_challenge_stage_matches_host);
    the host challenger REPLAYS the ladder afterwards from one batched
    root fetch, so it stays the transcript oracle."""
    from ..crypto import poseidon

    W = poseidon.WIDTH

    def absorb_sample(state, buf):
        # observe: append to the input buffer, duplex when it fills
        n = int(buf.shape[0])
        st = state
        if n >= W:
            st = st.at[:W].set(buf[:W])
            st = bb.from_monty(poseidon.permute_device(bb.to_monty(st)))
            buf = buf[W:]
            n -= W
        # sample: duplex iff inputs pending or output buffer empty; a
        # just-filled output buffer (n == 0 here) is popped directly
        if n:
            st = st.at[:n].set(buf)
            st = bb.from_monty(poseidon.permute_device(bb.to_monty(st)))
        beta = st[jnp.array([15, 14, 13, 12, 11])]
        return st, bb.to_monty(beta)

    if k0:
        def stage(state, pending, root):
            words = root % np.uint32(bb.P)
            return absorb_sample(state, jnp.concatenate([pending, words]))

        args = (_sds(16, ctx=ctx), _sds(k0, ctx=ctx), _sds(8, ctx=ctx))
    else:
        def stage(state, root):
            return absorb_sample(state, root % np.uint32(bb.P))

        args = (_sds(16, ctx=ctx), _sds(8, ctx=ctx))

    return _exported_stage(
        f"frichal:{k0}:{poseidon.PARAM_SET}", stage, args, exported, ctx,
    )


class _BufSim:
    """Input/output-buffer lengths of a DuplexChallenger as a function of
    the observe/sample COUNT sequence only (values never change buffer
    arithmetic) — used by warmup to precompute the ladder's entry k0."""

    def __init__(self):
        self.k = 0
        self.out = 0

    def observe(self, n=1):
        for _ in range(n):
            self.out = 0
            self.k += 1
            if self.k == 16:
                self.k = 0
                self.out = 16

    def sample(self, n=1):
        for _ in range(n):
            if self.k or not self.out:
                self.k = 0
                self.out = 16
            self.out -= 1


def _pre_ladder_sim(all_mats, direct_set) -> "_BufSim":
    """Replay the pre-ladder transcript's observe/sample counts (shapes
    only) to get the challenger's buffer state at FRI-ladder entry.
    Must mirror prove_jit's transcript order exactly; a mismatch only
    costs one small runtime compile (the k0 variant), never correctness."""
    sim = _BufSim()
    sim.observe(8)                      # preprocessed root (zeros if none)
    sim.observe(8)                      # main root
    sim.sample(15)                      # 3 perm challenges
    sim.observe(8)                      # perm root
    sim.sample(5)                       # alpha
    sim.observe(8)                      # quotient root
    sim.sample(5)                       # zeta
    for mi, ((_h, w), kind) in enumerate(all_mats):
        n_points = 2 if kind[0] == "pair" else 1
        sim.observe(n_points * w * 5)   # opened values (all mats)
    for mi in sorted(direct_set):
        (h, w), _k = all_mats[mi]
        sim.observe(h * w)              # direct coefficient binding
    sim.sample(5)                       # alpha_fri
    return sim


def _ladder_entry_k0(all_mats, direct_set) -> int:
    return _pre_ladder_sim(all_mats, direct_set).k


def _grind_entry_k(all_mats, direct_set, n_layers: int, log_stop: int,
                   log_blowup: int) -> int:
    """Continue the transcript simulation through the FRI ladder and the
    final-poly binding to the PoW grind point (same caveat as above: a
    mismatch costs one runtime compile of the grind attempt, nothing
    else)."""
    sim = _pre_ladder_sim(all_mats, direct_set)
    for _ in range(n_layers):
        sim.observe(8)                  # layer root
        sim.sample(5)                   # beta
    n_keep = max(1, (1 << log_stop) >> log_blowup)
    sim.observe(5 * n_keep)             # final-poly coefficients
    return sim.k


def _dev_challenger_enabled() -> bool:
    return os.environ.get("VALIDA_TPU_DEV_CHALLENGER", "1") != "0"


@functools.lru_cache(maxsize=None)
def _stack_canon_stage(n, exported=True, ctx=None):
    """Stack n [5]-element monty ext values and convert to canonical in
    one stage (the per-prove cumulative-sum fetch)."""

    def stage(vals):
        return bb.from_monty(jnp.stack(vals))

    return _exported_stage(
        f"stackcanon:{n}", stage,
        (tuple(_sds(5, ctx=ctx) for _ in range(n)),), exported, ctx,
    )


_PERM_STAGE_CACHE = {}
_QUOTIENT_STAGE_CACHE = {}
_TRACE_STAGE_CACHE = {}

# host->device upload accounting (reset per prove_jit call); the
# device-side trace materialization exists to shrink this number
transfer_stats = {"bytes": 0, "trace_bytes": 0}


def _upload(x, ctx, kind="bytes"):
    arr = jnp.asarray(x)
    transfer_stats["bytes"] += int(arr.nbytes)
    if kind == "trace":
        transfer_stats["trace_bytes"] += int(arr.nbytes)
    if ctx is None:
        return arr
    return jax.device_put(
        arr, _shard_of(ctx, tuple(int(s) for s in arr.shape))
    )


def _trace_stage(machine, chip, shapes, meta, exported, ctx):
    """Compiled device-side trace materialization for one chip: compact
    op-log arrays in, the [n2, width] canonical trace out (bit-identical
    to the host build — same build_trace code, xp=jnp)."""
    key = (type(machine).__name__, chip.name, shapes, meta, exported,
           _ctx_key(ctx))
    fn = _TRACE_STAGE_CACHE.get(key)
    if fn is None:
        def stage(*inputs):
            return chip.build_trace(jnp, inputs, meta)

        fn = _exported_stage(
            f"tracegen:{key}", stage,
            tuple(_sds(*s, ctx=ctx) for s in shapes), exported, ctx,
        )
        _TRACE_STAGE_CACHE[key] = fn
    return fn


def _device_tracegen_enabled() -> bool:
    return os.environ.get("VALIDA_TPU_DEVICE_TRACEGEN", "1") != "0"


def _perm_stage(machine, chip, log_degree, width, prep_shape=None,
                exported=True, ctx=None):
    """prep_shape: shape of the chip's preprocessed trace, or None.  The
    preprocessed trace is a traced ARGUMENT, never a baked constant: the
    stage key carries only shapes, so baking content (the program ROM)
    would let a second program with the same ROM length silently reuse
    the first one's constants from the in-process or persistent cache
    (observed as a program-chip OOD failure at 2^17 after a 2^13 run)."""
    n = 1 << log_degree
    n_inter = len(chip.all_interactions(machine))
    chunk = _pow2_chunk("VALIDA_TPU_PERM_CHUNK", 1 << 16)
    # row-tile only the big single-device stages: the RLC/ext-inv temps of
    # a [2^22, w] chip OOM XLA's compile-time HBM accounting (observed at
    # the 2^20-cycle flagship config); under a mesh the associative_scan
    # already shards, and interaction-free chips are trivial
    if not (chunk and n > chunk and ctx is None and n_inter > 0):
        chunk = 0
    key = (type(machine).__name__, chip.name, log_degree, width,
           prep_shape, chunk, exported, _ctx_key(ctx))
    fn = _PERM_STAGE_CACHE.get(key)
    if fn is None:
        from ..air.lookup import perm_cols_and_terms

        def perm_full(main_trace, ch_arr, prep):
            t = generate_permutation_trace(machine, chip, main_trace,
                                           ch_arr, prep=prep)
            flat = bb.from_monty(t).reshape(t.shape[0], t.shape[1] * 5)
            return t, flat, t[-1, -1]

        def perm_chunked(main_trace, ch_arr, prep):
            """lax.scan over row tiles with the phi prefix sum carried:
            mod-p addition is exact and associative, so the stitched phi
            is bit-identical to the whole-domain associative_scan."""
            nc = n // chunk
            main_r = main_trace.reshape(nc, chunk, width)
            xs = (main_r,)
            if prep is not None:
                ph, pw = int(prep.shape[0]), int(prep.shape[1])
                if ph < n:
                    prep_p = jnp.concatenate(
                        [prep, jnp.zeros((n - ph, pw), jnp.uint32)], axis=0)
                else:
                    prep_p = prep[:n]
                xs = (main_r, prep_p.reshape(nc, chunk, pw))

            def body(carry, x):
                mt = x[0]
                prep_m = bb.to_monty(x[1]) if len(x) > 1 else None
                cols, terms = perm_cols_and_terms(
                    machine, chip, bb.to_monty(mt), prep_m, ch_arr)
                phi = bb.add(
                    jax.lax.associative_scan(bb.add, terms, axis=0),
                    carry[None, :])
                t = jnp.stack(cols + [phi], axis=1)
                flat = bb.from_monty(t).reshape(chunk, t.shape[1] * 5)
                return phi[-1], (t, flat)

            _last, (t, flat) = jax.lax.scan(
                body, jnp.zeros((5,), jnp.uint32), xs)
            t = t.reshape(n, n_inter + 1, 5)
            flat = flat.reshape(n, (n_inter + 1) * 5)
            return t, flat, t[-1, -1]

        impl = perm_chunked if chunk else perm_full
        if prep_shape is None:
            def stage(main_trace, ch_arr):
                return impl(main_trace, ch_arr, None)

            args = (_sds(1 << log_degree, width, ctx=ctx),
                    _sds(3, 5, ctx=ctx))
        else:
            def stage(main_trace, prep, ch_arr):
                return impl(main_trace, ch_arr, prep)

            args = (_sds(1 << log_degree, width, ctx=ctx),
                    _sds(*prep_shape, ctx=ctx), _sds(3, 5, ctx=ctx))

        fn = _exported_stage(f"perm:{key}", stage, args, exported, ctx)
        _PERM_STAGE_CACHE[key] = fn
    return fn


def _decompose_device(q_vals, pcs_shift, qd):
    """Device decompose_and_flatten (air/quotient.py) without host pulls."""
    coeffs = nttm.coset_intt(q_vals, pcs_shift)
    shift_chunk = bb.h_exp(pcs_shift, 1 << qd)
    rev = bitrev_indices(qd) if qd > 0 else np.array([0])
    chunks = []
    for i in np.asarray(rev):
        evals = nttm.coset_eval_from_coeffs(coeffs[int(i) :: 1 << qd], shift_chunk)
        chunks.append(bb.from_monty(evals))
    n = q_vals.shape[0] >> qd
    return jnp.concatenate(chunks, axis=1).reshape(n, (1 << qd) * 5)


def _quotient_stage(machine, chip, log_degree, qd, shapes, shift,
                    log_blowup, exported=True, ctx=None):
    chunk = _pow2_chunk("VALIDA_TPU_QUOTIENT_CHUNK", 1 << 15)
    key = (type(machine).__name__, chip.name, log_degree, qd, shapes,
           chunk, exported, _ctx_key(ctx))
    fn = _QUOTIENT_STAGE_CACHE.get(key)
    if fn is None:
        def stage(prep_lde, main_lde, perm_lde, ch_arr, alpha_arr, cum_canon):
            qv = quotient_values(
                machine, chip, log_degree, qd, prep_lde, main_lde, perm_lde,
                cum_canon, ch_arr, alpha_arr, shift, log_blowup, chunk=chunk,
            )
            return _decompose_device(qv, shift, qd)

        main_s, perm_s, prep_s = shapes
        fn = _exported_stage(
            f"quot:{key}:{shift}:{log_blowup}", stage,
            (_sds(*prep_s, ctx=ctx) if prep_s is not None else None,
             _sds(*main_s, ctx=ctx), _sds(*perm_s, ctx=ctx),
             _sds(3, 5, ctx=ctx), _sds(5, ctx=ctx), _sds(5, ctx=ctx)),
            exported, ctx,
        )
        _QUOTIENT_STAGE_CACHE[key] = fn
    return fn


def _to_ext_tuples(arr):
    """[w, 5] canonical np array -> list of ext tuples."""
    a = np.asarray(arr)
    return [tuple(int(x) for x in row) for row in a]


# one stable jit object -> the flatten+concat compiles once per shape-set
# (instead of an eager concat compile on every distinct call site)
_CATFLAT_JIT = jax.jit(
    lambda arrs: jnp.concatenate([a.reshape(-1) for a in arrs])
)


def _fetch_all(arrs):
    """ONE host fetch for a list of u32 device arrays.

    Per-array np.asarray costs a full device->host round trip each; the
    tunnel's latency made the ~80 small fetches of opened values + query
    openings several seconds of the 2^13 steady-state prove (VERDICT r3
    #3 breakdown).  Flattening everything into one device concatenate
    and fetching once pays the latency once.  np arrays pass through."""
    out = [None] * len(arrs)
    dev = [(i, a) for i, a in enumerate(arrs)
           if not isinstance(a, np.ndarray)]
    for i, a in enumerate(arrs):
        if isinstance(a, np.ndarray):
            out[i] = a
    if dev:
        flat = _CATFLAT_JIT(tuple(a for (_i, a) in dev))
        host = np.asarray(flat)
        off = 0
        for i, a in dev:
            sz = int(np.prod(a.shape)) if a.ndim else 1
            out[i] = host[off:off + sz].reshape(a.shape)
            off += sz
    return out


def _par_map(thunks):
    """Run independent stage thunks from a thread pool (order-preserving).

    XLA compilation releases the GIL, so first-call compiles of the
    per-chip / per-group stages overlap across threads; results and
    transcript order are unchanged (every challenger interaction happens
    outside these loops).  VALIDA_TPU_PAR=0 forces sequential; non-CPU
    backends default to sequential (the experimental tunnel PJRT plugin
    deadlocks under concurrent first calls — VALIDA_TPU_PAR=1 forces
    threads back on)."""
    thunks = list(thunks)
    par = os.environ.get("VALIDA_TPU_PAR")
    if par is None:
        par = "1" if jax.default_backend() == "cpu" else "0"
    if len(thunks) <= 1 or par == "0":
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(thunks))) as ex:
        return list(ex.map(lambda t: t(), thunks))


# ---------------------------------------------------------------------------
# parallel compile warmup
# ---------------------------------------------------------------------------


def _commit_hash_jobs(committed_shapes):
    """Signatures of every hash stage _build_levels_jit builds for a
    commit over matrices of the given committed (LDE) shapes:
    ('leaf', member-shapes tuple) and ('pair', n-digests) entries."""
    by_level = {}
    for (h, w) in committed_shapes:
        k = int(h).bit_length() - 1
        by_level.setdefault(k, []).append((int(h), int(w)))
    log_max = max(by_level)
    out = {("leaf", tuple(by_level[log_max]))}
    for k in range(log_max - 1, -1, -1):
        out.add(("pair", 1 << (k + 1)))
        if k in by_level:
            out.add(("leaf", tuple(by_level[k])))
            out.add(("leaf", ((1 << k, 8), (1 << k, 8))))
    return out


def warmup_jit(machine, config, threads: int = 8, dry: bool = False,
               mesh=None, row_axis: str = "sp"):
    """Build + compile every stage `prove_jit` will need, CONCURRENTLY.

    Stage shapes are fully determined by the machine's trace shapes (the
    Fiat–Shamir challenges are traced arrays of fixed shape).  Stage
    construction loads the persistent exported-stage cache (or traces +
    exports on a cold source version); then every stage is executed once
    on zero inputs from a thread pool — XLA compilation releases the GIL,
    and on remote-compile backends the requests parallelize (~4x measured
    with 8 threads), landing in the persistent compilation cache so the
    subsequent prove_jit only executes.  With `mesh`, warms the
    mesh-sharded (GSPMD) stage set that `prove_jit(mesh=...)` uses — the
    stage keys match exactly, so the distributed prove afterwards only
    executes.  dry=True skips the execution pass (shape/signature check).
    Returns the number of stage signatures prepared."""
    from concurrent.futures import ThreadPoolExecutor

    chips = machine.chips()
    pcs = config.pcs
    fri_config = pcs.config
    shift = pcs.coset_shift()
    log_blowup = pcs.log_blowup
    hasher = fri_config.hasher
    ctx = (mesh, row_axis) if mesh is not None else None

    u32 = jnp.uint32

    def sds(*shape):
        return jax.ShapeDtypeStruct(shape, u32)

    qds = [get_log_quotient_degree(machine, c) for c in chips]
    prep_shapes = {}
    for ci, c in enumerate(chips):
        p = c.preprocessed_trace()
        if p is not None:
            prep_shapes[ci] = tuple(int(x) for x in np.asarray(p).shape)
    main_shapes = [
        tuple(int(x) for x in np.asarray(c.generate_trace(machine)).shape)
        for c in chips
    ]
    log_degrees = [h.bit_length() - 1 for (h, _w) in main_shapes]
    perm_shapes = [
        (1 << ld, (len(c.all_interactions(machine)) + 1) * 5)
        for c, ld in zip(chips, log_degrees)
    ]
    quot_shapes = [(1 << ld, (1 << qd) * 5)
                   for ld, qd in zip(log_degrees, qds)]
    coset_shifts = [bb.h_exp(shift, 1 << qd) for qd in qds]

    jobs = []  # (jit_fn, arg ShapeDtypeStructs)

    def add(fn, *args):
        jobs.append((fn, args))

    # device-side trace materialization stages
    if _device_tracegen_enabled():
        for c in chips:
            dti = c.device_trace_inputs(machine)
            if dti is None:
                continue
            inputs, tmeta = dti
            in_shapes = tuple(tuple(int(s) for s in x.shape) for x in inputs)
            add(_trace_stage(machine, c, in_shapes, tmeta, True, ctx),
                *(jax.ShapeDtypeStruct(tuple(int(s) for s in x.shape),
                                       np.asarray(x).dtype) for x in inputs))

    # LDE stages (prep/main/perm at dshift=1; quotient at its coset shift)
    lde_keys = set()
    for shape in list(prep_shapes.values()) + main_shapes + perm_shapes:
        lde_keys.add((shape, 1))
    for shape, ds in zip(quot_shapes, coset_shifts):
        lde_keys.add((shape, ds))
    for shape, ds in lde_keys:
        add(_lde_stage(shape, ds, log_blowup, shift, True, ctx), sds(*shape))

    # Merkle level hashes per commit group (+ FRI layer commits below),
    # and the per-tree batched query-opening stages
    hash_keys = set()
    nq = fri_config.num_queries

    def add_open_batch(committed):
        lm = max(int(h).bit_length() - 1 for (h, _w) in committed)
        if lm == 0:
            return
        mat_shapes = tuple(committed)
        level_shapes = tuple((1 << k, 8) for k in range(lm, 0, -1))
        fn = _open_batch_stage(mat_shapes, level_shapes, lm, nq, True, ctx)
        add(fn,
            tuple(_sds(*s) for s in mat_shapes),
            tuple(_sds(*s) for s in level_shapes),
            jax.ShapeDtypeStruct((nq,), jnp.int32))

    def add_commit(committed):
        lm = max(int(h).bit_length() - 1 for (h, _w) in committed)
        if (1 << lm) <= _tree_fuse_max():
            add(_tree_stage(tuple(committed), hasher, True, ctx),
                tuple(sds(*s) for s in committed))
        else:
            hash_keys.update(_commit_hash_jobs(committed))
        add_open_batch(committed)

    for group in (
        [prep_shapes[ci] for ci in sorted(prep_shapes)] or None,
        main_shapes,
        perm_shapes,
        quot_shapes,
    ):
        if not group:
            continue
        add_commit([(h << log_blowup, w) for (h, w) in group])

    # perm + quotient stages
    for ci, (c, ld) in enumerate(zip(chips, log_degrees)):
        h, w = main_shapes[ci]
        if ci in prep_shapes:
            add(_perm_stage(machine, c, ld, w, prep_shapes[ci], True, ctx),
                sds(h, w), sds(*prep_shapes[ci]), sds(3, 5))
        else:
            add(_perm_stage(machine, c, ld, w, None, True, ctx),
                sds(h, w), sds(3, 5))
        shapes_q = (
            (h << log_blowup, w),
            (perm_shapes[ci][0] << log_blowup, perm_shapes[ci][1]),
            ((prep_shapes[ci][0] << log_blowup, prep_shapes[ci][1])
             if ci in prep_shapes else None),
        )
        prep_arg = (sds(*shapes_q[2]) if shapes_q[2] is not None else None)
        add(
            _quotient_stage(machine, c, ld, qds[ci], shapes_q, shift,
                            log_blowup, True, ctx),
            prep_arg, sds(*shapes_q[0]), sds(*shapes_q[1]),
            sds(3, 5), sds(5), sds(5),
        )

    # openings + reduced stages, grouped by (height, kind) as in prove_jit
    all_mats = []  # (coeff shape, kind)
    for ci in sorted(prep_shapes):
        all_mats.append((prep_shapes[ci], ("pair", log_degrees[ci])))
    for ci in range(len(chips)):
        all_mats.append((main_shapes[ci], ("pair", log_degrees[ci])))
    for ci in range(len(chips)):
        all_mats.append((perm_shapes[ci], ("pair", log_degrees[ci])))
    for ci in range(len(chips)):
        all_mats.append((quot_shapes[ci], ("pow", qds[ci])))
    threshold = frim.direct_open_threshold(fri_config)
    log_max_all = max(h.bit_length() - 1 + log_blowup
                      for (h, _w), _k in all_mats)
    direct_set = {
        mi for mi, ((h, _w), _k) in enumerate(all_mats)
        if frim.is_direct_mat(h.bit_length() - 1 + log_blowup,
                              log_max_all, threshold)
    }
    mat_offs = []
    off = 0
    for mi, ((_h, w), _k) in enumerate(all_mats):
        mat_offs.append(off)
        if mi not in direct_set:
            off += w
    groups = {}  # (log_h, kind) -> [mat index]
    for mi, ((h, _w), kind) in enumerate(all_mats):
        if mi in direct_set:
            continue
        groups.setdefault((h.bit_length() - 1, kind), []).append(mi)
    open_chunk = _pow2_chunk("VALIDA_TPU_OPEN_CHUNK", 1 << 16)
    red_chunk = _pow2_chunk("VALIDA_TPU_REDUCED_CHUNK", 1 << 16)
    for (log_h, kind), members in groups.items():
        h = 1 << log_h
        sum_w = sum(all_mats[mi][0][1] for mi in members)
        member_shapes = tuple((h, all_mats[mi][0][1]) for mi in members)
        add(_openings_stage(member_shapes, kind, open_chunk, True, ctx),
            tuple(sds(*s) for s in member_shapes), sds(5))
        n_points = 2 if kind[0] == "pair" else 1
        log_lde = log_h + log_blowup
        col_offs = tuple(
            mat_offs[mi] + j
            for mi in members
            for j in range(all_mats[mi][0][1])
        )
        add(
            _reduced_stage(member_shapes, kind, log_lde, col_offs, shift,
                           red_chunk, True, ctx),
            tuple(sds(1 << log_lde, s[1]) for s in member_shapes),
            tuple(sds(sum_w, 5) for _ in range(n_points)),
            sds(5), sds(5),
        )

    # merge-adds for heights shared by several reduced-opening groups
    height_group_counts = {}
    for (log_h, _kind) in groups:
        lde_h = log_h + log_blowup
        height_group_counts[lde_h] = height_group_counts.get(lde_h, 0) + 1
    for lde_h, cnt in height_group_counts.items():
        if cnt > 1:
            add(_add_stage((1 << lde_h, 5), True, ctx),
                sds(1 << lde_h, 5), sds(1 << lde_h, 5))

    # cumulative-sum stack fetch
    add(_stack_canon_stage(len(chips), True, ctx),
        tuple(sds(5) for _ in chips))

    # FRI layers (direct-opened tiny mats carry no reduced opening, so the
    # fold range is clamped by the smallest PARTICIPATING height)
    log_max = max(log_degrees) + log_blowup
    min_part = min(
        h.bit_length() - 1 + log_blowup
        for mi, ((h, _w), _k) in enumerate(all_mats)
        if mi not in direct_set
    )
    reduced_heights = {log_h + log_blowup for (log_h, _kind) in groups}
    log_stop = frim.fri_log_stop(fri_config, log_max, min_part)
    if _dev_challenger_enabled() and log_max > log_stop:
        k0 = _ladder_entry_k0(all_mats, direct_set)
        if k0:
            add(_ladder_challenge_stage(k0, True, ctx),
                sds(16), sds(k0), sds(8))
        if k0 == 0 or log_max - log_stop > 1:
            add(_ladder_challenge_stage(0, True, ctx), sds(16), sds(8))
    for layer, log_m in enumerate(range(log_max, log_stop, -1)):
        add(_fri_pair_mat(log_m, True, ctx), sds(1 << log_m, 5))
        inject = (log_m - 1) in reduced_heights
        fold = _fri_fold(log_m, frim.layer_shift(shift, layer), inject,
                         True, ctx)
        if inject:
            add(fold, sds(1 << log_m, 5), sds(5), sds(1 << (log_m - 1), 5))
        else:
            add(fold, sds(1 << log_m, 5), sds(5))
        add_commit([(1 << (log_m - 1), 10)])

    # first-call eager-compile kill (VERDICT r4 #4): the batched-fetch
    # concat jit (_fetch_all's _CATFLAT_JIT, keyed on its shape tuple) and
    # the PoW grind attempt are the last one-time compiles a first prove
    # pays after warmup; warm them on the exact shape sets prove_jit uses.
    catflat_sets = []
    open_shapes = []  # opened-values fetch: n_points x [sum_w, 5] per group
    for (_log_h, kind), members in groups.items():
        sum_w = sum(all_mats[mi][0][1] for mi in members)
        open_shapes += [(sum_w, 5)] * (2 if kind[0] == "pair" else 1)
    if open_shapes:
        catflat_sets.append(open_shapes)
    n_layers = max(log_max - log_stop, 0)
    if _dev_challenger_enabled() and n_layers:
        catflat_sets.append([(8,)] * n_layers)  # batched ladder-root fetch
    # query openings: FRI layer trees then commit-round trees, matching
    # prove_jit's flat order (zero-depth paths are numpy and never reach
    # the concat jit)
    q_shapes = []
    for log_m in range(log_max, log_stop, -1):
        q_shapes.append((nq, 10))
        if log_m - 1 > 0:
            q_shapes.append((nq, log_m - 1, 8))
    round_groups = []
    if prep_shapes:
        round_groups.append([prep_shapes[ci] for ci in sorted(prep_shapes)])
    round_groups += [main_shapes, perm_shapes, quot_shapes]
    for group in round_groups:
        committed = [(h << log_blowup, w) for (h, w) in group]
        lm_r = max(h.bit_length() - 1 for (h, _w) in committed)
        q_shapes += [(nq, w) for (_h, w) in committed]
        if lm_r > 0:
            q_shapes.append((nq, lm_r, 8))
    if q_shapes:
        catflat_sets.append(q_shapes)
    if ctx is None:
        # prove-time catflat args are stage outputs COMMITTED to the
        # default device; place the warmup zeros the same way so the jit
        # cache entry matches (see _place_calls)
        def _catflat_committed(arrs):
            dev = jax.devices()[0]
            return _CATFLAT_JIT(tuple(jax.device_put(a, dev) for a in arrs))

        for shapes_cf in catflat_sets:
            add(_catflat_committed, tuple(sds(*s) for s in shapes_cf))

    bits = fri_config.proof_of_work_bits
    if bits:
        from ..crypto import poseidon

        k_grind = _grind_entry_k(all_mats, direct_set, n_layers, log_stop,
                                 log_blowup)
        batch0 = max(64, min(1 << 14, 4 << bits))
        add(frim._grind_attempt_jit(batch0, k_grind, (1 << bits) - 1,
                                    poseidon.PARAM_SET),
            sds(batch0, poseidon.WIDTH), jax.ShapeDtypeStruct((), u32))

    for kind_, payload in hash_keys:
        if kind_ == "leaf":
            add(_leaf_hash_jit(payload, hasher, True, ctx),
                tuple(sds(*s) for s in payload))
        else:
            add(_pair_hash_jit(payload, hasher, True, ctx),
                sds(payload, 8))

    def zeros_of(a):
        if a is None:
            return None
        if isinstance(a, tuple):
            return tuple(zeros_of(x) for x in a)
        return jnp.zeros(a.shape, a.dtype)

    log_progress = os.environ.get("VALIDA_TPU_WARMUP_LOG", "0") == "1"

    def shapes_of(a):
        if a is None:
            return None
        if isinstance(a, tuple):
            return tuple(shapes_of(x) for x in a)
        return tuple(a.shape)

    def compile_one(ij):
        i, (fn, args) = ij
        if log_progress:
            import time as _time

            print(f"[warmup {i+1}/{len(jobs)}] "
                  f"{_time.strftime('%H:%M:%S')} args={shapes_of(args)}",
                  file=sys.stderr, flush=True)
        if dry:  # signature check only (tests): abstract evaluation
            jax.eval_shape(fn, *args)
        else:
            out = fn(*(zeros_of(a) for a in args))
            jax.block_until_ready(out)

    # the experimental tunnel PJRT plugin deadlocks under concurrent
    # first-call compiles (observed: all threads futex-parked); default to
    # serial off-CPU, overridable once a backend is known thread-safe
    env_threads = os.environ.get("VALIDA_TPU_WARMUP_THREADS")
    if env_threads is not None:
        threads = int(env_threads)
    elif jax.default_backend() != "cpu":
        threads = 1
    if threads <= 1:
        for ij in enumerate(jobs):
            compile_one(ij)
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(compile_one, enumerate(jobs)))
    return len(jobs)


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------


def prove_jit(machine, config, mesh=None, row_axis: str = "sp") -> MachineProof:
    """Device-resident prove.  With `mesh`, the prover runs DISTRIBUTED:
    trace rows (and everything derived from them — LDEs, Merkle leaves,
    permutation traces, quotient domains, FRI layers) are sharded over
    `mesh.shape[row_axis]` devices.  LDE transforms big enough for the
    four-step schedule use the explicit one-all_to_all-round distributed
    NTT; every other stage is the same jitted code partitioned by GSPMD
    (the Fiat-Shamir challenger runs replicated on the host between
    stages, so devices never need to communicate for sampling).  Proofs
    are bit-identical to the single-device path (tested on an 8-device
    mesh)."""
    chips = machine.chips()
    pcs = config.pcs
    fri_config = pcs.config
    shift = pcs.coset_shift()
    log_blowup = pcs.log_blowup
    challenger = config.challenger()

    ctx = (mesh, row_axis) if mesh is not None else None
    exported = True  # mesh-sharded stages export fine (shardings pinned)

    def place(mat):
        if ctx is None:
            return mat
        return jax.device_put(
            mat, _shard_of(ctx, tuple(int(x) for x in mat.shape))
        )

    qds = [get_log_quotient_degree(machine, c) for c in chips]

    # -- traces -------------------------------------------------------------
    transfer_stats["bytes"] = 0
    transfer_stats["trace_bytes"] = 0

    prep_traces = [c.preprocessed_trace() for c in chips]
    prep_indices = {}
    prep_list = []
    for ci, p in enumerate(prep_traces):
        if p is not None:
            prep_indices[ci] = len(prep_list)
            prep_list.append(_upload(np.asarray(p, dtype=np.uint32), ctx))
    from ..utils import stage

    def one_trace(c):
        dti = (c.device_trace_inputs(machine)
               if _device_tracegen_enabled() else None)
        if dti is None:
            return _upload(np.asarray(c.generate_trace(machine),
                                      dtype=np.uint32), ctx, "trace")
        inputs, tmeta = dti
        shapes = tuple(tuple(int(s) for s in x.shape) for x in inputs)
        fn = _trace_stage(machine, c, shapes, tmeta, exported, ctx)
        return fn(*[_upload(x, ctx, "trace") for x in inputs])

    with stage("generate main traces"):
        main_traces = _par_map([
            (lambda c=c: one_trace(c)) for c in chips
        ])
    log_degrees = [int(t.shape[0]).bit_length() - 1 for t in main_traces]
    g_subgroups = [bb.two_adic_generator(ld) for ld in log_degrees]

    def commit(mats, dshifts=None):
        dshifts = dshifts or [1] * len(mats)

        def one(mat, dshift):
            fn = _lde_stage(tuple(int(x) for x in mat.shape), dshift,
                            log_blowup, shift, exported, ctx)
            return fn(mat)

        outs = _par_map([
            (lambda m=mat, d=dshift: one(m, d))
            for mat, dshift in zip(mats, dshifts)
        ])
        coeffs = [o[0] for o in outs]
        ldes = [o[1] for o in outs]
        committed = [o[2] for o in outs]
        root, levels = _build_levels_jit(committed, fri_config.hasher,
                                         exported, ctx)
        tree = DeviceTree(committed, root, levels, exported, ctx)
        return tree, coeffs, ldes

    # -- transcript ---------------------------------------------------------
    with stage("commit to preprocessed traces"):
        if prep_list:
            prep_tree, prep_coeffs, prep_ldes = commit(prep_list)
            prep_root = prep_tree.root
        else:
            prep_tree, prep_coeffs, prep_ldes = None, [], []
            prep_root = np.zeros(8, dtype=np.uint32)
    challenger.observe_digest(prep_root)

    with stage("commit to main traces"):
        main_tree, main_coeffs, main_ldes = commit(main_traces)
    challenger.observe_digest(main_tree.root)

    perm_challenges = [challenger.sample_ext() for _ in range(3)]
    ch_arr = jnp.asarray(np.array(perm_challenges, dtype=np.uint32))

    def perm_one(ci, c, t):
        ld = int(t.shape[0]).bit_length() - 1
        w = int(t.shape[1])
        if ci in prep_indices:
            prep = prep_list[prep_indices[ci]]
            fn = _perm_stage(machine, c, ld, w,
                             tuple(int(x) for x in prep.shape),
                             exported, ctx)
            return fn(t, prep, ch_arr)
        return _perm_stage(machine, c, ld, w, None, exported, ctx)(t, ch_arr)

    with stage("generate permutation traces"):
        perm_outs = _par_map([
            (lambda ci=ci, c=c, t=t: perm_one(ci, c, t))
            for ci, (c, t) in enumerate(zip(chips, main_traces))
        ])
    perm_traces = [o[0] for o in perm_outs]
    perm_flat = [o[1] for o in perm_outs]
    cumulative_sums_dev = [o[2] for o in perm_outs]
    with stage("commit to permutation traces"):
        perm_tree, perm_coeffs, perm_ldes = commit(perm_flat)
    challenger.observe_digest(perm_tree.root)
    # one stacked fetch instead of one round trip per chip
    cs_host = np.asarray(
        _stack_canon_stage(len(chips), exported, ctx)(
            tuple(cumulative_sums_dev)
        )
    )
    cumulative_sums = [tuple(int(x) for x in row) for row in cs_host]

    alpha = challenger.sample_ext()
    alpha_arr = jnp.asarray(np.array(alpha, dtype=np.uint32))

    if config.debug_checks:
        from ..air.check import check_constraints, check_cumulative_sums

        for c, t, pt, cs in zip(chips, main_traces, perm_traces, cumulative_sums):
            check_constraints(machine, c, np.asarray(t), np.asarray(pt),
                              perm_challenges, cs)
        check_cumulative_sums(cumulative_sums)

    # -- quotient -----------------------------------------------------------
    def quotient_one(ci, chip):
        prep_lde = prep_ldes[prep_indices[ci]] if ci in prep_indices else None
        shapes_q = (
            tuple(int(x) for x in main_ldes[ci].shape),
            tuple(int(x) for x in perm_ldes[ci].shape),
            tuple(int(x) for x in prep_lde.shape) if prep_lde is not None else None,
        )
        fn = _quotient_stage(machine, chip, log_degrees[ci], qds[ci],
                             shapes_q, shift, log_blowup, exported, ctx)
        # canonical cum-sum from the already-fetched stacked host copy —
        # an eager device `bb.from_monty` here costs ~9 tiny one-time
        # remote compiles and ~9 dispatches per chip per prove
        return fn(prep_lde, main_ldes[ci], perm_ldes[ci], ch_arr, alpha_arr,
                  jnp.asarray(cs_host[ci]))

    with stage("compute quotient polynomial"):
        quotient_mats = _par_map([
            (lambda ci=ci, chip=chip: quotient_one(ci, chip))
            for ci, chip in enumerate(chips)
        ])
    coset_shifts = [bb.h_exp(shift, 1 << qd) for qd in qds]
    with stage("commit to quotient chunks"):
        quotient_tree, quotient_coeffs, quotient_ldes = commit(
            quotient_mats, coset_shifts
        )
    challenger.observe_digest(quotient_tree.root)

    # -- openings -----------------------------------------------------------
    zeta = challenger.sample_ext()
    # Montgomery-convert on the host (numpy) and upload the 20-byte result:
    # to_monty on a device array is ~20 eager ops of one-time compile
    zeta_m = jnp.asarray(bb.to_monty(np.array(zeta, dtype=np.uint32)))

    rounds_meta = []  # (tree, coeffs, ldes, point_kinds)
    if prep_tree is not None:
        kinds = tuple(
            ("pair", log_degrees[ci]) for ci in sorted(prep_indices)
        )
        rounds_meta.append((prep_tree, prep_coeffs, prep_ldes, kinds))
    rounds_meta.append(
        (main_tree, main_coeffs, main_ldes,
         tuple(("pair", ld) for ld in log_degrees))
    )
    rounds_meta.append(
        (perm_tree, perm_coeffs, perm_ldes,
         tuple(("pair", ld) for ld in log_degrees))
    )
    rounds_meta.append(
        (quotient_tree, quotient_coeffs, quotient_ldes,
         tuple(("pow", qd) for qd in qds))
    )

    all_coeffs = []
    all_ldes = []
    all_kinds = []
    for _tree, coeffs, ldes, kinds in rounds_meta:
        all_coeffs += coeffs
        all_ldes += ldes
        all_kinds += list(kinds)

    # direct-opened tiny matrices (commit/fri.py direct_open_threshold):
    # full coefficients ship in the proof, zeta openings are evaluated
    # host-side from them (exact arithmetic, bit-identical to the device
    # stage), and they skip the openings/reduced stages and FRI entirely
    threshold = frim.direct_open_threshold(fri_config)
    log_max_all = max(
        int(c.shape[0]).bit_length() - 1 + log_blowup for c in all_coeffs
    )
    direct_set = set()
    direct_polys = []
    for mi, c in enumerate(all_coeffs):
        log_lde = int(c.shape[0]).bit_length() - 1 + log_blowup
        if frim.is_direct_mat(log_lde, log_max_all, threshold):
            direct_set.add(mi)
            direct_polys.append(
                np.asarray(bb.from_monty(np.asarray(c)), dtype=np.uint32)
            )

    # group matrices by (height, point-kind): one openings stage and one
    # reduced stage per group instead of per matrix (identical values,
    # far fewer compiles — see _reduced_stage)
    groups = {}  # (log_h, kind) -> [mat index]
    for mi, (c, kind) in enumerate(zip(all_coeffs, all_kinds)):
        if mi in direct_set:
            continue
        key = (int(c.shape[0]).bit_length() - 1, kind)
        groups.setdefault(key, []).append(mi)

    group_items = list(groups.items())
    open_chunk = _pow2_chunk("VALIDA_TPU_OPEN_CHUNK", 1 << 16)
    red_chunk = _pow2_chunk("VALIDA_TPU_REDUCED_CHUNK", 1 << 16)

    def open_group(kind, members):
        shapes = tuple(
            tuple(int(x) for x in all_coeffs[mi].shape) for mi in members
        )
        return _openings_stage(shapes, kind, open_chunk, exported, ctx)(
            tuple(all_coeffs[mi] for mi in members), zeta_m
        )

    def open_direct(mi):
        """Host evaluation of a direct mat at its kind's points."""
        coeffs = direct_polys[sorted(direct_set).index(mi)].astype(np.uint64)
        tag, param = all_kinds[mi]
        if tag == "pair":
            g = bb.two_adic_generator(param)
            points = [zeta, extf.e_scale(zeta, g)]
        else:
            zq = zeta
            for _ in range(param):
                zq = extf.e_mul(zq, zq)
            points = [zq]
        out = []
        for z in points:
            zp = np.asarray(extf.e_powers(z, coeffs.shape[0]),
                            dtype=np.uint64)  # [h, 5]
            vals = np.zeros((coeffs.shape[1], 5), dtype=np.uint64)
            for d in range(5):
                vals[:, d] = ((coeffs * zp[:, d:d + 1]) % bb.P
                              ).sum(axis=0) % bb.P
            out.append([tuple(int(x) for x in row) for row in vals])
        return out

    with stage("open at zeta"):
        group_vals = _par_map([
            (lambda kind=kind, members=members: open_group(kind, members))
            for (_lh, kind), members in group_items
        ])
    # observe opened values (canonical, host) — all GROUPS' values in ONE
    # batched fetch (see _fetch_all), then per-matrix slicing on the host
    # (device-side per-matrix slices were ~100 tiny one-time compiles)
    fetched = iter(_fetch_all(
        [v for vals in group_vals for v in vals]
    ))
    opened_host = [None] * len(all_coeffs)
    for ((_lh, _kind), members), vals in zip(group_items, group_vals):
        # Montgomery values fetched raw; canonicalize in numpy on the host
        # (a per-group-shape device from_monty was ~9 one-time compiles
        # per distinct opened-width through the remote-compile service)
        host_points = [bb.from_monty(np.asarray(next(fetched)))
                       for _ in vals]
        off = 0
        for mi in members:
            w = int(all_coeffs[mi].shape[1])
            opened_host[mi] = [
                _to_ext_tuples(hp[off:off + w]) for hp in host_points
            ]
            off += w
    for mi in sorted(direct_set):
        opened_host[mi] = open_direct(mi)
    for mat_vals in opened_host:
        for point_vals in mat_vals:
            for val in point_vals:
                challenger.observe_ext(val)
    # bind direct-opened coefficients before alpha / query sampling
    # (transcript position matches pcs.open_multi_batches / verify)
    observe_direct_polys(challenger, direct_polys)
    alpha_fri = challenger.sample_ext()
    alpha_fri_m = jnp.asarray(bb.to_monty(np.array(alpha_fri, dtype=np.uint32)))

    mat_offs = []  # absolute alpha-power offset of each matrix
    off = 0
    for mi, c in enumerate(all_coeffs):
        mat_offs.append(off)
        if mi not in direct_set:  # direct mats carry no alpha powers
            off += int(c.shape[1])
    def reduce_group(gi, log_h, kind, members):
        log_lde = log_h + log_blowup
        member_shapes = tuple(
            (1 << log_h, int(all_coeffs[mi].shape[1])) for mi in members
        )
        col_offs = tuple(
            mat_offs[mi] + j
            for mi in members
            for j in range(int(all_coeffs[mi].shape[1]))
        )
        # the group's zeta openings come straight from its openings stage
        # (same member grouping — no re-concatenation needed)
        return _reduced_stage(member_shapes, kind, log_lde, col_offs,
                              shift, red_chunk, exported, ctx)(
            tuple(all_ldes[mi] for mi in members), group_vals[gi],
            zeta_m, alpha_fri_m)

    reduced = {}
    with stage("reduce openings"):
        contribs = _par_map([
            (lambda gi=gi, lh=log_h, kind=kind, members=members:
             reduce_group(gi, lh, kind, members))
            for gi, ((log_h, kind), members) in enumerate(group_items)
        ])
        for ((log_h, _kind), _members), contrib in zip(group_items,
                                                       contribs):
            log_lde = log_h + log_blowup
            if log_lde in reduced:
                reduced[log_lde] = _add_stage((1 << log_lde, 5),
                                              exported, ctx)(
                    reduced[log_lde], contrib)
            else:
                reduced[log_lde] = contrib

    # -- FRI ----------------------------------------------------------------
    # With the device challenger (default), the whole ladder runs with NO
    # host round trips: per layer, the Merkle root stays on device, the
    # duplex absorb+sample runs as a compiled stage, and the fold consumes
    # the device beta.  All roots are fetched in ONE batch afterwards and
    # the host challenger REPLAYS the observes/samples, so it remains the
    # transcript oracle for everything downstream (final poly, grind,
    # query indices).  The per-layer root fetch + host Poseidon used to be
    # the dominant steady-state cost (1.23 s of 4.48 s at 2^13, VERDICT
    # r4 weak #3).
    log_max = max(reduced)
    log_min = frim.fri_log_stop(fri_config, log_max, min(reduced))
    current = reduced[log_max]
    commits = []
    layer_trees = []
    layer = 0
    use_dev_chal = _dev_challenger_enabled()
    fstage = stage("FRI commit phase")
    fstage.__enter__()
    if use_dev_chal:
        k0 = len(challenger.input_buffer)
        dev_state = _upload(
            np.asarray(challenger.state, dtype=np.uint32), ctx)
        pending0 = (_upload(
            np.asarray(challenger.input_buffer, dtype=np.uint32), ctx)
            if k0 else None)
        root_devs = []
    for log_m in range(log_max, log_min, -1):
        pair_mat = _fri_pair_mat(log_m, exported, ctx)(current)
        root, levels = _build_levels_jit([pair_mat], fri_config.hasher,
                                         exported, ctx,
                                         fetch_root=not use_dev_chal)
        tree = DeviceTree([pair_mat], root, levels, exported, ctx)
        layer_trees.append(tree)
        if use_dev_chal:
            root_devs.append(root)
            kk = k0 if layer == 0 else 0
            chal = _ladder_challenge_stage(kk, exported, ctx)
            if kk:
                dev_state, beta_m = chal(dev_state, pending0, root)
            else:
                dev_state, beta_m = chal(dev_state, root)
        else:
            commits.append(tree.root)
            challenger.observe_digest(tree.root)
            beta = challenger.sample_ext()
            beta_m = jnp.asarray(
                bb.to_monty(np.array(beta, dtype=np.uint32)))
        nxt = log_m - 1
        inject = nxt in reduced
        fold = _fri_fold(log_m, frim.layer_shift(shift, layer), inject,
                         exported, ctx)
        current = (fold(current, beta_m, reduced[nxt]) if inject
                   else fold(current, beta_m))
        layer += 1

    if use_dev_chal and layer:
        # one batched root fetch, then host transcript replay
        for r in _fetch_all(root_devs):
            r = np.asarray(r)
            commits.append(r)
            challenger.observe_digest(r)
            challenger.sample_ext()
    fstage.__exit__(None, None, None)
    final_poly = frim.extract_final_poly(np.asarray(current), fri_config,
                                         log_max, log_min, shift, challenger)
    with stage("PoW grind"):
        pow_witness = frim.grind_device(challenger,
                                        fri_config.proof_of_work_bits)
    query_indices = [
        challenger.sample_bits(log_max)
        for _ in range(fri_config.num_queries)
    ]
    qidx = np.array(query_indices, dtype=np.int64)

    # -- query openings (batched per tree, ONE host fetch for all trees) ----
    ostage = stage("query openings")
    ostage.__enter__()
    layer_dev = []  # (rows0, paths) device arrays per FRI layer tree
    cur_idx = qidx.copy()
    for tree in layer_trees:
        rows, paths = tree.open_batch(cur_idx >> 1, fetch=False)
        layer_dev.append((rows[0], paths))
        cur_idx >>= 1
    round_dev = []  # (rows list, paths) device arrays per commit round
    for tree, _c, _l, _k in rounds_meta:
        tree_idx = qidx >> (log_max - tree.log_max)
        rows, paths = tree.open_batch(tree_idx, fetch=False)
        round_dev.append((rows, paths))
    flat = [a for (r0, p) in layer_dev for a in (r0, p)]
    flat += [a for (rows, p) in round_dev for a in list(rows) + [p]]
    fetched = iter(_fetch_all(flat))
    layer_rows, layer_paths = [], []
    for _ in layer_dev:
        layer_rows.append(next(fetched))
        layer_paths.append(next(fetched))
    round_opens = []
    for rows, _p in round_dev:
        got_rows = [next(fetched) for _ in rows]
        round_opens.append((got_rows, next(fetched)))

    fri_queries = []
    for qi in range(len(query_indices)):
        fri_queries.append(
            frim.FriQueryProof(
                commit_phase_openings=[
                    frim.CommitPhaseOpening(
                        pair_row=layer_rows[li][qi],
                        path=list(layer_paths[li][qi]),
                    )
                    for li in range(len(layer_trees))
                ]
            )
        )
    fri_proof = frim.FriProof(
        commit_phase_commits=commits,
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_proofs=fri_queries,
    )

    pcs_queries = []
    for qi in range(len(query_indices)):
        input_openings = []
        for rows, paths in round_opens:
            input_openings.append(
                BatchOpening(
                    opened_rows=[r[qi] for r in rows],
                    path=list(paths[qi]),
                )
            )
        pcs_queries.append(
            PcsQueryProof(
                input_openings=input_openings, fri_query=fri_queries[qi]
            )
        )
    ostage.__exit__(None, None, None)
    opening_proof = PcsProof(fri=fri_proof, query_proofs=pcs_queries,
                             direct_polys=direct_polys)

    # -- assemble opened values per chip ------------------------------------
    n_prep = len(prep_list)
    prep_vals = opened_host[:n_prep]
    main_vals = opened_host[n_prep : n_prep + len(chips)]
    perm_vals = opened_host[n_prep + len(chips) : n_prep + 2 * len(chips)]
    quot_vals = opened_host[n_prep + 2 * len(chips) :]

    chip_proofs = []
    for ci, chip in enumerate(chips):
        if ci in prep_indices:
            pv = prep_vals[prep_indices[ci]]
            prep_local, prep_next = pv[0], pv[1]
        else:
            prep_local, prep_next = [], []
        chip_proofs.append(
            ChipProof(
                log_degree=log_degrees[ci],
                opened_values=OpenedValues(
                    preprocessed_local=prep_local,
                    preprocessed_next=prep_next,
                    trace_local=main_vals[ci][0],
                    trace_next=main_vals[ci][1],
                    permutation_local=perm_vals[ci][0],
                    permutation_next=perm_vals[ci][1],
                    quotient_chunks=quot_vals[ci][0],
                ),
                cumulative_sum=cumulative_sums[ci],
            )
        )

    return MachineProof(
        commitments=Commitments(
            preprocessed=prep_root,
            main_trace=main_tree.root,
            perm_trace=perm_tree.root,
            quotient_chunks=quotient_tree.root,
        ),
        opening_proof=opening_proof,
        chip_proofs=chip_proofs,
    )
