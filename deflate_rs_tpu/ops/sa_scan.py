"""Pallas TPU kernel: fused suffix-order LCP + K-deep running-min scan.

The suffix-sort matcher (matching.find_matches) spends its post-sort time in
two HBM-bound XLA stages: the adjacent-row LCP construction and the K-step
running-min neighbor scan (each fori_loop step round-trips ~5 arrays through
HBM).  This kernel fuses both into one VMEM-resident pass per chunk: the
sorted keys/payloads/positions are loaded once, and all K steps run on the
VPU over a (ROWS, 128) layout, shifting by one row-major element per step
with two `pltpu.roll`s + a lane select.

Semantics are identical to the XLA formulation (see find_matches, and the
reference's hash-chain candidate walk it replaces, matching.rs:87):

* adjacent LCP ``al[i]`` = matched leading bytes between sorted rows i-1 and
  i, exact to 4*PW bytes (big-endian key words compared by leading-byte
  tests, little-endian payload words by trailing-byte tests, each tier gated
  on the previous tiers being fully equal);
* the match length with the neighbor k rows away is the running MIN of
  adjacent LCPs (ultrametric), tracked in both sorted-order directions;
* a candidate k away is valid iff its position is in-window, >= hstart, and
  the running min is >= MIN_MATCH; the best (length, distance) is kept as
  the packed score ``(len << 16) | (WINDOW_SIZE + 1 - dist)``.

Wrapped (circular-roll) lanes at the array edges are excluded by an explicit
index mask each step, so they can never contribute a candidate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import WINDOW_SIZE

LANES = 128


def _shift_down(x, lane):
    """result[i] = x[i-1] in row-major order (garbage at i=0)."""
    a = pltpu.roll(x, 1, 1)  # lane l <- l-1 (lane 0 wraps to 127, same row)
    b = pltpu.roll(a, 1, 0)  # row r <- r-1
    return jnp.where(lane == 0, b, a)


def _shift_up(x, lane):
    """result[i] = x[i+1] in row-major order (garbage at i=N-1).

    pltpu.roll requires non-negative shifts; roll by size-1 == roll by -1.
    """
    a = pltpu.roll(x, LANES - 1, 1)
    b = pltpu.roll(a, x.shape[0] - 1, 0)
    return jnp.where(lane == LANES - 1, b, a)


def _lead_bytes(x):
    """Matched leading bytes of a XOR'd big-endian word (0..4), int ops only."""
    x = x.astype(jnp.uint32)
    m0 = (x >> 8) == 0
    m1 = (x >> 16) == 0
    m2 = (x >> 24) == 0
    m3 = x == 0
    return (m3.astype(jnp.int32) + m2) + (m1 + m0.astype(jnp.int32))


def _trail_bytes(x):
    """Matched trailing (low-order) bytes of a XOR'd little-endian word."""
    x = x.astype(jnp.uint32)
    m0 = (x & 0x000000FF) == 0
    m1 = (x & 0x0000FFFF) == 0
    m2 = (x & 0x00FFFFFF) == 0
    m3 = x == 0
    return (m0.astype(jnp.int32) + m1) + (m2 + m3.astype(jnp.int32))


def _make_kernel(nkey: int, npay: int, K: int, init_lcp: int):
    def kernel(scal_ref, *refs):
        keys = [refs[i] for i in range(nkey)]
        spos_ref = refs[nkey]
        pays = [refs[nkey + 1 + i] for i in range(npay)]
        best_ref = refs[nkey + 1 + npay]

        b = pl.program_id(0)
        R = spos_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        idx = row * LANES + lane
        N = R * LANES
        hstart = scal_ref[b, 0]
        n_total = scal_ref[b, 1]

        spos = spos_ref[0]

        total = None
        for w in range(nkey):
            a = keys[w][0]
            m = _lead_bytes(a ^ _shift_down(a, lane))
            total = m if total is None else total + jnp.where(total == 4 * w, m, 0)
        for w in range(npay):
            p = pays[w][0]
            m = _trail_bytes(p ^ _shift_down(p, lane))
            total = total + jnp.where(total == 4 * (nkey + w), m, 0)
        al = jnp.where(idx == 0, 0, total)

        svalid = (spos >= hstart) & (spos <= n_total - 3)

        # Invariants entering step k (1-based):
        #   ab holds al[i-(k-1)]   (al itself at k=1)
        #   af holds al[i+(k-1)]... shifted before use to al[i+k]
        #   cb holds spos[i-(k-1)]; shifted before use to spos[i-k]
        # matching the XLA scan: runb_k admits al[i-k+1], candidate spos[i-k];
        # runf_k admits al[i+k], candidate spos[i+k].
        def step(k, carry):
            runb, runf, cb, cf, ab, af, best = carry
            runb = jnp.minimum(runb, ab)  # admit al[i-(k-1)] == al[i-k+1]
            cb = _shift_down(cb, lane)  # spos[i-k]
            af = _shift_up(af, lane)  # al[i+k]
            cf = _shift_up(cf, lane)  # spos[i+k]
            runf = jnp.minimum(runf, af)
            db = spos - cb
            df = spos - cf
            okb = (idx >= k) & (db >= 1) & (db <= WINDOW_SIZE) & (cb >= hstart) & (runb >= 3)
            okf = (idx < N - k) & (df >= 1) & (df <= WINDOW_SIZE) & (cf >= hstart) & (runf >= 3)
            sb = jnp.where(okb, (runb << 16) | (WINDOW_SIZE + 1 - db), 0)
            sf = jnp.where(okf, (runf << 16) | (WINDOW_SIZE + 1 - df), 0)
            best = jnp.maximum(best, jnp.maximum(sb, sf))
            ab = _shift_down(ab, lane)  # al[i-k] for the next step
            return runb, runf, cb, cf, ab, af, best

        init = jnp.full((R, LANES), init_lcp, jnp.int32)
        zero = jnp.zeros((R, LANES), jnp.int32)
        _, _, _, _, _, _, best = jax.lax.fori_loop(
            1, K + 1, step, (init, init, spos, spos, al, al, zero)
        )
        best_ref[0] = jnp.where(svalid, best, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nkey", "npay", "K", "init_lcp", "interpret")
)
def sa_scan_batched(skeys, spos, spay, hstart, n_total, *, nkey: int, npay: int,
                    K: int, init_lcp: int, interpret: bool = False):
    """Best packed score per sorted row, for a batch of chunks.

    Args:
      skeys: uint32[B, nkey, N] big-endian sorted key words.
      spos: int32[B, N] sorted positions.
      spay: uint32[B, npay, N] little-endian payload words (may be npay=0).
      hstart, n_total: int32[B] dynamic bounds.
      K: static scan depth; init_lcp: static LCP cap (4*probe_words).

    Returns int32[B, N] packed scores ``(len<<16)|(WINDOW_SIZE+1-dist)`` in
    sorted-row order (0 where no match).
    """
    B, N = spos.shape
    assert N % LANES == 0
    R = N // LANES

    scal = jnp.stack([hstart.astype(jnp.int32), n_total.astype(jnp.int32)], axis=1)

    def as_i32(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    operands = [as_i32(skeys[:, w]).reshape(B, R, LANES) for w in range(nkey)]
    operands.append(spos.reshape(B, R, LANES))
    operands += [as_i32(spay[:, w]).reshape(B, R, LANES) for w in range(npay)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM)
            for _ in operands
        ],
        out_specs=pl.BlockSpec(
            (1, R, LANES), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = _make_kernel(nkey, npay, K, init_lcp)

    best = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, *operands)
    return best.reshape(B, N)


@functools.lru_cache(maxsize=None)
def _make_sa_scan(nkey: int, npay: int, K: int, init_lcp: int):
    kw = dict(nkey=nkey, npay=npay, K=K, init_lcp=init_lcp)

    @jax.custom_batching.custom_vmap
    def scan(skeys, spos, spay, hstart, n_total):
        return sa_scan_batched(
            skeys[None], spos[None], spay[None], hstart[None], n_total[None], **kw
        )[0]

    @scan.def_vmap
    def scan_vmap(axis_size, in_batched, skeys, spos, spay, hstart, n_total):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

        args = [bc(x, b) for x, b in zip((skeys, spos, spay, hstart, n_total), in_batched)]
        return sa_scan_batched(*args, **kw), True

    return scan


def sa_scan(skeys, spos, spay, hstart, n_total, *, K: int, init_lcp: int):
    """Single-chunk (vmap-aware) fused LCP + K-scan.

    Args: skeys uint32[nkey, N], spos int32[N], spay uint32[npay, N],
    hstart/n_total int32 scalars.  Returns int32[N] packed scores in sorted
    order (see sa_scan_batched).
    """
    fn = _make_sa_scan(skeys.shape[0], spay.shape[0], K, init_lcp)
    return fn(
        skeys, spos, spay,
        jnp.asarray(hstart, jnp.int32), jnp.asarray(n_total, jnp.int32),
    )
