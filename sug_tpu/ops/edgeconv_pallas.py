"""Fused EdgeConv gather-reduce Pallas kernel.

The DGCNN EdgeConv (reference model/Model.py:54-121 via get_graph_feature,
model/model_utils.py:178-209) is, per block:

    a[b,n,k,f] = concat(nbr - x, x) @ W  ->  BN -> leaky_relu -> max over k

XLA executes this as a full (B,N,N) sort for the kNN (~17ms each), a
(B,N,k,2C) edge-feature gather, a big batched matmul, and (B,N,k,F)
activation traffic — the profiled step spends ~60% of its time in these
sorts/gathers (docs/PERF.md). This kernel removes all of it:

- algebraic split: a_k = U[idx_k] + V with U = x @ W1, V = x @ (W2 - W1)
  (W1/W2 = neighbor/center halves of the Dense kernel), so the inner loop
  works on (N, F) tensors instead of (N, k, 2C) edge features;
- kNN *inside* the kernel: the (128, N) distance tile is computed on the MXU
  and the top-k extracted by iterative argmax (VPU) — no O(N log N) sort, no
  HBM distance matrix;
- neighbor gather as one-hot MXU matmuls from VMEM-resident U — no HBM
  gather/scatter;
- BN statistics without materializing a: the kernel returns per-(b,n,f)
  max_k a, min_k a, sum_k a, sum_k a^2. Because BN's per-channel affine and
  leaky_relu are monotone, max_k(lrelu(BN(a))) == lrelu(BN(max_k a)) when
  scale >= 0 and lrelu(BN(min_k a)) otherwise — the caller selects by
  sign(scale) and applies BN/activation on (B,N,F) tensors only.

The custom VJP runs a mirror kernel: recompute a_k from the saved neighbor
indices, form da_k = damax*selmax + damin*selmin + ds1 + 2*a_k*ds2 (the ds1 /
ds2 terms are exactly the BN batch-statistics backward, since the caller's
mean/var are functions of s1/s2), and accumulate dU via transposed one-hot
matmuls and dV by summation. x itself receives zero gradient from the kernel
(it enters only through the non-differentiable neighbor selection; its
differentiable influence flows through U and V outside).

Two generalizations (round 3):
- ``fused_cross_edgeconv_reduce``: the query set may differ from the key set
  (q_pts vs kv_pts) — serves the SA-node's kNN-64 re-query + max-pool
  (adapt_layer_off, reference model/model_utils.py:119-123) with the same
  kernels; query rows are padded to TILE with far sentinels.
- ``values_bf16`` (PRECISION: bf16): value gathers in one bf16 MXU pass
  instead of the exact two-pass split (selection stays f32-split, so kNN
  sets are identical); halves the dominant gather matmul cost fwd+bwd.

Loop scheduling: Mosaic's fori_loop lowers with unroll=1 or full only. The
forward fully unrolls up to k=24; beyond that (SA-node k=64) and in the
backward (whose full unroll OOMs the VMEM stack at F=256) a python-unrolled
window INSIDE the fori body (chunked unroll) gives the scheduler independent
gather matmuls to software-pipeline with a bounded live set.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # query points per program (MXU-aligned)

# Mosaic's fori_loop lowering supports only unroll=1 or full unroll. Full
# unroll lets the compiler software-pipeline the gather matmuls against the
# next step's argmax, but keeps all k iterations' buffers live: the FORWARD
# fits (its per-iteration live set is small once the u hi/lo split is
# hoisted), the BACKWARD's (N, TILE) one-hots x k blow the 16M VMEM stack —
# so only the forward unrolls (SUG_EDGECONV_FWD_UNROLL=0 disables).
import os as _os

_FWD_UNROLL = _os.environ.get("SUG_EDGECONV_FWD_UNROLL", "1") == "1"


def _split_bf16(a):
    """a == hi + lo with hi exactly bf16-representable."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot_acc(a, b):
    """Near-f32 matmul from bf16 passes (Mosaic supports only DEFAULT/HIGHEST
    dot precision in-kernel; HIGHEST is 6 passes — this hand-rolled 3-pass
    split reaches ~2^-16 relative error, enough that kNN ranking and edge
    activations match the f32 reference paths)."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    d = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return d


def _onehot_dot(onehot, b):
    """Exact one-hot gather as two bf16-pass matmuls: the 0/1 left operand is
    exactly bf16, so onehot @ hi + onehot @ lo reconstructs b's f32 rows
    bit-exactly."""
    b_hi, b_lo = _split_bf16(b)
    return jnp.dot(onehot, b_hi, preferred_element_type=jnp.float32) + jnp.dot(
        onehot, b_lo, preferred_element_type=jnp.float32
    )


def _onehotT_dot(onehotT, b):
    """Like _onehot_dot but with the one-hot stored transposed (N, TILE):
    contracts its FIRST axis with b's first — dot_general keeps the
    contraction on the MXU without materializing a transpose (Mosaic cannot
    legalize large in-loop transposes inside scf.for)."""
    dn = (((0,), (0,)), ((), ()))
    b_hi, b_lo = _split_bf16(b)
    return jax.lax.dot_general(
        onehotT, b_hi, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(onehotT, b_lo, dn, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_tile_ref, xb_ref, u_ref, v_ref,
                amax_ref, amin_ref, s1_ref, s2_ref, idx_ref, *, k: int,
                unroll: int = 1, values_bf16: bool = False):
    """One (batch, tile) program.

    Blocks: x_tile (TILE, C), xb (N, C), u (N, F), v (TILE, F);
    outputs amax/amin/s1/s2 (TILE, F), idx (TILE, k) int32.

    ``values_bf16`` (the PRECISION: bf16 policy): gather u in ONE bf16 MXU
    pass instead of the exact two-pass split — halves the dominant gather
    cost; neighbor SELECTION (the distance path) stays f32-split regardless,
    so kNN sets are identical to the f32 kernel.
    """
    x_tile = x_tile_ref[:]  # (TILE, C)
    xb = xb_ref[:]  # (N, C)
    N = xb.shape[0]

    # negative squared distance, up to a per-row constant (|x_tile|^2), which
    # does not affect per-row ranking: -|x_tile - xb|^2 ~ 2<x_tile, xb> - |xb|^2
    neg_d = 2.0 * _dot_acc(x_tile, xb.T) - jnp.sum(xb * xb, axis=1)[None, :]  # (TILE, N)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, N), 1)
    if values_bf16:
        u_hi = u_ref[:].astype(jnp.bfloat16)  # single-pass value gathers
        u_lo = None
    else:
        u_hi, u_lo = _split_bf16(u_ref[:])  # hoisted loop-invariant (N, F) split
    v = v_ref[:]  # (TILE, F)

    # fori_loop (not a python unroll): an unrolled k-loop keeps every
    # iteration's (TILE, N) one-hot live on the Mosaic stack and OOMs VMEM at
    # F=256; the loop body reuses one set of buffers. No dynamic ref
    # slicing inside the loop (scf.for fails to legalize it) — the idx rows
    # accumulate in a carried (k, TILE) register via a masked select.
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, TILE), 0)

    def body(j, carry):
        neg_d, amax, amin, s1, s2, idx_acc = carry
        rowmax = jnp.max(neg_d, axis=1, keepdims=True)  # (TILE, 1)
        eligible = neg_d == rowmax
        # lowest index among ties (lax.top_k / torch.topk tie order)
        j_sel = jnp.min(jnp.where(eligible, iota_n, N), axis=1, keepdims=True)
        if u_lo is None:
            onehot = (iota_n == j_sel).astype(jnp.bfloat16)  # (TILE, N)
            a = jnp.dot(onehot, u_hi, preferred_element_type=jnp.float32) + v
            onehot = onehot.astype(jnp.float32)
        else:
            onehot = (iota_n == j_sel).astype(jnp.float32)  # (TILE, N)
            a = (
                jnp.dot(onehot, u_hi, preferred_element_type=jnp.float32)
                + jnp.dot(onehot, u_lo, preferred_element_type=jnp.float32)
                + v
            )  # (TILE, F); exact gather (one-hot rows are exactly bf16)
        idx_acc = jnp.where(iota_k == j, jnp.broadcast_to(j_sel.T, (k, TILE)), idx_acc)
        return (
            jnp.where(onehot > 0, -jnp.inf, neg_d),
            jnp.maximum(amax, a),
            jnp.minimum(amin, a),
            s1 + a,
            s2 + a * a,
            idx_acc,
        )

    init = (
        neg_d,
        jnp.full_like(v, -jnp.inf),
        jnp.full_like(v, jnp.inf),
        jnp.zeros_like(v),
        jnp.zeros_like(v),
        jnp.zeros((k, TILE), jnp.int32),
    )
    if unroll >= k:
        # full unroll (EdgeConv k=20): best software pipelining, live set fits
        _, amax, amin, s1, s2, idx_acc = jax.lax.fori_loop(
            0, k, body, init, unroll=k
        )
    elif unroll > 1 and k % unroll == 0:
        # chunked unroll for large k (SA-node k=64): Mosaic's fori supports
        # only unroll=1/full, so python-unroll a window inside the fori body
        def chunk_body(c, carry):
            for i in range(unroll):
                carry = body(c * unroll + i, carry)
            return carry

        _, amax, amin, s1, s2, idx_acc = jax.lax.fori_loop(
            0, k // unroll, chunk_body, init
        )
    else:
        _, amax, amin, s1, s2, idx_acc = jax.lax.fori_loop(0, k, body, init)

    amax_ref[:] = amax
    amin_ref[:] = amin
    s1_ref[:] = s1
    s2_ref[:] = s2
    # idx laid out (k, TILE): lane dim = TILE (128-aligned); a (TILE, k)
    # layout would put k=20 on lanes, which Mosaic cannot tile.
    idx_ref[:] = idx_acc


def _fwd_kernel_batched(x_tile_ref, xb_ref, u_ref, v_ref,
                        amax_ref, amin_ref, s1_ref, s2_ref, idx_ref,
                        *, k: int, window: int, values_bf16: bool = False):
    """Two-stage batched forward (mirror of _bwd_kernel_batched): run a
    window's worth of the sequential argmax selection chain first (pure VPU
    on the (TILE, N) distance tile), stack the selected one-hots into ONE
    (w*TILE, N) block, and gather a whole window of neighbors with ONE MXU
    matmul instead of one per neighbor. Same selection order and f32-split
    distance math as _fwd_kernel — idx and activations are identical; only
    the f32 summation order inside the gather matmul differs (and not even
    that for exact one-hot rows)."""
    x_tile = x_tile_ref[:]  # (TILE, C)
    xb = xb_ref[:]  # (N, C)
    N = xb.shape[0]

    neg_d = 2.0 * _dot_acc(x_tile, xb.T) - jnp.sum(xb * xb, axis=1)[None, :]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, N), 1)
    if values_bf16:
        u_hi, u_lo = u_ref[:].astype(jnp.bfloat16), None
    else:
        u_hi, u_lo = _split_bf16(u_ref[:])
    v = v_ref[:]  # (TILE, F)
    F = v.shape[1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, TILE), 0)

    amax = jnp.full_like(v, -jnp.inf)
    amin = jnp.full_like(v, jnp.inf)
    s1 = jnp.zeros_like(v)
    s2 = jnp.zeros_like(v)
    idx_acc = jnp.zeros((k, TILE), jnp.int32)
    for w0 in range(0, k, window):
        w = min(window, k - w0)
        ohs = []
        for j in range(w0, w0 + w):
            rowmax = jnp.max(neg_d, axis=1, keepdims=True)
            eligible = neg_d == rowmax
            # lowest index among ties (lax.top_k / torch.topk tie order)
            j_sel = jnp.min(jnp.where(eligible, iota_n, N), axis=1, keepdims=True)
            onehot = (iota_n == j_sel).astype(jnp.float32)  # (TILE, N)
            neg_d = jnp.where(onehot > 0, -jnp.inf, neg_d)
            idx_acc = jnp.where(
                iota_k == j, jnp.broadcast_to(j_sel.T, (k, TILE)), idx_acc
            )
            ohs.append(onehot)
        oh = jnp.concatenate(ohs, axis=0)  # (w*TILE, N)
        if u_lo is None:
            G = jnp.dot(
                oh.astype(jnp.bfloat16), u_hi, preferred_element_type=jnp.float32
            )
        else:  # exact: one-hot rows are exactly bf16
            G = jnp.dot(oh, u_hi, preferred_element_type=jnp.float32) + jnp.dot(
                oh, u_lo, preferred_element_type=jnp.float32
            )  # (w*TILE, F)
        for i in range(w):
            a = jax.lax.slice(G, (i * TILE, 0), ((i + 1) * TILE, F)) + v
            amax = jnp.maximum(amax, a)
            amin = jnp.minimum(amin, a)
            s1 = s1 + a
            s2 = s2 + a * a

    amax_ref[:] = amax
    amin_ref[:] = amin
    s1_ref[:] = s1
    s2_ref[:] = s2
    idx_ref[:] = idx_acc


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(idx_ref, u_ref, v_ref, amax_ref, amin_ref,
                damax_ref, damin_ref, ds1_ref, ds2_ref,
                du_ref, dv_ref, *, k: int, unroll: int = 1,
                values_bf16: bool = False):
    """Mirror of the forward: da_k = damax*selmax + damin*selmin + ds1 +
    2*a_k*ds2; dU += onehot^T @ da_k (accumulated across the batch row's
    tiles — the dU output block revisits per-b), dV = sum_k da_k."""
    t = pl.program_id(1)

    if values_bf16:
        u_hi, u_lo = u_ref[:].astype(jnp.bfloat16), None
    else:
        u_hi, u_lo = _split_bf16(u_ref[:])  # hoisted loop-invariant split (N, F)
    v = v_ref[:]  # (TILE, F)
    amax = amax_ref[:]
    amin = amin_ref[:]
    damax = damax_ref[:]
    damin = damin_ref[:]
    ds1 = ds1_ref[:]
    ds2 = ds2_ref[:]
    N = u_hi.shape[0]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, N), 1)

    @pl.when(t == 0)
    def _():
        du_ref[:] = jnp.zeros(du_ref.shape, du_ref.dtype)

    idx = idx_ref[:]  # (k, TILE), read once; rows selected by masked reduce
    k_num = idx.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_num, TILE), 0)
    iota_nT = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)

    def body(j, carry):
        # the first-hit masks are carried as {0,1} f32 — scf.for cannot carry
        # i1 vectors through Mosaic legalization
        assigned_max, assigned_min, dv, du_acc = carry
        row = jnp.sum(jnp.where(iota_k == j, idx, 0), axis=0, keepdims=True)  # (1, TILE)
        # one-hot built directly in transposed (N, TILE) layout — no in-loop
        # transpose, both uses contract it via dot/dot_general on the MXU
        dn = (((0,), (0,)), ((), ()))
        if u_lo is None:
            onehotT_b = (iota_nT == row).astype(jnp.bfloat16)
            a = (
                jax.lax.dot_general(
                    onehotT_b, u_hi, dn, preferred_element_type=jnp.float32
                )
                + v
            )  # (TILE, F) — bit-identical to the forward's bf16 gather
        else:
            onehotT = (iota_nT == row).astype(jnp.float32)  # [n, t] = (idx_t == n)
            a = (
                jax.lax.dot_general(onehotT, u_hi, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehotT, u_lo, dn, preferred_element_type=jnp.float32)
                + v
            )  # (TILE, F)
        selmax = jnp.where(a == amax, 1.0, 0.0) * (1.0 - assigned_max)
        selmin = jnp.where(a == amin, 1.0, 0.0) * (1.0 - assigned_min)
        da = damax * selmax + damin * selmin + ds1 + 2.0 * a * ds2
        if u_lo is None:
            du_new = du_acc + jnp.dot(
                onehotT_b, da.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (N, F) f32-accumulated from bf16-rounded per-edge cotangents
        else:
            da_hi, da_lo = _split_bf16(da)
            du_new = (
                du_acc
                + jnp.dot(onehotT, da_hi, preferred_element_type=jnp.float32)
                + jnp.dot(onehotT, da_lo, preferred_element_type=jnp.float32)
            )  # (N, F)
        return (
            jnp.maximum(assigned_max, selmax),
            jnp.maximum(assigned_min, selmin),
            dv + da,
            du_new,
        )

    init = (
        jnp.zeros_like(v),
        jnp.zeros_like(v),
        jnp.zeros_like(v),
        jnp.zeros(u_hi.shape, jnp.float32),  # du accumulates f32 either mode
    )
    # Chunked unroll: Mosaic's fori_loop supports only unroll=1/full, and a
    # full unroll keeps all k one-hot (N, TILE) buffers live on the VMEM
    # stack (OOM at F=256). Python-unrolling `unroll` iterations INSIDE the
    # fori body keeps only that window live (~0.5MB per one-hot) while giving
    # the scheduler independent gather matmuls to software-pipeline — the
    # select chain (first-hit max/min assignment) is VPU work off the MXU
    # critical path.
    if unroll > 1 and k % unroll == 0:
        def chunk_body(c, carry):
            for i in range(unroll):
                carry = body(c * unroll + i, carry)
            return carry

        _, _, dv, du_acc = jax.lax.fori_loop(0, k // unroll, chunk_body, init)
    else:
        _, _, dv, du_acc = jax.lax.fori_loop(0, k, body, init)

    du_ref[:] += du_acc
    dv_ref[:] = dv


def _bwd_kernel_batched(idx_ref, u_ref, v_ref, amax_ref, amin_ref,
                        damax_ref, damin_ref, ds1_ref, ds2_ref,
                        du_ref, dv_ref, *, k: int, window: int,
                        values_bf16: bool = False):
    """Two-stage batched backward: instead of k sequential one-hot gather
    matmuls (each streaming the full (N, F) u through the MXU), build a
    whole window's one-hots as ONE (w*TILE, N) block and do ONE gather
    matmul -> (w*TILE, F), run the first-hit max/min selection chain on the
    materialized slices (pure VPU, off the MXU critical path), then ONE
    scatter matmul for dU. Same FLOPs as the loop kernel, ~w x fewer passes
    over u — the MXU-occupancy fix docs/PERF.md called the 'two-stage
    pipeline'. Gathers are exact (one-hot rows are exactly bf16); dU differs
    from the loop kernel only in f32 summation order inside the matmul."""
    t = pl.program_id(1)

    if values_bf16:
        u_hi, u_lo = u_ref[:].astype(jnp.bfloat16), None
    else:
        u_hi, u_lo = _split_bf16(u_ref[:])  # (N, F)
    v = v_ref[:]  # (TILE, F)
    amax = amax_ref[:]
    amin = amin_ref[:]
    damax = damax_ref[:]
    damin = damin_ref[:]
    ds1 = ds1_ref[:]
    ds2 = ds2_ref[:]
    N, F = u_hi.shape

    @pl.when(t == 0)
    def _():
        du_ref[:] = jnp.zeros(du_ref.shape, du_ref.dtype)

    idx = idx_ref[:]  # (k, TILE)
    k_num = idx.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_num, TILE), 0)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, N), 1)
    dn = (((0,), (0,)), ((), ()))

    assigned_max = jnp.zeros_like(v)
    assigned_min = jnp.zeros_like(v)
    dv = jnp.zeros_like(v)
    du_acc = jnp.zeros((N, F), jnp.float32)
    for w0 in range(0, k, window):
        w = min(window, k - w0)
        ohs = []
        for j in range(w0, w0 + w):
            row = jnp.sum(
                jnp.where(iota_k == j, idx, 0), axis=0, keepdims=True
            )  # (1, TILE)
            ohs.append((iota_n == row.T).astype(jnp.float32))  # (TILE, N)
        oh = jnp.concatenate(ohs, axis=0)  # (w*TILE, N)
        if u_lo is None:
            ohb = oh.astype(jnp.bfloat16)
            G = jnp.dot(ohb, u_hi, preferred_element_type=jnp.float32)
        else:
            G = jnp.dot(oh, u_hi, preferred_element_type=jnp.float32) + jnp.dot(
                oh, u_lo, preferred_element_type=jnp.float32
            )  # (w*TILE, F)
        das = []
        for i in range(w):
            a = jax.lax.slice(G, (i * TILE, 0), ((i + 1) * TILE, F)) + v
            selmax = jnp.where(a == amax, 1.0, 0.0) * (1.0 - assigned_max)
            selmin = jnp.where(a == amin, 1.0, 0.0) * (1.0 - assigned_min)
            da = damax * selmax + damin * selmin + ds1 + 2.0 * a * ds2
            assigned_max = jnp.maximum(assigned_max, selmax)
            assigned_min = jnp.maximum(assigned_min, selmin)
            dv = dv + da
            das.append(da)
        da_flat = jnp.concatenate(das, axis=0)  # (w*TILE, F)
        if u_lo is None:
            du_acc = du_acc + jax.lax.dot_general(
                ohb, da_flat.astype(jnp.bfloat16), dn,
                preferred_element_type=jnp.float32,
            )
        else:
            da_hi, da_lo = _split_bf16(da_flat)
            du_acc = (
                du_acc
                + jax.lax.dot_general(oh, da_hi, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(oh, da_lo, dn, preferred_element_type=jnp.float32)
            )
    du_ref[:] += du_acc
    dv_ref[:] = dv


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pad_lanes(a, to: int = 128):
    """Zero-pad the channel (lane) axis to a multiple of 128 — Mosaic cannot
    slice sub-128 lane widths (e.g. the C=3 xyz input of EdgeConv block 1).
    Zero channels change neither distances nor activations."""
    d = a.shape[-1]
    pad = (-d) % to
    if pad == 0:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])


def _fwd_pallas(q, kv, u, v, k: int, interpret: bool = False,
                values_bf16: bool = False):
    """Returns (amax, amin, s1, s2) in (B, S, F) and idx_t in (B, k, S).

    ``q`` (B, S, C) are the query positions, ``kv`` (B, N, C) the key/value
    positions ``u`` indexes; the self-kNN EdgeConv case passes q is kv. S must
    be a multiple of TILE (wrappers pad query rows with far sentinels)."""
    F = u.shape[-1]
    q = _pad_lanes(q)
    kv = _pad_lanes(kv)
    u = _pad_lanes(u)
    v = _pad_lanes(v)
    B, N, C = kv.shape
    S = q.shape[1]
    Fp = u.shape[-1]
    n_tiles = S // TILE
    grid = (B, n_tiles)
    # analytic executed-MXU FLOPs (invisible to XLA cost_analysis):
    # distance tile 3 bf16-split passes + k one-hot gathers at 1 (bf16
    # values) or 2 (exact split) passes each; padded dims = real passes.
    from sug_tpu.ops import flops as _flops

    p = 1 if values_bf16 else 2
    _flops.record("edgeconv_fwd", B * S * N * (6.0 * C + 2.0 * p * Fp * k))

    # Two forward kernels (SUG_EDGECONV_FWD_MODE):
    #   loop — per-neighbor gather matmuls, full unroll up to k=24
    #     and a chunked window beyond (SUG_EDGECONV_FWD_UNROLL=0 forces
    #     unroll=1); the unrolled loop already software-pipelines gathers
    #     against the next argmax;
    #   batched — two-stage windowed selection + one gather matmul per
    #     window, mirroring the backward's winning structure
    #     (SUG_EDGECONV_FWD_WINDOW bounds the one-hot block);
    #   auto (default) — batched for narrow features (Fp <= 128), loop for
    #     wide. v5e A/B (tools/fwd_mode_ab.py, B=32 N=1024 k=20): F=64
    #     batched 17.96 ms vs loop 136.35 ms (7.6x); F=256 loop 29.11 vs
    #     batched 30.08 (loop 1.03x); F=256 bf16 loop 17.96 vs 19.14.
    fwd_mode = _os.environ.get("SUG_EDGECONV_FWD_MODE", "auto")
    if fwd_mode == "auto":
        fwd_mode = "batched" if Fp <= 128 else "loop"
    compiler_params = None
    if fwd_mode == "batched":
        want = int(_os.environ.get("SUG_EDGECONV_FWD_WINDOW", "32"))
        kernel = functools.partial(
            _fwd_kernel_batched, k=k, window=min(want, k),
            values_bf16=values_bf16,
        )
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(_os.environ.get("SUG_EDGECONV_VMEM_MB", "96"))
            * 1024 * 1024
        )
    else:
        if _FWD_UNROLL:
            fwd_unroll = k if k <= 24 else next(
                (c for c in range(8, 0, -1) if k % c == 0), 1
            )
        else:
            fwd_unroll = 1
        kernel = functools.partial(
            _fwd_kernel, k=k, unroll=fwd_unroll, values_bf16=values_bf16
        )
    out_shape = (
        jax.ShapeDtypeStruct((B, S, Fp), jnp.float32),  # amax
        jax.ShapeDtypeStruct((B, S, Fp), jnp.float32),  # amin
        jax.ShapeDtypeStruct((B, S, Fp), jnp.float32),  # s1
        jax.ShapeDtypeStruct((B, S, Fp), jnp.float32),  # s2
        jax.ShapeDtypeStruct((B, k, S), jnp.int32),  # idx (k on sublanes)
    )
    tile_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, TILE, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, N, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    amax, amin, s1, s2, idx_t = pl.pallas_call(
        _squeeze_batch(kernel, n_in=4, n_out=5),
        grid=grid,
        in_specs=[tile_spec(C), full_spec(C), full_spec(Fp), tile_spec(Fp)],
        out_specs=(
            tile_spec(Fp), tile_spec(Fp), tile_spec(Fp), tile_spec(Fp),
            pl.BlockSpec((1, k, TILE), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(q, kv, u, v)
    if Fp != F:
        amax, amin, s1, s2 = (a[..., :F] for a in (amax, amin, s1, s2))
    return amax, amin, s1, s2, idx_t


def _bwd_pallas(idx_t, u, v, amax, amin, damax, damin, ds1, ds2,
                interpret: bool = False, values_bf16: bool = False):
    """u is (B, N, F) keyed by idx; v/amax/amin and the cotangents are per
    QUERY (B, S, F); du comes back (B, N, F), dv (B, S, F)."""
    F = u.shape[-1]
    u, v, amax, amin, damax, damin, ds1, ds2 = (
        _pad_lanes(a) for a in (u, v, amax, amin, damax, damin, ds1, ds2)
    )
    B, N, Fp = u.shape
    S = v.shape[1]
    k = idx_t.shape[1]
    n_tiles = S // TILE
    grid = (B, n_tiles)
    # analytic executed-MXU FLOPs: gather replay + dU scatter, p passes each
    from sug_tpu.ops import flops as _flops

    p = 1 if values_bf16 else 2
    _flops.record("edgeconv_bwd", 4.0 * p * B * S * N * Fp * k)

    # Two backward kernels (SUG_EDGECONV_BWD_MODE):
    #   batched (default) — two-stage windowed gather/scatter (one big MXU
    #     matmul per window instead of one per neighbor);
    #   loop — the chunked-unroll fori kernel (SUG_EDGECONV_BWD_CHUNK window).
    mode = _os.environ.get("SUG_EDGECONV_BWD_MODE", "batched")
    if mode == "batched":
        # window bounds the (w*TILE, N) one-hot block (~10MB f32 at w=20,
        # N=1024); k<=32 fits in one window, larger k (SA-node 64) splits
        want = int(_os.environ.get("SUG_EDGECONV_BWD_WINDOW", "32"))
        kernel = functools.partial(
            _bwd_kernel_batched, k=k, window=min(want, k),
            values_bf16=values_bf16,
        )
    else:
        want = int(_os.environ.get("SUG_EDGECONV_BWD_CHUNK", "5"))
        chunk = next((c for c in range(min(want, k), 0, -1) if k % c == 0), 1)
        kernel = functools.partial(
            _bwd_kernel, k=k, unroll=chunk, values_bf16=values_bf16
        )
    tile_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, TILE, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, N, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    du, dv = pl.pallas_call(
        _squeeze_batch(kernel, n_in=9, n_out=2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, TILE), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            full_spec(Fp), tile_spec(Fp), tile_spec(Fp), tile_spec(Fp),
            tile_spec(Fp), tile_spec(Fp), tile_spec(Fp), tile_spec(Fp),
        ],
        out_specs=(full_spec(Fp), tile_spec(Fp)),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, Fp), jnp.float32),  # du (keys)
            jax.ShapeDtypeStruct((B, S, Fp), jnp.float32),  # dv (queries)
        ),
        interpret=interpret,
        # the batched kernel's windowed one-hot block exceeds the compiler's
        # default 16MB scoped-vmem budget; v5e has 128MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_os.environ.get("SUG_EDGECONV_VMEM_MB", "96"))
            * 1024 * 1024
        ),
    )(idx_t, u, v, amax, amin, damax, damin, ds1, ds2)
    if Fp != F:
        du, dv = du[..., :F], dv[..., :F]
    return du, dv


def _squeeze_batch(kernel, n_in: int, n_out: int):
    """Adapt a kernel written for 2-D refs to the (1, rows, cols) blocks the
    (b, t) grid delivers."""

    def wrapped(*refs):
        squeezed = [r.at[0] for r in refs]
        return kernel(*squeezed)

    return wrapped


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_cross(q, kv, u, v, k: int, interpret: bool = False,
                 values_bf16: bool = False):
    """Core op: kNN of q against kv + gather-reduce of u (see wrappers)."""
    amax, amin, s1, s2, idx_t = _fwd_pallas(q, kv, u, v, k, interpret, values_bf16)
    return amax, amin, s1, s2, jnp.swapaxes(idx_t, 1, 2)


def _fused_fwd(q, kv, u, v, k, interpret, values_bf16):
    amax, amin, s1, s2, idx_t = _fwd_pallas(q, kv, u, v, k, interpret, values_bf16)
    out = (amax, amin, s1, s2, jnp.swapaxes(idx_t, 1, 2))
    return out, (q, kv, idx_t, u, v, amax, amin)


def _fused_bwd(k, interpret, values_bf16, res, grads):
    q, kv, idx_t, u, v, amax, amin = res
    damax, damin, ds1, ds2, _didx = grads
    du, dv = _bwd_pallas(idx_t, u, v, amax, amin, damax, damin, ds1, ds2,
                         interpret, values_bf16)
    # q/kv only select neighbors (non-differentiable) -> zero cotangent;
    # their differentiable influence reaches the loss through u and v.
    return jnp.zeros_like(q), jnp.zeros_like(kv), du, dv


_fused_cross.defvjp(_fused_fwd, _fused_bwd)


def fused_edgeconv_reduce(x, u, v, k: int, interpret: bool = False,
                          values_bf16: bool = False):
    """Fused kNN + gather + per-(b,n,f) reductions (self-kNN EdgeConv case).

    Args:
        x: (B, N, C) positions/features defining the kNN graph.
        u: (B, N, F) neighbor-side projections (x @ W1).
        v: (B, N, F) center-side projections (x @ (W2 - W1)).
        k: neighbors per point (static).
    Returns:
        amax, amin, s1, s2: (B, N, F) — max/min/sum/sum-of-squares over the k
        neighbor activations a_j = u[idx_j] + v; and idx (B, N, k) int32.
    """
    return _fused_cross(x, x, u, v, k, interpret, values_bf16)


def fused_cross_edgeconv_reduce(q_pts, kv_pts, u, v, k: int,
                                interpret: bool = False,
                                values_bf16: bool = False):
    """Cross-query variant: for each of S query points, reduce over its k
    nearest KEY points' values — the SA-node re-query + max-pool
    (adapt_layer_off stage B, reference model/model_utils.py:119-123) and any
    FPS-level "gather neighbors of coarse nodes" pattern, without the
    (B, S, k, F) HBM gather or its scatter-add backward.

    Args:
        q_pts: (B, S, C) query positions (S padded to TILE internally).
        kv_pts: (B, N, C) key positions (N multiple of TILE).
        u: (B, N, F) per-key values.
        v: (B, S, F) per-query additive term (zeros for a plain gather-max).
    Returns: amax, amin, s1, s2 (B, S, F); idx (B, S, k).
    """
    B, S, C = q_pts.shape
    Sp = -(-S // TILE) * TILE
    if Sp != S:
        pad = Sp - S
        # far, mutually-distant sentinel queries: their outputs are sliced
        # off, and their zero cotangents keep du unpolluted in the backward
        sentinels = 1e6 + 17.0 * jnp.arange(pad, dtype=q_pts.dtype)
        q_pts = jnp.concatenate(
            [q_pts, jnp.broadcast_to(sentinels[None, :, None], (B, pad, C))], axis=1
        )
        v = jnp.concatenate([v, jnp.zeros((B, pad, v.shape[-1]), v.dtype)], axis=1)
    amax, amin, s1, s2, idx = _fused_cross(
        q_pts, kv_pts, u, v, k, interpret, values_bf16
    )
    if Sp != S:
        amax, amin, s1, s2, idx = (
            a[:, :S] for a in (amax, amin, s1, s2, idx)
        )
    return amax, amin, s1, s2, idx


# ---------------------------------------------------------------------------
# pure-jnp reference (all backends; also the CPU fallback path)
# ---------------------------------------------------------------------------


def edgeconv_reduce_reference(x, u, v, k: int):
    """Same contract as fused_edgeconv_reduce, in plain XLA ops."""
    from sug_tpu.ops.geometry import index_points, knn_indices

    idx = knn_indices(x, k)  # (B, N, k)
    a = index_points(u, idx) + v[:, :, None, :]  # (B, N, k, F)
    return (
        jnp.max(a, axis=2),
        jnp.min(a, axis=2),
        jnp.sum(a, axis=2),
        jnp.sum(a * a, axis=2),
        idx,
    )
