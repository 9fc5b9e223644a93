"""Fused vector self-attention Pallas kernel (Point Transformer).

The PTran TransformerBlock (reference model/Ptran_transformer.py:9-46) does,
per point n over its k=16 nearest neighbors j:

    pos_j   = Wd2 @ relu(Wd1 @ (xyz_n - xyz_j) + bd1) + bd2          (3 -> D)
    z_j     = Wg2 @ relu(Wg1 @ (q_n - key_j + pos_j) + bg1) + bg2    (D -> D)
    alpha_j = softmax_j(z_j / sqrt(D))          (per CHANNEL over neighbors)
    out_n   = sum_j alpha_j * (val_j + pos_j)

XLA materializes several (B, N, k, D) tensors for this (1GB each at B=32,
N=1024, D=512 in f32) and the profiled bf16 step spends most of its time in
the per-edge fusions around them. This kernel streams over the k axis with
an ONLINE per-channel softmax (the flash-attention recurrence), so only
(B, N, D) tensors ever touch HBM:

- kNN selection inside the kernel: f32-split distance tile on the MXU +
  iterative argmax (the EdgeConv kernel's pattern — neighbor sets exactly
  match lax.top_k's, lowest-index ties);
- neighbor gathers as one-hot MXU matmuls from VMEM-resident key/val/xyz;
- the two per-edge MLP chains run on (TILE, D) tiles in VMEM in single-pass
  bf16 (the PRECISION: bf16 policy's matmul precision; softmax stats in f32);
- online softmax carry (m, l, acc) per (row, channel).

The custom VJP saves (idx, m, l, out) + the inputs and replays the k-loop
(flash-attention backward): per channel
dz_j = alpha_j * dout * (vpos_j - out), chained through the gamma MLP into
(dq, -dkey_j, dpos) and — for the weight grads — through the delta MLP.
The backward runs as TWO kernels (input grads / weight grads): a single
kernel's resident set (inputs + dkey/dval f32 accumulators + four DxD
weight accumulators) exceeds the ~16MB VMEM at N=1024, D=512, and the split
costs only one extra forward replay. xyz receives zero cotangent — nothing
with parameters produces xyz upstream (it only ever comes from the input
cloud through FPS gathers), so this is exact, unlike the neighbor-selection
non-differentiability which is inherent.

The 1/sqrt(D) softmax temperature is FOLDED INTO Wg2/bg2 by the public
wrapper (``fused_vector_attention``) — the kernels softmax z directly.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128

# the kernels' resident set (full key/val blocks + weight accumulators)
# exceeds the compiler's default 16MB scoped-vmem budget at N=1024, D=512;
# v5e has 128MB physical VMEM — raise the scoped limit for these calls.
_VMEM_LIMIT = int(_os.environ.get("SUG_VECATTN_VMEM_MB", "96")) * 1024 * 1024


def _split_bf16(a):
    """a == hi + lo with hi exactly bf16-representable."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot_acc(a, b):
    """3-pass bf16-split matmul ~= f32 (Mosaic in-kernel dots are bf16) —
    the neighbor-SELECTION distance path, where bf16 would reorder kNN."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    d = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return d


def _bdot(a, b):
    """Single-pass bf16 matmul with f32 accumulate — the value/MLP paths'
    precision (matches the XLA bf16 policy's Dense matmuls)."""
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _bdotT(aT, b):
    """Contract aT's FIRST axis with b's first (transposed-one-hot scatters
    and weight-grad outer products) — single-pass bf16, f32 accumulate."""
    dn = (((0,), (0,)), ((), ()))
    return jax.lax.dot_general(
        aT.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32,
    )


def _gather2(onehot, hi, lo):
    """Near-exact (rel ~2^-17) gather of f32 rows via a pre-split hi/lo pair
    (both bf16): two single-pass matmuls. Used for xyz_j, where a plain bf16
    gather would lose delta precision to cancellation."""
    return jnp.dot(onehot, hi, preferred_element_type=jnp.float32) + jnp.dot(
        onehot, lo, preferred_element_type=jnp.float32
    )


def _gather2T(onehotT, hi, lo):
    """_gather2 with the one-hot stored transposed (N, TILE): first-axis
    contraction keeps the gather on the MXU with no in-loop transpose."""
    dn = (((0,), (0,)), ((), ()))
    return jax.lax.dot_general(
        onehotT, hi, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(onehotT, lo, dn, preferred_element_type=jnp.float32)


def _dot_accT(aT, b):
    """3-pass bf16-split first-axis contraction (~f32) — the weight-grad
    outer products in the f32-faithful 3-pass mode."""
    a_hi, a_lo = _hilo(aT)
    b_hi, b_lo = _hilo(b)
    dn = (((0,), (0,)), ((), ()))
    d = jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(a_hi, b_lo, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(a_lo, b_hi, dn, preferred_element_type=jnp.float32)
    return d


def _hilo(a):
    """Hoisted hi/lo bf16 pair for near-exact (~2^-17 rel — the 2-term bf16
    split carries ~16 mantissa bits, not f32's 24) 2-pass gathers of an f32
    block."""
    hi = a.astype(jnp.bfloat16)
    return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _scatter2(onehotT, v):
    """Near-exact scatter of f32 rows v (TILE, D) through a transposed
    one-hot (N, TILE): the one-hot's 0/1 entries are bf16-representable, so
    two single-pass matmuls against v's hi/lo split reproduce v to ~2^-17
    relative error (the residual v - bf16(v) is itself re-rounded to bf16;
    NOT bit-exact) — the f32-faithful mode's dkey/dval accumulation."""
    v_hi, v_lo = _hilo(v)
    return jnp.dot(onehotT, v_hi, preferred_element_type=jnp.float32) + jnp.dot(
        onehotT, v_lo, preferred_element_type=jnp.float32
    )


def _edge_forward(xyz_tile, xyz_j, q, key_j, wd1, bd1, wd2, bd2, wg1, bg1,
                  wg2, bg2, mm=_bdot):
    """Per-edge math for one neighbor slot: all inputs (TILE, Cp/D); weight
    matmuls through ``mm`` (single-pass bf16 by default; the f32-faithful
    mode passes _dot_acc). Returns every intermediate the two backward
    kernels need."""
    delta = xyz_tile - xyz_j  # (TILE, Cp)
    h_d = mm(delta, wd1) + bd1  # (TILE, D)
    relu_d = jnp.maximum(h_d, 0.0)
    pos = mm(relu_d, wd2) + bd2
    att_in = q - key_j + pos
    h_g = mm(att_in, wg1) + bg1
    relu_g = jnp.maximum(h_g, 0.0)
    z = mm(relu_g, wg2) + bg2
    return z, pos, relu_d, relu_g, att_in, delta


def _loop(k: int, unroll: int, body, init):
    """fori_loop with a python-unrolled window inside the body (Mosaic's
    fori supports only unroll=1/full; the window software-pipelines the
    gather matmuls with a bounded VMEM live set)."""
    if unroll > 1 and k % unroll == 0:
        def chunk(c, carry):
            for i in range(unroll):
                carry = body(c * unroll + i, carry)
            return carry

        return jax.lax.fori_loop(0, k // unroll, chunk, init)
    return jax.lax.fori_loop(0, k, body, init)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xyz_tile_ref, xyzb_ref, q_ref, key_ref, val_ref,
                wd1_ref, wd2_ref, wg1_ref, wg2_ref, bias_ref,
                out_ref, m_ref, l_ref, idx_ref, *, k: int, unroll: int,
                precise: bool = False, mm3: bool = False):
    """One (batch, query-tile) program.

    Blocks: xyz_tile (TILE, Cp) f32, xyzb (N, Cp) f32, q (TILE, D) f32,
    key/val (N, D) bf16 (f32 when ``precise`` — gathered exactly via hi/lo
    2-pass), weights (Cp or D, D) bf16/f32, bias (8, D) f32 rows
    [bd1, bd2, bg1, bg2, pad]. ``mm3`` runs the MLP matmuls as 3-pass
    bf16 splits (~f32) instead of single-pass bf16. Outputs: out (TILE, D),
    m/l (TILE, D) softmax stats, idx (k, TILE) int32.
    """
    xyz_tile = xyz_tile_ref[:]
    xyzb = xyzb_ref[:]
    N = xyzb.shape[0]
    q = q_ref[:]
    bias = bias_ref[:]
    bd1, bd2, bg1, bg2 = bias[0:1], bias[1:2], bias[2:3], bias[3:4]
    wd1, wd2, wg1, wg2 = wd1_ref[:], wd2_ref[:], wg1_ref[:], wg2_ref[:]
    key_b = key_ref[:]
    val_b = val_ref[:]
    mm = _dot_acc if mm3 else _bdot
    if precise:
        key_hi, key_lo = _hilo(key_b)
        val_hi, val_lo = _hilo(val_b)
    # hoisted loop invariants: xyz hi/lo split for near-exact gathers
    xyzb_hi = xyzb.astype(jnp.bfloat16)
    xyzb_lo = (xyzb - xyzb_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # negative squared distance up to a per-row constant (row-rank invariant)
    neg_d = 2.0 * _dot_acc(xyz_tile, xyzb.T) - jnp.sum(xyzb * xyzb, axis=1)[None, :]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, N), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, TILE), 0)
    D = q.shape[-1]

    def body(j, carry):
        neg_d, m, l, acc, idx_acc = carry
        rowmax = jnp.max(neg_d, axis=1, keepdims=True)
        eligible = neg_d == rowmax
        # lowest index among ties (lax.top_k / torch.topk tie order)
        j_sel = jnp.min(jnp.where(eligible, iota_n, N), axis=1, keepdims=True)
        onehot = (iota_n == j_sel).astype(jnp.bfloat16)  # (TILE, N)
        xyz_j = _gather2(onehot, xyzb_hi, xyzb_lo)
        if precise:
            key_j = _gather2(onehot, key_hi, key_lo)
            val_j = _gather2(onehot, val_hi, val_lo)
        else:
            key_j = jnp.dot(onehot, key_b, preferred_element_type=jnp.float32)
            val_j = jnp.dot(onehot, val_b, preferred_element_type=jnp.float32)
        z, pos, _, _, _, _ = _edge_forward(
            xyz_tile, xyz_j, q, key_j, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
            mm=mm,
        )
        # online per-channel softmax update
        m_new = jnp.maximum(m, z)
        scale = jnp.exp(m - m_new)
        p = jnp.exp(z - m_new)
        l = l * scale + p
        acc = acc * scale + p * (val_j + pos)
        idx_acc = jnp.where(
            iota_k == j, jnp.broadcast_to(j_sel.T, (k, TILE)), idx_acc
        )
        return (
            jnp.where(onehot.astype(jnp.float32) > 0, -jnp.inf, neg_d),
            m_new, l, acc, idx_acc,
        )

    init = (
        neg_d,
        jnp.full((TILE, D), -jnp.inf, jnp.float32),
        jnp.zeros((TILE, D), jnp.float32),
        jnp.zeros((TILE, D), jnp.float32),
        jnp.zeros((k, TILE), jnp.int32),
    )
    _, m, l, acc, idx_acc = _loop(k, unroll, body, init)

    out_ref[:] = acc / l
    m_ref[:] = m
    l_ref[:] = l
    # idx laid out (k, TILE): lane dim = TILE (128-aligned)
    idx_ref[:] = idx_acc


# ---------------------------------------------------------------------------
# backward kernels (split: input grads / weight grads — VMEM budget)
# ---------------------------------------------------------------------------


def _replay_setup(idx_ref, bias_ref, m_ref, l_ref, out_ref, dout_ref):
    bias = bias_ref[:]
    return (
        idx_ref[:],  # (k, TILE)
        bias[0:1], bias[1:2], bias[2:3], bias[3:4],
        m_ref[:], l_ref[:], out_ref[:], dout_ref[:],
    )


def _bwd_input_kernel(idx_ref, xyz_tile_ref, xyzb_ref, q_ref, key_ref,
                      val_ref, wd1_ref, wd2_ref, wg1_ref, wg2_ref, bias_ref,
                      m_ref, l_ref, out_ref, dout_ref,
                      dq_ref, dkey_ref, dval_ref, *, k: int, unroll: int,
                      precise: bool = False, mm3: bool = False):
    """dq/dkey/dval: replay the k-loop from saved idx/m/l/out.

    Per channel c: alpha_jc = exp(z_jc - m_c)/l_c,
    dz_jc = alpha_jc * dout_c * (vpos_jc - out_c); gamma chain gives
    datt (-> dq, -dkey_j) and dvpos gives dval_j. The delta-MLP chain is
    NOT needed here: pos depends only on weights and xyz, and xyz gets a
    zero cotangent by design. dkey/dval scatter via transposed one-hots
    into per-batch-revisited output blocks (near-exact ~2^-17-rel 2-pass
    hi/lo scatters when ``precise``).
    """
    t = pl.program_id(1)
    xyz_tile = xyz_tile_ref[:]
    xyzb = xyzb_ref[:]
    N = xyzb.shape[0]
    q = q_ref[:]
    wd1, wd2, wg1, wg2 = wd1_ref[:], wd2_ref[:], wg1_ref[:], wg2_ref[:]
    key_b = key_ref[:]
    val_b = val_ref[:]
    mm = _dot_acc if mm3 else _bdot
    if precise:
        key_hi, key_lo = _hilo(key_b)
        val_hi, val_lo = _hilo(val_b)
    idx, bd1, bd2, bg1, bg2, m, l, out, dout = _replay_setup(
        idx_ref, bias_ref, m_ref, l_ref, out_ref, dout_ref
    )
    xyzb_hi = xyzb.astype(jnp.bfloat16)
    xyzb_lo = (xyzb - xyzb_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    @pl.when(t == 0)
    def _():
        dkey_ref[:] = jnp.zeros(dkey_ref.shape, dkey_ref.dtype)
        dval_ref[:] = jnp.zeros(dval_ref.shape, dval_ref.dtype)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, TILE), 0)
    iota_nT = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)
    D = q.shape[-1]
    # loop-invariant transposes (Mosaic cannot legalize them in-loop)
    wg2T = wg2.T
    wg1T = wg1.T

    def body(j, dq):
        # dkey/dval accumulate by read-modify-write on the (VMEM-resident,
        # per-batch-revisited) output refs — carrying two (N, D) f32
        # accumulators would double their VMEM footprint past the budget.
        row = jnp.sum(jnp.where(iota_k == j, idx, 0), axis=0, keepdims=True)
        onehotT = (iota_nT == row).astype(jnp.bfloat16)  # (N, TILE)
        xyz_j = _gather2T(onehotT, xyzb_hi, xyzb_lo)
        if precise:
            key_j = _gather2T(onehotT, key_hi, key_lo)
            val_j = _gather2T(onehotT, val_hi, val_lo)
        else:
            key_j = _bdotT(onehotT, key_b)
            val_j = _bdotT(onehotT, val_b)
        z, pos, _, relu_g, _, _ = _edge_forward(
            xyz_tile, xyz_j, q, key_j, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
            mm=mm,
        )
        alpha = jnp.exp(z - m) / l  # (TILE, D)
        dvpos = alpha * dout
        dz = dvpos * (val_j + pos - out)
        drelu_g = mm(dz, wg2T)
        dh_g = jnp.where(relu_g > 0, drelu_g, 0.0)
        datt = mm(dh_g, wg1T)  # -> dq, -dkey_j
        if precise:
            dkey_ref[:] += _scatter2(onehotT, -datt)
            dval_ref[:] += _scatter2(onehotT, dvpos)
        else:
            dkey_ref[:] += _bdot(onehotT, -datt)
            dval_ref[:] += _bdot(onehotT, dvpos)
        return dq + datt

    dq_ref[:] = _loop(k, unroll, body, jnp.zeros((TILE, D), jnp.float32))


def _bwd_weight_kernel(idx_ref, xyz_tile_ref, xyzb_ref, q_ref, key_ref,
                       val_ref, wd1_ref, wd2_ref, wg1_ref, wg2_ref, bias_ref,
                       m_ref, l_ref, out_ref, dout_ref,
                       dwd1_ref, dwd2_ref, dwg1_ref, dwg2_ref, dbias_ref,
                       *, k: int, unroll: int,
                       precise: bool = False, mm3: bool = False):
    """dWd1/dWd2/dWg1/dWg2/dbias: same replay, chained through BOTH MLPs.

    dpos collects the attention-path (datt) and value-path (dvpos)
    cotangents. Outer products accumulate into globally-revisited output
    blocks (TPU grid programs run sequentially); dbias rows follow the
    forward's [bd1, bd2, bg1, bg2] packing.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    xyz_tile = xyz_tile_ref[:]
    xyzb = xyzb_ref[:]
    N = xyzb.shape[0]
    q = q_ref[:]
    wd1, wd2, wg1, wg2 = wd1_ref[:], wd2_ref[:], wg1_ref[:], wg2_ref[:]
    key_b = key_ref[:]
    val_b = val_ref[:]
    mm = _dot_acc if mm3 else _bdot
    if precise:
        key_hi, key_lo = _hilo(key_b)
        val_hi, val_lo = _hilo(val_b)
    idx, bd1, bd2, bg1, bg2, m, l, out, dout = _replay_setup(
        idx_ref, bias_ref, m_ref, l_ref, out_ref, dout_ref
    )
    xyzb_hi = xyzb.astype(jnp.bfloat16)
    xyzb_lo = (xyzb - xyzb_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dwd1_ref[:] = jnp.zeros(dwd1_ref.shape, dwd1_ref.dtype)
        dwd2_ref[:] = jnp.zeros(dwd2_ref.shape, dwd2_ref.dtype)
        dwg1_ref[:] = jnp.zeros(dwg1_ref.shape, dwg1_ref.dtype)
        dwg2_ref[:] = jnp.zeros(dwg2_ref.shape, dwg2_ref.dtype)
        dbias_ref[:] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, TILE), 0)
    iota_nT = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)
    D = q.shape[-1]
    wg2T = wg2.T
    wg1T = wg1.T
    wd2T = wd2.T
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (dbias_ref.shape[0], D), 0)

    def body(j, carry):
        # weight-grad accumulators live in the (globally-revisited,
        # VMEM-resident) output refs — RMW, not loop carries (VMEM budget)
        row = jnp.sum(jnp.where(iota_k == j, idx, 0), axis=0, keepdims=True)
        onehotT = (iota_nT == row).astype(jnp.bfloat16)  # (N, TILE)
        xyz_j = _gather2T(onehotT, xyzb_hi, xyzb_lo)
        if precise:
            key_j = _gather2T(onehotT, key_hi, key_lo)
            val_j = _gather2T(onehotT, val_hi, val_lo)
        else:
            key_j = _bdotT(onehotT, key_b)
            val_j = _bdotT(onehotT, val_b)
        z, pos, relu_d, relu_g, att_in, delta = _edge_forward(
            xyz_tile, xyz_j, q, key_j, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
            mm=mm,
        )
        alpha = jnp.exp(z - m) / l
        dvpos = alpha * dout
        dz = dvpos * (val_j + pos - out)
        drelu_g = mm(dz, wg2T)
        dh_g = jnp.where(relu_g > 0, drelu_g, 0.0)
        datt = mm(dh_g, wg1T)
        dpos = datt + dvpos  # attention + value paths
        drelu_d = mm(dpos, wd2T)
        dh_d = jnp.where(relu_d > 0, drelu_d, 0.0)
        mmT = _dot_accT if mm3 else _bdotT
        dwg2_ref[:] += mmT(relu_g, dz)
        dwg1_ref[:] += mmT(att_in, dh_g)
        dwd2_ref[:] += mmT(relu_d, dpos)
        dwd1_ref[:] += mmT(delta, dh_d)
        dbias_ref[:] += (
            jnp.where(iota_b == 0, jnp.sum(dh_d, axis=0)[None, :], 0.0)
            + jnp.where(iota_b == 1, jnp.sum(dpos, axis=0)[None, :], 0.0)
            + jnp.where(iota_b == 2, jnp.sum(dh_g, axis=0)[None, :], 0.0)
            + jnp.where(iota_b == 3, jnp.sum(dz, axis=0)[None, :], 0.0)
        )
        return carry

    _loop(k, unroll, body, jnp.int32(0))


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pad_lanes(a, to: int = 128):
    d = a.shape[-1]
    pad = (-d) % to
    if pad == 0:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])


def _squeeze_lead(kernel, n: int):
    """Adapt a 2-D-ref kernel to the (1, rows, cols) blocks the grid
    delivers."""

    def wrapped(*refs):
        return kernel(*[r.at[0] for r in refs])

    return wrapped


def _specs(N, Cp, D, k):
    tile = lambda d: pl.BlockSpec(  # noqa: E731
        (1, TILE, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    full = lambda d: pl.BlockSpec(  # noqa: E731
        (1, N, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    shared = lambda r, d: pl.BlockSpec(  # noqa: E731
        (1, r, d), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM
    )
    idx_spec = pl.BlockSpec(
        (1, k, TILE), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
    )
    return tile, full, shared, idx_spec


def _cast_operands(xyz, q, key, val, wd1, wd2, wg1, wg2,
                   precise: bool = False, mm3: bool = False):
    """bf16 for the value/MLP operands; f32 for xyz (selection) and q.

    ``precise`` keeps key/val f32 (the kernels gather them exactly via
    hi/lo 2-pass); weights stay f32 only when ``mm3`` also asks for 3-pass
    MLP matmuls — in the 1-pass f32-faithful mode they are pre-truncated to
    bf16, exactly what XLA's DEFAULT-precision f32 dot does on TPU."""
    bf = jnp.bfloat16
    kv = jnp.float32 if precise else bf
    w = jnp.float32 if (precise and mm3) else bf
    return (
        xyz.astype(jnp.float32), q.astype(jnp.float32),
        key.astype(kv), val.astype(kv),
        wd1.astype(w), wd2.astype(w), wg1.astype(w), wg2.astype(w),
    )


def _chunk(k: int, env: str, default: int) -> int:
    """Python-unrolled window size inside the kernels' k-loops (Mosaic's
    fori supports only unroll=1/full; a windowed unroll software-pipelines
    the gather matmuls without the full unroll's VMEM stack). Defaults from
    a TPU-v5e sweep of the full PTran DG step at B=32+32 (ms/step):
    fwd/bwd 2/2=174.3, 4/4=169.4, 8/4=169.2, 8/8=168.0, 16/8=166.5."""
    want = int(_os.environ.get(env, str(default)))
    return next((c for c in range(min(want, k), 0, -1) if k % c == 0), 1)


def _mm3() -> bool:
    """Whether the f32-faithful mode should run the MLP matmuls as 3-pass
    bf16 splits. Default OFF: measured on this TPU (tools/precision_probe.py)
    XLA's DEFAULT-precision f32 dot IS a single-pass-bf16 truncation, so the
    1-pass kernel already matches the XLA f32 path's matmul semantics;
    SUG_VECATTN_F32_MM=3pass buys true-f32 matmuls at ~3x the MXU passes."""
    return _os.environ.get("SUG_VECATTN_F32_MM", "1pass") == "3pass"


def _fwd_pallas(xyz, q, key, val, wd1, wd2, wg1, wg2, bias, k: int,
                interpret: bool = False, precise: bool = False):
    """xyz (B, N, Cp) f32, q (B, N, D), key/val (B, N, D), wd1 (Cp, D),
    wd2/wg1/wg2 (D, D), bias (8, D). Returns out/m/l (B, N, D) f32 and
    idx_t (B, k, N) int32."""
    B, N, Cp = xyz.shape
    D = q.shape[-1]
    mm3 = precise and _mm3()
    xyz, q, key, val, wd1, wd2, wg1, wg2 = _cast_operands(
        xyz, q, key, val, wd1, wd2, wg1, wg2, precise, mm3
    )
    # analytic executed-MXU FLOPs (invisible to XLA cost_analysis): 3-pass
    # distance tile + per-neighbor gathers (xyz 2 passes, key/val 1 each —
    # 2 each when precise) and the two MLP chains (Cp->D, 3x D->D; 1 or 3
    # passes).
    from sug_tpu.ops import flops as _flops

    g = 4.0 if precise else 2.0
    p = 3.0 if mm3 else 1.0
    _flops.record(
        "vecattn_fwd",
        B * N * (6.0 * N * Cp + k * (4.0 * N * Cp + g * N * D
                                     + p * (2.0 * Cp * D + 6.0 * D * D))),
    )
    tile, full, shared, idx_spec = _specs(N, Cp, D, k)
    kernel = functools.partial(
        _fwd_kernel, k=k, unroll=_chunk(k, "SUG_VECATTN_FWD_CHUNK", 16),
        precise=precise, mm3=mm3,
    )
    out, m, l, idx_t = pl.pallas_call(
        _squeeze_lead(kernel, 10),
        grid=(B, N // TILE),
        in_specs=[
            tile(Cp), full(Cp), tile(D), full(D), full(D),
            shared(Cp, D), shared(D, D), shared(D, D), shared(D, D),
            shared(8, D),
        ],
        out_specs=(tile(D), tile(D), tile(D), idx_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, k, N), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xyz, xyz, q, key, val, wd1[None], wd2[None], wg1[None], wg2[None],
      bias[None])
    return out, m, l, idx_t


def _bwd_pallas(idx_t, xyz, q, key, val, wd1, wd2, wg1, wg2, bias,
                m, l, out, dout, interpret: bool = False,
                precise: bool = False):
    B, N, Cp = xyz.shape
    D = q.shape[-1]
    k = idx_t.shape[1]
    mm3 = precise and _mm3()
    xyz, q, key, val, wd1b, wd2b, wg1b, wg2b = _cast_operands(
        xyz, q, key, val, wd1, wd2, wg1, wg2, precise, mm3
    )
    # analytic executed-MXU FLOPs: input kernel (replay gathers+MLPs, gamma
    # backward, dkey/dval scatters) + weight kernel (replay, both MLP
    # backwards, 4 outer products) — see the kernel bodies for the terms.
    from sug_tpu.ops import flops as _flops

    # key/val gathers: 2 gathers x 2 kernels x 2 flops x passes(1|2) = 8|16;
    # dkey/dval scatters: 2 x 2 flops x passes(1|2) = 4|8.
    gs = (16.0 + 8.0) if precise else (8.0 + 4.0)
    p = 3.0 if mm3 else 1.0
    _flops.record(
        "vecattn_bwd",
        B * N * k * (8.0 * N * Cp + gs * N * D
                     + p * (6.0 * Cp * D + 28.0 * D * D)),
    )
    tile, full, shared, idx_spec = _specs(N, Cp, D, k)
    grid = (B, N // TILE)
    common_in = [
        idx_spec, tile(Cp), full(Cp), tile(D), full(D), full(D),
        shared(Cp, D), shared(D, D), shared(D, D), shared(D, D),
        shared(8, D), tile(D), tile(D), tile(D), tile(D),
    ]
    common_args = (
        idx_t, xyz, xyz, q, key, val, wd1b[None], wd2b[None], wg1b[None],
        wg2b[None], bias[None], m, l, out, dout,
    )
    in_kernel = functools.partial(
        _bwd_input_kernel, k=k, unroll=_chunk(k, "SUG_VECATTN_BWD_CHUNK", 8),
        precise=precise, mm3=mm3,
    )
    dq, dkey, dval = pl.pallas_call(
        _squeeze_lead(in_kernel, 15),
        grid=grid,
        in_specs=common_in,
        out_specs=(tile(D), full(D), full(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*common_args)
    w_kernel = functools.partial(
        _bwd_weight_kernel, k=k, unroll=_chunk(k, "SUG_VECATTN_BWD_CHUNK", 8),
        precise=precise, mm3=mm3,
    )
    dwd1, dwd2, dwg1, dwg2, dbias = pl.pallas_call(
        _squeeze_lead(w_kernel, 15),
        grid=grid,
        in_specs=common_in,
        out_specs=(
            shared(Cp, D), shared(D, D), shared(D, D), shared(D, D),
            shared(8, D),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Cp, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, D), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*common_args)
    return dq, dkey, dval, dwd1[0], dwd2[0], dwg1[0], dwg2[0], dbias[0]


# ---------------------------------------------------------------------------
# custom-VJP core + public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _vecattn_core(xyz, q, key, val, wd1, wd2, wg1, wg2, bias,
                  k: int, interpret: bool = False, precise: bool = False):
    out, _, _, _ = _fwd_pallas(
        xyz, q, key, val, wd1, wd2, wg1, wg2, bias, k, interpret, precise
    )
    return out


def _vecattn_fwd(xyz, q, key, val, wd1, wd2, wg1, wg2, bias, k, interpret,
                 precise):
    out, m, l, idx_t = _fwd_pallas(
        xyz, q, key, val, wd1, wd2, wg1, wg2, bias, k, interpret, precise
    )
    return out, (xyz, q, key, val, wd1, wd2, wg1, wg2, bias, m, l, out, idx_t)


def _vecattn_bwd(k, interpret, precise, res, dout):
    xyz, q, key, val, wd1, wd2, wg1, wg2, bias, m, l, out, idx_t = res
    dq, dkey, dval, dwd1, dwd2, dwg1, dwg2, dbias = _bwd_pallas(
        idx_t, xyz, q, key, val, wd1, wd2, wg1, wg2, bias, m, l, out,
        dout, interpret, precise,
    )
    # xyz only selects neighbors + feeds the (parameter-free) delta path;
    # nothing upstream of xyz carries parameters -> zero cotangent.
    return (
        jnp.zeros_like(xyz),
        dq.astype(q.dtype), dkey.astype(key.dtype), dval.astype(val.dtype),
        dwd1.astype(wd1.dtype), dwd2.astype(wd2.dtype),
        dwg1.astype(wg1.dtype), dwg2.astype(wg2.dtype),
        dbias.astype(bias.dtype),
    )


_vecattn_core.defvjp(_vecattn_fwd, _vecattn_bwd)


def fused_vector_attention(xyz, q, key, val, wd1, bd1, wd2, bd2, wg1, bg1,
                           wg2, bg2, k: int, interpret: bool = False,
                           precise: bool = False):
    """Fused kNN + relative-position MLP + per-channel vector attention.

    Args:
        xyz: (B, N, C) point positions (C <= 128; padded internally).
        q/key/val: (B, N, D) projected features (D multiple of 128).
        wd1 (C, D), bd1 (D): delta-MLP layer 1;  wd2 (D, D), bd2: layer 2.
        wg1/bg1, wg2/bg2: gamma-MLP layers (softmax temperature 1/sqrt(D)
            is folded into wg2/bg2 here — callers pass RAW weights).
        k: neighbors (static). N must be a multiple of 128.
        precise: f32-faithful mode — key/val gathered and scattered
            near-exactly (~2^-17 rel, 2-pass hi/lo splits; the bf16 mode
            truncates them to bf16),
            f32 accumulation throughout; MLP matmuls stay single-pass bf16
            (= XLA's DEFAULT f32 dot on TPU, measured) unless
            SUG_VECATTN_F32_MM=3pass. Matches the XLA f32 path the way the
            bf16 mode matches the bf16-policy path.
    Returns:
        (B, N, D) f32 attention output (softmax over each point's k nearest
        neighbors, per channel), matching the XLA path of
        models/ptran.py::VectorAttentionBlock under the bf16 policy.
    """
    B, N, C = xyz.shape
    D = q.shape[-1]
    if N % TILE != 0 or D % 128 != 0:
        raise ValueError(f"N ({N}) must be a multiple of {TILE} and D ({D}) of 128")
    s = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    xyz = _pad_lanes(xyz.astype(jnp.float32))
    Cp = xyz.shape[-1]
    wd1 = jnp.pad(wd1, ((0, Cp - C), (0, 0)))
    bias = jnp.pad(
        jnp.stack([bd1, bd2, bg1, bg2 * s]), ((0, 4), (0, 0))
    ).astype(jnp.float32)
    return _vecattn_core(
        xyz, q.astype(jnp.float32), key, val,
        wd1, wd2, wg1, wg2 * s, bias, k, interpret, precise,
    )


# ---------------------------------------------------------------------------
# pure-XLA reference (tests / non-TPU fallback)
# ---------------------------------------------------------------------------


def vector_attention_reference(xyz, q, key, val, wd1, bd1, wd2, bd2, wg1,
                               bg1, wg2, bg2, k: int, bf16_mm: bool = True):
    """Same contract as fused_vector_attention, in plain XLA ops.

    ``bf16_mm`` mirrors the kernel's single-pass bf16 matmuls so interpret
    tests can compare tightly; False gives the pure-f32 math."""
    from sug_tpu.ops.geometry import index_points, knn_indices

    def mm(a, b):
        if bf16_mm:
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                (((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jnp.tensordot(a, b, axes=[[a.ndim - 1], [0]])

    D = q.shape[-1]
    idx = knn_indices(xyz, k)  # (B, N, k)
    xyz_j = index_points(xyz, idx)
    key_j = index_points(key.astype(jnp.float32), idx)
    val_j = index_points(val.astype(jnp.float32), idx)
    delta = xyz[:, :, None, :].astype(jnp.float32) - xyz_j.astype(jnp.float32)
    pos = mm(jnp.maximum(mm(delta, wd1) + bd1, 0.0), wd2) + bd2
    att_in = q.astype(jnp.float32)[:, :, None, :] - key_j + pos
    z = mm(jnp.maximum(mm(att_in, wg1) + bg1, 0.0), wg2) + bg2
    alpha = jax.nn.softmax(z / jnp.sqrt(jnp.asarray(D, jnp.float32)), axis=-2)
    return jnp.sum(alpha * (val_j + pos), axis=-2)
