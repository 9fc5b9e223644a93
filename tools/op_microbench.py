#!/usr/bin/env python
"""Per-op timing of the DG step's components at flagship shapes (B=64, N=1024).

Methodology (the only one that survives the axon tunnel, see
docs/PERF.md): each op runs K times inside ONE compiled lax.scan whose
iterations are data-dependent (input perturbed by the carry), then a scalar
is fetched; host wall time / K bounds the per-op device time from above.
block_until_ready over the tunnel does NOT wait and is never used for timing.

Run: PYTHONPATH=/root/.axon_site:. python tools/op_microbench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N = 64, 1024
K_REPS = 10


def timed_scan(make_body, reps=K_REPS, label=""):
    """make_body() -> (init_carry, body_fn(carry, t) -> carry). Returns ms/rep."""

    @jax.jit
    def run():
        init = make_body()
        carry, body = init
        carry, _ = jax.lax.scan(body, carry, jnp.arange(reps, dtype=jnp.float32))
        return carry

    out = run()  # compile + warm
    _ = float(jnp.sum(out)) if hasattr(out, "sum") else np.asarray(out)
    t0 = time.perf_counter()
    out = run()
    _ = float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)

    from sug_tpu.ops.geometry import (
        chamfer_distance,
        farthest_point_sample,
        get_graph_feature,
        index_points,
        knn_indices,
        query_ball_point,
        square_distance,
        three_nn_interpolate,
    )

    print(f"device={jax.devices()[0].device_kind}  B={B} N={N} reps={K_REPS}", flush=True)

    # ---- kNN variants at each EdgeConv input width -----------------------
    for C in (3, 64, 128):
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

        def mk_topk(x=x):
            def body(c, t):
                idx = knn_indices(x + c * 0 + t * 1e-6, 20)
                return jnp.sum(idx.astype(jnp.float32)) * 1e-9, None
            return jnp.zeros(()), body

        timed_scan(mk_topk, label=f"knn lax.top_k        C={C}")

        def mk_approx(x=x):
            def body(c, t):
                d = -square_distance(x + c * 0 + t * 1e-6, x)
                _, idx = jax.lax.approx_max_k(d, 20)
                return jnp.sum(idx.astype(jnp.float32)) * 1e-9, None
            return jnp.zeros(()), body

        timed_scan(mk_approx, label=f"knn approx_max_k     C={C}")

        def mk_iter(x=x):
            def body(c, t):
                d = -square_distance(x + c * 0 + t * 1e-6, x)

                def step(state, _):
                    d, acc = state
                    i = jnp.argmax(d, axis=-1)  # (B, N)
                    d = d.at[jnp.arange(B)[:, None], jnp.arange(N)[None, :], i].set(
                        -jnp.inf
                    )
                    return (d, acc + jnp.sum(i).astype(jnp.float32)), i

                (_, acc), _ = jax.lax.scan(step, (d, 0.0), None, length=20)
                return acc * 1e-9, None
            return jnp.zeros(()), body

        timed_scan(mk_iter, label=f"knn iterative argmax C={C}")

        def mk_dist(x=x):
            def body(c, t):
                d = square_distance(x + c * 0 + t * 1e-6, x)
                return jnp.sum(d) * 1e-9, None
            return jnp.zeros(()), body

        timed_scan(mk_dist, label=f"pairwise dist only   C={C}")

    # ---- full EdgeConv graph feature (knn + gather + concat) -------------
    x64 = jnp.asarray(rng.normal(size=(B, N, 64)), jnp.float32)

    def mk_graphfeat():
        def body(c, t):
            f = get_graph_feature(x64 + c * 0 + t * 1e-6, k=20)  # (B,N,k,2C)
            return jnp.sum(f) * 1e-9, None
        return jnp.zeros(()), body

    timed_scan(mk_graphfeat, label="get_graph_feature    C=64")

    def mk_gather():
        idx = knn_indices(x64, 20)

        def body(c, t):
            f = index_points(x64 + c * 0 + t * 1e-6, idx)  # (B,N,k,C)
            return jnp.sum(f) * 1e-9, None
        return jnp.zeros(()), body

    timed_scan(mk_gather, label="edge gather only     C=64")

    # ---- SA-node components ---------------------------------------------
    def mk_fps():
        def body(c, t):
            idx = farthest_point_sample(xyz + c * 0 + t * 1e-6, 64)
            return jnp.sum(idx.astype(jnp.float32)) * 1e-9, None
        return jnp.zeros(()), body

    timed_scan(mk_fps, label="FPS 64/1024")

    def mk_ballq():
        nodes = xyz[:, :64, :]

        def body(c, t):
            idx = query_ball_point(0.3, 64, xyz + c * 0 + t * 1e-6, nodes)
            return jnp.sum(idx.astype(jnp.float32)) * 1e-9, None
        return jnp.zeros(()), body

    timed_scan(mk_ballq, label="ball query r=.3 K=64")

    def mk_3nn():
        nodes = xyz[:, :64, :]
        nf = jnp.asarray(rng.normal(size=(B, 64, 64)), jnp.float32)

        def body(c, t):
            f = three_nn_interpolate(xyz + c * 0 + t * 1e-6, nodes, nf)
            return jnp.sum(f) * 1e-9, None
        return jnp.zeros(()), body

    timed_scan(mk_3nn, label="3-NN interpolate")

    def mk_chamfer():
        xyz2 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)

        def body(c, t):
            d = chamfer_distance(xyz + c * 0 + t * 1e-6, xyz2)
            return jnp.sum(d) * 1e-3, None
        return jnp.zeros(()), body

    timed_scan(mk_chamfer, label="chamfer 1024x1024")

    from sug_tpu.ops.augment import augment_batch

    def mk_aug():
        key = jax.random.key(0)

        def body(c, t):
            out = augment_batch(jax.random.fold_in(key, t.astype(jnp.int32)), xyz + c * 0)
            return jnp.sum(out) * 1e-6, None
        return jnp.zeros(()), body

    timed_scan(mk_aug, label="augment_batch")

    # ---- fused EdgeConv blocks fwd+bwd at each width ---------------------
    if jax.default_backend() == "tpu":
        from sug_tpu.ops.edgeconv_pallas import fused_edgeconv_reduce

        for F, vb in ((64, False), (256, False), (256, True)):
            xF = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
            uF = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
            vF = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)

            def mk_block(xF=xF, uF=uF, vF=vF, vb=vb):
                def loss(u, v, eps):
                    amax, amin, s1, s2, _ = fused_edgeconv_reduce(
                        xF + eps, u, v, 20, values_bf16=vb
                    )
                    return jnp.sum(amax - amin) + jnp.sum(s1) * 0.1 + jnp.sum(s2) * 0.01

                g = jax.grad(loss, argnums=(0, 1))

                def body(c, t):
                    du, dv = g(uF + c * 0, vF, t * 1e-7)
                    return jnp.sum(du) * 1e-9 + jnp.sum(dv) * 1e-12, None
                return jnp.zeros(()), body

            timed_scan(
                mk_block,
                label=f"fused block fwd+bwd  F={F}{' bf16' if vb else ''}",
            )

    # ---- model forwards --------------------------------------------------
    from sug_tpu.models import NetMDA

    model = NetMDA(model_name="DGCNN", num_class=10)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        xyz, True, domain="both",
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def mk_fwd():
        def body(c, t):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                xyz + c * 0 + t * 1e-6, False, domain="both",
            )
            return jnp.sum(out["logits1"]) * 1e-3, None
        return jnp.zeros(()), body

    timed_scan(mk_fwd, label="NetMDA fwd (eval, both)", reps=5)

    def mk_fwd_grad():
        def loss_fn(p, x):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, True, domain="both",
                rngs={"dropout": jax.random.key(0)},
                mutable=["batch_stats"],
            )
            return jnp.sum(out["logits1"] ** 2) + jnp.sum(out["node_attn"] ** 2)

        def body(c, t):
            g = jax.grad(loss_fn)(params, xyz + c * 0 + t * 1e-6)
            return jax.tree.reduce(
                lambda a, l: a + jnp.sum(jnp.abs(l)), g, jnp.zeros(())
            ) * 1e-6, None
        return jnp.zeros(()), body

    timed_scan(mk_fwd_grad, label="NetMDA fwd+bwd (train, both)", reps=5)


if __name__ == "__main__":
    main()
