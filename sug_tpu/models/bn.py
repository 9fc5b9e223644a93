"""BatchNorm cross-replica semantics under data parallelism.

Under GSPMD the repo's default BatchNorm statistics are GLOBALLY EXACT: the
batch axis is logically one global array, so mean/var reductions span every
device (XLA inserts the collectives). The torch reference running under DDP
computes PER-REPLICA statistics instead (each GPU normalizes its local
micro-batch; reference train_dg.py:248's DDP never syncs BN).

``BN_SEMANTICS: per_replica`` (MODEL_CFG, or SUG_BN_GROUPS=<n>) reproduces
the reference's semantics as GROUPED batch norm: the batch axis is split into
``groups`` contiguous groups (= the mesh's device count, matching how
shard_batch lays out rows), each normalized by its own statistics. This is
bit-identical to per-replica BN on a real N-device mesh AND runs on a single
chip, so the accuracy A/B (docs/PERF.md "sync-BN A/B") does not need real
multi-chip hardware. Running stats accumulate the mean over groups of the
per-group statistics (the sensible aggregate; torch-DDP's default
broadcast_buffers=True instead adopts rank 0's buffers every step —
a quirk, not a semantic worth keeping).

The variable tree matches nn.BatchNorm exactly (params scale/bias,
batch_stats mean/var), so checkpoints, the 3-group optimizer masks, and the
torch weight-transplant converter are unaffected by the switch.

Group state is process-global and read at TRACE time (like
models/precision.py). It is a trace-time MAILBOX, not the source of truth:
each trainer snapshots the effective group count at construction
(``configure_from_cfg`` returns it) and re-asserts it via ``set_bn_groups``
before every call that can trigger a trace (init_state / train_step /
eval), so interleaved trainers with different BN semantics in one process
each trace with their own groups — latest-configure no longer wins.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import flax.linen as nn

# mode is a tri-state: "unset" (default — the SUG_BN_GROUPS env override
# applies) vs "configured" (an explicit set_bn_groups/BN_SEMANTICS decision
# — env is ignored, even for groups == 1). momentum_mode: "mean" (grouped
# stats feed ONE momentum update with their across-group mean) vs
# "sequential" (one momentum update PER group, in group order — exactly the
# running stats the sequential source-then-target choreography accumulates;
# used by the stacked both-domains forward, engine/dg_trainer.py).
_STATE = {"groups": 1, "mode": "unset", "momentum_mode": "mean"}


_STACK_SAVED: list = []


def set_stacked_bn(on: bool) -> None:
    """Enter/exit the stacked-forward BN regime: 2 batch groups (source
    half, target half) with sequential momentum updates. Trace-time mailbox
    like the rest of this module — NetMDA._stacked sets it around the
    generator call only (the per-domain CALayers/heads see single-domain
    batches and keep plain BN). Enter/exit save/restore the full state, so
    an env SUG_BN_GROUPS or configured-global regime resumes afterwards."""
    if on:
        if bn_groups() != 1:
            raise ValueError(
                "stacked forward + per-replica BN groups are mutually "
                "exclusive (grouped-BN group axes would collide)"
            )
        _STACK_SAVED.append(dict(_STATE))
        _STATE.update(groups=2, mode="configured", momentum_mode="sequential")
    else:
        _STATE.update(
            _STACK_SAVED.pop() if _STACK_SAVED
            else {"groups": 1, "mode": "unset", "momentum_mode": "mean"}
        )


def bn_momentum_mode() -> str:
    return _STATE["momentum_mode"]


def set_bn_groups(n: int) -> None:
    """Set the number of per-replica BN groups (1 = globally-exact stats).

    Marks the state explicitly configured: SUG_BN_GROUPS no longer applies.
    """
    if n < 1:
        raise ValueError(f"BN groups must be >= 1, got {n}")
    _STATE["groups"] = int(n)
    _STATE["mode"] = "configured"


def reset_bn_groups() -> None:
    """Back to the unset default (groups=1, env override honored)."""
    _STATE["groups"] = 1
    _STATE["mode"] = "unset"


def bn_groups() -> int:
    """Current BN group count; SUG_BN_GROUPS env overrides only while the
    state is UNSET (an explicit ``BN_SEMANTICS: global`` beats the env)."""
    if _STATE["mode"] == "unset":
        env = os.environ.get("SUG_BN_GROUPS", "")
        if env.isdigit() and int(env) > 1:
            return int(env)
    return _STATE["groups"]


def configure_from_cfg(cfg, mesh_devices: int) -> int:
    """Read ``MODEL_CFG.BN_SEMANTICS`` ('global' | 'per_replica').

    per_replica groups = the mesh's device count; ``MODEL_CFG.BN_GROUPS``
    overrides it explicitly — that lets a SINGLE chip emulate the BN
    statistics an N-replica DDP run would compute (the accuracy A/B).

    A cfg WITHOUT an explicit BN_SEMANTICS resets to the unset default (so
    a stale per_replica state from a previous trainer cannot leak, and the
    SUG_BN_GROUPS env override stays honored). Malformed MODEL_CFG raises.
    Returns the effective group count for the caller to snapshot.
    """
    model_cfg = cfg.get("MODEL_CFG", None) if cfg is not None else None
    if model_cfg is not None and not hasattr(model_cfg, "get"):
        raise ValueError(f"MODEL_CFG is not a mapping: {model_cfg!r}")
    sem = model_cfg.get("BN_SEMANTICS", None) if model_cfg is not None else None
    if sem is None:
        reset_bn_groups()
        return bn_groups()
    sem = str(sem).lower()
    groups = model_cfg.get("BN_GROUPS", None)
    if sem == "per_replica":
        set_bn_groups(int(groups) if groups else max(mesh_devices, 1))
    elif sem == "global":
        set_bn_groups(1)
    else:
        raise ValueError(f"unknown BN_SEMANTICS {sem!r}")
    return bn_groups()


class BatchNorm(nn.Module):
    """nn.BatchNorm with statistics over batch GROUPS (per-replica BN).

    Same variable tree as nn.BatchNorm — INCLUDING the auto-name: flax
    auto-names submodules by class name, so this class is deliberately
    called ``BatchNorm`` and slots into existing param trees
    ("BatchNorm_0", ...) when the factory swaps it in. Train mode
    normalizes each of the ``groups`` contiguous batch groups by its own
    mean/var over (group rows x all spatial axes); eval mode uses the
    running stats, which accumulate the across-group mean of the per-group
    statistics.
    """

    groups: int
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None
    # "mean": one momentum update with the across-group mean (per-replica
    # emulation). "sequential": one momentum update per group in order —
    # bit-faithful to the sequential source-then-target forwards' running
    # stats (the stacked-forward regime).
    momentum_mode: str = "mean"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        else:
            B = x.shape[0]
            g = self.groups
            if B % g != 0:
                raise ValueError(
                    f"batch {B} not divisible by {g} BN replica groups"
                )
            xg = x.astype(jnp.float32).reshape((g, B // g) + x.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))  # all but group + channel
            gmean = jnp.mean(xg, axis=axes)  # (g, C)
            gvar = jnp.mean(jnp.square(xg), axis=axes) - jnp.square(gmean)
            yg = (xg - gmean.reshape((g,) + (1,) * (xg.ndim - 2) + (C,))) \
                * jax.lax.rsqrt(
                    gvar.reshape((g,) + (1,) * (xg.ndim - 2) + (C,))
                    + self.epsilon
                )
            y = yg.reshape(x.shape)
            if not self.is_initializing():
                if self.momentum_mode == "sequential":
                    rm, rv = ra_mean.value, ra_var.value
                    for i in range(g):
                        rm = self.momentum * rm + (1.0 - self.momentum) * gmean[i]
                        rv = self.momentum * rv + (1.0 - self.momentum) * gvar[i]
                    ra_mean.value, ra_var.value = rm, rv
                else:
                    ra_mean.value = (
                        self.momentum * ra_mean.value
                        + (1.0 - self.momentum) * jnp.mean(gmean, axis=0)
                    )
                    ra_var.value = (
                        self.momentum * ra_var.value
                        + (1.0 - self.momentum) * jnp.mean(gvar, axis=0)
                    )
        y = y * scale + bias
        return y.astype(self.dtype) if self.dtype is not None else y


def batch_norm(train: bool, momentum: float = 0.9, epsilon: float = 1e-5,
               dtype=None, name=None):
    """The repo-wide BatchNorm factory: nn.BatchNorm (globally-exact stats,
    the battle-tested default) when bn_groups()==1, the grouped per-replica
    BatchNorm otherwise. Both auto-name identically ("BatchNorm_<i>"), so
    the param tree is invariant to the semantics switch."""
    g = bn_groups()
    if g == 1:
        return nn.BatchNorm(
            use_running_average=not train, momentum=momentum, epsilon=epsilon,
            dtype=dtype, name=name,
        )
    return BatchNorm(
        groups=g, use_running_average=not train, momentum=momentum,
        epsilon=epsilon, dtype=dtype, name=name,
        momentum_mode=bn_momentum_mode(),
    )
