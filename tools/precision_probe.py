"""Empirically establish what XLA's DEFAULT f32 dot does on this TPU.

The fused vector-attention kernel's f32-faithful mode must match the XLA
f32 path's matmul semantics. On TPU the MXU is bf16; XLA emulates f32 dots
with 1/3/6 bf16 passes depending on precision. This probe measures the
error of a DEFAULT-precision f32 dot against a HIGHEST (true-f32) dot and
against hand-rolled 1-pass bf16 / 3-pass bf16-split emulations, so we know
which emulation DEFAULT corresponds to here.

Usage: python tools/precision_probe.py
"""

import jax
import jax.numpy as jnp


def _split(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def main():
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 512)).astype(np.float32)
    b = rng.standard_normal((512, 512)).astype(np.float32)
    # split on HOST: XLA's algebraic simplifier merges visible hi/lo split
    # passes (dot(hi,x)+dot(lo,x) -> dot(hi+lo,x)) back into one dot, which
    # silently destroys the emulation — each pass must enter as an opaque
    # input and run in its own jit.
    def np_split(x):
        hi = x.astype(jnp.bfloat16).astype(np.float32)
        return hi, x - hi

    a_hi, a_lo = np_split(a)
    b_hi, b_lo = np_split(b)

    f_hi = jax.jit(lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST))
    f_def = jax.jit(lambda a, b: jnp.dot(a, b))
    f_bf = jax.jit(
        lambda a, b: jnp.dot(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    f_1 = jax.jit(
        lambda x, y: jnp.dot(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    ref = np.asarray(f_hi(a, b))
    d_def = np.asarray(f_def(a, b))
    d_1p = np.asarray(f_bf(a, b))
    d_3p = (
        np.asarray(f_1(a_hi, b_hi)) + np.asarray(f_1(a_hi, b_lo))
        + np.asarray(f_1(a_lo, b_hi))
    )
    scale = np.max(np.abs(ref))
    err = lambda x: np.max(np.abs(x - ref)) / scale  # noqa: E731
    print(f"backend={jax.default_backend()}")
    print(f"rel err vs HIGHEST: DEFAULT={err(d_def):.3e}  1-pass bf16={err(d_1p):.3e}  3-pass split={err(d_3p):.3e}")
    d1 = np.max(np.abs(d_def - d_1p))
    d3 = np.max(np.abs(d_def - d_3p))
    print(f"max|DEFAULT - 1pass|={d1:.3e}  max|DEFAULT - 3pass|={d3:.3e}")
    if d1 == 0.0:
        print("=> DEFAULT f32 dot IS single-pass bf16 here")
    elif d3 == 0.0:
        print("=> DEFAULT f32 dot IS the 3-pass bf16 split here")
    else:
        print("=> DEFAULT matches neither emulation exactly")


if __name__ == "__main__":
    main()
