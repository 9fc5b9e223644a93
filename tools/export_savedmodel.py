#!/usr/bin/env python
"""Export a trained classifier to a TF SavedModel (and optionally TFLite).

Converts the jitted eval forward (standalone classifier, or the DG twin-head
ensemble) to TensorFlow via jax2tf, so trained SUG models deploy on standard
TF-serving infrastructure. The serving signature takes (B, N, 3) float32
clouds (already normalized like the ingest pipeline) and returns logits.

    python tools/export_savedmodel.py --ckpt <orbax_dir> --model DGCNN --dg \
        --out /tmp/sug_savedmodel [--batch 64 --points 1024] \
        [--tflite /tmp/sug.tflite [--tflite-batch 1]]

The TFLite flatbuffer uses a FIXED batch (edge runtimes want static shapes);
ops jax2tf emits that have no builtin TFLite kernel (top_k etc.) ride the
SELECT_TF_OPS fallback. Both exports are round-trip-checked against the jax
forward before the script reports success.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--model", default="Pointnet")
    ap.add_argument("--dg", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--tflite", default=None, help="also write a .tflite here")
    ap.add_argument("--tflite-batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import tensorflow as tf
    from jax.experimental import jax2tf

    from sug_tpu.engine.checkpoint import restore_checkpoint

    if args.dg:
        from sug_tpu.engine.dg_trainer import DGTrainer
        from sug_tpu.utils.config import ConfigDict

        cfg = ConfigDict({"METHODS": {"GRL": False}, "OPTIMIZATION": {"WEIGHT_DECAY": 0.0}})
        trainer = DGTrainer(cfg, model_name=args.model)
        state = trainer.init_state(0, args.batch, args.points)

        def fwd(params, batch_stats, data):
            out = trainer.model.apply(
                {"params": params, "batch_stats": batch_stats}, data, False
            )
            return (out["logits1"] + out["logits2"]) / 2.0

    else:
        from sug_tpu.engine.source_trainer import SourceTrainer

        trainer = SourceTrainer(model_name=args.model)
        state = trainer.init_state(0, args.batch, args.points)
        fwd = trainer.eval_apply

    state = restore_checkpoint(args.ckpt, state)["state"]
    params, batch_stats = state.params, state.batch_stats

    tf_fn = jax2tf.convert(
        lambda data: fwd(params, batch_stats, data),
        polymorphic_shapes=[f"(b, {args.points}, 3)"],
        with_gradient=False,
    )

    module = tf.Module()
    module.serve = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec([None, args.points, 3], tf.float32, name="clouds")],
    )
    tf.saved_model.save(
        module, args.out, signatures={"serving_default": module.serve}
    )
    print(f"SavedModel written to {args.out}")

    # round-trip check
    loaded = tf.saved_model.load(args.out)
    import numpy as np

    x = np.random.default_rng(0).normal(size=(2, args.points, 3)).astype(np.float32)
    out = loaded.signatures["serving_default"](clouds=tf.constant(x))
    logits = list(out.values())[0].numpy()
    ref = np.asarray(fwd(params, batch_stats, x))
    err = float(np.abs(logits - ref).max())
    print(f"round-trip max abs err vs jax forward: {err:.2e}")
    assert err < 1e-3

    if args.tflite:
        export_tflite(
            lambda data: fwd(params, batch_stats, data),
            args.tflite, args.tflite_batch, args.points,
        )


def export_tflite(jax_fwd, out_path: str, batch: int, points: int) -> str:
    """Convert the (params-closed) jax forward to a TFLite flatbuffer with a
    static (batch, points, 3) signature and verify it with the TFLite
    interpreter against the jax forward."""
    import numpy as np
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(jax_fwd, with_gradient=False)
    conc = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec([batch, points, 3], tf.float32, name="clouds")],
    ).get_concrete_function()
    converter = tf.lite.TFLiteConverter.from_concrete_functions([conc])
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,  # jax2tf's top_k/scatter land here
    ]
    flatbuffer = converter.convert()
    with open(out_path, "wb") as f:
        f.write(flatbuffer)
    print(f"TFLite model written to {out_path} ({len(flatbuffer)/1e6:.2f} MB)")

    interp = tf.lite.Interpreter(model_content=flatbuffer)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    x = np.random.default_rng(1).normal(size=(batch, points, 3)).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    logits = interp.get_tensor(out["index"])
    ref = np.asarray(jax_fwd(x))
    err = float(np.abs(logits - ref).max())
    print(f"TFLite round-trip max abs err vs jax forward: {err:.2e}")
    assert err < 1e-2, err
    return out_path


if __name__ == "__main__":
    main()
