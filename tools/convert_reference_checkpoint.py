"""Convert a reference (SiyuanHuang95/SUG) Net_MDA ``.pth`` checkpoint into
NetMDA variables, so models trained with the torch reference can be served /
fine-tuned with sug_tpu directly.

Usage:
    python tools/convert_reference_checkpoint.py \
        --ckpt path/to/model.pth --model Pointnet --out netmda_vars.msgpack

The output is a flax-serialized ``{"params", "batch_stats"}`` tree:

    import flax.serialization, jax.numpy as jnp
    from sug_tpu.models.net_mda import NetMDA
    net = NetMDA(model_name="Pointnet")
    template = net.init(jax.random.key(0), jnp.zeros((1, 1024, 3)),
                        train=False, domain="both")
    variables = flax.serialization.from_bytes(template, open(OUT, "rb").read())
    logits = net.apply(variables, clouds, train=False)

Verified numerically by tests/test_weight_transplant.py (forward parity at
1e-4 on logits / semantic / node features for Pointnet, DGCNN, Pointnet2).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .pth state_dict")
    ap.add_argument("--model", default="Pointnet",
                    choices=["Pointnet", "DGCNN", "Pointnet2"])
    ap.add_argument("--out", required=True, help="output .msgpack path")
    ap.add_argument("--key", default=None,
                    help="optional sub-dict key inside the checkpoint blob")
    args = ap.parse_args()

    import flax.serialization

    from sug_tpu.utils.torch_convert import load_reference_checkpoint

    variables = load_reference_checkpoint(args.ckpt, args.model, key=args.key)
    blob = flax.serialization.msgpack_serialize(variables)
    with open(args.out, "wb") as f:
        f.write(blob)
    n = sum(x.size for x in __import__("jax").tree.leaves(variables))
    print(f"wrote {args.out}: {n:,} parameters ({args.model})")


if __name__ == "__main__":
    main()
