"""SUG-TPU: a TPU-native (JAX/XLA/Pallas/pjit) point-cloud domain-generalization framework.

Re-implements the capabilities of SiyuanHuang95/SUG ("Single-dataset Unified
Generalization for 3D Point Cloud Classification") with a TPU-first design:

- fixed-shape, channels-last ``(B, N, C)`` tensors everywhere,
- a single jitted train step containing augmentation + both domain forwards +
  all DG losses + the 3-group optimizer update,
- ``jax.sharding.Mesh`` + ``shard_map`` data parallelism instead of DDP/NCCL,
- Pallas kernels for the hot geometry ops (FPS, kNN/EdgeConv, chamfer).

Package layout:
    ops/       geometry op library (FPS, ball query, kNN, 3-NN interp, chamfer) + augmentations
    models/    backbones (PointNet, DGCNN, PointNet++, Point Transformer, KPConv) + Net_MDA
    losses/    MMD alignment library, focal/class-weighted CE, discrepancy
    data/      PointDA-10 ingest (.npy dump contract), samplers, train-time splitters
    parallel/  mesh + sharding helpers
    engine/    trainers (source-only, DG, UDA), eval loop, checkpointing
    utils/     config system (YAML + _BASE_CONFIG_ + --set), logging, metrics
"""

__version__ = "0.1.0"
