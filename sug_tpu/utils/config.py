"""Config system: argparse + YAML with _BASE_CONFIG_ inheritance + typed
``--set KEY.SUBKEY value`` overrides.

CLI-surface parity with the reference (utils/config.py:10-40): same flag
names and defaults, so reference launch commands work unchanged. The
reference's EasyDict is replaced by a small attribute-access dict
(``ConfigDict``) to avoid the dependency.
"""

from __future__ import annotations

import argparse
from ast import literal_eval
from pathlib import Path

import yaml


class ConfigDict(dict):
    """dict with attribute access; nested dicts are wrapped recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                ConfigDict(v) if isinstance(v, dict) and not isinstance(v, ConfigDict) else v
                for v in value
            )
        super().__setitem__(key, value)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


# global mutable config singleton, mirroring the reference's ``cfg``
# (utils/config.py:7-8)
cfg = ConfigDict()
cfg.LOCAL_RANK = 0


def merge_new_config(config: ConfigDict, new_config: dict) -> ConfigDict:
    """Recursive merge honoring ``_BASE_CONFIG_`` file inheritance
    (reference utils/config.py:51-68)."""
    if "_BASE_CONFIG_" in new_config:
        with open(new_config["_BASE_CONFIG_"], "r") as f:
            base = yaml.safe_load(f)
        config.update(ConfigDict(base))

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config or not isinstance(config[key], dict):
            config[key] = ConfigDict()
        merge_new_config(config[key], val)
    return config


def cfg_from_yaml_file(cfg_file: str, config: ConfigDict) -> ConfigDict:
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)
    return merge_new_config(config, new_config or {})


# --set roots that may be CREATED when absent from the YAML: every shipped
# config predates these extension blocks (MODEL_CFG backbone overrides,
# PRECISION mixed-precision policy), so `--set MODEL_CFG.PYRAMID grid` /
# `--set PRECISION bf16` must work without editing the YAML. All other keys
# keep the reference's exists-check (typo protection, utils/config.py:93).
_CREATABLE_SET_ROOTS = ("MODEL_CFG", "PRECISION")
# exact dotted paths that may also be created (extension leaves under
# otherwise-strict blocks)
_CREATABLE_SET_PATHS = ("DATASET.FIXED_X_ROTATION", "RANDOM_SEED")


def cfg_from_list(cfg_list, config: ConfigDict) -> None:
    """Typed dotted-path CLI overrides: ``--set A.B 1 C.D foo``
    (reference utils/config.py:83-115)."""
    assert len(cfg_list) % 2 == 0, "--set expects KEY VALUE pairs"
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split(".")
        d = config
        creatable = key_list[0] in _CREATABLE_SET_ROOTS or k in _CREATABLE_SET_PATHS
        for subkey in key_list[:-1]:
            if subkey not in d and creatable:
                d[subkey] = ConfigDict()
            assert subkey in d, f"NotFoundKey: {subkey}"
            d = d[subkey]
        subkey = key_list[-1]
        if subkey not in d and creatable:
            try:
                d[subkey] = literal_eval(v)
            except (ValueError, SyntaxError):
                d[subkey] = v
            if isinstance(d[subkey], tuple):
                d[subkey] = list(d[subkey])
            continue
        assert subkey in d, f"NotFoundKey: {subkey}"
        try:
            value = literal_eval(v)
        except (ValueError, SyntaxError):
            value = v
        if isinstance(value, tuple):
            # "--set KEY 4,5" literal_evals to a tuple; lists are the config
            # currency (the reference crashes on this input — fixed here)
            value = list(value)

        if type(value) is not type(d[subkey]) and isinstance(d[subkey], ConfigDict):
            for src in value.split(","):
                cur_key, cur_val = src.split(":")
                val_type = type(d[subkey][cur_key])
                d[subkey][cur_key] = val_type(cur_val)
        elif type(value) is not type(d[subkey]) and isinstance(d[subkey], list):
            elem_type = type(d[subkey][0])
            d[subkey] = [elem_type(x) for x in str(value).split(",")]
        else:
            if isinstance(d[subkey], float) and isinstance(value, int):
                # "--set METHODS.MMD_WEIGHT 0" literal_evals to int; widening
                # to the key's float type is lossless and saves the caller a
                # trailing ".0" (the reference asserts here).
                value = float(value)
            assert type(value) is type(d[subkey]), (
                f"--set {k}: value {v!r} parsed as {type(value).__name__}, "
                f"but the config key is {type(d[subkey]).__name__}"
            )
            d[subkey] = value


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Arg parser")
    parser.add_argument("--cfg", type=str, default=None, help="training config yaml")
    parser.add_argument("--source", "-s", type=str, default="scannet", help="source dataset")
    parser.add_argument("--batch_size", "-b", type=int, default=64, help="batch size")
    parser.add_argument("--epochs", "-e", type=int, default=300, help="training epochs")
    parser.add_argument("--gpu", "-g", type=str, default="0", help="device id (accepted for CLI parity; devices come from jax)")
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--ckpt_save_interval", type=int, default=10)
    parser.add_argument("--max_ckpt_save_num", type=int, default=50)
    parser.add_argument(
        "--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER,
        help="set extra config keys [use in last position]",
    )
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm", "jax"], default="none",
                        help="'jax'/'slurm' initialize jax.distributed; 'pytorch' is accepted as an alias of 'jax' for CLI parity")
    parser.add_argument("--tcp_port", type=int, default=18888)
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--fix_random_seed", action="store_true", default=False)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint directory to resume from (new in sug_tpu; the reference saved but never loaded)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="data-parallel device count (default: all local devices)")
    return parser


def parser_config(argv=None):
    """Parse CLI + YAML into (args, cfg) — reference utils/config.py:10-40."""
    parser = build_arg_parser()
    args = parser.parse_args(argv)

    if args.cfg is not None:
        cfg_from_yaml_file(args.cfg, cfg)
        cfg.TAG = Path(args.cfg).stem
        cfg.EXP_GROUP_PATH = "/".join(args.cfg.split("/")[1:-1])

    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    return args, cfg


def log_config_to_file(config, pre="cfg", logger=None):
    for key, val in config.items():
        if isinstance(val, ConfigDict):
            logger.info("\n%s.%s = edict()" % (pre, key))
            log_config_to_file(val, pre=f"{pre}.{key}", logger=logger)
            continue
        logger.info("%s.%s: %s" % (pre, key, val))


def resolve_seed(args, cfg=None) -> int:
    """Consume ``--fix_random_seed`` (reference train_dg_single_gpu.py gates
    set_random_seed(666 + LOCAL_RANK) on it, utils/common_utils.py:81-88).

    Fixed: the reference's deterministic seed. Unfixed: fresh OS entropy per
    run — the reference leaves its RNGs unseeded in that case.

    ``--set RANDOM_SEED N`` takes precedence over both: multi-seed A/B
    matrices need an explicit seed per run (the reference offers only the
    hardcoded 666).
    """
    if cfg is not None and cfg.get("RANDOM_SEED") is not None:
        return int(cfg["RANDOM_SEED"]) + (int(cfg.get("LOCAL_RANK", 0)))
    if getattr(args, "fix_random_seed", False):
        local_rank = int(cfg.get("LOCAL_RANK", 0)) if cfg is not None else 0
        return 666 + local_rank
    import secrets

    seed = int(secrets.randbits(31))

    # Multi-host: every rank MUST agree on the seed — BatchIterator derives the
    # shared epoch permutation from it (ranks would otherwise sample
    # overlapping/missing data) and init_state seeds params before device_put
    # to a replicated sharding. The reference is safe unseeded only because
    # DistributedSampler carries its own rank-consistent default seed
    # (data/dataloader.py:16-36); here we broadcast process 0's entropy.
    try:
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            import numpy as _np

            seed = int(
                _np.asarray(
                    multihost_utils.broadcast_one_to_all(_np.int32(seed))
                )
            )
    except Exception:  # jax not initialized / single-process fallback
        pass
    return seed
