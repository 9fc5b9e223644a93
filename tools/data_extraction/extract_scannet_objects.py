#!/usr/bin/env python
"""Extract per-object point clouds from raw ScanNet scenes and pack them into
the h5 shards the PointDA-10 scannet pipeline consumes.

Compact equivalent of the reference's two-stage offline pipeline
(data/data_extraction/ScanNet/extract_scannet_objs_revised.py +
prepare_scannet_cls_data_new10.py): scene PLY + .aggregation.json +
_vh_clean_2.0.010000.segs.json -> per-object clouds for the 10 benchmark
classes -> h5 shards ('data' (B, S, 3), 'label' (B,)) + {train,test}_files.txt
lists -> (optionally) the unified train/test_{pts,label}.npy dumps.

Self-contained: a minimal PLY vertex reader (ascii + binary_little_endian)
replaces the plyfile dependency.

    python tools/data_extraction/extract_scannet_objects.py \
        --scans <scannet>/scans --output data/scannet_cls \
        [--benchmark <dir with classes txt>] [--sample-num 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

# PointDA-10 scannet benchmark classes (reference
# data/data_extraction/ScanNet/benchmark/classes_ObjClassification-scannet10.txt)
SCANNET10_CLASSES = [
    "bathtub", "bed", "bookshelf", "cabinet", "chair",
    "lamp", "monitor", "plant", "sofa", "table",
]
# common raw-label aliases seen in aggregation jsons
LABEL_ALIASES = {
    "bookcase": "bookshelf", "shelf": "bookshelf", "night stand": "cabinet",
    "nightstand": "cabinet", "dresser": "cabinet", "couch": "sofa",
    "tv": "monitor", "television": "monitor", "desk": "table",
    "coffee table": "table", "end table": "table", "office chair": "chair",
    "armchair": "chair", "potted plant": "plant",
}


def read_ply_vertices(path: str) -> np.ndarray:
    """Minimal PLY vertex reader: returns (N, 3) xyz float32."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_vertex = 0
        props = []  # (name, dtype_char) for the vertex element
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1].decode()
            elif line.startswith(b"element"):
                parts = line.split()
                in_vertex = parts[1] == b"vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif line.startswith(b"property") and in_vertex:
                parts = line.split()
                props.append((parts[-1].decode(), parts[1].decode()))
            elif line == b"end_header":
                break

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
            "uint": "u4", "uint32": "u4",
        }
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n_vertex, dtype=np.float64)
            names = [p[0] for p in props]
            xyz = rows[:, [names.index("x"), names.index("y"), names.index("z")]]
            return xyz.astype(np.float32)
        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported PLY format {fmt}")
        dt = np.dtype([(name, "<" + type_map[t]) for name, t in props])
        data = np.frombuffer(f.read(dt.itemsize * n_vertex), dtype=dt, count=n_vertex)
        return np.stack(
            [data["x"], data["y"], data["z"]], axis=1
        ).astype(np.float32)


def canonical_label(raw: str):
    raw = raw.strip().lower()
    raw = LABEL_ALIASES.get(raw, raw)
    return raw if raw in SCANNET10_CLASSES else None


def extract_scene(scan_dir: str):
    """Yield (class_name, points (M,3)) for each benchmark object in a scene."""
    scan_id = os.path.basename(scan_dir.rstrip("/"))
    ply = os.path.join(scan_dir, f"{scan_id}_vh_clean_2.ply")
    agg = os.path.join(scan_dir, f"{scan_id}.aggregation.json")
    segs = os.path.join(scan_dir, f"{scan_id}_vh_clean_2.0.010000.segs.json")
    if not (os.path.exists(ply) and os.path.exists(agg) and os.path.exists(segs)):
        return
    pts = read_ply_vertices(ply)
    with open(segs) as f:
        seg_indices = np.asarray(json.load(f)["segIndices"])
    with open(agg) as f:
        groups = json.load(f)["segGroups"]

    for g in groups:
        label = canonical_label(g.get("label", ""))
        if label is None:
            continue
        seg_set = set(g["segments"])
        mask = np.isin(seg_indices, list(seg_set))
        obj = pts[mask]
        if obj.shape[0] < 50:  # too sparse to be a usable object
            continue
        yield label, obj


def pack_h5(objects, labels, out_dir: str, split: str, sample_num: int, shard: int = 2048):
    """Sample each object to sample_num points and write h5 shards + list."""
    import h5py

    rng = np.random.default_rng(0)
    os.makedirs(out_dir, exist_ok=True)
    files = []
    for s in range(0, len(objects), shard):
        chunk = objects[s : s + shard]
        data = np.zeros((len(chunk), sample_num, 3), dtype=np.float32)
        for i, obj in enumerate(chunk):
            idx = rng.choice(obj.shape[0], sample_num, replace=obj.shape[0] < sample_num)
            data[i] = obj[idx]
        name = f"{split}_{s // shard}.h5"
        with h5py.File(os.path.join(out_dir, name), "w") as hf:
            hf.create_dataset("data", data=data)
            hf.create_dataset("label", data=np.asarray(labels[s : s + shard], dtype=np.int64))
        files.append(name)
    with open(os.path.join(out_dir, f"{split}_files.txt"), "w") as f:
        f.write("\n".join(files) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", required=True, help="ScanNet scans/ directory")
    ap.add_argument("--output", required=True)
    ap.add_argument("--sample-num", type=int, default=2048)
    ap.add_argument("--test-fraction", type=float, default=0.2)
    ap.add_argument("--to-npy", action="store_true",
                    help="also write the unified train/test_{pts,label}.npy dumps")
    args = ap.parse_args()

    objects, labels = [], []
    scan_dirs = sorted(
        os.path.join(args.scans, d) for d in os.listdir(args.scans)
        if os.path.isdir(os.path.join(args.scans, d))
    )
    for sd in scan_dirs:
        for label, obj in extract_scene(sd) or []:
            objects.append(obj)
            labels.append(SCANNET10_CLASSES.index(label))
    print(f"extracted {len(objects)} objects from {len(scan_dirs)} scenes")

    rng = np.random.default_rng(42)
    order = rng.permutation(len(objects))
    n_test = int(len(objects) * args.test_fraction)
    test_ids, train_ids = order[:n_test], order[n_test:]
    pack_h5([objects[i] for i in train_ids], [labels[i] for i in train_ids],
            args.output, "train", args.sample_num)
    pack_h5([objects[i] for i in test_ids], [labels[i] for i in test_ids],
            args.output, "test", args.sample_num)

    if args.to_npy:
        from sug_tpu.data.datasets import extract_scannet_to_npy

        extract_scannet_to_npy(args.output)


if __name__ == "__main__":
    main()
