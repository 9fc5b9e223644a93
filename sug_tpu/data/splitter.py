"""Train-time sub-domain splitter.

Splits ONE source dataset into two sub-domains for the MSA alignment.
File-contract parity with the reference (utils/train_files_spliter.py:20-126):

- Random / RandomAblation: index split with .pkl caching under
  ``<data_root>/<dataset>/size_{usage}{METHOD}_{RATE}[_{TAG}].pkl``; keys
  'index1'/'index2'; SUBSET_FULLSIZE makes subset_2 the full dataset.
- Cluster / Entropy / Geo_hist / Geometric (+Ablation variants): load the
  offline splitter's ``<data_root>/<dataset>/DGCNN_spliter/<method>_<cls>_*.npy``
  cluster files (written by tools/dataset_splitter.py).
"""

from __future__ import annotations

import datetime
import glob
import os
import pickle
import random
from typing import Dict, List, Optional

import numpy as np

from sug_tpu.data.datasets import NUM_CLASS, load_dataset_full, resolve_data_root


def _index_cache_name(split_config) -> str:
    subset_2_size = 1 if split_config["SUBSET_FULLSIZE"] else 0.5
    size_usage = split_config["SAMPLE_RATE"] + subset_2_size
    tag = split_config.get("EXTRA_TAG", None)
    if split_config.get("FILE", None):
        return split_config["FILE"]
    stem = f"size_{size_usage}{split_config['METHOD']}_{split_config['SAMPLE_RATE']}"
    if tag and tag != "Datetime":
        return f"{stem}_{tag}.pkl"
    if tag == "Datetime":
        return f"{stem}_{datetime.datetime.now()}.pkl"
    return f"{stem}.pkl"


def _pack(pts1, lbl1, pts2, lbl2) -> Dict:
    return {
        "subset_1": {"pts": np.asarray(pts1), "label": np.asarray(lbl1)},
        "subset_2": {"pts": np.asarray(pts2), "label": np.asarray(lbl2)},
    }


def split_dataset(
    dataset_type: str,
    split_config,
    logger=None,
    status: str = "train",
    data_root: Optional[str] = None,
) -> Dict:
    """Dispatch on METHOD; returns {'subset_1': {pts,label}, 'subset_2': ...}."""
    root = resolve_data_root(data_root)
    dataset_path = os.path.join(root, dataset_type)
    full_pts, full_label = load_dataset_full(dataset_type, status, root)
    assert full_pts.shape[0] == full_label.shape[0]

    index_file_storage = os.path.join(dataset_path, _index_cache_name(split_config))
    if os.path.exists(index_file_storage) and split_config.get("RELOAD", False):
        if logger:
            logger.info(f"Direct load the indexing history from {index_file_storage}")
        with open(index_file_storage, "rb") as f:
            indexs = pickle.load(f)
        i1, i2 = indexs["index1"], indexs["index2"]
        return _pack(full_pts[i1], full_label[i1], full_pts[i2], full_label[i2])

    method = split_config["METHOD"]
    if "Random" in method:
        dataset_size = full_pts.shape[0]
        if method == "RandomAblation":
            # quarter-size per-class bootstrap subsample
            # (utils/train_files_spliter.py:57-63,129-137)
            ratio = 4
            dataset_size = dataset_size // ratio - 1
            pts_list, lbl_list = [], []
            for c in range(NUM_CLASS):
                mask = full_label == c
                cls_pts, cls_lbl = full_pts[mask], full_label[mask]
                n = len(cls_pts)
                take = np.random.randint(0, n, n // ratio)
                pts_list.append(cls_pts[take])
                lbl_list.append(cls_lbl[take])
            full_pts = np.concatenate(pts_list)
            full_label = np.concatenate(lbl_list)

        index_array = np.arange(dataset_size)
        subset_size = int(dataset_size * split_config["SAMPLE_RATE"])
        index_subset_1 = np.random.choice(index_array, replace=False, size=subset_size)
        if not split_config["SUBSET_FULLSIZE"]:
            index_subset_2 = np.setdiff1d(index_array, index_subset_1)
        else:
            index_subset_2 = index_array

        with open(index_file_storage, "wb") as f:
            pickle.dump({"index2": index_subset_2, "index1": index_subset_1}, f)
        if logger:
            logger.info(f"Save indexing history to {index_file_storage}")
        return _pack(
            full_pts[index_subset_1],
            full_label[index_subset_1],
            full_pts[index_subset_2],
            full_label[index_subset_2],
        )

    method_map = {
        "Cluster": ("kmeans", False),
        "KL": ("kl", False),
        "Entropy": ("entropy", False),
        "Geo_hist": ("geo_hist", False),
        "Geometric": ("geometric", False),
        "GeometricAblation": ("geometric", True),
        "ClusterAblation": ("kmeans", True),
        "EntropyAblation": ("entropy", True),
    }
    if method not in method_map:
        raise NotImplementedError(f"Unsupported split method {method}")
    m, ablation = method_map[method]
    return _load_from_offline_splitter(
        dataset_path, split_config, method=m, ablation=ablation
    )


def _cluster_files(spliter_path: str, method: str, cls: int) -> List[str]:
    files = glob.glob(os.path.join(spliter_path, f"{method}_{cls}_*.npy"))
    return sorted(f for f in files if "_label" not in f)


def _load_npy_list(files: List[str]) -> List:
    out: List = []
    for f in files:
        out.extend(np.load(f))
    return out


def _load_pts_labels(files: List[str], cls: int):
    pts = np.array(_load_npy_list(files))
    if cls != -1:
        labels = (np.ones(pts.shape[0]) * cls).tolist()
    else:
        # strip the entropy suffix from the BASENAME only (the directory path
        # may legitimately contain "_entropy")
        label_files = [
            os.path.join(
                os.path.dirname(f),
                os.path.basename(f).split("_entropy")[0] + "_labels.npy",
            )
            for f in files
        ]
        labels = _load_npy_list(label_files)
    return pts.tolist(), labels


def _load_from_offline_splitter(
    dataset_path: str, spliter_config, method: str = "kmeans", ablation: bool = False
) -> Dict:
    """Consume the offline splitter's cluster npy files
    (utils/train_files_spliter.py:165-253)."""
    # the reference's offline tool writes to 'spliter' but its train-time
    # loader reads the hard-coded 'DGCNN_spliter' (SURVEY.md §2.7) — accept
    # both, preferring the reference read location when it exists
    spliter_path = os.path.join(dataset_path, "DGCNN_spliter")
    if not os.path.exists(spliter_path):
        alt = os.path.join(dataset_path, "spliter")
        if os.path.exists(alt):
            spliter_path = alt
        else:
            raise RuntimeError(
                "No Spliter Folder Found, Need to Generate Dataset Cluster First! "
                f"(expected {spliter_path} or {alt}; run dataset_splitter.py)"
            )

    s1_pts, s1_lbl, s2_pts, s2_lbl = [], [], [], []

    if ablation:
        if method == "entropy":
            files = _cluster_files(spliter_path, "entropy", -1)
            pts_ = np.array(_load_npy_list(files[:1]))
            lbl_files = [f.split("_entropy")[0] + "_labels.npy" for f in files[:1]]
            labels_ = np.array(_load_npy_list(lbl_files))
            index_array = np.arange(pts_.shape[0])
            i1 = np.random.choice(index_array, replace=False, size=pts_.shape[0] // 2)
            i2 = np.setdiff1d(index_array, i1)
            return _pack(pts_[i1], labels_[i1], pts_[i2], labels_[i2])
        for c in range(NUM_CLASS):
            files = _cluster_files(spliter_path, method, c)
            choice = np.random.randint(len(files))
            pts, lbl = _load_pts_labels(files[choice : choice + 1], cls=c)
            if "geo" in method:
                half = len(pts) // 2
                pts, lbl = pts[:half], lbl[:half]
            half = len(pts) // 2
            s1_pts.extend(pts[:half])
            s1_lbl.extend(lbl[:half])
            s2_pts.extend(pts[half:-1])
            s2_lbl.extend(lbl[half:-1])
        return _pack(s1_pts, s1_lbl, s2_pts, s2_lbl)

    if "kmeans" in method or "geo" in method or method == "kl":
        cluster_num = len(_cluster_files(spliter_path, method, 1))
        subset_1_cluster = int(cluster_num * spliter_config["SAMPLE_RATE"])
        sample_method = spliter_config.get("MERGE_CLUSTER_METHOD", "random")
        for c in range(NUM_CLASS):
            files = _cluster_files(spliter_path, method, c)
            if sample_method == "Entropy":
                files.sort(
                    key=lambda f: float(f.split("_entropy_")[-1].split(".npy")[0])
                )
            else:
                random.shuffle(files)
            sub1 = files[:subset_1_cluster]
            sub2 = files if spliter_config["SUBSET_FULLSIZE"] else files[subset_1_cluster:]
            p1, l1 = _load_pts_labels(sub1, cls=c)
            p2, l2 = _load_pts_labels(sub2, cls=c)
            s1_pts.extend(p1)
            s1_lbl.extend(l1)
            s2_pts.extend(p2)
            s2_lbl.extend(l2)
        return _pack(s1_pts, s1_lbl, s2_pts, s2_lbl)

    if method == "entropy":
        files = _cluster_files(spliter_path, "entropy", -1)
        cluster_num = len(files)
        if cluster_num == 4:
            choice_list = [[0], [1, 2, 3]]
        elif cluster_num == 2:
            choice_list = [[0], [1]]
        else:
            raise RuntimeError("The size of entropy cluster is wrong")
        sub1 = [files[i] for i in choice_list[0]]
        sub2 = [files[i] for i in choice_list[1]]
        s1_pts, s1_lbl = _load_pts_labels(sub1, cls=-1)
        s2_pts, s2_lbl = _load_pts_labels(sub2, cls=-1)
        return _pack(s1_pts, s1_lbl, s2_pts, s2_lbl)

    raise NotImplementedError(method)
