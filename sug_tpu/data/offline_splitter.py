"""Offline sub-domain splitter library (behind tools' dataset_splitter.py).

Reference: dataset_splitter.py (352 LoC) — extracts 1024-d mid features with
a pretrained PointNet, clusters them per class (TSNE -> KMeans(4), reordered
by center distance), clusters prediction entropies across classes
(histogram bins), and offers a geometric split (per-class ICP distance to a
random anchor, mean/hist threshold, <=5 retries). Cluster files are written
with the exact reference naming contract
``<method>_<cls>_<k>_<n>[_entropy_<e>].npy`` (+ ``_labels.npy`` for cls=-1)
consumed by the train-time splitter (utils/train_files_spliter.py:165-253).

TPU-native bits: feature extraction is a jitted batched forward; ICP is a
fixed-iteration jax program vmapped over the whole class (the reference loops
open3d ICP per cloud on the host, dataset_splitter.py:215-231).
"""

from __future__ import annotations

import functools
import os
import shutil
from glob import glob
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sug_tpu.data.datasets import (
    NUM_CLASS,
    PointCloudDataset,
    load_dataset_full,
    normalize_pc_np,
    resolve_data_root,
)
from sug_tpu.ops.geometry import farthest_point_sample, square_distance


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------


def extract_features(
    dataset_type: str,
    pre_trained: Optional[str] = None,
    model_name: str = "Pointnet",
    batch_size: int = 64,
    data_root: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched (jitted) extraction of (mid_features (M,1024), logits (M,10))
    with a pretrained standalone classifier — reference
    extract_feature_map_class (dataset_splitter.py:120-148)."""
    from sug_tpu.engine.checkpoint import restore_checkpoint
    from sug_tpu.engine.source_trainer import SourceTrainer

    ds = PointCloudDataset(
        dataset_type,
        *load_dataset_full(dataset_type, "train", data_root),
        aug=False,
        model=model_name,
    )
    trainer = SourceTrainer(model_name=model_name, augment=False)
    state = trainer.init_state(seed=0, batch_size=batch_size, num_points=ds.num_points)
    if pre_trained:
        state = restore_checkpoint(pre_trained, state)["state"]
    else:
        print(
            "WARNING: no --pre_trained checkpoint given; extracting features "
            "with a randomly initialized model (clusters will be weak)."
        )

    @jax.jit
    def fwd(params, batch_stats, data):
        logits, mid = trainer.model.apply(
            {"params": params, "batch_stats": batch_stats}, data, False
        )
        return logits, mid

    mids, logits_list = [], []
    M = len(ds)
    for i in range(0, M, batch_size):
        batch = ds.pts[i : i + batch_size]
        pad = batch_size - batch.shape[0]
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        lg, mid = fwd(state.params, state.batch_stats, jnp.asarray(batch))
        lg, mid = np.asarray(lg), np.asarray(mid)
        if pad:
            lg, mid = lg[:-pad], mid[:-pad]
        logits_list.append(lg[:, :NUM_CLASS])
        mids.append(mid)
    return np.concatenate(mids), np.concatenate(logits_list)


# ---------------------------------------------------------------------------
# clustering
# ---------------------------------------------------------------------------


def reduction_tsne(features: np.ndarray, num_comps: int = 2) -> np.ndarray:
    """TSNE reduction (sklearn) — dataset_splitter.py:180-187. Perplexity is
    clamped for small classes (sklearn requires perplexity < n_samples)."""
    from sklearn.manifold import TSNE

    perplexity = min(30.0, max(float(features.shape[0] - 1) / 3.0, 2.0))
    tsne = TSNE(
        n_components=num_comps, init="pca", random_state=0, method="exact",
        perplexity=perplexity,
    )
    return tsne.fit_transform(features)


def kmeans_cluster_idx_update(labels_, cluster_centers_):
    """Reorder cluster ids by distance to the first center
    (dataset_splitter.py:168-179)."""
    anchor = cluster_centers_[0]
    distances = [np.linalg.norm(anchor - c) for c in cluster_centers_]
    indices = np.argsort(np.array(distances)).squeeze()
    new_labels = np.zeros_like(labels_)
    new_centers = np.zeros_like(cluster_centers_)
    order = indices.tolist()
    for i in range(len(cluster_centers_)):
        new_labels[labels_ == i] = order.index(i)
        new_centers[i] = cluster_centers_[indices[i]]
    return new_labels, new_centers


def kmeans_clustering(
    feature_maps: np.ndarray, cluster_num: int = 4,
    fig_path: Optional[str] = None, cls: Optional[int] = None,
) -> np.ndarray:
    """TSNE(2d) -> KMeans -> center-distance reorder
    (dataset_splitter.py:151-166). When ``fig_path`` is given, writes the
    reference's per-class cluster scatter PNG (its inspection artifact,
    :155,:165 — headless-safe no-op if matplotlib is unavailable)."""
    from sklearn.cluster import KMeans

    reduced = reduction_tsne(feature_maps, num_comps=2)
    km = KMeans(n_clusters=cluster_num, n_init=10).fit(reduced)
    labels, centers = kmeans_cluster_idx_update(km.labels_, km.cluster_centers_)
    if fig_path is not None:
        from sug_tpu.utils.visualization import visualize_feature_scatter

        visualize_feature_scatter(
            reduced, cls=cls, labels_=labels, cluster_centers=centers,
            file_path=fig_path,
        )
    return labels


def cal_probs2entropy(probs: np.ndarray) -> np.ndarray:
    """Per-row Shannon entropy (dataset_splitter.py:233-240)."""
    eps = 1e-30
    return -(probs * np.log(probs + eps)).sum(1)


def entropy_clustering(probs: np.ndarray, cluster_num: int = 4):
    """Histogram clustering of prediction entropies
    (dataset_splitter.py:189-214, the cluster_with_hist branch)."""
    uncertainties = cal_probs2entropy(probs)
    cluster_labels = np.ones(probs.shape[0])
    edges = np.histogram(uncertainties, bins=cluster_num)[1]
    for i in range(cluster_num):
        pos = np.where((uncertainties >= edges[i]) & (uncertainties < edges[i + 1]))
        cluster_labels[pos] = i
    # the max falls on the last edge boundary
    cluster_labels[uncertainties >= edges[-1]] = cluster_num - 1
    return cluster_labels, uncertainties


def kl_clustering(preds: np.ndarray, cluster_num: int = 4) -> np.ndarray:
    """Hierarchical clustering with the symmetric-KL metric
    (dataset_splitter.py:247-249)."""
    from scipy.cluster.hierarchy import fclusterdata
    from scipy.special import kl_div

    metric = lambda x, y: (kl_div(x, y) * 0.5 + kl_div(y, x) * 0.5).sum()
    return fclusterdata(preds, metric=metric, criterion="maxclust", t=cluster_num)


# ---------------------------------------------------------------------------
# geometric (ICP) split
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3))
def _icp_fitness_batch(
    anchor: jax.Array, clouds: jax.Array, iters: int = 15, max_corr: float = 0.15
) -> jax.Array:
    """Point-to-point ICP of ``anchor`` onto each cloud; returns per-cloud
    fitness (inlier fraction). Replaces open3d registration_icp
    (dataset_splitter.py:215-231) with a fixed-iteration batched jax program.
    anchor: (P, 3); clouds: (M, P, 3).
    """

    def single(target):
        def body(_, src):
            d = square_distance(src[None], target[None])[0]  # (P, P)
            nn = jnp.argmin(d, axis=1)
            nnd = jnp.sqrt(jnp.maximum(jnp.min(d, axis=1), 0.0))
            w = (nnd < max_corr).astype(jnp.float32)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            b = target[nn]
            ca = jnp.sum(src * w[:, None], 0) / wsum
            cb = jnp.sum(b * w[:, None], 0) / wsum
            H = ((src - ca) * w[:, None]).T @ (b - cb)
            U, _, Vt = jnp.linalg.svd(H)
            det = jnp.linalg.det(Vt.T @ U.T)
            D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
            R = Vt.T @ D @ U.T
            t = cb - R @ ca
            return src @ R.T + t

        aligned = jax.lax.fori_loop(0, iters, body, anchor)
        d = square_distance(aligned[None], target[None])[0]
        nnd = jnp.sqrt(jnp.maximum(jnp.min(d, axis=1), 0.0))
        return jnp.mean((nnd < max_corr).astype(jnp.float32))

    return jax.vmap(single)(clouds)


def _use_native_pointops() -> bool:
    """The splitter is offline preprocessing: default to the native C++
    FPS/ICP (sug_tpu/native/pointops.cpp) when built, so splitting never
    attaches to the TPU (on the dev box a second TPU process would block the
    trainer). SUG_NATIVE_SPLITTER=0 forces the jax path."""
    if os.environ.get("SUG_NATIVE_SPLITTER", "1") != "1":
        return False
    from sug_tpu import native

    return native.pointops_available()


def icp_distance_batch(anchor: np.ndarray, clouds: np.ndarray) -> np.ndarray:
    """1 - fitness for each cloud (dataset_splitter icp_distance)."""
    if _use_native_pointops():
        from sug_tpu import native

        return 1.0 - native.icp_fitness_native(anchor, clouds)
    return 1.0 - np.asarray(
        _icp_fitness_batch(jnp.asarray(anchor), jnp.asarray(clouds))
    )


def split_dataset_geometric(
    dataset_type: str,
    use_hist: bool = False,
    fps_points: int = 500,
    data_root: Optional[str] = None,
    save_dir: str = "spliter",
    seed: int = 0,
) -> None:
    """Per-class geometric split (dataset_splitter.py:31-84): sort by min x,
    FPS-subsample, ICP-distance to a random anchor, mean/hist threshold,
    retry (<=5) on degenerate splits."""
    rng = np.random.default_rng(seed)
    raw_pts, raw_labels = load_dataset_full(dataset_type, "train", data_root)
    method = "geo_hist" if use_hist else "geometric"

    for cls_index in range(NUM_CLASS):
        cls_pts = raw_pts[raw_labels == cls_index]
        order = np.argsort([p[:, 0].min() for p in cls_pts])
        cls_pts = cls_pts[order]
        M = cls_pts.shape[0]

        normed = normalize_pc_np(np.asarray(cls_pts[..., :3], dtype=np.float32))
        n_fps = min(fps_points, normed.shape[1])
        if _use_native_pointops():
            from sug_tpu import native

            fps_idx = native.fps_native(normed, n_fps)
        else:
            fps_idx = np.asarray(farthest_point_sample(jnp.asarray(normed), n_fps))
        processed = np.take_along_axis(normed, fps_idx[..., None], axis=1)

        cls_cluster_labels = np.ones(M)
        for attempt in range(5):
            anchor_idx = rng.choice(np.arange(max(M // 4, 1), max(M // 2, 2)))
            distance_ = icp_distance_batch(processed[anchor_idx], processed)
            if not use_hist:
                pos = np.where(distance_ < np.mean(distance_))
            else:
                edges = np.histogram(distance_, bins=2)[1]
                pos = np.where(distance_ < edges[1])
            if np.abs(pos[0].shape[0] - 0.5 * M) < 0.4 * M:
                cls_cluster_labels = np.ones(M)
                cls_cluster_labels[pos] = 0
                break
        else:
            print(f"!!!For dataset {dataset_type} and cls {cls_index} cannot find suitable split")
            cls_cluster_labels[pos] = 0

        spliter_cls_data(
            pts_all=np.array(cls_pts), cluster_labels=cls_cluster_labels,
            cls=cls_index, method=method, dataset_type=dataset_type,
            data_root=data_root, save_dir=save_dir,
        )


# ---------------------------------------------------------------------------
# saving
# ---------------------------------------------------------------------------


def spliter_cls_data(
    pts_all: np.ndarray,
    cluster_labels: np.ndarray,
    cls: int,
    method: str,
    dataset_type: str,
    raw_labels: Optional[np.ndarray] = None,
    cls_entropy: Optional[np.ndarray] = None,
    data_root: Optional[str] = None,
    save_dir: str = "spliter",
) -> None:
    """Save per-cluster npy files with the reference naming contract
    (dataset_splitter.py:252-290)."""
    assert pts_all.shape[0] == cluster_labels.shape[0]
    if cls == -1 and raw_labels is None:
        raise RuntimeError("When process all cls, label infos need to be added")

    save_path = os.path.join(resolve_data_root(data_root), dataset_type, save_dir)
    os.makedirs(save_path, exist_ok=True)
    # stale-file cleanup is restricted to the cluster .npy contract — the
    # kmeans_<cls>_clsuter.png inspection artifact also matches this prefix
    for f in glob(os.path.join(save_path, f"{method}_{cls}*.npy")):
        os.remove(f)

    for k in range(len(set(cluster_labels.tolist()))):
        sel = cluster_labels == k
        cluster_pts = pts_all[sel]
        base = f"{method}_{cls}_{k}_{cluster_pts.shape[0]}"
        stem = base
        if cls_entropy is not None:
            stem += f"_entropy_{np.median(cls_entropy[sel]).tolist()}"
        np.save(os.path.join(save_path, stem + ".npy"), cluster_pts)
        print(f"Save Class {cls} Cluster {k} ({cluster_pts.shape[0]}) -> {stem}.npy")
        if cls == -1:
            # label sidecar keeps the NON-entropy stem: the train-time reader
            # reconstructs it by stripping "_entropy..." from the cluster
            # file name (utils/train_files_spliter.py:311)
            np.save(
                os.path.join(save_path, base + "_labels.npy"), raw_labels[sel]
            )


def split_dataset_kl(
    dataset_type: str,
    pre_trained: Optional[str] = None,
    cluster_num: int = 4,
    model_name: str = "Pointnet",
    data_root: Optional[str] = None,
    save_dir: str = "spliter",
) -> None:
    """Per-class hierarchical KL clustering of softmax predictions
    (the reference ships kl_clustering, dataset_splitter.py:247-249, but no
    driver for it — this wires it into the same cluster-file contract,
    method name 'kl', consumable via DATASET_SPLITTER.METHOD: KL)."""
    _, logits = extract_features(dataset_type, pre_trained, model_name, data_root=data_root)
    raw_pts, raw_labels = load_dataset_full(dataset_type, "train", data_root)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    for i in range(NUM_CLASS):
        sel = raw_labels == i
        if sel.sum() < cluster_num:
            continue
        clusters = kl_clustering(probs[sel], cluster_num) - 1  # fcluster ids are 1-based
        spliter_cls_data(
            pts_all=raw_pts[sel], cluster_labels=clusters.astype(float), cls=i,
            method="kl", dataset_type=dataset_type,
            data_root=data_root, save_dir=save_dir,
        )


def split_dataset_clusters(
    dataset_type: str,
    pre_trained: Optional[str] = None,
    cluster_num: int = 4,
    model_name: str = "Pointnet",
    data_root: Optional[str] = None,
    save_dir: str = "spliter",
) -> None:
    """Feature/cluster split path (dataset_splitter.py:87-118): per-class
    TSNE+KMeans on mid features + cross-class entropy clustering."""
    save_path = os.path.join(resolve_data_root(data_root), dataset_type, save_dir)
    if os.path.exists(save_path):
        shutil.rmtree(save_path, ignore_errors=True)
        print("Remove the old folder")

    mids, logits = extract_features(
        dataset_type, pre_trained, model_name, data_root=data_root
    )
    raw_pts, raw_labels = load_dataset_full(dataset_type, "train", data_root)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    cluster_labels_entropy, entropys = entropy_clustering(probs, cluster_num)

    for i in range(NUM_CLASS):
        sel = raw_labels == i
        if sel.sum() < cluster_num:
            continue
        # same inspection-artifact name as the reference (its misspelling
        # included, dataset_splitter.py:155)
        cluster_cls = kmeans_clustering(
            mids[sel], cluster_num,
            fig_path=os.path.join(save_path, f"kmeans_{i}_clsuter.png"), cls=i,
        )
        spliter_cls_data(
            pts_all=raw_pts[sel], cluster_labels=cluster_cls, cls=i,
            method="kmeans", dataset_type=dataset_type,
            cls_entropy=entropys[sel], data_root=data_root, save_dir=save_dir,
        )
    spliter_cls_data(
        pts_all=raw_pts, cluster_labels=cluster_labels_entropy, cls=-1,
        method="entropy", dataset_type=dataset_type, raw_labels=raw_labels,
        cls_entropy=entropys, data_root=data_root, save_dir=save_dir,
    )
