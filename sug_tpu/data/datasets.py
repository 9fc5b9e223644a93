"""PointDA-10 dataset ingest.

On-disk contract identical to the reference (utils/train_files_spliter.py:
140-149): ``<data_root>/<dataset>/{train,test}_pts.npy`` + ``_label.npy``
unified dumps; ``<data_root>/<dataset>/DGCNN_spliter/*.npy`` offline
sub-domain clusters; ``.pkl`` random-split index caches next to the dumps.

TPU-first pipeline design: everything shape-normalizing happens ONCE at
ingest (normalize + optional fixed x-rotation + pad/subsample to N=1024,
vectorized numpy) producing one contiguous (M, 1024, 3) float32 array; the
per-step augmentation (z-rotation + jitter) runs on-device inside the jitted
train step. This replaces the reference's per-item numpy ``__getitem__`` in
DataLoader worker processes (data/dataloader.py:302-327).

Parity note: the reference zero-pads AFTER jitter so pad points stay exactly
zero; here padding happens at ingest so pad points receive jitter too —
a sub-1e-2 perturbation on the rare short clouds (scannet), distributionally
irrelevant.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np

DATASET_LIST = ["scannet", "shapenet", "modelnet"]
NUM_CLASS = 10
DEFAULT_NUM_POINTS = 1024


def resolve_data_root(cfg_or_path=None) -> str:
    """Resolution order: explicit arg / cfg DATA_ROOT -> $SUG_DATA_ROOT ->
    ./data/PointDA_data."""
    if isinstance(cfg_or_path, str):
        return cfg_or_path
    if cfg_or_path is not None and "DATA_ROOT" in cfg_or_path:
        return cfg_or_path["DATA_ROOT"]
    return os.environ.get("SUG_DATA_ROOT", os.path.join("data", "PointDA_data"))


def load_dataset_full(
    dataset_type: str, status: str = "train", data_root: Optional[str] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Load the unified per-dataset dump (reference
    utils/train_files_spliter.py:140-149)."""
    root = resolve_data_root(data_root)
    pts = np.load(os.path.join(root, dataset_type, f"{status}_pts.npy"))
    labels = np.load(os.path.join(root, dataset_type, f"{status}_label.npy"))
    return pts, labels


def normalize_pc_np(pc: np.ndarray) -> np.ndarray:
    """Vectorized (M, N, 3) center + max-norm scale (data/data_utils.py:5-15)."""
    pc = pc - pc.mean(axis=-2, keepdims=True)
    max_norm = np.sqrt((pc**2).sum(-1)).max(axis=-1)[..., None, None]
    return pc / np.maximum(max_norm, 1e-12)


def _rot_x_np(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)


def fit_num_points(
    pts: np.ndarray, num_points: int, rng: np.random.Generator
) -> np.ndarray:
    """Pad with zeros / random-subsample each cloud to exactly num_points
    (reference data/dataloader.py:316-326, done per-item there)."""
    M, N, C = pts.shape
    if N == num_points:
        return pts
    if N < num_points:
        pad = np.zeros((M, num_points - N, C), dtype=pts.dtype)
        return np.concatenate([pts, pad], axis=1)
    idx = np.stack([rng.permutation(N)[:num_points] for _ in range(M)])
    return np.take_along_axis(pts, idx[..., None], axis=1)


class PointCloudDataset:
    """In-memory dataset over (pts, labels) arrays — the reference's
    UnifiedPointDG (data/dataloader.py:244-330) redesigned for batched device
    feeding: holds a single (M, num_points, 3) float32 array, ready to slice.

    ``fixed_x_rotation``: the -pi/2 x-rotation applied to non-modelnet data
    under DGCNN (data/dataloader.py:308-310).
    """

    def __init__(
        self,
        dataset_type: str,
        pts: np.ndarray,
        labels: np.ndarray,
        status: str = "train",
        num_points: int = DEFAULT_NUM_POINTS,
        aug: bool = True,
        model: str = "Pointnet",
        seed: int = 666,
        fixed_x_rotation: Optional[bool] = None,
    ):
        assert pts.shape[0] == labels.shape[0], "pts/label count mismatch"
        self.dataset_type = dataset_type
        self.status = status
        self.num_points = num_points
        self.aug = aug  # consumed by the trainer: gates on-device augmentation
        self.model = model

        rng = np.random.default_rng(seed)
        pts = np.asarray(pts, dtype=np.float32)[..., :3]
        pts = normalize_pc_np(pts)
        # the reference's fixed -pi/2 x-rotation for non-modelnet data under
        # DGCNN (data/dataloader.py:308-310). ``fixed_x_rotation`` overrides
        # the auto rule (None): the rotation aligns the real PointDA exports
        # but MISaligns already-aligned data (e.g. the synthetic tree) —
        # set DATASET.FIXED_X_ROTATION: False in the config to disable.
        if fixed_x_rotation is None:
            fixed_x_rotation = dataset_type != "modelnet" and model == "DGCNN"
        if fixed_x_rotation:
            pts = (pts @ _rot_x_np(-np.pi / 2)).astype(np.float32)
        pts = fit_num_points(pts, num_points, rng)

        self.pts = np.ascontiguousarray(pts, dtype=np.float32)
        self.labels = np.asarray(labels, dtype=np.int32).reshape(-1)

        self.class_num = NUM_CLASS
        self.indices = [
            np.nonzero(self.labels == c)[0].tolist() for c in range(self.class_num)
        ]
        self.cls_num_counter = [len(ix) for ix in self.indices]

    def __len__(self) -> int:
        return self.pts.shape[0]

    def classes(self):
        return self.indices

    def cls_wights(self, weighting: str = "number_inverse", q_=None):
        """Class-weight vector for focal/ClassWeighting losses — reference
        UnifiedPointDG.cls_wights (data/dataloader.py:272-300), incl. the
        [sic] method name for drop-in familiarity."""
        from sug_tpu.losses.classification import class_weights

        return class_weights(
            self.cls_num_counter,
            weighting,
            q=q_,
            adaptive_q=isinstance(q_, str),
        )


def create_single_dataset(
    dataset_type: str,
    status: str = "test",
    aug: bool = False,
    pc_num: int = DEFAULT_NUM_POINTS,
    model: str = "Pointnet",
    data_root: Optional[str] = None,
    fixed_x_rotation: Optional[bool] = None,
) -> PointCloudDataset:
    """Full-dataset factory (reference data/dataloader.py:350-356)."""
    assert dataset_type in DATASET_LIST, f"Not supported dataset {dataset_type}!"
    pts, labels = load_dataset_full(dataset_type, status, data_root)
    assert len(set(labels.tolist())) == NUM_CLASS, "The class in labels is less than 10!"
    return PointCloudDataset(
        dataset_type, pts, labels, status=status, num_points=pc_num, aug=aug,
        model=model, fixed_x_rotation=fixed_x_rotation,
    )


def create_splitted_dataset(
    dataset_type: str,
    status: str = "train",
    config=None,
    logger=None,
    pc_num: int = DEFAULT_NUM_POINTS,
    aug: bool = True,
    model: str = "Pointnet",
    data_root: Optional[str] = None,
    fixed_x_rotation: Optional[bool] = None,
):
    """Sub-domain pair factory (reference data/dataloader.py:334-347):
    runs the train-time splitter and wraps both subsets."""
    from sug_tpu.data.splitter import split_dataset

    assert dataset_type in DATASET_LIST, f"Not supported dataset {dataset_type}!"
    spliter = split_dataset(
        dataset_type, split_config=config, logger=logger, status=status, data_root=data_root
    )
    subsets = []
    for name in spliter:
        subsets.append(
            PointCloudDataset(
                dataset_type,
                spliter[name]["pts"],
                spliter[name]["label"],
                status=status,
                num_points=pc_num,
                aug=aug,
                model=model,
                fixed_x_rotation=fixed_x_rotation,
            )
        )
    return subsets


# ---------------------------------------------------------------------------
# Synthetic PointDA-like data (tests / smoke training)
# ---------------------------------------------------------------------------


def _scan_degrade(pc: np.ndarray, rng: np.random.Generator,
                  partial_view: float, occlusion: float,
                  density_grad: float) -> np.ndarray:
    """Scan-realism degradations for the synthetic benchmark (the failure
    modes real PointDA-10 scannet objects exhibit — single-viewpoint
    crops, occluded patches, nonuniform density — so transfer A/Bs stress
    what real data will):

    - partial_view: keep only the ``1-partial_view`` fraction of points
      nearest a random camera direction (self-occlusion half-space crop);
    - occlusion: delete the ``occlusion`` fraction around a random surface
      point (an occluder blob);
    - density_grad: thin points with probability decaying along a random
      axis (scanner falloff), strength = the exp rate.

    The survivors are resampled WITH replacement back to the original count
    (real scannet ingest pads short clouds by duplication,
    reference data/dataloader.py:207-217)."""
    n = pc.shape[0]
    keep = np.ones(n, dtype=bool)
    if partial_view > 0:
        d = rng.normal(size=3)
        d /= np.linalg.norm(d) + 1e-9
        proj = pc @ d
        keep &= proj >= np.quantile(proj, partial_view)
    if occlusion > 0:
        center = pc[rng.integers(0, n)]
        dist = np.linalg.norm(pc - center, axis=1)
        k = int(occlusion * n)
        if k > 0:
            keep[np.argsort(dist)[:k]] = False
    if density_grad > 0:
        d = rng.normal(size=3)
        d /= np.linalg.norm(d) + 1e-9
        proj = pc @ d
        span = proj.max() - proj.min() + 1e-9
        p = np.exp(-density_grad * (proj - proj.min()) / span)
        keep &= rng.uniform(size=n) < p
    if keep.sum() < 16:  # degenerate crop — keep the original
        return pc
    survivors = pc[keep]
    idx = rng.integers(0, survivors.shape[0], n)
    return survivors[idx]


def make_synthetic_pointda(
    num_per_class: int = 24,
    num_points: int = DEFAULT_NUM_POINTS,
    num_class: int = NUM_CLASS,
    seed: int = 0,
    noise: float = 0.02,
    partial_view: float = 0.0,
    occlusion: float = 0.0,
    density_grad: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """10 geometrically distinguishable classes (spheres, cubes, cylinders,
    cones, tori, planes, ... parameterized by class index) for smoke
    training — stands in for PointDA-10 where real data is unavailable.
    ``partial_view``/``occlusion``/``density_grad`` add scan-realism domain
    shift (_scan_degrade)."""
    rng = np.random.default_rng(seed)
    clouds, labels = [], []
    for c in range(num_class):
        for _ in range(num_per_class):
            u = rng.uniform(0, 2 * np.pi, num_points)
            v = rng.uniform(-1, 1, num_points)
            # vary SHAPE RATIOS per class (aspect, apex angle, tube radius):
            # pure scale differences would be erased by the ingest
            # normalization, leaving paired classes indistinguishable.
            t = c / num_class
            if c % 5 == 0:  # ellipsoid, elongation varies
                e = 0.3 + 1.4 * t
                phi = np.arccos(v)
                pc = np.stack(
                    [np.sin(phi) * np.cos(u), np.sin(phi) * np.sin(u), e * np.cos(phi)],
                    axis=1,
                )
            elif c % 5 == 1:  # cylinder, height/radius ratio varies
                h = 0.4 + t
                pc = np.stack([np.cos(u), np.sin(u), h * v], axis=1)
            elif c % 5 == 2:  # cuboid shell, aspect varies
                pc = rng.uniform(-1, 1, (num_points, 3))
                axis = rng.integers(0, 3, num_points)
                sign = rng.choice([-1.0, 1.0], num_points)
                pc[np.arange(num_points), axis] = sign
                pc[:, 2] *= 0.4 + 1.2 * t
            elif c % 5 == 3:  # cone, apex angle varies
                z = rng.uniform(0, 1, num_points)
                r = (1 - z) * (0.3 + t)
                pc = np.stack([r * np.cos(u), r * np.sin(u), z], axis=1)
            else:  # torus, tube radius varies
                rt = 0.15 + 0.3 * t
                pc = np.stack(
                    [
                        (1 + rt * np.cos(v * np.pi)) * np.cos(u),
                        (1 + rt * np.cos(v * np.pi)) * np.sin(u),
                        rt * np.sin(v * np.pi),
                    ],
                    axis=1,
                )
            if partial_view > 0 or occlusion > 0 or density_grad > 0:
                pc = _scan_degrade(pc, rng, partial_view, occlusion, density_grad)
            pc = pc + rng.normal(0, noise, pc.shape)
            clouds.append(pc.astype(np.float32))
            labels.append(c)
    order = rng.permutation(len(clouds))
    return np.stack(clouds)[order], np.array(labels, dtype=np.int64)[order]


# ---------------------------------------------------------------------------
# One-time dump builders (reference utils/train_files_spliter.py:322-379)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# legacy per-file dataset loaders (reference data/dataloader.py:99-241 —
# Modelnet40_data / Shapenet_data / Scannet_data_h5, used by train_uda /
# train_source before the unified dumps existed). Each returns raw
# (list_of_clouds, labels) ready for PointCloudDataset.
# ---------------------------------------------------------------------------


def load_modelnet_files(pc_root: str, status: str = "train", pc_input_num: int = 1024):
    """Per-file npy tree: <root>/<class>/<split>/*.npy (reference
    Modelnet40_data)."""
    categories = sorted(
        c.split(os.path.sep)[-1]
        for c in glob.glob(os.path.join(pc_root, "*"))
        if os.path.isdir(c)
    )
    files = sorted(glob.glob(os.path.join(pc_root, "*", status, "*.npy")))
    pts, labels = [], []
    for f in files:
        pc = np.load(f)[:pc_input_num].astype(np.float32)
        if pc.shape[0] < pc_input_num:
            pad = np.zeros((pc_input_num - pc.shape[0], pc.shape[1]), np.float32)
            pc = np.concatenate([pc, pad], 0)
        pts.append(pc[:, :3])
        labels.append(categories.index(f.split(os.path.sep)[-3]))
    return np.stack(pts), np.asarray(labels, dtype=np.int64)


def load_shapenet_files(
    pc_root: str, status: str = "train", pc_input_num: int = 1024, data_type: str = "*.npy"
):
    """Per-file npy/pts tree (reference Shapenet_data, incl. the .pts text
    parser and zero-padding)."""
    categories = sorted(
        c.split(os.path.sep)[-1]
        for c in glob.glob(os.path.join(pc_root, "*"))
        if os.path.isdir(c)
    )
    files = sorted(glob.glob(os.path.join(pc_root, "*", status, data_type)))
    pts, labels = [], []
    for f in files:
        if data_type == "*.pts":
            rows = [
                [float(v) for v in line.split(" ")]
                for line in open(f)
                if len(line.split(" ")) == 3
            ]
            pc = np.asarray(rows, dtype=np.float32)[:pc_input_num]
        else:
            pc = np.load(f)[:pc_input_num].astype(np.float32)
        if pc.shape[0] < pc_input_num:
            pad = np.zeros((pc_input_num - pc.shape[0], pc.shape[1]), np.float32)
            pc = np.concatenate([pc, pad], 0)
        pts.append(pc[:, :3])
        labels.append(categories.index(f.split(os.path.sep)[-3]))
    return np.stack(pts), np.asarray(labels, dtype=np.int64)


def load_scannet_h5(pc_root: str, status: str = "train"):
    """h5 shards listed in {split}_files.txt (reference Scannet_data_h5)."""
    import h5py

    with open(os.path.join(pc_root, f"{status}_files.txt")) as f:
        files = [os.path.join(pc_root, line.rstrip().split("/")[-1]) for line in f]
    points, labels = [], []
    for pth in files:
        with h5py.File(pth, "r") as hf:
            points.append(hf["data"][:])
            labels.append(hf["label"][:])
    return np.concatenate(points, 0), np.concatenate(labels, 0)


def rename_npy_files(data_path: str, start_counter: int = 500000) -> None:
    """Re-number per-file npy dumps to avoid index collisions (reference
    utils/train_files_spliter.py:382-400, used for ShapeNet/plant)."""
    counter = start_counter
    for split in ("train", "test"):
        full = os.path.join(data_path, split)
        if not os.path.isdir(full):
            continue
        for name in sorted(os.listdir(full)):
            if not name.endswith(".npy"):
                continue
            old = os.path.join(full, name)
            pts = np.load(old)
            np.save(os.path.join(full, f"{counter}.npy"), pts)
            os.remove(old)
            counter += 1


def extract_scannet_to_npy(scannet_path: str) -> None:
    """h5 shards listed in {train,test}_files.txt -> unified npy dumps."""
    import h5py

    for split in ("train", "test"):
        with open(os.path.join(scannet_path, f"{split}_files.txt")) as f:
            files = [
                os.path.join(scannet_path, line.rstrip().split("/")[-1]) for line in f
            ]
        points, labels = [], []
        for pth in files:
            with h5py.File(pth, "r") as hf:
                points.append(hf["data"][:])
                labels.append(hf["label"][:])
        data = np.concatenate(points, axis=0)
        label = np.concatenate(labels, axis=0)
        assert data.shape[0] == label.shape[0]
        np.save(os.path.join(scannet_path, f"{split}_pts.npy"), data)
        np.save(os.path.join(scannet_path, f"{split}_label.npy"), label)


def extract_shapenet_to_npy(shapenet_path: str) -> None:
    """Per-file category tree (<cls>/<split>/*.npy) -> unified npy dumps."""
    for split in ("train", "test"):
        categories = sorted(
            c.split(os.path.sep)[-1] for c in glob.glob(os.path.join(shapenet_path, "*"))
            if os.path.isdir(c)
        )
        pts_files = sorted(glob.glob(os.path.join(shapenet_path, "*", split, "*.npy")))
        points, labels = [], []
        for pf in pts_files:
            points.append(np.load(pf))
            cls_name = pf.split(os.path.sep)[-3]
            labels.append(categories.index(cls_name))
        data = np.array(points)
        label = np.array(labels)
        assert data.shape[0] == label.shape[0]
        np.save(os.path.join(shapenet_path, f"{split}_pts.npy"), data)
        np.save(os.path.join(shapenet_path, f"{split}_label.npy"), label)


def extract_modelnet_to_npy(modelnet_path: str) -> None:
    extract_shapenet_to_npy(modelnet_path)
