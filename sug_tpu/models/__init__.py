from sug_tpu.models.layers import (
    ConvBN,
    FCLayer,
    TransformNet,
    CALayer,
    grad_reverse,
)
from sug_tpu.models.adapt_node import SelfAdaptiveNodeModule
from sug_tpu.models.heads import ClassifierHead, KPConvHead
from sug_tpu.models.pointnet import PointNetGenerator, PointNetClassifier
from sug_tpu.models.dgcnn import DGCNNGenerator, DGCNNClassifier
from sug_tpu.models.pointnet2 import (
    SetAbstraction,
    SetAbstractionMSG,
    FeaturePropagation,
    PointNet2Generator,
    PointNet2Classifier,
    PointNet2MSGSegmenter,
)
from sug_tpu.models.net_mda import NetMDA


def make_classifier(model_name: str, num_class: int = 10):
    """Standalone classifier factory — train_source.py's backbone dispatch
    (reference train_source.py:74-83)."""
    if model_name == "Pointnet":
        return PointNetClassifier(num_class)
    if model_name == "Pointnet2":
        return PointNet2Classifier(num_class)
    if model_name == "DGCNN":
        return DGCNNClassifier(num_class)
    if model_name == "PTran":
        from sug_tpu.models.ptran import PointTransformerClassifier

        return PointTransformerClassifier(num_class)
    if model_name == "KPConv":
        from sug_tpu.models.kpconv import KPConvClassifier

        return KPConvClassifier(num_class)
    raise NotImplementedError(f"Unsupported model name {model_name}")


__all__ = [
    "ConvBN",
    "FCLayer",
    "TransformNet",
    "CALayer",
    "grad_reverse",
    "SelfAdaptiveNodeModule",
    "ClassifierHead",
    "KPConvHead",
    "PointNetGenerator",
    "PointNetClassifier",
    "DGCNNGenerator",
    "DGCNNClassifier",
    "SetAbstraction",
    "SetAbstractionMSG",
    "FeaturePropagation",
    "PointNet2Generator",
    "PointNet2Classifier",
    "PointNet2MSGSegmenter",
    "NetMDA",
    "make_classifier",
]
