#!/usr/bin/env python
"""Offline sub-domain splitter CLI.

CLI parity with the reference dataset_splitter.py:318-352:
    python dataset_splitter.py --pre_trained <orbax_ckpt_dir> --dataset modelnet
    python dataset_splitter.py --pre_trained <ckpt_root> --process_all [--geometric]

--process_all runs the geometric ICP split per dataset (the reference's
process_all branch); otherwise the TSNE+KMeans / entropy feature split runs
on --dataset. Cluster files land in ``<data_root>/<dataset>/<spliter_dir>/``
(default 'spliter'; the train-time loader also accepts 'DGCNN_spliter', the
reference's hard-coded read location).
"""

import argparse
import os

from sug_tpu.data.datasets import DATASET_LIST
from sug_tpu.data.offline_splitter import (
    split_dataset_clusters,
    split_dataset_geometric,
)


def main():
    parser = argparse.ArgumentParser(description="Arg parser")
    parser.add_argument("--pre_trained", type=str, default=None, help="pretrained_model")
    parser.add_argument("--dataset", type=str, default="modelnet")
    parser.add_argument("--process_all", action="store_true", default=False)
    parser.add_argument("--geometric", action="store_true", default=False)
    parser.add_argument("--kl", action="store_true", default=False,
                        help="per-class hierarchical KL clustering of predictions")
    parser.add_argument("--use_hist", action="store_true", default=False)
    parser.add_argument("--cluster_num", type=int, default=4)
    parser.add_argument("--model", type=str, default="Pointnet")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--spliter_dir", type=str, default="spliter")
    args = parser.parse_args()

    if args.process_all:
        for dataset_type in DATASET_LIST:
            if args.geometric:
                split_dataset_geometric(
                    dataset_type, use_hist=args.use_hist,
                    data_root=args.data_root, save_dir=args.spliter_dir,
                )
            else:
                ckpt = (
                    os.path.join(args.pre_trained, dataset_type)
                    if args.pre_trained
                    else None
                )
                split_dataset_clusters(
                    dataset_type, pre_trained=ckpt, cluster_num=args.cluster_num,
                    model_name=args.model, data_root=args.data_root,
                    save_dir=args.spliter_dir,
                )
    elif args.geometric:
        split_dataset_geometric(
            args.dataset, use_hist=args.use_hist,
            data_root=args.data_root, save_dir=args.spliter_dir,
        )
    elif args.kl:
        from sug_tpu.data.offline_splitter import split_dataset_kl

        split_dataset_kl(
            args.dataset, pre_trained=args.pre_trained,
            cluster_num=args.cluster_num, model_name=args.model,
            data_root=args.data_root, save_dir=args.spliter_dir,
        )
    else:
        split_dataset_clusters(
            args.dataset, pre_trained=args.pre_trained,
            cluster_num=args.cluster_num, model_name=args.model,
            data_root=args.data_root, save_dir=args.spliter_dir,
        )


if __name__ == "__main__":
    main()
