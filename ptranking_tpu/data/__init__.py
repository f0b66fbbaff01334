"""Data layer: LETOR parsing, per-query assembly, bucketed padded batching."""

from ptranking_tpu.data.meta import (
    DataMeta,
    get_data_meta,
    get_scaler_setting,
    scale_features,
)
from ptranking_tpu.data.letor import (
    Query,
    group_and_clip,
    load_letor_file,
    np_shuffle_ties_argsort,
    parse_letor_lines,
)
from ptranking_tpu.data.prefetch import (
    initialize_distributed,
    prefetch_to_device,
    shard_for_process,
)
from ptranking_tpu.data.dataset import (
    BucketedDataset,
    make_synthetic_queries,
    random_mask_all_labels,
    random_mask_rele_labels,
)

__all__ = [
    "DataMeta",
    "get_data_meta",
    "get_scaler_setting",
    "scale_features",
    "Query",
    "group_and_clip",
    "load_letor_file",
    "np_shuffle_ties_argsort",
    "parse_letor_lines",
    "BucketedDataset",
    "make_synthetic_queries",
    "random_mask_all_labels",
    "initialize_distributed",
    "prefetch_to_device",
    "shard_for_process",
    "random_mask_rele_labels",
]
