from dldkd_tpu.data.bigfile import BigFile, BigFileWriter
from dldkd_tpu.data.ingest import (
    PackedQueries,
    PackedVideos,
    TrainData,
    load_captions,
    pack_query_set,
    pack_train_dataset,
    pack_video_corpus,
    read_dict,
    uniform_feature_sampling,
    l2_normalize_rows,
)
from dldkd_tpu.data.pipeline import TrainLoader, device_prefetch

__all__ = [
    "BigFile",
    "BigFileWriter",
    "PackedQueries",
    "PackedVideos",
    "TrainData",
    "load_captions",
    "pack_query_set",
    "pack_train_dataset",
    "pack_video_corpus",
    "read_dict",
    "uniform_feature_sampling",
    "l2_normalize_rows",
    "TrainLoader",
    "device_prefetch",
]
