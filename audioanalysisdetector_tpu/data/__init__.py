"""Data pipeline (L2): ingestion, chunking, balancing, augmentation, feed."""

from audioanalysisdetector_tpu.data.augment import (
    AUG_CODES,
    add_noise,
    apply_augmentations,
    pitch_shift,
    resample_to,
    spec_augment,
    time_shift,
    time_stretch,
)
from audioanalysisdetector_tpu.data.bucketing import (
    bucket_for,
    bucketed_batches,
    make_bucket_ladder,
)
from audioanalysisdetector_tpu.data.balance import (
    add_data_augmentation,
    balance_downsample,
    balance_upsample,
    filtr_nan,
)
from audioanalysisdetector_tpu.data.dataset import (
    chunk_rows,
    prepare_dataframe,
    prepare_dirs_dataset,
)
from audioanalysisdetector_tpu.data.metadata import (
    detect_columns,
    prepare_filepaths,
    read_metadata,
)
from audioanalysisdetector_tpu.data.pipeline import (
    default_extractors,
    extract_feature_array,
    extract_features,
)
from audioanalysisdetector_tpu.data.scaler import (
    FrameScaler,
    prepare_train_test_data,
    prepare_train_test_data_multi,
)
from audioanalysisdetector_tpu.data.shape_utils import (
    build_X_from_df,
    prepare_data_gmm_bilstm,
    to_array_safe,
)

__all__ = [
    "AUG_CODES",
    "FrameScaler",
    "add_data_augmentation",
    "add_noise",
    "apply_augmentations",
    "balance_downsample",
    "balance_upsample",
    "bucket_for",
    "build_X_from_df",
    "prepare_data_gmm_bilstm",
    "to_array_safe",
    "bucketed_batches",
    "make_bucket_ladder",
    "chunk_rows",
    "default_extractors",
    "detect_columns",
    "extract_feature_array",
    "extract_features",
    "filtr_nan",
    "pitch_shift",
    "prepare_dataframe",
    "prepare_dirs_dataset",
    "prepare_filepaths",
    "prepare_train_test_data",
    "prepare_train_test_data_multi",
    "read_metadata",
    "resample_to",
    "spec_augment",
    "time_shift",
    "time_stretch",
]
