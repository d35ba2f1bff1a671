from sequoia_tpu.data.dataset import (  # noqa: F401
    FeatureDataset, BatchLoader, filter_no_features, prefetch)
from sequoia_tpu.data.splits import patient_kfold, patient_split  # noqa: F401
