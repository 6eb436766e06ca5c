from histogan_tpu.data.dataset import (  # noqa: F401
    ImageFolderDataset,
    HistogramPool,
    TrainLoader,
)
