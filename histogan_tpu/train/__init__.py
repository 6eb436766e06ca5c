from histogan_tpu.train.state import HistoGANState  # noqa: F401
from histogan_tpu.train.trainer import Trainer, NanException  # noqa: F401
