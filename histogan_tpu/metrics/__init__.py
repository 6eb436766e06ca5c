from histogan_tpu.metrics.fid import (  # noqa: F401
    frechet_distance,
    compute_statistics,
    FIDScorer,
)
