from histogan_tpu.metrics.fid import (  # noqa: F401
    frechet_distance,
    compute_statistics,
    FIDScorer,
    inception_extractor,
    random_inception_extractor,
    default_extractor,
)
