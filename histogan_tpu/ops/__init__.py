from histogan_tpu.ops.histogram import (  # noqa: F401
    HistBlock,
    RGBuvHistBlock,
    rgChromaHistBlock,
    LabHistBlock,
    histogram_feature,
)
from histogan_tpu.ops.losses import (  # noqa: F401
    hellinger_histogram_loss,
    hinge_divergence,
    gradient_penalty,
)
from histogan_tpu.ops.conv2dmod import conv2d_mod  # noqa: F401
