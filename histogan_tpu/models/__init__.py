from histogan_tpu.models.generator import Generator, generator_filters  # noqa: F401
from histogan_tpu.models.discriminator import Discriminator  # noqa: F401
from histogan_tpu.models.vectorizers import StyleVectorizer, HistVectorizer  # noqa: F401
from histogan_tpu.models.blocks import (  # noqa: F401
    Conv2DMod,
    GeneratorBlock,
    RGBBlock,
    DiscriminatorBlock,
)
from histogan_tpu.models.rehisto import (  # noqa: F401
    RecoloringGAN,
    RecoloringEncoderDecoder,
    EncoderBlock,
    DecoderBlock,
)
