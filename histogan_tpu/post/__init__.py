from histogan_tpu.post.imresize import imresize  # noqa: F401
from histogan_tpu.post.mkl import color_transfer_MKL, MKL  # noqa: F401
from histogan_tpu.post.pyramid import pyramid_upsampling  # noqa: F401
