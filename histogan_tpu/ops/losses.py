"""Loss functions for HistoGAN / ReHistoGAN training.

Numeric specs from the reference:
- Hellinger histogram loss: histoGAN/histoGAN.py:955-960 (SCALE at :54).
- Hinge GAN divergence: histoGAN/histoGAN.py:913.
- R1-style gradient penalty: histoGAN/histoGAN.py:156-163.
- Reconstruction losses (L1 / sobel-gradient / laplacian):
  ReHistoGAN/rehistoGAN.py:279-326.
- Variance loss: ReHistoGAN/rehistoGAN.py:1019-1028.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from histogan_tpu.ops import filters

SCALE = 1.0 / np.sqrt(2.0)  # reference histoGAN/histoGAN.py:54


def hellinger_histogram_loss(target_hist: jnp.ndarray, generated_hist: jnp.ndarray,
                             alpha: float = 2.0) -> jnp.ndarray:
    """alpha * (1/sqrt(2)) * ||sqrt(h_t) - sqrt(h_g)||_2 / B.

    Note the reference takes the 2-norm over the WHOLE batch tensor and then
    divides by batch size (histoGAN/histoGAN.py:957-960) — not a per-sample
    mean. Faithfully kept.
    """
    diff = jnp.sqrt(target_hist) - jnp.sqrt(generated_hist)
    return alpha * SCALE * jnp.sqrt(jnp.sum(jnp.square(diff))) / target_hist.shape[0]


def hinge_divergence(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """mean(relu(1 + real) + relu(1 - fake)) — histoGAN/histoGAN.py:913.

    (Sign convention follows the reference: D is trained to push real
    logits negative.)
    """
    return jnp.mean(jax.nn.relu(1.0 + real_logits) + jax.nn.relu(1.0 - fake_logits))


def gradient_penalty(d_apply: Callable[[jnp.ndarray], jnp.ndarray],
                     images: jnp.ndarray, weight: float = 10.0) -> jnp.ndarray:
    """1-centered gradient penalty on real images.

    weight * mean((||d D(x)/d x||_2 - 1)^2), gradients taken of
    sum(D(x)) w.r.t. x — equivalent to the reference's grad_outputs=ones
    (histoGAN/histoGAN.py:156-163).

    ``d_apply`` maps images -> logits (any trailing shape); under jit this
    is second-order autodiff when used inside the D loss.
    """
    grads = jax.grad(lambda x: jnp.sum(d_apply(x)))(images)
    grads = grads.reshape(images.shape[0], -1)
    norms = jnp.linalg.norm(grads, axis=1)
    return weight * jnp.mean(jnp.square(norms - 1.0))


def shared_forward_gradient_penalty(forward: Callable, images: jnp.ndarray,
                                    weight: float = 10.0):
    """Gradient penalty that shares ONE real-image forward with the
    caller's hinge logits via ``jax.vjp`` (both train steps use this;
    the separate-forward form is :func:`gradient_penalty`).

    ``forward``: images -> (logits_f32, aux). Returns
    (logits, aux, gp) with the same weight/norm semantics as
    :func:`gradient_penalty` (histoGAN/histoGAN.py:156-163).
    """
    logits, vjp_fn, aux = jax.vjp(forward, images, has_aux=True)
    (img_grads,) = vjp_fn(jnp.ones_like(logits))
    flat = img_grads.reshape(images.shape[0], -1)
    gp = weight * jnp.mean(jnp.square(jnp.linalg.norm(flat, axis=1) - 1.0))
    return logits, aux, gp


def path_length_lengths(pl_images: jnp.ndarray, generated_images: jnp.ndarray) -> jnp.ndarray:
    """Per-sample squared pixel-space change, mean over C,H,W
    (histoGAN/histoGAN.py:969). Works for NHWC or NCHW — reduces all
    non-batch axes."""
    d = pl_images - generated_images
    return jnp.mean(jnp.square(d), axis=tuple(range(1, d.ndim)))


def path_length_penalty(pl_lengths: jnp.ndarray, pl_mean: jnp.ndarray) -> jnp.ndarray:
    """mean((pl_lengths - pl_mean)^2), NaN-guarded like the reference
    (histoGAN/histoGAN.py:973-975)."""
    loss = jnp.mean(jnp.square(pl_lengths - pl_mean))
    return jnp.where(jnp.isnan(loss), 0.0, loss)


def reconstruction_loss(input_img: jnp.ndarray, target_img: jnp.ndarray,
                        variant: str = "2nd gradient") -> jnp.ndarray:
    """ReHistoGAN reconstruction term (ReHistoGAN/rehistoGAN.py:303-326).

    variant: 'L1' | '1st gradient' (sobel magnitude L1) | '2nd gradient'
    (laplacian L1). Images are NHWC.
    """
    if variant == "L1":
        return jnp.mean(jnp.abs(input_img - target_img))
    if variant == "1st gradient":
        gi = jnp.sqrt(jnp.square(filters.sobel_op(input_img, 0))
                      + jnp.square(filters.sobel_op(input_img, 1)))
        gt = jnp.sqrt(jnp.square(filters.sobel_op(target_img, 0))
                      + jnp.square(filters.sobel_op(target_img, 1)))
        return jnp.mean(jnp.abs(gi - gt))
    if variant == "2nd gradient":
        return jnp.mean(jnp.abs(filters.laplacian_op(input_img)
                                - filters.laplacian_op(target_img)))
    raise ValueError(f"unknown reconstruction loss variant {variant!r}")


def variance_loss(hist_batch: jnp.ndarray, input_hist_of_hist: jnp.ndarray,
                  input_images: jnp.ndarray, generated_images: jnp.ndarray,
                  gauss_kernel: jnp.ndarray, beta: float) -> jnp.ndarray:
    """ReHistoGAN variance term (ReHistoGAN/rehistoGAN.py:1019-1028).

    -1 * (beta/10) * sum(|h_t - H(relu(h_t))|) *
        mean(|std_col(blur(x_in)) - std_col(blur(x_gen))|)

    Faithful-quirk note: the reference feeds the HISTOGRAM tensor itself
    back through a histogram block (`self.histBlock_input(F.relu(hist_batch))`,
    rehistoGAN.py:1020); callers pass that value as ``input_hist_of_hist``.

    Images NHWC; the reference's torch.std(torch.std(x, dim=2), dim=2) on
    NCHW reduces H then W with Bessel correction (unbiased), leaving (B, C).
    """
    def _std2(x):  # x: (B, H, W, C) -> std over H (ddof=1), then over W
        s1 = jnp.std(x, axis=1, ddof=1)   # (B, W, C)
        return jnp.std(s1, axis=1, ddof=1)  # (B, C)

    blur_in = filters.gaussian_op(input_images, gauss_kernel)
    blur_gen = filters.gaussian_op(generated_images, gauss_kernel)
    color_term = jnp.sum(jnp.abs(hist_batch - input_hist_of_hist))
    structure_term = jnp.mean(jnp.abs(_std2(blur_in) - _std2(blur_gen)))
    return -1.0 * (beta / 10.0) * color_term * structure_term
