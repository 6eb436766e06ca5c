"""Jitted ReHistoGAN (recoloring) training step.

Reference: ReHistoGAN/rehistoGAN.py:895-1052 — alternating D/G with
losses gamma*adv + alpha*Hellinger + beta*reconstruction + variance term,
GP every 4th step. No EMA / path-length / style mixing in the reference
recoloringTrainer.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from histogan_tpu.ops import filters, losses
from histogan_tpu.ops.histogram import histogram_feature
from histogan_tpu.train.state import ReHistoGANState


class RecolorModels(NamedTuple):
    ED: Any
    H: Any
    G: Any
    D: Any


def recolor_forward(models: RecolorModels, params, image_batch, hist_batch,
                    noise, cfg):
    """The 4-way ED/G dispatch (rehistoGAN.py:938-956). Returns images.
    Runs in the compute dtype under the bf16 policy (loss math stays
    fp32 in the caller)."""
    from histogan_tpu.train.steps import cast_tree, compute_dtype

    dt = compute_dtype(cfg)
    params = cast_tree(params, dt)
    image_batch = image_batch.astype(dt)
    hist_batch = hist_batch.astype(dt)
    noise = noise.astype(dt)
    h_w = models.H.apply({"params": params["H"]}, hist_batch)
    if cfg.skip_conn_to_GAN and not cfg.internal_hist:
        latent, rgb, pl1, pl2 = models.ED.apply(
            {"params": params["ED"]}, image_batch, hist_batch
        )
        return models.G.apply(
            {"params": params["G"]}, latent, rgb, h_w, noise, pl1, pl2
        )
    if cfg.skip_conn_to_GAN and cfg.internal_hist:
        latent, rgb, pl1, pl2 = models.ED.apply(
            {"params": params["ED"]}, image_batch, h_w
        )
        return models.G.apply(
            {"params": params["G"]}, latent, rgb, h_w, noise, pl1, pl2
        )
    if cfg.internal_hist:
        latent, rgb = models.ED.apply({"params": params["ED"]}, image_batch, h_w)
        return models.G.apply({"params": params["G"]}, latent, rgb, h_w, noise)
    latent, rgb = models.ED.apply({"params": params["ED"]}, image_batch, hist_batch)
    return models.G.apply({"params": params["G"]}, latent, rgb, h_w, noise)


def _rec_variant(rec_loss) -> str:
    if rec_loss is None:
        return "L1"
    if rec_loss == "sobel":
        return "1st gradient"
    if rec_loss == "laplacian":
        return "2nd gradient"
    raise Exception("Unknown reconstruction loss!")


def make_rehisto_train_step(models: RecolorModels, g_tx, d_tx, cfg,
                            state_shardings=None):
    """batch = {'d_images','d_hists','g_images','g_hists'} with leading
    (A, B, ...); hyperparameters (alpha, beta, gamma) are jitted in
    statically — the reference's step-100k switch recompiles once.

    ``state_shardings`` pins the output state to the FSDP layout
    (parallel/fsdp.py): step code unchanged, params/opt stay sharded
    over the mesh, XLA inserts the collectives."""

    accum = cfg.gradient_accumulate_every
    gauss_kernel = filters.gaussian_kernel(15, 5.0)
    rec_variant = _rec_variant(cfg.rec_loss)

    if state_shardings is not None:
        # same flatten-cotangent pin as steps.py (VERDICT r3 weak #2)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        models = models._replace(D=models.D.clone(
            flatten_sharding=NamedSharding(mesh, P("data", None))))

    def d_loss_fn(params_d, vq_stats, fake_images, real_images, apply_gp):
        # shares steps.py's D-application helpers; the recoloring
        # Discriminator supports the same VQ blocks
        # (histoGAN/histoGAN.py:594-601) but the reference
        # recoloringTrainer has no AugWrapper, hence allow_aug=False /
        # keys=None
        from histogan_tpu.train import steps as _steps

        if _steps.MERGE_D_FORWARD and not apply_gp and not vq_stats:
            divergence, quantize_loss = _steps.merged_hinge_d_forward(
                models, params_d, fake_images, real_images, None, cfg,
            )
            return divergence + quantize_loss, (
                divergence, jnp.zeros(()), quantize_loss, vq_stats)

        fake_logits, fake_q, vq_stats = _steps._apply_d(
            models, params_d, vq_stats, fake_images, None, cfg, True,
            allow_aug=False)

        if apply_gp:
            # share ONE real forward between the hinge logits and the
            # penalty's input gradient via vjp (histoGAN steps.py does the
            # same; replaces the r1 third forward inside gradient_penalty)
            def real_fwd(imgs):
                logits, rq, vq2 = _steps._apply_d(
                    models, params_d, vq_stats, imgs, None, cfg, True,
                    allow_aug=False)
                return logits.astype(jnp.float32), (rq, vq2)

            real_logits, (real_q, vq_stats), gp = (
                losses.shared_forward_gradient_penalty(real_fwd, real_images)
            )
        else:  # unmerged reference-shaped path
            real_logits, real_q, vq_stats = _steps._apply_d(
                models, params_d, vq_stats, real_images, None, cfg, True,
                allow_aug=False)
            real_logits = real_logits.astype(jnp.float32)
            gp = jnp.zeros(())
        divergence = losses.hinge_divergence(
            real_logits, fake_logits.astype(jnp.float32))
        quantize_loss = jnp.mean((fake_q + real_q).astype(jnp.float32))
        return divergence + quantize_loss + gp, (
            divergence, gp, quantize_loss, vq_stats)

    def g_loss_fn(params_g, params_d, vq_stats, image_batch, hist_batch, key,
                  alpha, beta, gamma):
        noise = jax.random.uniform(
            key, (image_batch.shape[0], cfg.image_size, cfg.image_size, 1)
        )
        from histogan_tpu.train import steps as _steps

        generated = recolor_forward(models, params_g, image_batch, hist_batch,
                                    noise, cfg)
        fake_logits, _, _ = _steps._apply_d(
            models, params_d, vq_stats, generated, None, cfg, False,
            allow_aug=False)
        d_loss = gamma * jnp.mean(fake_logits.astype(jnp.float32))

        generated32 = generated.astype(jnp.float32)  # loss math fp32
        gen_hists = histogram_feature(
            jax.nn.relu(generated32), h=cfg.hist_bin, insz=cfg.hist_insz,
            resizing=cfg.hist_resizing, method=cfg.hist_method,
            sigma=cfg.hist_sigma,
        )
        hist_loss = losses.hellinger_histogram_loss(hist_batch, gen_hists, alpha)
        rec_loss = beta * losses.reconstruction_loss(
            image_batch, generated32, rec_variant
        )
        loss = d_loss + hist_loss + rec_loss
        var_loss = jnp.zeros(())
        if cfg.variance_loss:
            # faithful quirk: hist-of-hist (rehistoGAN.py:1020) — the hist
            # TENSOR is fed back through a histogram block as an image
            hist_as_img = jnp.transpose(jax.nn.relu(hist_batch), (0, 2, 3, 1))
            input_hoh = histogram_feature(
                hist_as_img, h=cfg.hist_bin, insz=cfg.hist_insz,
                resizing=cfg.hist_resizing, method=cfg.hist_method,
                sigma=cfg.hist_sigma,
            )
            var_loss = losses.variance_loss(
                hist_batch, input_hoh, image_batch, generated32, gauss_kernel,
                beta,
            )
            loss = loss + var_loss
        return loss, (d_loss, hist_loss, rec_loss, var_loss)

    def train_step(state: ReHistoGANState, batch: Dict[str, jnp.ndarray], key,
                   apply_gp: bool, alpha: float, beta: float, gamma: float):
        from histogan_tpu.train.steps import dequantize_batch

        from histogan_tpu.train import steps as _steps_mod

        batch = dequantize_batch(batch)
        k_d, k_g = jax.random.split(key)
        fast_accum = accum == 1 and not _steps_mod.FORCE_SCAN_ACCUM

        # ------------- D phase
        def d_one(vq_stats, d_images, d_hists, k):
            noise = jax.random.uniform(
                k, (d_images.shape[0], cfg.image_size, cfg.image_size, 1)
            )
            fake = jax.lax.stop_gradient(
                recolor_forward(models, state.params_g, d_images, d_hists,
                                noise, cfg)
            )
            (loss, (div, gp, qloss, vq_stats)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d, vq_stats, fake, d_images, apply_gp)
            return grads, vq_stats, (div, gp, qloss)

        d_keys = jax.random.split(k_d, accum)
        if fast_accum:
            # accum==1: skip the scan's zeros init / carry
            # materialization / (0+g)/1 plumbing (steps.FORCE_SCAN_ACCUM)
            d_grads, vq_stats, (div, gp, qloss) = d_one(
                state.vq_stats, batch["d_images"][0], batch["d_hists"][0],
                d_keys[0])
            divs, gps, qlosses = (x[None] for x in (div, gp, qloss))
        else:
            zero_d = jax.tree_util.tree_map(jnp.zeros_like, state.params_d)

            def d_iter(carry, inp):
                grad_acc, vq_stats = carry
                grads, vq_stats, aux = d_one(vq_stats, *inp)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (grad_acc, vq_stats), aux

            (d_grads, vq_stats), (divs, gps, qlosses) = jax.lax.scan(
                d_iter, (zero_d, state.vq_stats),
                (batch["d_images"], batch["d_hists"], d_keys)
            )
            d_grads = jax.tree_util.tree_map(lambda g: g / accum, d_grads)
        d_updates, opt_d = d_tx.update(d_grads, state.opt_d, state.params_d)
        params_d = jax.tree_util.tree_map(jnp.add, state.params_d, d_updates)

        # ------------- G phase
        def g_one(g_images, g_hists, k):
            (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.params_g, params_d, vq_stats, g_images, g_hists, k,
                alpha, beta, gamma,
            )
            return grads, aux

        g_keys = jax.random.split(k_g, accum)
        if fast_accum:
            g_grads, (adv, hloss, rloss, vloss) = g_one(
                batch["g_images"][0], batch["g_hists"][0], g_keys[0])
            advs, hlosses, rlosses, vlosses = (
                x[None] for x in (adv, hloss, rloss, vloss))
        else:
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params_g)

            def g_iter(grad_acc, inp):
                grads, aux = g_one(*inp)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return grad_acc, aux

            g_grads, (advs, hlosses, rlosses, vlosses) = jax.lax.scan(
                g_iter, zero_g, (batch["g_images"], batch["g_hists"], g_keys)
            )
            g_grads = jax.tree_util.tree_map(lambda g: g / accum, g_grads)
        if cfg.fixed_gan_weights:
            # only ED learns (rehistoGAN.py:671-676)
            g_grads = {
                "ED": g_grads["ED"],
                "H": jax.tree_util.tree_map(jnp.zeros_like, g_grads["H"]),
                "G": jax.tree_util.tree_map(jnp.zeros_like, g_grads["G"]),
            }
        g_updates, opt_g = g_tx.update(g_grads, state.opt_g, state.params_g)
        params_g = jax.tree_util.tree_map(jnp.add, state.params_g, g_updates)

        metrics = {
            "d_loss": jnp.mean(divs),
            "g_loss": jnp.mean(advs),
            "h_loss": jnp.mean(hlosses),
            "r_loss": jnp.mean(rlosses),
            "var_loss": jnp.mean(vlosses),
            "q_loss": jnp.mean(qlosses),
            "gp_loss": gps[-1] if apply_gp else jnp.zeros(()),
        }
        new_state = state.replace(
            step=state.step + 1, params_g=params_g, params_d=params_d,
            opt_g=opt_g, opt_d=opt_d, vq_stats=vq_stats,
        )
        return new_state, metrics

    if state_shardings is not None:
        mesh = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.jit(
            train_step,
            static_argnames=("apply_gp", "alpha", "beta", "gamma"),
            donate_argnums=(0,),
            out_shardings=(state_shardings,
                           NamedSharding(mesh, PartitionSpec())),
        )
    return jax.jit(
        train_step,
        static_argnames=("apply_gp", "alpha", "beta", "gamma"),
        donate_argnums=(0,),
    )
