"""Jitted HistoGAN training step (the hot path).

Reference semantics: histoGAN/histoGAN.py:853-1020 — alternating D/G
phases with gradient accumulation, hinge divergence, R1-style gradient
penalty every 4th step, Hellinger histogram loss, path-length
regularization every 32nd step, EMA schedule, NaN surfacing.

TPU-first design:
- ONE jit per (apply_gp, apply_pl) flag combo (3 variants reachable:
  32 % 4 == 0) instead of per-op dispatch; the whole step — both phases,
  both optimizers, EMA — is a single XLA program.
- Gradient accumulation is a ``lax.scan`` over a leading accumulation
  axis; with data parallelism over the mesh the batch axis is sharded
  and XLA inserts the gradient psum over ICI.
- All randomness is explicit key-splitting; sampling distributions match
  the reference's mixed_list/noise_list/image_noise
  (histoGAN/histoGAN.py:166-190).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from histogan_tpu.ops import losses
from histogan_tpu.ops.diffaugment import aug_wrapper
from histogan_tpu.ops.histogram import histogram_feature
from histogan_tpu.train.state import HistoGANState

EPS = 1e-8  # histoGAN/histoGAN.py:53

# Merge the fake+real D forwards into one batch-2B call on non-GP steps
# (numerically identical without VQ; tests/test_parallel.py pins equality
# by flipping this off). Module-level so tests can monkeypatch it.
MERGE_D_FORWARD = True

# With gradient_accumulate_every == 1 (the TPU flagship config — the
# reference's batch_size 2 x accum 8 exists for GPU memory, not here)
# the accumulation lax.scan lowers to a while-loop whose carry is the
# FULL gradient tree: the zeros init, the loop-boundary carry
# materialization and the (0+g)/1 plumbing are pure HBM traffic
# (~0.76 GB params_g + 0.73 GB params_d per boundary). The accum==1
# fast path calls the loss directly — mathematically identical
# ((0+g)/1 == g; compiled fusion order differs at fp32 epsilon) — and
# tests pin equality by forcing the scan with this flag.
FORCE_SCAN_ACCUM = False


class Models(NamedTuple):
    S: Any
    H: Any
    G: Any
    D: Any


def sample_w_rows(S, params_s, key, batch: int, num_rows: int, latent_dim: int,
                  mixed_prob: float, dtype=jnp.float32) -> jnp.ndarray:
    """Sample per-block w vectors: with prob ``mixed_prob`` style-mix two
    z's at a uniform cutoff (mixed_list, histoGAN/histoGAN.py:174-176),
    else one z for all rows (noise_list)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z1 = jax.random.normal(k1, (batch, latent_dim), dtype)
    z2 = jax.random.normal(k2, (batch, latent_dim), dtype)
    use_mixed = jax.random.uniform(k3, ()) < mixed_prob
    tt = jax.random.randint(k4, (), 0, num_rows)  # int(rand*layers)
    cutoff = jnp.where(use_mixed, tt, num_rows)
    w1 = S.apply({"params": params_s}, z1)
    w2 = S.apply({"params": params_s}, z2)
    rows = jnp.arange(num_rows)[None, :, None]
    return jnp.where(rows < cutoff, w1[:, None, :], w2[:, None, :])


def image_noise(key, batch: int, im_size: int) -> jnp.ndarray:
    """U[0,1) noise image (histoGAN/histoGAN.py:188-190), NHWC."""
    return jax.random.uniform(key, (batch, im_size, im_size, 1))


def hist_rows(H, params_h, hist_batch: jnp.ndarray) -> jnp.ndarray:
    """Project histogram and duplicate into the 2 hist-driven rows
    (histoGAN/histoGAN.py:900-902)."""
    h_w = H.apply({"params": params_h}, hist_batch)
    return jnp.stack([h_w, h_w], axis=1)


def compute_dtype(cfg):
    return jnp.bfloat16 if getattr(cfg, "precision", "fp32") == "bf16" else jnp.float32


def dequantize_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """uint8-fed image arrays -> fp32/255 on device.

    The loader ships images as uint8 (4x less host->device wire traffic;
    every decode path is PIL-uint8-derived so the quantization is
    lossless) and this reproduces the host float path bit-for-bit: both
    compute float32(u8)/255 (tests/test_train.py pins step equality).
    Histograms always travel fp32 and pass through untouched."""
    return {
        k: (v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v)
        for k, v in batch.items()
    }


def cast_tree(tree, dtype):
    """Cast float32 leaves to the compute dtype (params stay fp32 masters;
    the cast's VJP returns fp32 gradients — standard mixed precision)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


def generate(models: Models, params_g, hist_batch, key, cfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full G forward from fresh latents; returns (images, w_styles,
    h_rows, noise). Under the bf16 policy the synthesis path runs in
    bf16 (histogram/loss math stays fp32 — SURVEY.md §2 C30)."""
    dt = compute_dtype(cfg)
    pg = cast_tree(params_g, dt)
    k_style, k_noise = jax.random.split(key)
    batch = hist_batch.shape[0]
    w_styles = sample_w_rows(
        models.S, pg["S"], k_style, batch, cfg.num_layers - 2,
        cfg.latent_dim, cfg.mixed_prob, dtype=dt,
    )
    h_rows = hist_rows(models.H, pg["H"], hist_batch.astype(dt))
    noise = image_noise(k_noise, batch, cfg.image_size).astype(dt)
    images = models.G.apply({"params": pg["G"]}, w_styles, h_rows, noise)
    return images, w_styles, h_rows, noise


def _d_variables(params_d, vq_stats):
    v = {"params": params_d}
    if vq_stats:
        v["vq_stats"] = vq_stats
    return v


def _apply_d(models, params_d, vq_stats, images, key, cfg, train_stats: bool,
             allow_aug: bool = True):
    """Discriminator with optional batch augmentation; returns
    (logits, qloss, new_vq_stats). Runs in the compute dtype; loss math
    upstream is fp32. ``allow_aug=False`` (or ``key=None``) disables the
    AugWrapper — the ReHistoGAN step shares this function but the
    reference recoloringTrainer has no augmentation."""
    dt = compute_dtype(cfg)
    images = images.astype(dt)
    if allow_aug and key is not None and cfg.aug_prob > 0.0:
        images = aug_wrapper(key, images, cfg.aug_prob, cfg.aug_types)
    variables = _d_variables(cast_tree(params_d, dt), vq_stats)
    if vq_stats and train_stats:
        (logits, qloss), updated = models.D.apply(
            variables, images, train=True, mutable=["vq_stats"]
        )
        return logits, qloss, updated["vq_stats"]
    logits, qloss = models.D.apply(variables, images)
    return logits, qloss, vq_stats


def merged_hinge_d_forward(models, params_d, fake_images, real_images,
                           keys, cfg):
    """ONE batch-2B D forward for the non-GP hinge phase (no VQ stats —
    callers gate on ``not vq_stats``): augment fake/real separately when
    enabled (separate keys, reference draw-parity), concat, split the
    logits. Numerically identical to two half-batch calls since D is
    per-sample; fills the MXU twice as well (docs/DESIGN.md round-2
    ledger). ``keys=None`` disables augmentation (ReHistoGAN).
    Returns (divergence, quantize_loss)."""
    dt = compute_dtype(cfg)
    imgs_f = fake_images.astype(dt)
    imgs_r = real_images.astype(dt)
    if keys is not None and cfg.aug_prob > 0.0:
        k_f, k_r = keys
        imgs_f = aug_wrapper(k_f, imgs_f, cfg.aug_prob, cfg.aug_types)
        imgs_r = aug_wrapper(k_r, imgs_r, cfg.aug_prob, cfg.aug_types)
    b = imgs_f.shape[0]
    logits, qloss = models.D.apply(
        {"params": cast_tree(params_d, compute_dtype(cfg))},
        jnp.concatenate([imgs_f, imgs_r], axis=0),
    )
    divergence = losses.hinge_divergence(
        logits[b:].astype(jnp.float32), logits[:b].astype(jnp.float32)
    )
    # VQ blocks are structurally absent here, so this is an exact zero
    # like the unmerged path's quantize term
    return divergence, jnp.mean(qloss.astype(jnp.float32))


def make_train_step(models: Models, g_tx, d_tx, cfg, split: bool = False,
                    state_shardings=None):
    """Build the jitted train step.

    Returns step(state, batch, key, apply_gp, apply_pl) -> (state, metrics)
    where batch = {'d_images': (A,B,H,W,3), 'd_hists': (A,B,3,h,h),
    'g_hists': (A,B,3,h,h)} and A = cfg.gradient_accumulate_every.

    ``split=True`` compiles the D phase and the G phase as two separate
    XLA programs instead of one fused step — numerically identical (the
    phases share the same code and key schedule; equality pinned in
    tests/test_train.py) but each program is roughly half the size,
    which is the fallback when the fused 512px step exceeds this
    environment's remote compile helper (BASELINE.md 512px note,
    VERDICT r2 #2). The fused form stays the default: one dispatch per
    step beats two on RPC-attached devices.

    ``state_shardings`` (a pytree of NamedShardings mirroring the state,
    from parallel.fsdp.state_shardings) pins the output state to the
    FSDP layout: the step code is unchanged, but params/opt/EMA stay
    sharded across the mesh and XLA inserts the weight all-gathers /
    gradient reduce-scatters (parallel/fsdp.py). Incompatible with
    ``split`` (the fused program is the FSDP path; the split fallback
    targets the single-chip compile-size limit, the opposite regime).
    """

    accum = cfg.gradient_accumulate_every

    if state_shardings is not None:
        # pin D's flattened pre-logit activation (and thus its backward
        # cotangent) to batch sharding — without this the FSDP weight
        # layout leaks into the flatten transpose and GSPMD resolves it
        # by replicating the tensor (models/discriminator.py
        # flatten_sharding note, VERDICT r3 weak #2)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        models = models._replace(D=models.D.clone(
            flatten_sharding=NamedSharding(mesh, P("data", None))))

    # ----------------------------------------------------------------- D
    def d_loss_fn(params_d, vq_stats, fake_images, real_images, keys, apply_gp):
        k_aug_f, k_aug_r = keys

        if MERGE_D_FORWARD and not apply_gp and not vq_stats:
            divergence, quantize_loss = merged_hinge_d_forward(
                models, params_d, fake_images, real_images,
                (k_aug_f, k_aug_r), cfg,
            )
            return divergence + quantize_loss, (
                divergence, quantize_loss, jnp.zeros(()), vq_stats
            )

        fake_logits, fake_q, vq_stats = _apply_d(
            models, params_d, vq_stats, fake_images, k_aug_f, cfg, True
        )

        if apply_gp:
            # share ONE real forward between the hinge logits and the
            # gradient-penalty input gradient via vjp (the reference also
            # reuses its real forward for both, histoGAN.py:908-922)
            def real_fwd(imgs):
                logits, real_q, vq2 = _apply_d(
                    models, params_d, vq_stats, imgs, k_aug_r, cfg, True
                )
                return logits.astype(jnp.float32), (real_q, vq2)

            real_logits, (real_q, vq_stats2), gp = (
                losses.shared_forward_gradient_penalty(real_fwd, real_images)
            )
        else:
            real_logits, real_q, vq_stats2 = _apply_d(
                models, params_d, vq_stats, real_images, k_aug_r, cfg, True
            )
            real_logits = real_logits.astype(jnp.float32)
            gp = jnp.zeros(())

        divergence = losses.hinge_divergence(
            real_logits, fake_logits.astype(jnp.float32)
        )
        quantize_loss = jnp.mean((fake_q + real_q).astype(jnp.float32))
        loss = divergence + quantize_loss + (gp if apply_gp else 0.0)
        return loss, (divergence, quantize_loss, gp, vq_stats2)

    # ----------------------------------------------------------------- G
    def g_loss_fn(params_g, params_d, vq_stats, hist_batch, pl_mean, keys, apply_pl):
        k_gen, k_aug, k_pl = keys
        images, w_styles, h_rows, noise = generate(models, params_g, hist_batch, k_gen, cfg)
        fake_logits, _, vq_stats = _apply_d(
            models, params_d, vq_stats, images, k_aug, cfg, True
        )
        gen_hists = histogram_feature(
            jax.nn.relu(images.astype(jnp.float32)),  # hist math stays fp32
            h=cfg.hist_bin, insz=cfg.hist_insz, resizing=cfg.hist_resizing,
            method=cfg.hist_method, sigma=cfg.hist_sigma,
        )
        hist_loss = losses.hellinger_histogram_loss(hist_batch, gen_hists, cfg.alpha)
        adv_loss = jnp.mean(fake_logits.astype(jnp.float32))
        loss = adv_loss + hist_loss
        avg_pl = jnp.zeros(())
        if apply_pl:
            # path-length reg (histoGAN/histoGAN.py:965-975); fp32 math.
            # Safe-std: jnp.std's backward is (w-mean)/((N-1)*sigma),
            # which is NaN when a w coordinate collides across the batch
            # (sigma == 0 — happens under bf16 at small capacities) and
            # overflows for denormal sigma. The forward stays finite, so
            # the reference's NaN guard never fires; the reference's own
            # torch.std has the identical hazard and relies on its
            # rollback/retry. var + 1e-12 bounds the sqrt gradient and is
            # numerically neutral for any realistic sigma (>= 1e-4).
            w32 = w_styles.astype(jnp.float32)
            sigma = jnp.sqrt(
                jnp.var(w32, axis=0, keepdims=True, ddof=1) + 1e-12
            )
            std = 0.1 / (sigma + EPS)
            w2 = w32 + jax.random.normal(k_pl, w32.shape) / (std + EPS)
            pl_images = models.G.apply(
                {"params": cast_tree(params_g["G"], compute_dtype(cfg))},
                w2.astype(w_styles.dtype), h_rows, noise,
            )
            pl_lengths = losses.path_length_lengths(
                pl_images.astype(jnp.float32), images.astype(jnp.float32)
            )
            avg_pl = jnp.mean(pl_lengths)
            loss = loss + losses.path_length_penalty(pl_lengths, pl_mean)
        return loss, (adv_loss, hist_loss, avg_pl, vq_stats)

    def run_d_phase(state: HistoGANState, batch: Dict[str, jnp.ndarray],
                    k_d, apply_gp: bool):
        """D phase: scan over the accumulation axis, apply the D
        optimizer. Returns (params_d, opt_d, vq_stats, d_metrics)."""
        batch = dequantize_batch(batch)

        def d_one(vq_stats, d_images, d_hists, k):
            """One accumulation micro-step: grads + metrics."""
            k_gen, k_aug_f, k_aug_r = jax.random.split(k, 3)
            fake_images, _, _, _ = generate(
                models, state.params_g, d_hists, k_gen, cfg
            )
            fake_images = jax.lax.stop_gradient(fake_images)
            (loss, (div, qloss, gp, vq_stats)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d, vq_stats, fake_images, d_images,
              (k_aug_f, k_aug_r), apply_gp)
            return grads, vq_stats, (div, qloss, gp)

        d_keys = jax.random.split(k_d, accum)
        if accum == 1 and not FORCE_SCAN_ACCUM:
            # fast path: no zeros init, no loop-carry materialization,
            # no (0+g)/1 plumbing (see FORCE_SCAN_ACCUM note)
            d_grads, vq_stats, (div, qloss, gp) = d_one(
                state.vq_stats, batch["d_images"][0], batch["d_hists"][0],
                d_keys[0])
            divs, qlosses, gps = (x[None] for x in (div, qloss, gp))
        else:
            zero_grads_d = jax.tree_util.tree_map(jnp.zeros_like,
                                                  state.params_d)

            def d_iter(carry, inp):
                grad_acc, vq_stats = carry
                grads, vq_stats, aux = d_one(vq_stats, *inp)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (grad_acc, vq_stats), aux

            (d_grads, vq_stats), (divs, qlosses, gps) = jax.lax.scan(
                d_iter, (zero_grads_d, state.vq_stats),
                (batch["d_images"], batch["d_hists"], d_keys),
            )
            d_grads = jax.tree_util.tree_map(lambda g: g / accum, d_grads)
        d_updates, opt_d = d_tx.update(d_grads, state.opt_d, state.params_d)
        params_d = jax.tree_util.tree_map(jnp.add, state.params_d, d_updates)
        d_metrics = {
            "d_loss": jnp.mean(divs),
            "q_loss": jnp.mean(qlosses),
            "gp_loss": gps[-1] if apply_gp else jnp.zeros(()),
        }
        return params_d, opt_d, vq_stats, d_metrics

    def run_g_phase(state: HistoGANState, params_d, opt_d, vq_stats,
                    batch: Dict[str, jnp.ndarray], k_g, d_metrics,
                    apply_pl: bool, apply_ema: bool):
        """G phase against the freshly-updated D, then the moving
        averages; assembles the new state and the full metrics dict."""
        batch = dequantize_batch(batch)

        def g_one(vq_stats, g_hists, k):
            ks = jax.random.split(k, 3)
            (loss, (adv, hloss, avg_pl, vq_stats)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.params_g, params_d, vq_stats, g_hists, state.pl_mean,
              tuple(ks), apply_pl)
            return grads, vq_stats, avg_pl, (adv, hloss)

        g_keys = jax.random.split(k_g, accum)
        if accum == 1 and not FORCE_SCAN_ACCUM:
            g_grads, vq_stats, avg_pl, (adv, hloss) = g_one(
                vq_stats, batch["g_hists"][0], g_keys[0])
            advs, hlosses = adv[None], hloss[None]
        else:
            zero_grads_g = jax.tree_util.tree_map(jnp.zeros_like,
                                                  state.params_g)

            def g_iter(carry, inp):
                grad_acc, vq_stats, _ = carry
                grads, vq_stats, avg_pl, aux = g_one(vq_stats, *inp)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (grad_acc, vq_stats, avg_pl), aux

            (g_grads, vq_stats, avg_pl), (advs, hlosses) = jax.lax.scan(
                g_iter, (zero_grads_g, vq_stats, jnp.zeros(())),
                (batch["g_hists"], g_keys),
            )
            g_grads = jax.tree_util.tree_map(lambda g: g / accum, g_grads)
        g_updates, opt_g = g_tx.update(g_grads, state.opt_g, state.params_g)
        params_g = jax.tree_util.tree_map(jnp.add, state.params_g, g_updates)

        # ---------------- moving averages (histoGAN/histoGAN.py:991-1000)
        step = state.step
        pl_mean = state.pl_mean
        if apply_pl:
            pl_mean = jnp.where(
                jnp.isnan(avg_pl), pl_mean, pl_mean * 0.99 + 0.01 * avg_pl
            )

        # EMA schedule (steps>20000 every 10, histoGAN/histoGAN.py:996-998)
        # is host-known — the flag is STATIC, so the ~1.2 GB ema
        # read+write is skipped entirely on the ~9/10 steps where the
        # schedule does nothing (the r1 traced `where` paid it every
        # step); when off, the donated ema buffer passes through
        # untouched. The rare reset (<=25000 every 1000, :999-1000) is
        # applied eagerly by the Trainer between steps.
        #
        # ema_dtype='bf16' (Trainer knob): the EMA tree is STORED bf16 —
        # halves its read+write bytes and HBM residency. Math stays
        # fp32, and the store uses STOCHASTIC rounding
        # (ops/rounding.py): with decay 0.995 the per-application
        # increment (~0.5% of the value) is below bf16's half-ulp, so a
        # plain-truncated store would stall the EMA far from the params
        # (tests/test_ema.py pins the failure mode); SR keeps it
        # unbiased. The dtype test is static — the fp32 path traces the
        # identical jaxpr it always did (compile-cache preserving).
        if apply_ema:
            ema_leaves = jax.tree_util.tree_leaves(state.ema)
            if ema_leaves and ema_leaves[0].dtype == jnp.bfloat16:
                from histogan_tpu.ops.rounding import tree_stochastic_round_bf16

                ema32 = jax.tree_util.tree_map(
                    lambda e, p: e.astype(jnp.float32) * 0.995 + 0.005 * p,
                    state.ema, params_g,
                )
                # fold_in, not split: the g-phase key stream is untouched,
                # so fp32-EMA draws are bit-identical with the knob off
                ema = tree_stochastic_round_bf16(
                    ema32, jax.random.fold_in(k_g, 0x454D41)
                )
            else:
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * 0.995 + 0.005 * p, state.ema, params_g
                )
        else:
            ema = state.ema

        metrics = {
            **d_metrics,
            "g_loss": jnp.mean(advs),
            "h_loss": jnp.mean(hlosses),
            "pl_mean": pl_mean,
        }
        new_state = state.replace(
            step=step + 1,
            params_g=params_g,
            params_d=params_d,
            ema=ema,
            opt_g=opt_g,
            opt_d=opt_d,
            pl_mean=pl_mean,
            vq_stats=vq_stats,
        )
        return new_state, metrics

    def train_step(state: HistoGANState, batch: Dict[str, jnp.ndarray], key,
                   apply_gp: bool, apply_pl: bool, apply_ema: bool = False):
        k_d, k_g = jax.random.split(key)
        params_d, opt_d, vq_stats, d_metrics = run_d_phase(
            state, batch, k_d, apply_gp
        )
        return run_g_phase(state, params_d, opt_d, vq_stats, batch, k_g,
                           d_metrics, apply_pl, apply_ema)

    if state_shardings is not None:
        if split:
            raise ValueError(
                "param_sharding='fsdp' requires the fused step "
                "(split_step=False): the split fallback exists for the "
                "single-chip compile-size limit, FSDP for multi-chip state"
            )
        mesh = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        from jax.sharding import NamedSharding, PartitionSpec
        metrics_sharding = NamedSharding(mesh, PartitionSpec())
        return jax.jit(train_step,
                       static_argnames=("apply_gp", "apply_pl", "apply_ema"),
                       donate_argnums=(0,),
                       out_shardings=(state_shardings, metrics_sharding))

    if not split:
        return jax.jit(train_step,
                       static_argnames=("apply_gp", "apply_pl", "apply_ema"),
                       donate_argnums=(0,))

    # split mode: two programs, identical math. The D jit must NOT donate
    # state (the G jit still reads params_g/opt_g/ema from it); the G jit
    # donates state plus the phase-1 outputs it consumes.
    d_jit = jax.jit(run_d_phase, static_argnames=("apply_gp",))
    g_jit = jax.jit(run_g_phase,
                    static_argnames=("apply_pl", "apply_ema"),
                    donate_argnums=(0, 1, 2, 3))

    def split_step(state, batch, key, apply_gp: bool, apply_pl: bool,
                   apply_ema: bool = False):
        # eager split reproduces the fused trace's draws exactly
        k_d, k_g = jax.random.split(key)
        params_d, opt_d, vq_stats, d_metrics = d_jit(
            state, batch, k_d, apply_gp=apply_gp
        )
        return g_jit(state, params_d, opt_d, vq_stats, batch, k_g, d_metrics,
                     apply_pl=apply_pl, apply_ema=apply_ema)

    return split_step
