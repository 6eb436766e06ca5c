"""ReHistoGAN recoloringTrainer.

Mirrors the reference recoloringTrainer surface
(ReHistoGAN/rehistoGAN.py:721-1226): load / set_data_src(folder,
sampling) / train(alpha,beta,gamma) / evaluate with upscale (BGU or
pyramid) / downscale / post-recoloring paths / save / print_log, plus the
pretrained-histoGAN head transplant (rehistoGAN.py:326-360).
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from histogan_tpu.data.dataset import HistogramPool, ImageFolderDataset, TrainLoader
from histogan_tpu.models import (
    Discriminator,
    HistVectorizer,
    RecoloringEncoderDecoder,
    RecoloringGAN,
)
from histogan_tpu.optim import diffgrad
from histogan_tpu.parallel import make_mesh, replicate
from histogan_tpu.train.checkpoint import CheckpointStore
from histogan_tpu.train.rehisto_steps import (
    RecolorModels,
    make_rehisto_train_step,
    recolor_forward,
)
from histogan_tpu.train.state import ReHistoGANState
from histogan_tpu.train.trainer import NanException
from histogan_tpu.utils.config import ReHistoGANConfig
from histogan_tpu.utils.image_io import save_image_grid


class RecoloringTrainer:
    def __init__(self, name="default", results_dir="results", models_dir="models",
                 image_size=256, network_capacity=16, transparent=False,
                 batch_size=4, gradient_accumulate_every=1, lr=2e-4,
                 save_every=1000, fq_layers=(), fq_dict_size=256, attn_layers=(),
                 hist_method="inverse-quadratic", hist_resizing="sampling",
                 hist_sigma=0.02, hist_bin=64, hist_insz=150,
                 fixed_gan_weights=False, skip_conn_to_GAN=False,
                 rec_loss="laplacian", initialize_gan=False, variance_loss=True,
                 internal_hist=False, change_hyperparameters=False,
                 change_hyperparameters_after=100000, latent_dim=512,
                 style_depth=8, num_devices=None, seed=42,
                 precision="fp32", sync_every=1, device_dataset="auto",
                 param_sharding="replicated", opt_state_dtype=None,
                 remat=False, num_workers=None, **_unused):
        # sync_every: fetch step metrics every N steps (same async-
        # metrics amortization as Trainer — the ~31 ms/step host sync
        # dominated the r1 e2e numbers; NaN rollback then triggers up to
        # N-1 steps late, reloading the same checkpoint).
        self.sync_every = max(1, int(sync_every))
        self.num_workers = int(num_workers) if num_workers else None
        # param_sharding: "replicated" or "fsdp" (parallel/fsdp.py) —
        # same surface as Trainer.
        if param_sharding not in ("replicated", "fsdp"):
            raise ValueError(
                f"param_sharding must be 'replicated' or 'fsdp', "
                f"got {param_sharding!r}")
        self.param_sharding = param_sharding
        self._shardings = None
        # opt_state_dtype: same knob as Trainer (optim/diffgrad.py) —
        # bf16 storage for the DiffGrad trees, fp32 math.
        if opt_state_dtype not in (None, "fp32", "bf16"):
            raise ValueError(f"opt_state_dtype must be None, 'fp32' or "
                             f"'bf16', got {opt_state_dtype!r}")
        self.opt_state_dtype = opt_state_dtype
        self.cfg = ReHistoGANConfig(
            image_size=image_size, network_capacity=network_capacity,
            latent_dim=latent_dim, style_depth=style_depth,
            transparent=transparent,
            fq_layers=tuple(int(x) for x in np.atleast_1d(fq_layers)) if len(fq_layers) else (),
            fq_dict_size=fq_dict_size,
            attn_layers=tuple(int(x) for x in np.atleast_1d(attn_layers)) if len(attn_layers) else (),
            hist_bin=hist_bin, hist_insz=hist_insz, hist_method=hist_method,
            hist_resizing=hist_resizing, hist_sigma=hist_sigma,
            batch_size=batch_size,
            gradient_accumulate_every=gradient_accumulate_every,
            learning_rate=lr, save_every=save_every,
            rec_loss=rec_loss, variance_loss=variance_loss,
            internal_hist=internal_hist, skip_conn_to_GAN=skip_conn_to_GAN,
            fixed_gan_weights=fixed_gan_weights, initialize_gan=initialize_gan,
            change_hyperparameters=change_hyperparameters,
            change_hyperparameters_after=change_hyperparameters_after,
            precision=precision, remat=bool(remat),
        )
        self.name = name
        self.results_dir = Path(results_dir)
        self.models_dir = Path(models_dir)
        (self.results_dir / name).mkdir(parents=True, exist_ok=True)
        self.store = CheckpointStore(models_dir, name)
        self.mesh = make_mesh(num_devices)
        self._key = jax.random.PRNGKey(seed)
        self.steps = 0
        self.d_loss = self.g_loss = self.h_loss = self.r_loss = 0.0
        self.var_loss = self.last_gp_loss = self.last_cr_loss = self.q_loss = 0.0
        self.state: Optional[ReHistoGANState] = None
        self.loader = None
        self.pool: Optional[HistogramPool] = None
        self._eval_cache: Dict[Any, Any] = {}
        self._staged_batch = None  # double-buffered H2D (see train())
        self.device_dataset = device_dataset  # see Trainer.device_dataset

        from histogan_tpu.utils.logging import MetricsLogger

        self.metrics_logger = MetricsLogger(
            results_dir, name, every=50,
            imgs_per_step=batch_size * gradient_accumulate_every,
        )

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------ setup
    def init_GAN(self) -> None:
        cfg = self.cfg
        self.ED = RecoloringEncoderDecoder(
            cfg.image_size, cfg.network_capacity, cfg.hist_bin, cfg.latent_dim,
            cfg.style_depth, cfg.skip_conn_to_GAN, cfg.internal_hist,
            remat=cfg.remat,
        )
        self.H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
        self.G = RecoloringGAN(cfg.image_size, cfg.latent_dim,
                               cfg.network_capacity, cfg.transparent,
                               remat=cfg.remat)
        self.D = Discriminator(cfg.image_size, cfg.network_capacity,
                               cfg.fq_layers, cfg.fq_dict_size,
                               cfg.attn_layers, cfg.transparent,
                               remat=cfg.remat)
        self.models = RecolorModels(self.ED, self.H, self.G, self.D)

        ks = jax.random.split(self._next_key(), 5)
        size = cfg.image_size
        img = jnp.zeros((1, size, size, 3))
        hist = jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin))
        h_w = jnp.zeros((1, cfg.latent_dim))
        noise = jnp.zeros((1, size, size, 1))

        ed_hist_arg = h_w if cfg.internal_hist else hist
        ed_out = self.ED.init(ks[0], img, ed_hist_arg)
        ed_params = ed_out["params"]
        # probe ED output shapes for G init
        ed_apply = self.ED.apply(ed_out, img, ed_hist_arg)
        if cfg.skip_conn_to_GAN:
            latent, rgb, pl1, pl2 = ed_apply
        else:
            latent, rgb = ed_apply
            pl1 = pl2 = None
        params_g = {
            "ED": ed_params,
            "H": self.H.init(ks[1], hist)["params"],
            "G": self.G.init(ks[2], latent, rgb, h_w, noise, pl1, pl2)["params"],
        }
        d_vars = self.D.init(ks[3], img)
        params_d = d_vars["params"]
        vq_stats = d_vars.get("vq_stats", {})  # fq_layers codebooks

        sdt = jnp.bfloat16 if self.opt_state_dtype == "bf16" else None
        self.g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9, state_dtype=sdt)
        self.d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9, state_dtype=sdt)
        state = ReHistoGANState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g, params_d=params_d,
            opt_g=self.g_tx.init(params_g), opt_d=self.d_tx.init(params_d),
            vq_stats=vq_stats,
        )
        self.state = self._place(state)
        self._train_step = make_rehisto_train_step(
            self.models, self.g_tx, self.d_tx, cfg,
            state_shardings=self._shardings,
        )

    def _place(self, state):
        """Put a host/replicated state onto the mesh per param_sharding."""
        if self.param_sharding == "fsdp":
            from histogan_tpu.parallel import shard_state, state_shardings

            if self._shardings is None:
                self._shardings = state_shardings(state, self.mesh)
            return shard_state(state, self.mesh, self._shardings)
        return replicate(state, self.mesh)

    def _host_state(self):
        """Full state to host RAM (all-gathers first under FSDP)."""
        s = self.state
        if self.param_sharding == "fsdp":
            from histogan_tpu.parallel import unshard

            s = unshard(s, self.mesh)
        return jax.device_get(s)

    def load_histogan_head(self, histogan_trainer) -> None:
        """Transplant a pretrained histoGAN's EMA head: GE.blocks[-2:] ->
        G.blocks, HE -> H (rehistoGAN.py:355-357). Pass a loaded
        histogan Trainer."""
        assert self.state is not None, "init_GAN first"
        ema = jax.device_get(histogan_trainer.state.ema)
        g_src = ema["G"]
        n = histogan_trainer.cfg.num_layers
        host = self._host_state()
        params_g = dict(host.params_g)
        params_g["G"] = dict(params_g["G"])
        params_g["G"]["blocks_0"] = g_src[f"blocks_{n - 2}"]
        params_g["G"]["blocks_1"] = g_src[f"blocks_{n - 1}"]
        params_g["H"] = ema["H"]
        self.state = self._place(host.replace(params_g=params_g))

    # ------------------------------------------------------------- data
    def set_data_src(self, folder: str, sampling: bool = True) -> None:
        cfg = self.cfg
        self.dataset = ImageFolderDataset(folder, cfg.image_size, cfg.transparent,
                                          cache_dir=str(self.store.dir))
        self.pool = HistogramPool(
            self.dataset.paths, cfg.hist_insz, cfg.hist_bin, cfg.hist_method,
            cfg.hist_resizing, cfg.hist_sigma, cfg.transparent,
            cache_dir=str(self.store.dir),
        )
        from histogan_tpu.data.device_source import (
            DeviceDataSource, device_dataset_mode,
        )

        # pass the DATASET's own aug_prob (not a config lookup) so the
        # eligibility check can never drift from how the dataset was
        # actually constructed (ADVICE r2)
        mode = device_dataset_mode(self.device_dataset, self.dataset,
                                   self.pool, self.mesh,
                                   self.dataset.aug_prob)
        if mode:
            self.loader = DeviceDataSource(
                np.asarray(self.dataset._cache), self.pool.pool, self.mesh,
                cfg.batch_size, cfg.gradient_accumulate_every, seed=11,
                self_hist=not sampling, include_g_images=True,
                shard_cache=(mode == "sharded"),
                aug_prob=self.dataset.aug_prob,  # device-side crop when
                # the user forced device_dataset=True with aug enabled
            )
        else:
            self.loader = TrainLoader(
                self.dataset, self.pool, cfg.batch_size,
                cfg.gradient_accumulate_every, seed=11,
                self_hist=not sampling, include_g_images=True,
                # num_workers (reference DataLoader knob) -> prefetch
                # depth; see train/trainer.py num_workers note
                prefetch=max(2, self.num_workers or 0),
            )
        self._staged_batch = None  # new source -> drop any staged batch
        self._eval_rng = np.random.default_rng(99)

    # ------------------------------------------------------------ train
    def train(self, alpha: float = 32.0, beta: float = 1.5, gamma: float = 4.0):
        assert self.loader is not None, (
            "You must first initialize the data source with "
            "`.set_data_src(<folder of images>)`"
        )
        if self.state is None:
            self.init_GAN()
        if (self.steps >= self.cfg.change_hyperparameters_after
                and self.cfg.change_hyperparameters):
            alpha, gamma, beta = 8.0, 2.0, 1.0  # rehistoGAN.py:900-905

        apply_gp = self.steps % 4 == 0
        from histogan_tpu.data.device_source import (
            stage_next_batch, take_batch,
        )

        batch = take_batch(self.loader, self.mesh, self._staged_batch)
        self.state, metrics = self._train_step(
            self.state, batch, self._next_key(), apply_gp=apply_gp,
            alpha=float(alpha), beta=float(beta), gamma=float(gamma),
        )
        self._staged_batch = stage_next_batch(self.loader, self.mesh)

        checkpoint_num = self.steps // self.cfg.save_every
        must_sync = (
            self.sync_every == 1
            or self.steps % self.sync_every == 0
            or self.steps % self.cfg.save_every == 0
        )
        if must_sync:
            m = {k: float(v) for k, v in metrics.items()}
            self.metrics_logger.log(self.steps, m)
            self.d_loss, self.g_loss = m["d_loss"], m["g_loss"]
            self.h_loss, self.r_loss = m["h_loss"], m["r_loss"]
            self.var_loss = m["var_loss"]
            self.q_loss = m["q_loss"]
            if apply_gp:
                self.last_gp_loss = m["gp_loss"]

            if math.isnan(self.g_loss) or math.isnan(self.d_loss):
                print(
                    f"NaN detected for generator or discriminator. "
                    f"Loading from checkpoint #{checkpoint_num}"
                )
                self.load(checkpoint_num)
                raise NanException

        # all processes run the jitted save/eval computation (multi-host
        # collectives); file IO is host-0-gated inside save/evaluate
        if self.steps % self.cfg.save_every == 0:
            self.save(checkpoint_num)
        if self.steps % 1000 == 0 or (self.steps % 100 == 0 and self.steps < 2500):
            self.evaluate(self.steps // 1000,
                          triple_hist=not self.cfg.fixed_gan_weights)
        self.steps += 1

    # ------------------------------------------------------------- eval
    def _recolor(self, image_batch: jnp.ndarray, hist_batch: jnp.ndarray) -> jnp.ndarray:
        key = ("recolor", image_batch.shape, hist_batch.shape)
        if key not in self._eval_cache:
            self._eval_cache[key] = jax.jit(
                lambda p, img, hist, noise: recolor_forward(
                    self.models, p, img, hist, noise, self.cfg
                )
            )
        noise = jax.random.uniform(
            self._next_key(),
            (image_batch.shape[0], image_batch.shape[1], image_batch.shape[2], 1),
        )
        return self._eval_cache[key](
            self.state.params_g, image_batch, hist_batch, noise
        )

    def evaluate(self, num: int = 0, image_batch=None, hist_batch=None,
                 triple_hist: bool = False, double_hist: bool = False,
                 resizing=None, resizing_method=None, swapping_levels: int = 1,
                 pyramid_levels: int = 5, level_blending: bool = False,
                 original_size=None, input_image_name=None, original_image=None,
                 post_recoloring: bool = False, save_input: bool = True):
        cfg = self.cfg
        if hist_batch is None or image_batch is None:
            assert self.pool is not None, "set_data_src first"
            rng = self._eval_rng
            idx = rng.integers(0, len(self.dataset), size=4)
            image_batch = jnp.asarray(
                np.stack([self.dataset.get_image(int(i), rng) for i in idx])
            )
            img_bt_sz = image_batch.shape[0]
            hist_batch = jnp.asarray(self.pool.sample_interpolated(rng, 4))
            if triple_hist:
                image_batch = jnp.concatenate([image_batch] * 3, axis=0)
                hist_batch = jnp.asarray(
                    np.concatenate([np.asarray(hist_batch),
                                    self.pool.sample_interpolated(rng, 4),
                                    self.pool.sample_interpolated(rng, 4)])
                )
            elif double_hist:
                image_batch = jnp.concatenate([image_batch] * 2, axis=0)
                hist_batch = jnp.asarray(
                    np.concatenate([np.asarray(hist_batch),
                                    self.pool.sample_interpolated(rng, 4)])
                )
        else:
            image_batch = jnp.asarray(image_batch)
            hist_batch = jnp.asarray(hist_batch)
            img_bt_sz = image_batch.shape[0]

        generated = self._recolor(image_batch, hist_batch)
        generated = jnp.clip(generated, 0.0, 1.0)

        ext = "jpg" if not cfg.transparent else "png"
        if double_hist or triple_hist:
            num_rows = img_bt_sz
        else:
            num_rows = int(np.ceil(np.sqrt(hist_batch.shape[0])))
        out_dir = self.results_dir / self.name
        output_name = out_dir / f"{num}-generated.{ext}"
        # compute runs on every process (multi-host collectives); file
        # writes and CPU post-processing are host-0 work
        if jax.process_index() != 0:
            return generated
        save_image_grid(np.asarray(generated), output_name, nrow=num_rows)

        if resizing is not None:
            if resizing == "upscaling":
                print("Upsampling")
                from histogan_tpu.data.dataset import load_rgb

                reference_img = load_rgb(input_image_name)
                if resizing_method == "BGU":
                    from histogan_tpu.post.bgu import bgu_upsample

                    out = bgu_upsample(reference_img, np.asarray(generated[0]))
                    save_image_grid(out[None], output_name, nrow=1)
                elif resizing_method == "pyramid":
                    from histogan_tpu.post.pyramid import pyramid_upsampling

                    out = pyramid_upsampling(
                        np.asarray(generated[0]), reference_img,
                        levels=pyramid_levels, swapping_levels=swapping_levels,
                        blending=level_blending,
                    )
                    save_image_grid(np.clip(out, 0, 1)[None], output_name, nrow=1)
            elif resizing == "downscaling" and original_size is not None:
                print("Resizing")
                from PIL import Image

                img = Image.open(output_name)
                img = img.resize((original_size[0], original_size[1]))
                img.save(output_name)

        if post_recoloring:
            print("Post-recoloring")
            from histogan_tpu.post.mkl import color_transfer_MKL

            target = np.asarray(generated[0])
            result = color_transfer_MKL(original_image, target)
            save_image_grid(result[None], output_name, nrow=1)

        if save_input:
            save_image_grid(
                np.asarray(image_batch[:img_bt_sz]),
                out_dir / f"{num}-input.{ext}",
                nrow=img_bt_sz if (double_hist or triple_hist) else num_rows,
            )
        return generated

    # ------------------------------------------------------ persistence
    def save(self, num: int) -> None:
        assert self.state is not None
        # store.save must run on ALL processes (orbax syncs internally
        # and gates file writes to host 0 — train/checkpoint.py note)
        host_state = self._host_state()
        self.store.save(host_state, num)
        if jax.process_index() == 0:
            self.cfg.write_config(self.store.config_path)

    def load(self, num: int = -1) -> int:
        self.cfg = self.cfg.load_config(self.store.config_path)
        self.init_GAN()
        name = num
        if num == -1:
            latest = self.store.latest()
            if latest is None:
                return -1
            name = latest
            print(f"continuing from previous epoch - {name}")
        self.steps = name * self.cfg.save_every
        template = self._host_state()
        self.state = self._place(self.store.restore(name, template))
        return 0

    def clear(self) -> None:
        self.store.clear()
        import shutil

        shutil.rmtree(self.results_dir / self.name, ignore_errors=True)
        (self.results_dir / self.name).mkdir(parents=True, exist_ok=True)

    def print_log(self) -> None:
        print(
            f"\nG: {self.g_loss:.2f} | H: {self.h_loss:.2f} | "
            f"D: {self.d_loss:.2f} | R: {self.r_loss:.2f} "
            f"| V: {self.var_loss:.2f} | GP: {self.last_gp_loss:.2f}"
            f" | CR: {self.last_cr_loss:.2f} | Q: {self.q_loss:.2f}"
        )
