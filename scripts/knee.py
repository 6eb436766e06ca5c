"""Batch-size knee of the train step with clean memory hygiene.

One batch size per section, state freed + gc'd between sections (the
first roofline run leaked ~3.4 GB HistoGANState copies per variant and
hit RESOURCE_EXHAUSTED from b32+pl onward). Sections are independent:
an OOM in one (a genuinely too-big variant) doesn't kill the rest.

Usage: python -u scripts/knee.py [b1 b2 ...]   (default: 64 128 32)
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SUSTAINED_TFLOPS = 145.8
HBM_GBPS = 819.0
GIB = float(2 ** 30)


def run_batch(batch_size: int, variants, schedule_steps: int = 32):
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    # env knobs: KNEE_REMAT=1 (block remat), KNEE_OPT_BF16=1 (bf16
    # optimizer-state storage — the 501 imgs/sec b128 preset's knob)
    remat = os.environ.get("KNEE_REMAT", "0") == "1"
    opt_bf16 = os.environ.get("KNEE_OPT_BF16", "0") == "1"
    size = int(os.environ.get("KNEE_SIZE", "256"))
    cfg = HistoGANConfig(image_size=size, network_capacity=16,
                         batch_size=batch_size, gradient_accumulate_every=1,
                         precision="bf16", remat=remat)
    mesh = make_mesh()
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity,
                  remat=remat)
    D = Discriminator(cfg.image_size, cfg.network_capacity, remat=remat)
    models = Models(S, H, G, D)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    nl = cfg.num_layers
    # host-side parameter template; device state is built fresh per
    # variant and EXPLICITLY dropped afterwards
    params_g = jax.device_get({
        "S": S.init(ks[0], jnp.zeros((1, cfg.latent_dim)))["params"],
        "H": H.init(ks[1], jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin)))["params"],
        "G": G.init(
            ks[2],
            jnp.zeros((1, nl - 2, cfg.latent_dim)),
            jnp.zeros((1, 2, cfg.latent_dim)),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 1)),
        )["params"],
    })
    params_d = jax.device_get(
        D.init(ks[3], jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"])
    sdt = jnp.bfloat16 if opt_bf16 else None
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9, state_dtype=sdt)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9, state_dtype=sdt)

    # opt-state zeros built from eval_shape so storage dtype always
    # matches the transform (fp32 or bf16)
    zeros_of = lambda tpl: jax.tree_util.tree_map(
        lambda sd: np.zeros(sd.shape, sd.dtype), tpl)
    opt_tpl_g = jax.eval_shape(g_tx.init, params_g)
    opt_tpl_d = jax.eval_shape(d_tx.init, params_d)

    def fresh_state():
        return replicate(HistoGANState(
            step=np.zeros((), np.int32), params_g=params_g, params_d=params_d,
            ema=params_g,
            opt_g=zeros_of(opt_tpl_g), opt_d=zeros_of(opt_tpl_d),
            pl_mean=np.zeros(()),
        ), mesh)

    rng = np.random.default_rng(0)
    a, b = 1, batch_size
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.random((a, b, cfg.image_size, cfg.image_size, 3), np.float32),
        "d_hists": norm(rng.random((a, b, 3, 64, 64), np.float32)),
        "g_hists": norm(rng.random((a, b, 3, 64, 64), np.float32)),
    }, mesh, batch_axis=1)
    step = make_train_step(models, g_tx, d_tx, cfg)

    # ONE device state for the whole section, uploaded once (a fresh
    # 3.4 GB state per variant costs 155 s on the 22 MB/s tunnel) and
    # threaded through every timed step via donation. ONE compile per
    # variant: the AOT-compiled executable is invoked directly — the
    # jit call path does NOT share the AOT persistent-cache entry on
    # this platform (measured: each path recompiled ~40 min at b64).
    results = {}
    state = fresh_state()
    for label, gp, pl in variants:
        try:
            lowered = step.lower(state, batch, ks[4],
                                 apply_gp=gp, apply_pl=pl)
            compiled = lowered.compile()
            c = compiled.cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            flops, nbytes = float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
            state, m = compiled(state, batch, ks[4])
            float(m["d_loss"])
            t0 = time.perf_counter()
            for i in range(8):
                state, m = compiled(state, batch, jax.random.fold_in(key, i))
            float(m["d_loss"])
            dt = (time.perf_counter() - t0) / 8
            t_b = nbytes / (HBM_GBPS * 1e9)
            print(f"b{batch_size} {label:<10} {dt*1e3:8.2f} ms  "
                  f"{b/dt:7.1f} imgs/s  {flops/1e9:8.1f} GF  "
                  f"{nbytes/GIB:6.2f} GiB  minB={t_b*1e3:6.2f}ms  "
                  f"eff={t_b/dt*100:5.1f}%", flush=True)
            results[label] = dt
            del compiled, lowered
        except Exception as e:  # noqa: BLE001
            print(f"b{batch_size} {label:<10} FAILED {type(e).__name__}: {e}"[:170],
                  flush=True)
            state = fresh_state()  # the old one may be donated/poisoned
        gc.collect()

    # full-schedule estimate from the variant times (gp on 8/32 steps,
    # pl on 1/32, the overlap at i=0; EMA every 10th adds ~1.2 GB of
    # ema read+write ~= 3 ms — counted as +1 ms/step amortized). The
    # bench.py driver run measures the real JIT-path schedule; this row
    # exists so the knee can rank batch sizes with ONE compile/variant.
    if all(k in results for k in ("plain", "+gp", "+gp+pl", "+pl")):
        # 32-step schedule: gp at i%4==0 (8 steps, one of which — i=0 —
        # is also the pl step) -> 24 plain + 7 gp-only + 1 gp+pl
        est = (24 * results["plain"] + 7 * results["+gp"]
               + results["+gp+pl"]) / 32 + 1e-3
        print(f"b{batch_size} SCHEDULE EST: {b/est:7.1f} imgs/s "
              f"({est*1e3:.1f} ms/step amortized)", flush=True)


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [64, 128, 32]
    print("devices:", jax.devices(),
          "remat:", os.environ.get("KNEE_REMAT", "0"),
          "opt_bf16:", os.environ.get("KNEE_OPT_BF16", "0"), flush=True)
    variants = [("plain", False, False), ("+gp", True, False),
                ("+pl", False, True), ("+gp+pl", True, True)]
    for bs in sizes:
        print(f"\n==== batch {bs} ====", flush=True)
        try:
            run_batch(bs, variants)
        except Exception as e:  # noqa: BLE001
            print(f"batch {bs} section failed: {type(e).__name__}: {e}"[:170],
                  flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
