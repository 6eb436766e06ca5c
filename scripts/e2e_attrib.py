"""Same-window attribution of the e2e loop overhead for BOTH trainers
(VERDICT r2 #5: rehisto e2e ran at 67% of its device-resident step vs
81% for histoGAN — close it or attribute it with the same rigor).

For each family, in ONE process (same tunnel-link window):
  loader   — next(loader) alone (packed-draw upload + jitted gather)
  step     — _train_step on a FIXED batch (device-resident compute)
  train()  — the full Trainer.train() loop step (loader + step + host)

overhead = train() - step; the loader row shows how much of it is the
data path vs host bookkeeping (key splitting, logging, cadence checks).

Usage: python -u scripts/e2e_attrib.py [--steps 24]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def fetch(tree):
    return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0]
                         .astype(jnp.float32)))


def run_family(rehisto: bool, data: str, steps: int,
               batch: int = 16, opt: str = None, ema: str = None):
    fam = "rehistogan" if rehisto else "histogan"
    print(f"\n==== {fam} ====", flush=True)
    if rehisto:
        from histogan_tpu.train.rehisto_trainer import RecoloringTrainer

        tr = RecoloringTrainer(
            name=f"attrib_{fam}", results_dir="/tmp/attrib_results",
            models_dir="/tmp/attrib_models", image_size=256,
            network_capacity=16, batch_size=batch,
            gradient_accumulate_every=1, opt_state_dtype=opt,
            precision="bf16", sync_every=10 ** 9, save_every=10 ** 9,
            skip_conn_to_GAN=True, variance_loss=True,
        )
        tr.set_data_src(data, sampling=True)
        step_kwargs = dict(alpha=32.0, beta=1.5, gamma=4.0)
    else:
        from histogan_tpu.train.trainer import Trainer

        tr = Trainer(
            name=f"attrib_{fam}", results_dir="/tmp/attrib_results",
            models_dir="/tmp/attrib_models", image_size=256,
            network_capacity=16, batch_size=batch,
            gradient_accumulate_every=1, opt_state_dtype=opt,
            ema_dtype=ema,
            precision="bf16", sync_every=10 ** 9, save_every=10 ** 9,
        )
        tr.set_data_src(data)
        step_kwargs = {}
    print(f"loader: {type(tr.loader).__name__}", flush=True)

    # warmup: compile all schedule variants + the gather program
    for _ in range(8):
        tr.train(**step_kwargs)
    fetch(tr.state.params_d)

    # ---- loader alone
    b = next(tr.loader)
    fetch(b)
    t0 = time.perf_counter()
    for _ in range(steps):
        b = next(tr.loader)
    fetch(b)
    loader_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"loader only:  {loader_ms:7.2f} ms/batch", flush=True)

    # ---- step alone on a fixed batch (off-GP-schedule step: the
    # common 3/4 case; then the amortized schedule below)
    key = jax.random.PRNGKey(1)
    if rehisto:
        call = lambda i, gp: tr._train_step(
            tr.state, b, jax.random.fold_in(key, i), apply_gp=gp,
            alpha=32.0, beta=1.5, gamma=4.0)
    else:
        call = lambda i, gp: tr._train_step(
            tr.state, b, jax.random.fold_in(key, i), apply_gp=gp,
            apply_pl=False, apply_ema=False)
    tr.state, m = call(0, True)
    fetch(m["d_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        tr.state, m = call(i, i % 4 == 0)
    fetch(m["d_loss"])
    step_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"step only:    {step_ms:7.2f} ms/step (gp/4 schedule)", flush=True)

    # ---- full train() loop
    t0 = time.perf_counter()
    start = tr.steps
    while tr.steps < start + steps:
        tr.train(**step_kwargs)
    fetch(tr.state.params_d)
    train_ms = (time.perf_counter() - t0) / steps * 1e3
    rate = float(batch) / train_ms * 1e3
    print(f"train() loop: {train_ms:7.2f} ms/step = {rate:.1f} imgs/s "
          f"({step_ms / train_ms * 100:.0f}% of step-only)", flush=True)
    print(f"overhead: {train_ms - step_ms:+.2f} ms/step "
          f"(loader accounts for <= {loader_ms:.2f})", flush=True)
    tr.loader.close()
    return dict(loader_ms=loader_ms, step_ms=step_ms, train_ms=train_ms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--data", default="/tmp/e2e_data")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--opt", default=None, choices=(None, "fp32", "bf16"))
    ap.add_argument("--ema", default=None, choices=(None, "fp32", "bf16"),
                    help="histoGAN Trainer ema_dtype (rehisto has no EMA)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from bench_e2e import make_synthetic_dataset

    make_synthetic_dataset(args.data)
    h = run_family(False, args.data, args.steps, args.batch, args.opt,
                   args.ema)
    r = run_family(True, args.data, args.steps, args.batch, args.opt)
    print("\n==== summary (same link window) ====", flush=True)
    for fam, d in (("histogan", h), ("rehistogan", r)):
        print(f"{fam}: loader {d['loader_ms']:.1f} ms, step "
              f"{d['step_ms']:.1f} ms, loop {d['train_ms']:.1f} ms "
              f"({d['step_ms'] / d['train_ms'] * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
