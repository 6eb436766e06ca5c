"""Round-4 perf levers, measured (DESIGN.md 'Round-4 mixed-regime
ceiling' deferred items):

1. FUSED OPTIMIZER APPLICATION — does materializing the `updates` tree
   between DiffGrad's per-leaf fusion and the `params + updates` add
   cost HBM traffic, or does XLA already fuse the add into the same
   per-leaf pass? Measured as an optimizer-application-only microbench
   at the flagship tree sizes (cap16/256px G+D params), two-stage
   (optax contract: tx.update then tree add) vs hand-fused (the add
   inside the per-leaf fusion), with compiled cost_analysis deltas.

2. ema_dtype='bf16' — bench.measure rows at the reference batch and the
   b128+optbf16 preset (full GP/4 + PL/32 + EMA/10 schedule).

One TPU client; run with `python -u scripts/levers_r4.py` and WAIT
(never kill — CLAUDE.md tunnel rules).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("LEVERS_CPU"):  # smoke/equality run off-TPU
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build_trees():
    """Flagship-sized param trees (256px cap16) exactly as bench.py
    builds them."""
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(image_size=256, network_capacity=16, batch_size=16,
                         gradient_accumulate_every=1)
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    nl = cfg.num_layers
    params_g = {
        "S": S.init(ks[0], jnp.zeros((1, cfg.latent_dim)))["params"],
        "H": H.init(ks[1], jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin)))["params"],
        "G": G.init(ks[2], jnp.zeros((1, nl - 2, cfg.latent_dim)),
                    jnp.zeros((1, 2, cfg.latent_dim)),
                    jnp.zeros((1, 256, 256, 1)))["params"],
    }
    params_d = D.init(ks[3], jnp.zeros((1, 256, 256, 3)))["params"]
    return cfg, params_g, params_d


def like_tree(tree, key, scale=1e-3):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [scale * jax.random.normal(k, x.shape, x.dtype)
         for k, x in zip(keys, leaves)],
    )


def time_fn(fn, args, donate_chain, n=None, windows=None):
    n = n or int(os.environ.get("LEVERS_N", "30"))
    windows = windows or int(os.environ.get("LEVERS_WINDOWS", "3"))
    """Time a donated-state chain: args[0..donate_chain) are threaded
    through; one value fetch at the end of each window synchronizes."""
    rates = []
    state = args[:donate_chain]
    rest = args[donate_chain:]
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            state = fn(*state, *rest)
        x = jax.tree_util.tree_leaves(state)[0]
        float(jnp.asarray(x).ravel()[0])
        rates.append((time.perf_counter() - t0) / n * 1000.0)
    return min(rates)


def probe_fused_opt():
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.optim.diffgrad import DiffGradState

    cfg, params_g, params_d = build_trees()
    lr, b1, b2, eps = cfg.learning_rate, 0.5, 0.9, 1e-8
    g_tx = diffgrad(lr, b1, b2)
    d_tx = diffgrad(lr, b1, b2)
    opt_g = g_tx.init(params_g)
    opt_d = d_tx.init(params_d)
    grads_g = like_tree(params_g, jax.random.PRNGKey(1))
    grads_d = like_tree(params_d, jax.random.PRNGKey(2))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves((params_g, params_d)))
    print(f"# trees built: {n_params/1e6:.1f}M params", flush=True)

    def two_stage(pg, pd, og, od, gg, gd):
        ug, og2 = g_tx.update(gg, og, pg)
        pg2 = jax.tree_util.tree_map(jnp.add, pg, ug)
        ud, od2 = d_tx.update(gd, od, pd)
        pd2 = jax.tree_util.tree_map(jnp.add, pd, ud)
        return pg2, pd2, og2, od2

    def fused_one(params, state, grads):
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(b2c) / b1c

        def _leaf(p, g, m, v, gp):
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            dfc = jax.nn.sigmoid(jnp.abs(gp - g))
            return p - step_size * dfc * m2 / (jnp.sqrt(v2) + eps), m2, v2

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_gp = treedef.flatten_up_to(state.previous_grad)
        outs = [_leaf(p, g, m, v, gp) for p, g, m, v, gp
                in zip(flat_p, flat_g, flat_m, flat_v, flat_gp)]
        unf = lambda i: jax.tree_util.tree_unflatten(treedef, [o[i] for o in outs])
        return unf(0), DiffGradState(count=count, exp_avg=unf(1),
                                     exp_avg_sq=unf(2), previous_grad=grads)

    def fused(pg, pd, og, od, gg, gd):
        pg2, og2 = fused_one(pg, og, gg)
        pd2, od2 = fused_one(pd, od, gd)
        return pg2, pd2, og2, od2

    copy_tree = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    out = {}
    check = {}
    for name, fn in (("two_stage", two_stage), ("fused", fused)):
        jfn = jax.jit(fn, donate_argnums=(0, 1, 2, 3))
        t0 = time.perf_counter()
        compiled = jfn.lower(params_g, params_d, opt_g, opt_d,
                             grads_g, grads_d).compile()
        print(f"# {name}: compiled in {time.perf_counter()-t0:.1f}s", flush=True)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        out[f"{name}_bytes_gb"] = round(
            float(ca.get("bytes accessed", float("nan"))) / 2**30, 3)
        # ONE pass from the pristine inputs for the cross-check (fresh
        # copies are donated, originals stay alive for the next probe)
        res = compiled(copy_tree(params_g), copy_tree(params_d),
                       copy_tree(opt_g), copy_tree(opt_d), grads_g, grads_d)
        check[name] = jax.device_get(
            jax.tree_util.tree_leaves(res[0])[0])
        ms = time_fn(compiled,
                     (copy_tree(params_g), copy_tree(params_d),
                      copy_tree(opt_g), copy_tree(opt_d), grads_g, grads_d),
                     donate_chain=4)
        del res
        out[f"{name}_ms"] = round(ms, 3)
        print(json.dumps({name: out[f"{name}_ms"],
                          "bytes_gb": out[f"{name}_bytes_gb"]}), flush=True)
        time.sleep(2)

    # identical math, only fusion boundaries differ — one-step cross-check
    out["first_leaf_max_diff"] = float(
        np.max(np.abs(check["two_stage"] - check["fused"])))
    return out


def main():
    results = {"probe": "levers_r4"}
    if os.environ.get("LEVERS_FUSE", "1") != "0":
        results.update(probe_fused_opt())
        print(json.dumps(results), flush=True)

    if os.environ.get("LEVERS_EMA", "1") != "0":
        import bench

        # reference batch first (smaller working set), then the preset
        results["ema_bf16_batch16"] = round(
            bench.measure("bf16", ema_dtype="bf16"), 2)
        print(json.dumps(results), flush=True)
        results["ema_bf16_batch128_optbf16"] = round(
            bench.measure("bf16", n_steps=16, batch_size=128,
                          opt_state_dtype="bf16", ema_dtype="bf16"), 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
