"""Probe: which 512px-cap16 GRADIENT program crashes the dev env's
remote compile helper (HTTP 500 tpu_compile_helper)?

Context (BASELINE.md 512px note): the full cap-16 512px train step fails
to compile here in both fused and split-D/G forms, while 512px cap-16
*sampling* (forward-only) runs at 437 imgs/sec — so the crash is
specific to backward programs containing the 4096-channel convs.
This probe compiles minimal grad programs one at a time to localize the
trigger and test candidate workarounds (remat, bf16, channel-split).

Run on the real TPU: `python -u scripts/probe512.py` (one process,
every case wrapped in try/except so a helper 500 doesn't stop the
sweep).
"""
from __future__ import annotations

import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from histogan_tpu.ops.conv2dmod import conv2d_mod


def report(name, fn):
    t0 = time.time()
    try:
        out = fn()
        val = float(np.asarray(out).ravel()[0])
        print(f"PROBE {name}: OK ({time.time()-t0:.1f}s) val={val:.4g}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        print(f"PROBE {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {msg}", flush=True)
        return False


def case_conv_grad(cin, cout, hw=8, batch=4, dtype=jnp.bfloat16):
    """grad of a single modulated conv at the block-0 512/cap16 shape."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, hw, hw, cin), dtype)
    w = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.02
    s = jax.random.normal(key, (batch, cin), dtype) * 0.1

    def loss(w):
        return jnp.mean(conv2d_mod(x, w, s)).astype(jnp.float32)

    g = jax.jit(jax.grad(loss))(w)
    return jnp.mean(g).astype(jnp.float32)


def _models(capacity=16, image_size=512):
    from histogan_tpu.models.generator import Generator
    from histogan_tpu.models.discriminator import Discriminator

    G = Generator(image_size=image_size, network_capacity=capacity)
    D = Discriminator(image_size=image_size, network_capacity=capacity)
    return G, D


def case_g_grad(batch=2, remat=False, capacity=16):
    G, _ = _models(capacity)
    nl = G.num_layers
    key = jax.random.PRNGKey(0)
    styles = jnp.zeros((batch, nl - 2, 512), jnp.bfloat16)
    hists = jnp.zeros((batch, 2, 512), jnp.bfloat16)
    noise = jax.random.uniform(key, (batch, 512, 512, 1), jnp.bfloat16)
    params = jax.jit(G.init)(key, styles, hists, noise)["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    apply = lambda p: jnp.mean(
        G.apply({"params": p}, styles, hists, noise)).astype(jnp.float32)
    if remat:
        apply = jax.checkpoint(apply)

    g = jax.jit(jax.grad(apply))(params)
    leaves = jax.tree.leaves(g)
    return jnp.mean(leaves[0]).astype(jnp.float32)


def case_d_grad(batch=2, capacity=16):
    _, D = _models(capacity)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (batch, 512, 512, 3), jnp.bfloat16)
    params = jax.jit(D.init)(key, img)["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    def loss(p):
        logits, _ = D.apply({"params": p}, img)
        return jnp.mean(logits).astype(jnp.float32)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    return jnp.mean(leaves[0]).astype(jnp.float32)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    # 1. lone 4096->4096 modulated-conv grad (G block0 conv2 shape)
    results["conv4096_grad"] = report(
        "conv4096x4096_grad_b4_8x8", lambda: case_conv_grad(4096, 4096))
    # 2. lone 64->4096 (block0 conv1)
    results["conv64_4096_grad"] = report(
        "conv64x4096_grad_b4_8x8", lambda: case_conv_grad(64, 4096))
    # 3. D-only grad at 512 cap16
    results["d_grad"] = report("D512cap16_grad_b2", lambda: case_d_grad())
    # 4. G-only grad at 512 cap16
    results["g_grad"] = report("G512cap16_grad_b2", lambda: case_g_grad())
    # 5. if G fails, try full-remat G grad
    if not results["g_grad"]:
        results["g_grad_remat"] = report(
            "G512cap16_grad_b2_remat", lambda: case_g_grad(remat=True))
    print("SUMMARY", results, flush=True)


if __name__ == "__main__":
    sys.exit(main())
