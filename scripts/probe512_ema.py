"""Does ema_dtype='bf16' buy BATCH at 512px cap16?

r3 established the single-chip 512px ceiling: batch 8 with remat +
opt_state_dtype bf16 (31.68 imgs/sec amortized, scripts/knee512.py);
batch 16 was a runtime HBM OOM even rematted. ema bf16 frees another
~1.4 GiB of state (DESIGN.md Round-4b) — this probe asks whether that
moves the batch knee: try plain-step b16, then b12, then run the full
variant set at the largest batch that fits (knee512's one-AOT-per-
variant memory hygiene throughout).

Usage: KNEE512 protocol applies — one TPU client, run in background,
never kill. `python -u scripts/probe512_ema.py`.
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import knee512


def plain_fits(bs: int) -> float | None:
    """Compile + run the plain(+ema) variant at batch ``bs``; return
    ms/step or None on OOM. One AOT executable, everything freed."""
    try:
        step, state, batch, key = knee512.build(
            bs, "bf16", split=False, remat=True, ema_dtype="bf16")
        compiled = step.lower(state, batch, key, apply_gp=False,
                              apply_pl=False, apply_ema=True).compile()
        state, m = compiled(state, batch, key)
        float(m["d_loss"])
        t0 = time.perf_counter()
        for i in range(6):
            state, m = compiled(state, batch, jax.random.fold_in(key, i))
        dl = float(m["d_loss"])
        dt = (time.perf_counter() - t0) / 6
        print(f"512 b{bs} remat ema=bf16 plain+ema: {dt*1e3:.2f} ms "
              f"({bs/dt:.2f} imgs/s) d_loss={dl:.4g} "
              f"finite={np.isfinite(dl)}", flush=True)
        del compiled, step, state, batch
        gc.collect()
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"512 b{bs} remat ema=bf16 plain FAILED "
              f"{type(e).__name__}: {e}"[:300], flush=True)
        gc.collect()
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    best = None
    for bs in (16, 12):
        if plain_fits(bs) is not None:
            best = bs
            break
    if best is None:
        print("neither b16 nor b12 fits; re-timing the b8 recipe with "
              "ema bf16 for the record", flush=True)
        best = 8
    knee512.aot_section(best, "bf16", remat=True, ema_dtype="bf16")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
