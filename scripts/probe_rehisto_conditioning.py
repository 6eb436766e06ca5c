"""CPU probe: how sensitive is the trained reHistoGAN output to the
target histogram, vs at random init? Distinguishes 'conditioning path
blocked' from 'training suppressed conditioning'."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from pathlib import Path
from PIL import Image

from histogan_tpu.train.rehisto_trainer import RecoloringTrainer
from histogan_tpu.cli.histogan import load_target_hist
from histogan_tpu.ops.histogram import RGBuvHistBlock

OUT = Path("/tmp/quality_run_rehisto")
image_size = 128

t = RecoloringTrainer(
    name="rehisto128", results_dir=str(OUT / "results"),
    models_dir=str(OUT / "models"),
    image_size=image_size, network_capacity=16, batch_size=32,
    gradient_accumulate_every=1, precision="bf16", seed=0,
    skip_conn_to_GAN=True, variance_loss=True,
    rec_loss="laplacian", internal_hist=False,
)
t.init_GAN()

cfg = t.cfg
block = RGBuvHistBlock(insz=cfg.hist_insz, h=cfg.hist_bin,
                       resizing=cfg.hist_resizing, method=cfg.hist_method,
                       sigma=cfg.hist_sigma)
srcs = sorted(Path("/root/reference/input_images").glob("*.jpg"))[:2]
imgs = np.stack([
    np.asarray(Image.open(p).convert("RGB").resize(
        (image_size, image_size), Image.LANCZOS), np.float32) / 255.0
    for p in srcs])
tgts = sorted(Path("/root/reference/target_images").glob("*.jpg"))
h1 = np.repeat(load_target_hist(str(tgts[0]), block), 2, axis=0)
h6 = np.repeat(load_target_hist(str(tgts[-1]), block), 2, axis=0)

def sens(tag):
    o1 = np.asarray(t._recolor(imgs, h1), np.float32)
    o6 = np.asarray(t._recolor(imgs, h6), np.float32)
    print(tag, "L1(out_h1, out_h6) =", float(np.abs(o1 - o6).mean()),
          "| mean RGB h1:", o1.reshape(-1, 3).mean(0).round(4),
          "h6:", o6.reshape(-1, 3).mean(0).round(4), flush=True)

sens("init   ")
t.load(-1)
print("loaded step", t.steps, flush=True)
t._eval_cache = {}
sens("trained")
