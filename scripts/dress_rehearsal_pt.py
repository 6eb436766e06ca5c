"""Full-shape pretrained-artifact dress rehearsal (VERDICT r4 #4).

The reference ships on downloaded ``.pt`` checkpoints
(/root/reference/README.md:306-317, save contract
histoGAN/histoGAN.py:1121); this zero-egress box can never download
one, so the day a real artifact appears the ingestion pipeline must be
known-good — not first-tried. This script builds synthetic
reference-layout bundles at the REAL flagship shapes (256px,
capacity 16, latent 512, style depth 8; histoGAN with EMA copies,
reHistoGAN with skip_conn_to_GAN) through the export converters
(train/convert.py export_* — themselves pinned bitwise against the
import converters in tests/test_export_pt.py), then drives the REAL
CLIs on the TPU exactly as a user holding published weights would:

    histogan   --new True --generate True --load_pt histogan_flagship.pt \
               --target_hist <bundled reference target image>
    rehistogan --generate True --load_pt rehisto_flagship.pt \
               --input_image <bundled reference input image>

and finally computes a provenance-labeled (random-feature, relative)
FID between the generated tiles and real reference images. Weights are
random, so the samples are noise — the rehearsal proves the pipeline
(.pt -> convert -> install -> jit -> sample -> grid -> FID), not
quality.

One TPU client; run in background, never kill.
Usage: python -u scripts/dress_rehearsal_pt.py
"""

import json
import os
import sys
import time
from math import log2
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

OUT = Path("/tmp/dress_rehearsal")
IMAGE_SIZE, CAP, LATENT, DEPTH, HIST_BIN = 256, 16, 512, 8, 64


def _rand_like(tree, seed, scale=0.02):
    import jax

    rng = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: hasattr(x, "shape"))
    out = [(rng.standard_normal(l.shape) * scale).astype(np.float32)
           for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def build_histogan_pt(path: str) -> int:
    """Flagship-shape reference-layout histoGAN .pt (with EMA copies)."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.models import (Discriminator, Generator,
                                     HistVectorizer, StyleVectorizer)
    from histogan_tpu.train import convert

    num_layers = int(log2(IMAGE_SIZE) - 1)
    key = jax.random.PRNGKey(0)
    g = jax.eval_shape(
        Generator(IMAGE_SIZE, LATENT, CAP).init, key,
        jax.ShapeDtypeStruct((1, num_layers - 2, LATENT), jnp.float32),
        jax.ShapeDtypeStruct((1, 2, LATENT), jnp.float32),
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32),
    )["params"]
    d = jax.eval_shape(
        Discriminator(IMAGE_SIZE, CAP).init, key,
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
    )["params"]
    s = jax.eval_shape(
        StyleVectorizer(LATENT, DEPTH).init, key,
        jax.ShapeDtypeStruct((1, LATENT), jnp.float32))["params"]
    h = jax.eval_shape(
        HistVectorizer(HIST_BIN, LATENT, DEPTH).init, key,
        jax.ShapeDtypeStruct((1, 3, HIST_BIN, HIST_BIN), jnp.float32),
    )["params"]
    bundle = {
        "params_g": {"S": _rand_like(s, 1), "H": _rand_like(h, 2),
                     "G": _rand_like(g, 3)},
        "params_d": _rand_like(d, 4),
        "ema": {"S": _rand_like(s, 5), "H": _rand_like(h, 6),
                "G": _rand_like(g, 7)},
    }
    sd = convert.export_histogan_checkpoint(bundle)
    convert.save_pt_file(sd, path)
    return len(sd)


def build_rehisto_pt(path: str) -> int:
    """Flagship-shape reference-layout reHistoGAN .pt."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.models import (Discriminator, HistVectorizer,
                                     RecoloringEncoderDecoder, RecoloringGAN)
    from histogan_tpu.models.generator import generator_filters
    from histogan_tpu.train import convert

    key = jax.random.PRNGKey(0)
    ed = jax.eval_shape(
        RecoloringEncoderDecoder(IMAGE_SIZE, CAP, HIST_BIN, LATENT, DEPTH,
                                 skip_conn_to_GAN=True).init, key,
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 3, HIST_BIN, HIST_BIN), jnp.float32),
    )["params"]
    pairs = generator_filters(IMAGE_SIZE, CAP)[-2:]
    g = jax.eval_shape(
        RecoloringGAN(IMAGE_SIZE, LATENT, CAP).init, key,
        jax.ShapeDtypeStruct(
            (1, IMAGE_SIZE // 4, IMAGE_SIZE // 4, pairs[0][0]), jnp.float32),
        None,
        jax.ShapeDtypeStruct((1, LATENT), jnp.float32),
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32),
    )["params"]
    d = jax.eval_shape(
        Discriminator(IMAGE_SIZE, CAP).init, key,
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
    )["params"]
    h = jax.eval_shape(
        HistVectorizer(HIST_BIN, LATENT, DEPTH).init, key,
        jax.ShapeDtypeStruct((1, 3, HIST_BIN, HIST_BIN), jnp.float32),
    )["params"]
    bundle = {
        "params_g": {"ED": _rand_like(ed, 11), "H": _rand_like(h, 12),
                     "G": _rand_like(g, 13)},
        "params_d": _rand_like(d, 14),
    }
    sd = convert.export_rehistogan_checkpoint(bundle)
    convert.save_pt_file(sd, path)
    return len(sd)


def grid_tiles(grid_path: str, tile: int, n: int, nrow: int,
               padding: int = 2) -> np.ndarray:
    """Invert utils/image_io.make_grid geometry -> (n, tile, tile, 3)."""
    from PIL import Image

    g = np.asarray(Image.open(grid_path).convert("RGB"), np.float32) / 255.0
    tiles = []
    for k in range(n):
        r, c = divmod(k, nrow)
        y = r * (tile + padding) + padding
        x = c * (tile + padding) + padding
        tiles.append(g[y:y + tile, x:x + tile])
    return np.stack(tiles)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    OUT.mkdir(parents=True, exist_ok=True)
    os.chdir(OUT)
    record = {"image_size": IMAGE_SIZE, "capacity": CAP}

    t0 = time.time()
    n_keys_h = build_histogan_pt("histogan_flagship.pt")
    n_keys_r = build_rehisto_pt("rehisto_flagship.pt")
    record["histogan_pt_keys"] = n_keys_h
    record["rehisto_pt_keys"] = n_keys_r
    record["histogan_pt_mb"] = round(
        os.path.getsize("histogan_flagship.pt") / 1e6, 1)
    record["rehisto_pt_mb"] = round(
        os.path.getsize("rehisto_flagship.pt") / 1e6, 1)
    print(json.dumps({"built_pt_files_s": round(time.time() - t0, 1),
                      **record}), flush=True)

    target = "/root/reference/target_images/2.jpg"
    inp = "/root/reference/input_images/0.jpg"

    # ---- histoGAN: --load_pt -> generate (the README workflow) --------
    from histogan_tpu.cli import histogan as hg_cli

    t0 = time.time()
    hg_cli.main([
        "--new", "True", "--generate", "True",
        "--load_pt", "histogan_flagship.pt", "--target_hist", target,
        "--name", "dress", "--results_dir", "res", "--models_dir", "mod",
        "--image_size", str(IMAGE_SIZE), "--network_capacity", str(CAP),
        "--num_image_tiles", "8",
    ])
    outs = sorted(Path("res/dress").glob("generated-2-*"))
    assert outs, "histoGAN --load_pt generate produced no output"
    print(json.dumps({"histogan_generate_s": round(time.time() - t0, 1),
                      "grid": str(outs[-1])}), flush=True)

    # ---- FID over the generated tiles vs real reference images --------
    from PIL import Image

    from histogan_tpu.metrics.fid import FIDScorer, default_extractor

    fake = grid_tiles(str(outs[-1]), IMAGE_SIZE, 64, 8)
    reals = sorted(Path("/root/reference/input_images").glob("*.jpg"))
    real = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize(
            (IMAGE_SIZE, IMAGE_SIZE), Image.LANCZOS), np.float32) / 255.0
        for p in reals])
    scorer = FIDScorer(default_extractor())
    t0 = time.time()
    for i in range(0, len(real), 16):
        scorer.add_real(real[i:i + 16])
    for i in range(0, len(fake), 16):
        scorer.add_generated(fake[i:i + 16])
    fid = scorer.score()
    record["fid"] = round(float(fid), 2)
    record["fid_provenance"] = scorer.provenance
    assert np.isfinite(fid)
    print(json.dumps({"fid_s": round(time.time() - t0, 1), "fid": record["fid"],
                      "provenance": scorer.provenance}), flush=True)

    # ---- reHistoGAN: --load_pt -> recolor a real input ----------------
    from histogan_tpu.cli import rehistogan as re_cli

    t0 = time.time()
    re_cli.main([
        "--generate", "True", "--load_pt", "rehisto_flagship.pt",
        "--input_image", inp, "--target_hist", target,
        "--name", "rdress", "--results_dir", "res", "--models_dir", "mod",
        "--image_size", str(IMAGE_SIZE), "--network_capacity", str(CAP),
    ])
    outs2 = sorted(Path("res/rdress").glob("output-2-*.jpg"))
    assert outs2, "reHistoGAN --load_pt recolor produced no output"
    print(json.dumps({"rehisto_recolor_s": round(time.time() - t0, 1),
                      "out": str(outs2[-1])}), flush=True)

    (OUT / "record.json").write_text(json.dumps(record, indent=1))
    print("DRESS REHEARSAL OK", flush=True)


if __name__ == "__main__":
    main()
