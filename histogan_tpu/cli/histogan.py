"""CLI: train HistoGAN or sample from it given target histogram(s).

Mirrors the reference entry point (histoGAN.py:33-305): same flags, same
routing — npy / image / directory target-histogram handling with tile
doubling, training loop with NaN retry. Boolean flags are real booleans
here (the reference's ``--new False`` truthiness wart is documented and
not replicated).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime
from pathlib import Path

import numpy as np


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes", "y")


def load_target_hist(path: str, hist_block):
    """npy histogram or image -> (1, 3, h, h) numpy array."""
    from histogan_tpu.data.dataset import load_rgb

    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        hist = np.load(path)
        if hist.ndim == 3:
            hist = hist[None]
        if hist.ndim == 5:  # pools saved as (N,1,3,h,h)
            hist = hist.reshape(-1, *hist.shape[-3:])[:1]
        return np.asarray(hist, np.float32)
    if ext in (".jpg", ".png", ".jpeg"):
        img = load_rgb(path)
        return np.asarray(hist_block(img[None]), np.float32)
    return None


def tile_double(h: np.ndarray, num_image_tiles: int) -> np.ndarray:
    """Reference tile doubling (histoGAN.py:117-120)."""
    if num_image_tiles > 1:
        num_image_tiles = num_image_tiles - num_image_tiles % 2
        for _ in range(int(np.log2(num_image_tiles))):
            h = np.concatenate([h, h], axis=0)
    return h


def train_from_folder(
    data="./dataset/", results_dir="./results", models_dir="./models",
    name="test", new=False, load_from=-1, image_size=128,
    network_capacity=16, transparent=False, batch_size=2,
    gradient_accumulate_every=8, num_train_steps=150000, learning_rate=2e-4,
    num_workers=None, save_every=1000, generate=False,
    save_noise_latent=False, target_noise_file=None, target_latent_file=None,
    num_image_tiles=8, trunc_psi=0.75, fq_layers=(), fq_dict_size=256,
    attn_layers=(), hist_method="inverse-quadratic", hist_resizing="sampling",
    hist_sigma=0.02, hist_bin=64, hist_insz=150, alpha=2, target_hist=None,
    aug_prob=0.0, dataset_aug_prob=0.0, aug_types=None, seed=42,
    num_devices=None, load_pt=None, export_pt=None, precision="fp32",
    sync_every=1,
    device_dataset="auto", calculate_fid_every=None, split_step=False,
    param_sharding="replicated", opt_state_dtype=None, ema_dtype=None,
    remat=False,
):
    from histogan_tpu.ops.histogram import RGBuvHistBlock
    from histogan_tpu.train import NanException, Trainer

    model = Trainer(
        name, results_dir, models_dir, batch_size=batch_size,
        gradient_accumulate_every=gradient_accumulate_every,
        image_size=image_size, network_capacity=network_capacity,
        transparent=transparent, lr=learning_rate, save_every=save_every,
        trunc_psi=trunc_psi, fq_layers=fq_layers, fq_dict_size=fq_dict_size,
        attn_layers=attn_layers, hist_insz=hist_insz, hist_bin=hist_bin,
        hist_sigma=hist_sigma, hist_resizing=hist_resizing,
        hist_method=hist_method, aug_prob=aug_prob,
        dataset_aug_prob=dataset_aug_prob, aug_types=aug_types, seed=seed,
        num_devices=num_devices, precision=precision, sync_every=sync_every,
        device_dataset=device_dataset,
        calculate_fid_every=calculate_fid_every, split_step=split_step,
        param_sharding=param_sharding, opt_state_dtype=opt_state_dtype,
        ema_dtype=ema_dtype, remat=remat,
    )

    if not new:
        model.init_GAN()
        model.load(load_from)
    else:
        model.clear()
        model.init_GAN()

    if load_pt is not None:
        # published reference .pt checkpoint (README.md:306-317)
        from histogan_tpu.train import convert

        convert.install_into_trainer(
            model, convert.convert_pt_file(load_pt, image_size))
        print(f"installed converted reference checkpoint {load_pt}")

    if export_pt is not None:
        # inverse workflow: train here, run on the reference
        # (train/convert.py export_histogan_checkpoint)
        from histogan_tpu.train import convert

        sd = convert.export_histogan_checkpoint(
            convert.bundle_from_trainer(model))
        convert.save_pt_file(sd, export_pt)
        print(f"exported reference-layout checkpoint to {export_pt} "
              f"({len(sd)} tensors)")
        return

    if generate:
        timestamp = datetime.now().strftime("%m-%d-%Y_%H-%M-%S")
        if save_noise_latent:
            Path(f"temp/{name}").mkdir(parents=True, exist_ok=True)
        if target_hist is None:
            raise Exception("No target histogram or image is given")
        hist_block = RGBuvHistBlock(
            insz=hist_insz, h=hist_bin, resizing=hist_resizing,
            method=hist_method, sigma=hist_sigma,
        )

        def generate_one(hist_source: str):
            h = load_target_hist(hist_source, hist_block)
            if h is None:
                print(f"Warning: File extension of {hist_source} is not supported.")
                return
            h = tile_double(h, num_image_tiles)
            base = os.path.basename(os.path.splitext(hist_source)[0])
            samples_name = f"generated-{base}-{timestamp}"
            model.evaluate(
                samples_name, hist_batch=h, num_image_tiles=num_image_tiles,
                save_noise_latent=save_noise_latent,
                load_noise_file=target_noise_file,
                load_latent_file=target_latent_file,
            )
            print(f"sample images generated at {results_dir}/{name}/{samples_name}")

        ext = os.path.splitext(target_hist)[1]
        if ext == "":
            files = [
                os.path.join(target_hist, f)
                for f in sorted(os.listdir(target_hist))
                if os.path.isfile(os.path.join(target_hist, f))
            ]
            for f in files:
                generate_one(f)
        elif ext.lower() in (".npy", ".jpg", ".png", ".jpeg"):
            generate_one(target_hist)
        else:
            print("The file extension of target image is not supported.")
            raise NotImplementedError
        return

    print("\nStart training....\n")
    print(f"Alpha = {alpha}")
    model.set_data_src(data)
    from tqdm import tqdm

    for i in tqdm(range(num_train_steps - model.steps), mininterval=10.0,
                  desc=f"{name}<{data}>"):
        tries = 0
        while True:
            try:
                model.train(alpha)
                break
            except NanException:
                tries += 1
                if tries >= 3:
                    raise
        if i % 50 == 0:
            model.print_log()


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Train/Test HistoGAN (TPU).")
    add = parser.add_argument
    add("--data", default="./dataset/")
    add("--results_dir", default="./results_HistoGAN")
    add("--models_dir", default="./models")
    add("--target_hist", default=None)
    add("--name", default="histoGAN_model")
    add("--new", type=str2bool, default=False)
    add("--load_from", type=int, default=-1)
    add("--load_pt", default=None, type=str,
        help="Convert+install a published reference .pt checkpoint.")
    add("--export_pt", default=None, type=str,
        help="Export the loaded model as a reference-layout .pt "
             "(loadable by the reference CLI) and exit.")
    add("--image_size", type=int, default=256)
    add("--network_capacity", type=int, default=16)
    add("--transparent", type=str2bool, default=False)
    add("--batch_size", type=int, default=2)
    add("--gradient_accumulate_every", type=int, default=8)
    add("--num_train_steps", type=int, default=1500000)
    add("--learning_rate", type=float, default=2e-4)
    # reference flag (torch DataLoader workers); here it sets the
    # streaming loader's decode-prefetch depth (no-op on the default
    # device-resident dataset path — decode happens once up front)
    add("--num_workers", type=int, default=None)
    add("--save_every", type=int, default=5000)
    add("--generate", type=str2bool, default=False)
    add("--save_noise_latent", dest="save_n_l", type=str2bool, default=False)
    add("--target_noise_file", dest="target_n", default=None)
    add("--target_latent_file", dest="target_l", default=None)
    add("--num_image_tiles", type=int, default=16)
    add("--trunc_psi", type=float, default=0.75)
    add("--fp16", type=str2bool, default=False,
        help="Mixed precision; on TPU this selects the bf16 compute "
             "policy (reference flag '--fp 16', typo'd there).")
    add("--precision", choices=("fp32", "bf16"), default=None,
        help="Compute precision; overrides --fp16. bf16 is ~1.6x faster "
             "at the flagship config (BASELINE.md).")
    add("--sync_every", type=int, default=1,
        help="Fetch step metrics every N steps (1 = reference parity; "
             "larger amortizes the per-step host sync).")
    add("--device_dataset", default="auto",
        choices=("auto", "true", "false"),
        help="Park the decoded dataset + hist pool in HBM and gather "
             "batches on device (auto: when eligible; see DESIGN.md).")
    add("--split_step", type=str2bool, default=False,
        help="Compile the D and G phases as two separate XLA programs "
             "(identical numerics; escape hatch for compiler resource "
             "limits on very large images — the Trainer also falls "
             "back to this automatically).")
    add("--remat", type=str2bool, default=False,
        help="Rematerialize model blocks on the backward pass "
             "(identical numerics; trades recompute for activation "
             "memory — enables larger batches / 512px batch sizes).")
    add("--param_sharding", default="replicated",
        choices=("replicated", "fsdp"),
        help="State layout over the device mesh: 'replicated' (DP) or "
             "'fsdp' (ZeRO-3-style — params/optimizer/EMA sharded over "
             "the data axis; the multi-chip path for models whose state "
             "outgrows one chip, e.g. 512px capacity-16).")
    add("--opt_state_dtype", default=None, choices=("fp32", "bf16"),
        help="Storage dtype for the DiffGrad moment/previous-grad trees "
             "(update math stays fp32). 'bf16' halves the optimizer's "
             "HBM traffic — a perf knob for the HBM-bound step "
             "(optim/diffgrad.py); default fp32 = reference numerics.")
    add("--ema_dtype", default=None, choices=("fp32", "bf16"),
        help="Storage dtype for the EMA weight tree. 'bf16' halves its "
             "HBM residency and EMA-step traffic; stores use stochastic "
             "rounding (ops/rounding.py — plain truncation would stall "
             "a 0.995-decay EMA below bf16's half-ulp). EMA samples "
             "then carry ~0.4% weight quantization; default fp32 = "
             "reference numerics.")
    add("--calculate_fid_every", type=int, default=None,
        help="Score FID on EMA samples every N steps "
             "(results/<name>/fid_scores.txt).")
    add("--fq_layers", nargs="*", type=int, default=[])
    add("--fq_dict_size", type=int, default=256)
    add("--attn_layers", nargs="*", type=int, default=[])
    add("--gpu", type=int, default=0)  # accepted for compat; device comes from JAX
    add("--num_devices", type=int, default=None)
    add("--hist_bin", type=int, default=64)
    add("--hist_insz", type=int, default=150)
    add("--hist_method", default="inverse-quadratic")
    add("--hist_resizing", default="interpolation")
    add("--hist_sigma", type=float, default=0.02)
    add("--alpha", type=float, default=2)
    add("--aug_prob", type=float, default=0.0,
        help="Probability of discriminator augmentation.")
    add("--dataset_aug_prob", type=float, default=0.0)
    add("--aug_types", nargs="+", default=["translation", "cutout"])
    add("--seed", type=int, default=42)
    return parser.parse_args(argv)


def main(argv=None):
    from histogan_tpu.utils.platform import setup_runtime

    setup_runtime()
    args = get_args(argv)
    train_from_folder(
        data=args.data, results_dir=args.results_dir, models_dir=args.models_dir,
        name=args.name, new=args.new, load_from=args.load_from,
        image_size=args.image_size, network_capacity=args.network_capacity,
        transparent=args.transparent, batch_size=args.batch_size,
        gradient_accumulate_every=args.gradient_accumulate_every,
        num_train_steps=args.num_train_steps, learning_rate=args.learning_rate,
        num_workers=args.num_workers, save_every=args.save_every,
        generate=args.generate, save_noise_latent=args.save_n_l,
        target_noise_file=args.target_n, target_latent_file=args.target_l,
        num_image_tiles=args.num_image_tiles, trunc_psi=args.trunc_psi,
        fq_layers=args.fq_layers, fq_dict_size=args.fq_dict_size,
        attn_layers=args.attn_layers, hist_method=args.hist_method,
        hist_resizing=args.hist_resizing, hist_sigma=args.hist_sigma,
        hist_bin=args.hist_bin, hist_insz=args.hist_insz,
        target_hist=args.target_hist, alpha=args.alpha, aug_prob=args.aug_prob,
        dataset_aug_prob=args.dataset_aug_prob, aug_types=args.aug_types,
        seed=args.seed, num_devices=args.num_devices, load_pt=args.load_pt,
        export_pt=args.export_pt,
        precision=args.precision or ("bf16" if args.fp16 else "fp32"),
        sync_every=args.sync_every,
        device_dataset={"true": True, "false": False}.get(
            args.device_dataset, "auto"),
        calculate_fid_every=args.calculate_fid_every,
        split_step=args.split_step,
        param_sharding=args.param_sharding,
        opt_state_dtype=args.opt_state_dtype,
        ema_dtype=args.ema_dtype,
        remat=args.remat,
    )


if __name__ == "__main__":
    main()
