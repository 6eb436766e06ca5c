"""Convert reference PyTorch HistoGAN checkpoints (.pt state_dict) to
this framework's parameter trees.

The reference publishes 9 histoGAN + 7 reHistoGAN pretrained .pt files
(README.md:306-317, 458-467) whose state dicts follow the module layout
of histoGAN/histoGAN.py:634-715 ('S.net.0.weight', 'G.blocks.0.conv1
.weight', 'GE...', 'HE...', ...). Layout mapping to our NHWC flax trees:

- Linear (out, in) -> kernel (in, out): transpose.
- Conv2d (O, I, kh, kw) -> HWIO (kh, kw, I, O): transpose (2, 3, 1, 0).
- Conv2DMod weight: same OIHW -> HWIO transpose.
- initial_block (C, 4, 4) -> (4, 4, C).
- D.to_logit: torch flattens NCHW (C,2,2); we flatten NHWC (2,2,C) — the
  input-dim permutation is baked into the converted kernel.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping, prefix: str) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.transpose(_t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv2dmod(sd: Mapping, prefix: str) -> Dict:
    return {"weight": np.transpose(_t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}


def convert_style_vectorizer(sd: Mapping, prefix: str, depth: int) -> Dict:
    # torch Sequential: Linear at even indices (Linear, LeakyReLU) pairs
    return {f"fc{i}": _linear(sd, f"{prefix}.net.{2 * i}") for i in range(depth)}


def convert_hist_vectorizer(sd: Mapping, prefix: str, depth: int) -> Dict:
    return {f"fc{i}": _linear(sd, f"{prefix}.fcs.{2 * i}") for i in range(depth)}


def convert_generator_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "to_style1": _linear(sd, f"{prefix}.to_style1"),
        "to_style2": _linear(sd, f"{prefix}.to_style2"),
        "to_noise1": _linear(sd, f"{prefix}.to_noise1"),
        "to_noise2": _linear(sd, f"{prefix}.to_noise2"),
        "conv1": _conv2dmod(sd, f"{prefix}.conv1"),
        "conv2": _conv2dmod(sd, f"{prefix}.conv2"),
        "to_rgb": {
            "to_style": _linear(sd, f"{prefix}.to_rgb.to_style"),
            "conv": _conv2dmod(sd, f"{prefix}.to_rgb.conv"),
        },
    }


def convert_generator(sd: Mapping, prefix: str, num_layers: int) -> Dict:
    out = {
        "initial_block": np.transpose(_t(sd[f"{prefix}.initial_block"]), (1, 2, 0))
    }
    for i in range(num_layers):
        out[f"blocks_{i}"] = convert_generator_block(sd, f"{prefix}.blocks.{i}")
    return out


def convert_discriminator(sd: Mapping, prefix: str, num_blocks: int) -> Dict:
    """Discriminator conversion incl. optional attention blocks
    (histoGAN/histoGAN.py:594-598). VQ buffers live in a separate flax
    collection — see convert_vq_stats. Raises on unrecognized keys under
    ``prefix`` so an unexpected checkpoint layout fails loudly instead of
    converting to a silently-wrong model."""
    out = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return key

    def conv(p, bias=True):
        r = {"kernel": np.transpose(_t(sd[take(f"{p}.weight")]), (2, 3, 1, 0))}
        if bias:
            r["bias"] = _t(sd[take(f"{p}.bias")])
        return r

    for i in range(num_blocks):
        b = f"{prefix}.blocks.{i}"
        blk = {
            "conv_res": conv(f"{b}.conv_res"),
            "net0": conv(f"{b}.net.0"),
            "net1": conv(f"{b}.net.2"),
        }
        if f"{b}.downsample.weight" in sd:
            blk["down"] = conv(f"{b}.downsample")
        out[f"blocks_{i}"] = blk

        # attention: Sequential of 2 Residual(Rezero(attn)) units
        ap = f"{prefix}.attn_blocks.{i}"
        if f"{ap}.0.fn.g" in sd:
            for j in (0, 1):
                out[f"attn_{i}_{j}"] = {
                    "g": _t(sd[take(f"{ap}.{j}.fn.g")]),
                    "attn": {
                        "to_q": conv(f"{ap}.{j}.fn.fn.to_q", bias=False),
                        "to_k": conv(f"{ap}.{j}.fn.fn.to_k", bias=False),
                        "to_v": conv(f"{ap}.{j}.fn.fn.to_v", bias=False),
                        "to_out": conv(f"{ap}.{j}.fn.fn.to_out"),
                    },
                }
        # VQ buffers consumed by convert_vq_stats (not params)
        qp = f"{prefix}.quantize_blocks.{i}.fn"
        for suffix in ("embed", "embed_avg", "cluster_size"):
            if f"{qp}.{suffix}" in sd:
                consumed.add(f"{qp}.{suffix}")

    # to_logit: permute input dim from (C, 2, 2) order to (2, 2, C)
    w = _t(sd[take(f"{prefix}.to_logit.weight")])  # (1, C*2*2)
    c = w.shape[1] // 4
    w = w.reshape(1, c, 2, 2).transpose(0, 2, 3, 1).reshape(1, -1)
    out["to_logit"] = {"kernel": w.T,
                       "bias": _t(sd[take(f"{prefix}.to_logit.bias")])}

    leftovers = [k for k in sd
                 if k.startswith(f"{prefix}.") and k not in consumed]
    if leftovers:
        raise ValueError(
            f"unrecognized discriminator keys under '{prefix}' — refusing "
            f"to convert a checkpoint layout this converter does not "
            f"understand: {sorted(leftovers)[:8]}"
        )
    return out


def convert_vq_stats(sd: Mapping, prefix: str, num_blocks: int) -> Dict:
    """Vector-quantize codebook buffers (histoGAN/histoGAN.py:600-601;
    third-party vector_quantize_pytorch: embed (dim, n_embed) +
    EMA cluster_size/embed_avg) -> the flax 'vq_stats' collection."""
    out = {}
    for i in range(num_blocks):
        qp = f"{prefix}.quantize_blocks.{i}.fn"
        if f"{qp}.embed" in sd:
            out[f"vq_{i}"] = {
                "embed": _t(sd[f"{qp}.embed"]),
                "embed_avg": _t(sd[f"{qp}.embed_avg"]),
                "cluster_size": _t(sd[f"{qp}.cluster_size"]),
            }
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def convert_histogan_checkpoint(sd: Mapping, image_size: int,
                                style_depth: int = 8) -> Dict:
    """Full reference HistoGAN bundle -> {'params_g', 'params_d', 'ema'}."""
    from math import log2

    num_layers = int(log2(image_size) - 1)
    num_d_blocks = num_layers + 1
    out = {
        "params_g": {
            "S": convert_style_vectorizer(sd, "S", style_depth),
            "H": convert_hist_vectorizer(sd, "H", style_depth),
            "G": convert_generator(sd, "G", num_layers),
        },
        "params_d": convert_discriminator(sd, "D", num_d_blocks),
        "ema": {
            "S": convert_style_vectorizer(sd, "SE", style_depth),
            "H": convert_hist_vectorizer(sd, "HE", style_depth),
            "G": convert_generator(sd, "GE", num_layers),
        },
    }
    vq = convert_vq_stats(sd, "D", num_d_blocks)
    if vq:
        out["vq_stats"] = vq
    return out


def convert_pt_file(path: str, image_size: int, style_depth: int = 8) -> Dict:
    return convert_histogan_checkpoint(load_torch_state_dict(path),
                                       image_size, style_depth)


def install_into_trainer(trainer, converted: Dict) -> None:
    """Load converted params into a Trainer (optimizer state stays fresh)."""
    import jax

    from histogan_tpu.parallel import replicate

    state = jax.device_get(trainer.state)
    ema = converted["ema"]
    if getattr(trainer, "ema_dtype", None) == "bf16":
        # respect the trainer's EMA storage dtype (trainer._ema_cast)
        import jax.numpy as jnp

        ema = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(jnp.bfloat16), ema)
    state = state.replace(
        params_g=converted["params_g"],
        params_d=converted["params_d"],
        ema=ema,
    )
    if "vq_stats" in converted:
        state = state.replace(vq_stats=converted["vq_stats"])
    trainer.state = replicate(state, trainer.mesh)
    trainer.av = None


# ------------------------------------------------------------ ReHistoGAN
def convert_encoder_block(sd: Mapping, prefix: str) -> Dict:
    """EncoderBlock (ReHistoGAN/rehistoGAN.py:485-504): torch Sequential
    net = [Conv, InstanceNorm(no params), LeakyReLU, Conv, InstanceNorm,
    LeakyReLU] -> convs at net.0 / net.3."""
    return {
        "conv_res": _conv(sd, f"{prefix}.conv_res"),
        "net0": _conv(sd, f"{prefix}.net.0"),
        "net1": _conv(sd, f"{prefix}.net.3"),
        "down": _conv(sd, f"{prefix}.downsample"),
    }


def convert_decoder_block(sd: Mapping, prefix: str,
                          internal_hist: bool) -> Dict:
    """DecoderBlock (ReHistoGAN/rehistoGAN.py:507-546): block1/block2/
    conv_out_latent are 1-conv Sequentials (conv at index 0)."""
    out = {
        "block1": _conv(sd, f"{prefix}.block1.0"),
        "block2": _conv(sd, f"{prefix}.block2.0"),
        "conv_res": _conv(sd, f"{prefix}.conv_res"),
        "conv_out_latent": _conv(sd, f"{prefix}.conv_out_latent.0"),
        "conv_out_rgb": _conv(sd, f"{prefix}.conv_out_rgb"),
    }
    if internal_hist:
        out["to_latent"] = _linear(sd, f"{prefix}.to_latent")
        out["conv_latent"] = _conv2dmod(sd, f"{prefix}.conv_latent")
    return out


def convert_encoder_decoder(sd: Mapping, prefix: str, image_size: int,
                            style_depth: int, skip_conn_to_GAN: bool,
                            internal_hist: bool) -> Dict:
    """RecoloringEncoderDecoder (ReHistoGAN/rehistoGAN.py:549-634)."""
    from math import log2

    enc_layers = int(log2(image_size) - 2)
    dec_layers = int(log2(image_size) - 4)
    out = {"mapping": _conv(sd, f"{prefix}.mapping"),
           "decoder_mapping": _conv(sd, f"{prefix}.decoder_mapping")}
    for i in range(enc_layers):
        out[f"encoder_{i}"] = convert_encoder_block(
            sd, f"{prefix}.encoder_blocks.{i}")
    for i in range(dec_layers):
        out[f"decoder_{i}"] = convert_decoder_block(
            sd, f"{prefix}.decoder_blocks.{i}", internal_hist)
    if skip_conn_to_GAN:
        if not internal_hist:
            out["hist_projection"] = convert_hist_vectorizer(
                sd, f"{prefix}.hist_projection", style_depth)
        out["to_latent_1"] = _linear(sd, f"{prefix}.to_latent_1")
        out["to_latent_2"] = _linear(sd, f"{prefix}.to_latent_2")
        out["conv_latent_1"] = _conv2dmod(sd, f"{prefix}.conv_latent_1")
        out["conv_latent_2"] = _conv2dmod(sd, f"{prefix}.conv_latent_2")
    return out


def detect_rehistogan_variant(sd: Mapping) -> Dict[str, bool]:
    """Infer skip_conn_to_GAN / internal_hist from the published .pt
    state-dict keys (the reference persists neither in .config.json)."""
    return {
        "skip_conn_to_GAN": "ED.conv_latent_1.weight" in sd,
        "internal_hist": "ED.decoder_blocks.0.to_latent.weight" in sd,
    }


def convert_rehistogan_checkpoint(sd: Mapping, image_size: int,
                                  style_depth: int = 8,
                                  skip_conn_to_GAN: Optional[bool] = None,
                                  internal_hist: Optional[bool] = None) -> Dict:
    """Full reference recoloringGAN bundle (ED/H/G/D state dict,
    ReHistoGAN/rehistoGAN.py:637-718, saved flat at :1207) ->
    {'params_g': {'ED','H','G'}, 'params_d'[, 'vq_stats'],
    'skip_conn_to_GAN', 'internal_hist'}. The reference saves no EMA for
    the recoloring model. Variant flags are auto-detected from the keys
    unless given."""
    from math import log2

    variant = detect_rehistogan_variant(sd)
    if skip_conn_to_GAN is None:
        skip_conn_to_GAN = variant["skip_conn_to_GAN"]
    if internal_hist is None:
        internal_hist = variant["internal_hist"]

    num_d_blocks = int(log2(image_size) - 1) + 1
    out = {
        "params_g": {
            "ED": convert_encoder_decoder(
                sd, "ED", image_size, style_depth, skip_conn_to_GAN,
                internal_hist),
            "H": convert_hist_vectorizer(sd, "H", style_depth),
            "G": {
                "blocks_0": convert_generator_block(sd, "G.blocks.0"),
                "blocks_1": convert_generator_block(sd, "G.blocks.1"),
            },
        },
        "params_d": convert_discriminator(sd, "D", num_d_blocks),
        "skip_conn_to_GAN": skip_conn_to_GAN,
        "internal_hist": internal_hist,
    }
    vq = convert_vq_stats(sd, "D", num_d_blocks)
    if vq:
        out["vq_stats"] = vq
    return out


def convert_rehistogan_pt_file(path: str, image_size: int,
                               style_depth: int = 8) -> Dict:
    return convert_rehistogan_checkpoint(
        load_torch_state_dict(path), image_size, style_depth)


def install_into_rehisto_trainer(trainer, converted: Dict) -> None:
    """Load a converted recoloringGAN bundle into a RecoloringTrainer
    (optimizer state stays fresh). The trainer must have been constructed
    with matching skip_conn_to_GAN/internal_hist flags."""
    import jax

    from histogan_tpu.parallel import replicate

    for flag in ("skip_conn_to_GAN", "internal_hist"):
        want = converted.get(flag)
        have = getattr(trainer.cfg, flag)
        if want is not None and want != have:
            raise ValueError(
                f"checkpoint was trained with {flag}={want}, but the "
                f"trainer is configured with {flag}={have}"
            )
    if trainer.state is None:
        trainer.init_GAN()
    state = jax.device_get(trainer.state)
    state = state.replace(
        params_g=converted["params_g"],
        params_d=converted["params_d"],
    )
    if "vq_stats" in converted:
        state = state.replace(vq_stats=converted["vq_stats"])
    trainer.state = replicate(state, trainer.mesh)
