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


def _count(tree: Mapping, fmt: str) -> int:
    n = 0
    while fmt.format(n) in tree:
        n += 1
    return n


def _inv_linear(tree: Mapping, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_t(tree["kernel"]).T)
    out[f"{prefix}.bias"] = _t(tree["bias"])


def _inv_conv(tree: Mapping, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.transpose(_t(tree["kernel"]), (3, 2, 0, 1)))
    if "bias" in tree:
        out[f"{prefix}.bias"] = _t(tree["bias"])


def _inv_conv2dmod(tree: Mapping, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.transpose(_t(tree["weight"]), (3, 2, 0, 1)))


def export_style_vectorizer(tree: Mapping, prefix: str, out: Dict) -> None:
    for i in range(_count(tree, "fc{}")):
        _inv_linear(tree[f"fc{i}"], f"{prefix}.net.{2 * i}", out)


def export_hist_vectorizer(tree: Mapping, prefix: str, out: Dict) -> None:
    for i in range(_count(tree, "fc{}")):
        _inv_linear(tree[f"fc{i}"], f"{prefix}.fcs.{2 * i}", out)


def export_generator_block(tree: Mapping, prefix: str, out: Dict) -> None:
    for name in ("to_style1", "to_style2", "to_noise1", "to_noise2"):
        _inv_linear(tree[name], f"{prefix}.{name}", out)
    _inv_conv2dmod(tree["conv1"], f"{prefix}.conv1", out)
    _inv_conv2dmod(tree["conv2"], f"{prefix}.conv2", out)
    _inv_linear(tree["to_rgb"]["to_style"], f"{prefix}.to_rgb.to_style", out)
    _inv_conv2dmod(tree["to_rgb"]["conv"], f"{prefix}.to_rgb.conv", out)


def export_generator(tree: Mapping, prefix: str, out: Dict) -> None:
    out[f"{prefix}.initial_block"] = np.ascontiguousarray(
        np.transpose(_t(tree["initial_block"]), (2, 0, 1)))
    for i in range(_count(tree, "blocks_{}")):
        export_generator_block(tree[f"blocks_{i}"], f"{prefix}.blocks.{i}", out)


def export_discriminator(tree: Mapping, prefix: str, out: Dict,
                         vq_stats: Optional[Mapping] = None) -> None:
    num_blocks = _count(tree, "blocks_{}")
    for i in range(num_blocks):
        blk = tree[f"blocks_{i}"]
        b = f"{prefix}.blocks.{i}"
        _inv_conv(blk["conv_res"], f"{b}.conv_res", out)
        _inv_conv(blk["net0"], f"{b}.net.0", out)
        _inv_conv(blk["net1"], f"{b}.net.2", out)
        if "down" in blk:
            _inv_conv(blk["down"], f"{b}.downsample", out)
        for j in (0, 1):
            if f"attn_{i}_{j}" not in tree:
                continue
            a = tree[f"attn_{i}_{j}"]
            ap = f"{prefix}.attn_blocks.{i}.{j}.fn"
            out[f"{ap}.g"] = _t(a["g"])
            for q in ("to_q", "to_k", "to_v", "to_out"):
                _inv_conv(a["attn"][q], f"{ap}.fn.{q}", out)
        if vq_stats and f"vq_{i}" in vq_stats:
            qp = f"{prefix}.quantize_blocks.{i}.fn"
            for suffix in ("embed", "embed_avg", "cluster_size"):
                out[f"{qp}.{suffix}"] = _t(vq_stats[f"vq_{i}"][suffix])
    w = _t(tree["to_logit"]["kernel"]).T          # (1, 2*2*C), NHWC order
    c = w.shape[1] // 4
    w = w.reshape(1, 2, 2, c).transpose(0, 3, 1, 2).reshape(1, -1)
    out[f"{prefix}.to_logit.weight"] = np.ascontiguousarray(w)
    out[f"{prefix}.to_logit.bias"] = _t(tree["to_logit"]["bias"])


def export_histogan_checkpoint(bundle: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of convert_histogan_checkpoint: {'params_g', 'params_d',
    'ema'[, 'vq_stats']} -> the flat reference state-dict layout
    (histoGAN/histoGAN.py:634-715, saved at :1121). Lets a model trained
    here be loaded by the reference CLI, and provides reference-layout
    bundles at any shape for converter validation."""
    out: Dict[str, np.ndarray] = {}
    export_style_vectorizer(bundle["params_g"]["S"], "S", out)
    export_hist_vectorizer(bundle["params_g"]["H"], "H", out)
    export_generator(bundle["params_g"]["G"], "G", out)
    export_discriminator(bundle["params_d"], "D", out,
                         bundle.get("vq_stats"))
    export_style_vectorizer(bundle["ema"]["S"], "SE", out)
    export_hist_vectorizer(bundle["ema"]["H"], "HE", out)
    export_generator(bundle["ema"]["G"], "GE", out)
    return out


def export_encoder_block(tree: Mapping, prefix: str, out: Dict) -> None:
    _inv_conv(tree["conv_res"], f"{prefix}.conv_res", out)
    _inv_conv(tree["net0"], f"{prefix}.net.0", out)
    _inv_conv(tree["net1"], f"{prefix}.net.3", out)
    _inv_conv(tree["down"], f"{prefix}.downsample", out)


def export_decoder_block(tree: Mapping, prefix: str, out: Dict) -> None:
    _inv_conv(tree["block1"], f"{prefix}.block1.0", out)
    _inv_conv(tree["block2"], f"{prefix}.block2.0", out)
    _inv_conv(tree["conv_res"], f"{prefix}.conv_res", out)
    _inv_conv(tree["conv_out_latent"], f"{prefix}.conv_out_latent.0", out)
    _inv_conv(tree["conv_out_rgb"], f"{prefix}.conv_out_rgb", out)
    if "to_latent" in tree:
        _inv_linear(tree["to_latent"], f"{prefix}.to_latent", out)
        _inv_conv2dmod(tree["conv_latent"], f"{prefix}.conv_latent", out)


def export_encoder_decoder(tree: Mapping, prefix: str, out: Dict) -> None:
    _inv_conv(tree["mapping"], f"{prefix}.mapping", out)
    _inv_conv(tree["decoder_mapping"], f"{prefix}.decoder_mapping", out)
    for i in range(_count(tree, "encoder_{}")):
        export_encoder_block(tree[f"encoder_{i}"],
                             f"{prefix}.encoder_blocks.{i}", out)
    for i in range(_count(tree, "decoder_{}")):
        export_decoder_block(tree[f"decoder_{i}"],
                             f"{prefix}.decoder_blocks.{i}", out)
    if "hist_projection" in tree:
        export_hist_vectorizer(tree["hist_projection"],
                               f"{prefix}.hist_projection", out)
    for name in ("to_latent_1", "to_latent_2"):
        if name in tree:
            _inv_linear(tree[name], f"{prefix}.{name}", out)
    for name in ("conv_latent_1", "conv_latent_2"):
        if name in tree:
            _inv_conv2dmod(tree[name], f"{prefix}.{name}", out)


def export_rehistogan_checkpoint(bundle: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of convert_rehistogan_checkpoint (flat ED/H/G/D layout,
    ReHistoGAN/rehistoGAN.py:637-718; no EMA in the reference format)."""
    out: Dict[str, np.ndarray] = {}
    export_encoder_decoder(bundle["params_g"]["ED"], "ED", out)
    export_hist_vectorizer(bundle["params_g"]["H"], "H", out)
    for i in range(_count(bundle["params_g"]["G"], "blocks_{}")):
        export_generator_block(bundle["params_g"]["G"][f"blocks_{i}"],
                               f"G.blocks.{i}", out)
    export_discriminator(bundle["params_d"], "D", out,
                         bundle.get("vq_stats"))
    return out


def save_pt_file(sd: Mapping[str, np.ndarray], path: str) -> None:
    """Write a flat numpy state dict as a torch .pt the reference's
    ``GAN.load_state_dict(torch.load(...))`` accepts."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def bundle_from_trainer(trainer) -> Dict:
    """Snapshot a Trainer's weights as a convert-format bundle
    (fp32 host copies; bf16 EMA storage is widened)."""
    import jax

    state = jax.device_get(trainer.state)
    tree = {"params_g": state.params_g, "params_d": state.params_d}
    if hasattr(state, "ema"):
        tree["ema"] = state.ema
    if getattr(state, "vq_stats", None):
        tree["vq_stats"] = state.vq_stats
    return jax.tree_util.tree_map(_t, tree)


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
