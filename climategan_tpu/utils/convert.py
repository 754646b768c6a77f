"""PyTorch -> JAX weight converter for released ClimateGAN checkpoints.

The reference ships trained torch state dicts (README.md:49-58): a merged
G state dict with keys like ``encoder.layer1.0.conv1.weight``,
``decoders.d.enc4_1.conv.module.weight_bar``, ``painter.head_0.conv_0...``.
This module translates those into this framework's flax variable tree
(params / batch_stats / spectral collections, NHWC/HWIO layout).

Layout transforms:
  * Conv weight OIHW -> HWIO (transpose 2,3,1,0)
  * BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
  * SpectralNorm weight_bar -> kernel; weight_u -> spectral/u;
    weight_v -> spectral/v (the (O, I*KH*KW) flatten order is preserved by
    models/norms.spectral_normalize, so u/v transfer verbatim)

The mapping is validated by coverage: every torch key must be consumed and
every flax leaf assigned (strict mode), with shape checks at each site.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(arr) -> np.ndarray:
    try:
        import torch

        if isinstance(arr, torch.Tensor):
            return arr.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(arr)


def conv_w(arr) -> np.ndarray:
    return np.transpose(_t(arr), (2, 3, 1, 0))  # OIHW -> HWIO


def load_torch_state_dict(path: str,
                          allow_pickle: bool = False) -> Dict[str, Any]:
    """Load a torch checkpoint safely: ``weights_only=True`` first (plain
    tensor state dicts — the released ClimateGAN ckpts — load fine), and
    fall back to full unpickling only with explicit ``allow_pickle=True``
    since that executes arbitrary code from the file."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise RuntimeError(
                f"{path} is not a plain-tensor checkpoint "
                f"(weights_only load failed: {e}). If you trust this file, "
                f"retry with allow_pickle=True."
            ) from e
        import warnings

        warnings.warn(
            f"falling back to unsafe pickle load for {path}; this executes "
            f"code embedded in the checkpoint",
            stacklevel=2,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "G" in ckpt:
        return ckpt["G"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


# ---------------------------------------------------------------------------
# generic assignment machinery
# ---------------------------------------------------------------------------


class VariableTree:
    """Mutable view over a flax variables dict for path assignment."""

    def __init__(self, variables: Dict):
        import copy

        self.v = copy.deepcopy(
            {k: _to_mutable(val) for k, val in variables.items()}
        )
        self.assigned = set()

    def set(self, collection: str, path: Tuple[str, ...], value: np.ndarray):
        node = self.v[collection]
        for p in path[:-1]:
            if p not in node:
                raise KeyError(
                    f"{collection}/{'/'.join(path)}: missing {p!r}; "
                    f"have {list(node.keys())}"
                )
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            raise KeyError(
                f"{collection}/{'/'.join(path)}: missing leaf {leaf!r}; "
                f"have {list(node.keys())}"
            )
        old = node[leaf]
        if tuple(np.shape(old)) != tuple(np.shape(value)):
            raise ValueError(
                f"{collection}/{'/'.join(path)}: shape mismatch "
                f"{np.shape(old)} vs {np.shape(value)}"
            )
        node[leaf] = value.astype(np.asarray(old).dtype)
        self.assigned.add((collection,) + tuple(path))

    def result(self):
        import jax.numpy as jnp
        import jax

        return jax.tree_util.tree_map(jnp.asarray, self.v)

    def unassigned(self):
        out = []

        def walk(node, path, coll):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k,), coll)
            else:
                if (coll,) + path not in self.assigned:
                    out.append(f"{coll}/{'/'.join(path)}")

        for coll, tree in self.v.items():
            walk(tree, (), coll)
        return out


def _to_mutable(d):
    if hasattr(d, "items"):
        return {k: _to_mutable(v) for k, v in d.items()}
    return d


# ---------------------------------------------------------------------------
# torch-module-pattern -> flax-path translators
# ---------------------------------------------------------------------------


def assign_plain_conv(vt, prefix: Tuple[str, ...], sd, tkey: str):
    """nn.Conv2d at torch key `tkey` -> SNConv at flax path `prefix`."""
    vt.set("params", prefix + ("kernel",), conv_w(sd[f"{tkey}.weight"]))
    if f"{tkey}.bias" in sd:
        vt.set("params", prefix + ("bias",), _t(sd[f"{tkey}.bias"]))


def assign_spectral_conv(vt, prefix: Tuple[str, ...], sd, tkey: str):
    """SpectralNorm(nn.Conv2d) -> SNConv(spectral=True)."""
    vt.set("params", prefix + ("kernel",),
           conv_w(sd[f"{tkey}.module.weight_bar"]))
    if f"{tkey}.module.bias" in sd:
        vt.set("params", prefix + ("bias",), _t(sd[f"{tkey}.module.bias"]))
    vt.set("spectral", prefix + ("u",), _t(sd[f"{tkey}.module.weight_u"]))
    vt.set("spectral", prefix + ("v",), _t(sd[f"{tkey}.module.weight_v"]))


def assign_any_conv(vt, prefix, sd, tkey):
    if f"{tkey}.module.weight_bar" in sd:
        assign_spectral_conv(vt, prefix, sd, tkey)
    else:
        assign_plain_conv(vt, prefix, sd, tkey)


def assign_bn(vt, prefix: Tuple[str, ...], sd, tkey: str,
              affine: bool = True):
    """nn.BatchNorm2d -> BatchNorm wrapper (inner linen module
    'BatchNorm_0')."""
    p = prefix + ("BatchNorm_0",)
    if affine:
        vt.set("params", p + ("scale",), _t(sd[f"{tkey}.weight"]))
        vt.set("params", p + ("bias",), _t(sd[f"{tkey}.bias"]))
    vt.set("batch_stats", p + ("mean",), _t(sd[f"{tkey}.running_mean"]))
    vt.set("batch_stats", p + ("var",), _t(sd[f"{tkey}.running_var"]))


def assign_raw_bn(vt, prefix: Tuple[str, ...], sd, tkey: str,
                  affine: bool = True):
    """nn.BatchNorm2d -> bare linen BatchNorm at `prefix`."""
    if affine:
        vt.set("params", prefix + ("scale",), _t(sd[f"{tkey}.weight"]))
        vt.set("params", prefix + ("bias",), _t(sd[f"{tkey}.bias"]))
    vt.set("batch_stats", prefix + ("mean",), _t(sd[f"{tkey}.running_mean"]))
    vt.set("batch_stats", prefix + ("var",), _t(sd[f"{tkey}.running_var"]))


def assign_conv2dblock(vt, prefix: Tuple[str, ...], sd, tkey: str,
                       norm: str = "none"):
    """Reference Conv2dBlock (blocks.py:49-147): .conv (+ .norm)."""
    assign_any_conv(vt, prefix + ("conv",), sd, f"{tkey}.conv")
    if norm == "batch":
        assign_bn(vt, prefix + ("norm",), sd, f"{tkey}.norm")


def assign_spade(vt, prefix: Tuple[str, ...], sd, tkey: str,
                 param_free_norm: str = "instance"):
    """Reference SPADE (norms.py:146-186)."""
    assign_plain_conv(vt, prefix + ("mlp_shared",), sd,
                      f"{tkey}.mlp_shared.0")
    assign_plain_conv(vt, prefix + ("mlp_gamma",), sd, f"{tkey}.mlp_gamma")
    assign_plain_conv(vt, prefix + ("mlp_beta",), sd, f"{tkey}.mlp_beta")
    if param_free_norm == "batch":
        # affine=False batch norm: only running stats
        assign_raw_bn(vt, prefix + ("param_free_norm",), sd,
                      f"{tkey}.param_free_norm", affine=False)


def assign_spade_resblock(vt, prefix: Tuple[str, ...], sd, tkey: str,
                          learned_shortcut: bool,
                          param_free_norm: str = "instance"):
    """Reference SPADEResnetBlock (blocks.py:325-398)."""
    assign_any_conv(vt, prefix + ("conv_0",), sd, f"{tkey}.conv_0")
    assign_any_conv(vt, prefix + ("conv_1",), sd, f"{tkey}.conv_1")
    assign_spade(vt, prefix + ("norm_0",), sd, f"{tkey}.norm_0",
                 param_free_norm)
    assign_spade(vt, prefix + ("norm_1",), sd, f"{tkey}.norm_1",
                 param_free_norm)
    if learned_shortcut:
        assign_any_conv(vt, prefix + ("conv_s",), sd, f"{tkey}.conv_s")
        assign_spade(vt, prefix + ("norm_s",), sd, f"{tkey}.norm_s",
                     param_free_norm)


def assign_bottleneck(vt, prefix, sd, tkey, has_down):
    for i in (1, 2, 3):
        assign_plain_conv(vt, prefix + (f"conv{i}",), sd, f"{tkey}.conv{i}")
        assign_bn(vt, prefix + (f"bn{i}",), sd, f"{tkey}.bn{i}")
    if has_down:
        assign_plain_conv(vt, prefix + ("downsample_conv",), sd,
                          f"{tkey}.downsample.0")
        assign_bn(vt, prefix + ("downsample_bn",), sd, f"{tkey}.downsample.1")


def convert_resnet_encoder(vt, sd, torch_prefix="encoder",
                           flax_prefix=("encoder",),
                           layers=(3, 4, 23, 3)):
    assign_plain_conv(vt, flax_prefix + ("conv1",), sd, f"{torch_prefix}.conv1")
    assign_bn(vt, flax_prefix + ("bn1",), sd, f"{torch_prefix}.bn1")
    for stage, n in enumerate(layers):
        for b in range(n):
            has_down = b == 0  # every reference stage-0 block has downsample
            assign_bottleneck(
                vt, flax_prefix + (f"layer{stage + 1}_block{b}",), sd,
                f"{torch_prefix}.layer{stage + 1}.{b}", has_down,
            )


def convert_dada_depth(vt, sd, torch_prefix="decoders.d",
                       flax_prefix=("depth_decoder",),
                       do_feat_fusion=True, upsample=True):
    for name in ("enc4_1", "enc4_2", "enc4_3"):
        assign_conv2dblock(vt, flax_prefix + (name,), sd,
                           f"{torch_prefix}.{name}", norm="batch")
    if do_feat_fusion:
        assign_conv2dblock(vt, flax_prefix + ("dec4",), sd,
                           f"{torch_prefix}.dec4", norm="none")
    if upsample:
        assign_conv2dblock(vt, flax_prefix + ("up_conv",), sd,
                           f"{torch_prefix}.upsample.1", norm="batch")
        assign_plain_conv(vt, flax_prefix + ("up_out", "conv"), sd,
                          f"{torch_prefix}.upsample.2")


def convert_seg_decoder(vt, sd, torch_prefix="decoders.s",
                        flax_prefix=("seg_decoder",)):
    for i, name in enumerate(("conv1", "conv2", "conv3", "conv4", "conv_out")):
        assign_plain_conv(vt, flax_prefix + ("aspp", name, "conv"), sd,
                          f"{torch_prefix}.aspp.{name}.conv")
        assign_raw_bn(vt, flax_prefix + ("aspp", name, "bn", "BatchNorm_0"),
                      sd, f"{torch_prefix}.aspp.{name}.bn")
    assign_plain_conv(vt, flax_prefix + ("decoder", "conv_low", "conv"), sd,
                      f"{torch_prefix}.decoder.conv_low.conv")
    assign_raw_bn(vt, flax_prefix + ("decoder", "conv_low", "bn",
                                     "BatchNorm_0"),
                  sd, f"{torch_prefix}.decoder.conv_low.bn")
    for i in (0, 1):
        assign_plain_conv(
            vt, flax_prefix + ("decoder", f"conv_cat{i}", "conv"), sd,
            f"{torch_prefix}.decoder.conv_cat.{i}.conv")
        assign_raw_bn(
            vt, flax_prefix + ("decoder", f"conv_cat{i}", "bn", "BatchNorm_0"),
            sd, f"{torch_prefix}.decoder.conv_cat.{i}.bn")
    assign_plain_conv(vt, flax_prefix + ("decoder", "conv_out"), sd,
                      f"{torch_prefix}.decoder.conv_out")


def convert_resnetmulti_v2(vt, sd, torch_prefix="encoder.model",
                           flax_prefix=("encoder",), layers=(3, 4, 23, 3),
                           n_res=0):
    """DeeplabV2Encoder (reference deeplab/__init__.py:85-109 wrapping
    resnetmulti_v2.ResNetMulti) -> ResNetMultiV2. Every stage-0 block has a
    downsample (stride/inplanes/dilation conditions all trigger —
    resnetmulti_v2.py:95-102)."""
    assign_plain_conv(vt, flax_prefix + ("conv1",), sd,
                      f"{torch_prefix}.conv1")
    assign_bn(vt, flax_prefix + ("bn1",), sd, f"{torch_prefix}.bn1")
    for stage, n in enumerate(layers):
        for b in range(n):
            assign_bottleneck(
                vt, flax_prefix + (f"layer{stage + 1}_block{b}",), sd,
                f"{torch_prefix}.layer{stage + 1}.{b}", b == 0,
            )
    for r in range(n_res):
        for ci, cname in ((0, "conv1"), (1, "conv2")):
            assign_conv2dblock(
                vt, flax_prefix + ("layer_res", f"block{r}", cname), sd,
                f"{torch_prefix}.layer_res.model.{r}.model.{ci}",
                norm="none",  # instance norm: param-free
            )


def convert_v2_seg_decoder(vt, sd, torch_prefix="decoders.s",
                           flax_prefix=("seg_decoder",),
                           upsample_featuremaps=False):
    """DeepLabV2Decoder (reference deeplab_v2.py:136-198) -> flax twin:
    aspp1-4 + GAP branch + conv1/bn1, then the dropout head Sequential
    (index shifted by 1 when upsample_featuremaps prepends the interp)."""
    for i in (1, 2, 3, 4):
        assign_plain_conv(vt, flax_prefix + (f"aspp{i}", "atrous_conv"), sd,
                          f"{torch_prefix}.aspp.aspp{i}.atrous_conv")
        assign_raw_bn(vt, flax_prefix + (f"aspp{i}", "bn", "BatchNorm_0"),
                      sd, f"{torch_prefix}.aspp.aspp{i}.bn")
    assign_plain_conv(vt, flax_prefix + ("gap_conv",), sd,
                      f"{torch_prefix}.aspp.global_avg_pool.1")
    assign_raw_bn(vt, flax_prefix + ("gap_bn", "BatchNorm_0"), sd,
                  f"{torch_prefix}.aspp.global_avg_pool.2")
    assign_plain_conv(vt, flax_prefix + ("conv1",), sd,
                      f"{torch_prefix}.aspp.conv1")
    assign_raw_bn(vt, flax_prefix + ("bn1", "BatchNorm_0"), sd,
                  f"{torch_prefix}.aspp.bn1")
    off = 1 if upsample_featuremaps else 0
    for hi, name in ((0, "head0"), (4, "head1")):
        assign_plain_conv(vt, flax_prefix + (name,), sd,
                          f"{torch_prefix}.conv.{off + hi}")
        assign_raw_bn(vt, flax_prefix + (f"{name}_bn", "BatchNorm_0"), sd,
                      f"{torch_prefix}.conv.{off + hi + 1}")
    assign_plain_conv(vt, flax_prefix + ("classifier",), sd,
                      f"{torch_prefix}.conv.{off + 8}")


def convert_mobilenet_seg_head(vt, sd, torch_prefix="decoders.s",
                               flax_prefix=("seg_decoder",)):
    """Runtime _DeepLabHead (reference deeplab_v3.py:13-30: two
    SeparableConv2d + 1x1 classifier) -> DeepLabHead."""
    def sep(prefix, tkey):
        vt.set("params", prefix + ("depthwise", "kernel"),
               conv_w(sd[f"{tkey}.block.depthwise.weight"]))
        assign_bn(vt, prefix + ("bn_depth",), sd, f"{tkey}.block.bn_depth")
        vt.set("params", prefix + ("pointwise", "kernel"),
               conv_w(sd[f"{tkey}.block.pointwise.weight"]))
        assign_bn(vt, prefix + ("bn_point",), sd, f"{tkey}.block.bn_point")

    sep(flax_prefix + ("head", "sep0"), f"{torch_prefix}.head.block.0")
    sep(flax_prefix + ("head", "sep1"), f"{torch_prefix}.head.block.1")
    assign_plain_conv(vt, flax_prefix + ("head", "classifier"), sd,
                      f"{torch_prefix}.head.block.2")


def convert_mask_base_decoder(vt, sd, torch_prefix="decoders.m",
                              flax_prefix=("mask_decoder", "decoder"),
                              n_res=3, n_upsample=3, norm="spectral",
                              has_low_level=True):
    assign_conv2dblock(vt, flax_prefix + ("proj_conv",), sd,
                       f"{torch_prefix}.proj_conv", norm="none")
    if has_low_level:
        assign_conv2dblock(vt, flax_prefix + ("low_level_conv",), sd,
                           f"{torch_prefix}.low_level_conv", norm="none")
        assign_conv2dblock(vt, flax_prefix + ("merge_feats_conv",), sd,
                           f"{torch_prefix}.merge_feats_conv", norm="none")
    # model.0 = ResBlocks; model.1,3,5.. = Interp; model.2,4,6 = up convs;
    # last = out conv
    for r in range(n_res):
        for ci, cname in ((0, "conv1"), (1, "conv2")):
            assign_conv2dblock(
                vt,
                flax_prefix + ("res_blocks", f"block{r}", cname),
                sd, f"{torch_prefix}.model.0.model.{r}.model.{ci}",
                norm="batch" if norm == "batch" else "none",
            )
    for u in range(n_upsample):
        assign_conv2dblock(
            vt, flax_prefix + (f"up_conv{u}",), sd,
            f"{torch_prefix}.model.{2 + 2 * u}",
            norm="batch" if norm == "batch" else "none",
        )
    assign_conv2dblock(
        vt, flax_prefix + ("out_conv",), sd,
        f"{torch_prefix}.model.{1 + 2 * n_upsample}", norm="none",
    )


def convert_mask_spade_decoder(vt, sd, torch_prefix="decoders.m",
                               flax_prefix=("mask_decoder",),
                               num_layers=3, use_proj=True,
                               param_free_norm="batch"):
    """Reference MaskSpadeDecoder (masker.py:59-231)."""
    assign_conv2dblock(vt, flax_prefix + ("low_level_conv",), sd,
                       f"{torch_prefix}.low_level_conv", norm="batch")
    if use_proj:
        assign_conv2dblock(vt, flax_prefix + ("high_level_conv",), sd,
                           f"{torch_prefix}.high_level_conv", norm="batch")
    assign_conv2dblock(vt, flax_prefix + ("merge_feats_conv",), sd,
                       f"{torch_prefix}.merge_feats_conv", norm="batch")
    for i in range(num_layers):
        assign_spade_resblock(
            vt, flax_prefix + (f"spade_block{i}",), sd,
            f"{torch_prefix}.spade_blocks.{i}", learned_shortcut=True,
            param_free_norm=param_free_norm,
        )
    assign_conv2dblock(vt, flax_prefix + ("mask_conv",), sd,
                       f"{torch_prefix}.mask_conv", norm="none")


def convert_painter(vt, sd, torch_prefix="painter",
                    flax_prefix=("painter",), latent_dim=640, spade_n_up=7,
                    param_free_norm="instance"):
    assign_plain_conv(vt, flax_prefix + ("fc",), sd, f"{torch_prefix}.fc")
    for name in ("head_0", "G_middle_0", "G_middle_1"):
        assign_spade_resblock(vt, flax_prefix + (name,), sd,
                              f"{torch_prefix}.{name}",
                              learned_shortcut=False,
                              param_free_norm=param_free_norm)
    for i in range(spade_n_up - 2):
        assign_spade_resblock(
            vt, flax_prefix + (f"up_spade{i}",), sd,
            f"{torch_prefix}.up_spades.{i}", learned_shortcut=True,
            param_free_norm=param_free_norm,
        )
    assign_spade_resblock(vt, flax_prefix + ("final_spade",), sd,
                          f"{torch_prefix}.final_spade",
                          learned_shortcut=False,
                          param_free_norm=param_free_norm)
    assign_plain_conv(vt, flax_prefix + ("conv_img",), sd,
                      f"{torch_prefix}.conv_img")


def convert_generator(variables: Dict, state_dict: Dict, cfg,
                      parts: Tuple[str, ...] = ("masker", "painter"),
                      lenient: bool = False) -> Dict:
    """Convert a full reference G state dict into flax variables.

    cfg: models.generator.GenConfig (drives which heads exist and sizes).
    Unknown/extra torch keys are ignored; unassigned flax leaves are
    reported by VariableTree.unassigned() for the caller to inspect.

    parts: which halves of the model to convert — "masker" (encoder +
    d/s/m heads) and/or "painter". Leaves outside `parts` keep the values
    already in ``variables`` (the reference's load_paths.m / .p semantics,
    trainer.py:440-527).

    lenient: when a whole module group has no keys in the state dict
    (e.g. a masker-only checkpoint loaded with tasks that include ``p``),
    skip it with a warning and keep the init values — the reference's
    ``load_state_dict(strict=False)`` inference behavior
    (trainer.py:536-546). A PARTIALLY present group still raises:
    truncated/corrupt files must be loud.
    """
    sd = {k.replace("module.", "module."): v for k, v in state_dict.items()}
    # strip an optional leading "G." (merged checkpoints)
    if any(k.startswith("G.") for k in sd):
        sd = {k[2:] if k.startswith("G.") else k: v for k, v in sd.items()}

    def have(prefix: str, group: str) -> bool:
        if any(k.startswith(prefix) for k in sd):
            return True
        if not lenient:
            raise KeyError(
                f"state dict has no {prefix!r}* keys for the {group} "
                f"(pass lenient=True to keep init values)"
            )
        import warnings

        warnings.warn(
            f"checkpoint has no {prefix!r}* keys: keeping init values for "
            f"the {group} (reference strict=False inference load)",
            stacklevel=3,
        )
        return False

    vt = VariableTree(variables)
    masker = "masker" in parts
    painter = "painter" in parts
    if masker and any(t in cfg.tasks for t in "msd") and \
            have("encoder.", "encoder"):
        if cfg.encoder_arch == "deeplabv2":
            convert_resnetmulti_v2(
                vt, sd, layers=cfg.encoder_layers,
                n_res=getattr(cfg, "encoder_n_res", 0),
            )
        elif cfg.backbone == "mobilenet":
            enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                      if k.startswith("encoder.")}
            convert_mobilenet_encoder(vt, enc_sd)
        else:
            convert_resnet_encoder(vt, sd, layers=cfg.encoder_layers)
    if masker and "d" in cfg.tasks and cfg.d_architecture == "dada" and \
            have("decoders.d.", "depth decoder"):
        convert_dada_depth(
            vt, sd,
            do_feat_fusion=cfg.m_use_dada or ("s" in cfg.tasks and cfg.s_use_dada),
            upsample=cfg.d_upsample_featuremaps,
        )
    if masker and "s" in cfg.tasks and have("decoders.s.", "seg decoder"):
        if cfg.s_architecture == "deeplabv2" or cfg.encoder_arch == "deeplabv2":
            convert_v2_seg_decoder(vt, sd)
        elif cfg.backbone == "mobilenet":
            convert_mobilenet_seg_head(vt, sd)
        else:
            convert_seg_decoder(vt, sd)
    if masker and "m" in cfg.tasks and have("decoders.m.", "mask decoder"):
        if cfg.m_use_spade:
            convert_mask_spade_decoder(
                vt, sd, num_layers=cfg.m_spade_num_layers,
                use_proj=cfg.m_use_proj,
            )
        else:
            convert_mask_base_decoder(
                vt, sd, n_res=cfg.m_n_res, n_upsample=cfg.m_n_upsample,
                norm=cfg.m_norm, has_low_level=cfg.m_use_low_level_feats,
            )
    if painter and "p" in cfg.tasks and have("painter.", "painter"):
        convert_painter(vt, sd, latent_dim=cfg.p_latent_dim,
                        spade_n_up=cfg.p_spade_n_up,
                        param_free_norm=cfg.p_spade_param_free_norm)
    return vt.result()


def load_inception_weights(path: str, variables: Dict) -> Dict:
    """torchvision/pytorch-fid inception_v3 state dict -> InceptionV3Features.

    The flax module names mirror torchvision's (Conv2d_1a_3x3,
    Mixed_5b.branch1x1, ...), so the mapping is a tree walk over every
    ConvBN (conv + bn pair).
    """
    sd = load_torch_state_dict(path)
    vt = VariableTree(variables)

    def walk(node: Dict, path: Tuple[str, ...]):
        if "conv" in node and "bn" in node:
            tkey = ".".join(path)
            vt.set("params", path + ("conv", "kernel"),
                   conv_w(sd[f"{tkey}.conv.weight"]))
            vt.set("params", path + ("bn", "scale"),
                   _t(sd[f"{tkey}.bn.weight"]))
            vt.set("params", path + ("bn", "bias"),
                   _t(sd[f"{tkey}.bn.bias"]))
            vt.set("batch_stats", path + ("bn", "mean"),
                   _t(sd[f"{tkey}.bn.running_mean"]))
            vt.set("batch_stats", path + ("bn", "var"),
                   _t(sd[f"{tkey}.bn.running_var"]))
            return
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))

    walk(vt.v["params"], ())
    return vt.result()


def load_vgg19_weights(path: str, variables: Dict) -> Dict:
    """torchvision vgg19 state dict -> VGG19Features variables."""
    sd = load_torch_state_dict(path)
    vt = VariableTree(variables)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
    for i, ti in enumerate(conv_idx):
        if f"features.{ti}.weight" not in sd:
            break
        vt.set("params", (f"conv{i}", "kernel"),
               conv_w(sd[f"features.{ti}.weight"]))
        vt.set("params", (f"conv{i}", "bias"), _t(sd[f"features.{ti}.bias"]))
    return vt.result()


# ---------------------------------------------------------------------------
# pretrained backbone / seg-head loading (the reference initializes encoders
# and the v3 seg decoder from pretrained DeepLab .pth files at setup:
# deeplab/__init__.py:43-101, deeplab_v3.py:193-230, mobilenet_v3.py:303-324)
# ---------------------------------------------------------------------------


def _cbr(vt, prefix, sd, tkey):
    """_ConvBNReLU (mobilenet_v3.py:70-101): .conv + .bn."""
    vt.set("params", prefix + ("conv", "kernel"),
           conv_w(sd[f"{tkey}.conv.weight"]))
    assign_bn(vt, prefix + ("bn",), sd, f"{tkey}.bn")


# (t, c, n) groups per stage, mirroring models.mobilenet._IR_SETTING and the
# reference's block1..block5 split (mobilenet_v3.py:193-236)
_MOBILENET_STAGES = (
    ("block1", ((1, 16, 1),)),
    ("block2", ((6, 24, 2),)),
    ("block3", ((6, 32, 3),)),
    ("block4", ((6, 64, 4), (6, 96, 3))),
    ("block5", ((6, 160, 3), (6, 320, 1))),
)


def convert_mobilenet_encoder(vt, sd, flax_prefix=("encoder",),
                              lenient=False):
    """Pretrained MobileNetV2 state dict (keys ``conv1.*``,
    ``block{1-5}.{j}.conv.{i}.*``) -> MobileNetV2Encoder. With ``lenient``,
    missing torch keys are skipped (the reference's strict-update-on-
    intersection semantics, mobilenet_v3.py:303-324)."""
    def maybe(fn, *args):
        try:
            fn(*args)
            return 1
        except KeyError:
            if not lenient:
                raise
            return 0

    loaded = maybe(_cbr, vt, flax_prefix + ("conv1",), sd, "conv1")
    for sname, groups in _MOBILENET_STAGES:
        j = 0
        for t, c, n in groups:
            for _ in range(n):
                tk = f"{sname}.{j}"
                fp = flax_prefix + (f"{sname}_ir{j}",)
                li = 0
                if t != 1:
                    loaded += maybe(_cbr, vt, fp + ("layer0",), sd,
                                    f"{tk}.conv.0")
                    li = 1
                loaded += maybe(_cbr, vt, fp + (f"layer{li}",), sd,
                                f"{tk}.conv.{li}")

                def pw(fp=fp, tk=tk, li=li):
                    vt.set("params", fp + ("project", "kernel"),
                           conv_w(sd[f"{tk}.conv.{li + 1}.weight"]))
                    assign_bn(vt, fp + ("project_bn",), sd,
                              f"{tk}.conv.{li + 2}")

                loaded += maybe(pw)
                j += 1
    return loaded


def convert_pretrained_seg_resnet(vt, sd, flax_prefix=("seg_decoder",),
                                  skip_classes=19):
    """Pretrained DeepLabv3+ (resnet) ``aspp.*`` / ``decoder.*`` keys ->
    DeepLabV3Decoder, skipping the source 19-class classifier
    (deeplab_v3.py:197-216)."""
    for name in ("conv1", "conv2", "conv3", "conv4", "conv_out"):
        assign_plain_conv(vt, flax_prefix + ("aspp", name, "conv"), sd,
                          f"aspp.{name}.conv")
        assign_raw_bn(vt, flax_prefix + ("aspp", name, "bn", "BatchNorm_0"),
                      sd, f"aspp.{name}.bn")
    assign_plain_conv(vt, flax_prefix + ("decoder", "conv_low", "conv"), sd,
                      "decoder.conv_low.conv")
    assign_raw_bn(vt, flax_prefix + ("decoder", "conv_low", "bn",
                                     "BatchNorm_0"),
                  sd, "decoder.conv_low.bn")
    for i in (0, 1):
        assign_plain_conv(vt, flax_prefix + ("decoder", f"conv_cat{i}",
                                             "conv"),
                          sd, f"decoder.conv_cat.{i}.conv")
        assign_raw_bn(vt, flax_prefix + ("decoder", f"conv_cat{i}", "bn",
                                         "BatchNorm_0"),
                      sd, f"decoder.conv_cat.{i}.bn")
    w = sd.get("decoder.conv_out.weight")
    if w is not None and _t(w).shape[0] != skip_classes:
        assign_plain_conv(vt, flax_prefix + ("decoder", "conv_out"), sd,
                          "decoder.conv_out")


def convert_pretrained_seg_mobilenet(vt, sd, flax_prefix=("seg_decoder",),
                                     skip_classes=19):
    """Pretrained ``head.block.{0,1,2}`` keys -> DeepLabHead, skipping the
    19-class classifier (deeplab_v3.py:218-230)."""
    def sep(prefix, tkey):
        vt.set("params", prefix + ("depthwise", "kernel"),
               conv_w(sd[f"{tkey}.block.depthwise.weight"]))
        assign_bn(vt, prefix + ("bn_depth",), sd, f"{tkey}.block.bn_depth")
        vt.set("params", prefix + ("pointwise", "kernel"),
               conv_w(sd[f"{tkey}.block.pointwise.weight"]))
        assign_bn(vt, prefix + ("bn_point",), sd, f"{tkey}.block.bn_point")

    sep(flax_prefix + ("head", "sep0"), "head.block.0")
    sep(flax_prefix + ("head", "sep1"), "head.block.1")
    w = sd.get("head.block.2.weight")
    if w is not None and _t(w).shape[0] != skip_classes:
        assign_plain_conv(vt, flax_prefix + ("head", "classifier"), sd,
                          "head.block.2")


def maybe_load_pretrained_backbone(opts, variables: Dict):
    """Honor ``gen.deeplabv2.use_pretrained`` / ``gen.deeplabv3.use_pretrained``
    + ``pretrained_model`` paths (reference defaults.yaml:108-120,
    deeplab/__init__.py:54-101). Returns ``(variables, loaded: bool)``; the
    returned tree has encoder (and, for v3, seg-decoder) weights replaced.
    """
    from pathlib import Path

    g = opts.gen
    arch = g.encoder.get("architecture", "deeplabv3")
    has_encoder = any(t in (opts.tasks or ()) for t in "msd")
    if not has_encoder:
        return variables, False

    if arch == "deeplabv2":
        conf = g.deeplabv2
        if not conf.get("use_pretrained"):
            return variables, False
        path = str(conf.get("pretrained_model") or "")
        if not path or not Path(path).exists():
            raise FileNotFoundError(
                f"gen.deeplabv2.use_pretrained set but pretrained_model "
                f"{path!r} does not exist"
            )
        sd = load_torch_state_dict(path)
        # strip the first key component and skip layer5/resblock
        # (reference deeplab/__init__.py:89-97)
        enc_sd = {}
        for k, v in sd.items():
            parts = k.split(".")
            if len(parts) > 1 and parts[1] in ("layer5", "resblock"):
                continue
            enc_sd["encoder." + ".".join(parts[1:])] = v
        vt = VariableTree(variables)
        convert_resnet_encoder(
            vt, enc_sd,
            layers=tuple(conf.get("nblocks") or (3, 4, 23, 3)),
        )
        return vt.result(), True

    conf = g.deeplabv3
    if not conf.get("use_pretrained"):
        return variables, False
    backbone = conf.get("backbone", "resnet")
    pm = conf.get("pretrained_model") or {}
    path = str(pm.get(backbone, "") if isinstance(pm, dict) else pm)
    if not path or not Path(path).exists():
        raise FileNotFoundError(
            f"gen.deeplabv3.use_pretrained set but pretrained_model."
            f"{backbone} {path!r} does not exist"
        )
    sd = load_torch_state_dict(path)
    vt = VariableTree(variables)
    has_seg = "s" in (opts.tasks or ()) and \
        g.s.get("architecture", "deeplabv3") == "deeplabv3"
    if backbone == "resnet":
        enc_sd = {
            "encoder." + k[len("backbone."):]: v
            for k, v in sd.items() if k.startswith("backbone.")
        }
        convert_resnet_encoder(vt, enc_sd)
        if has_seg:
            convert_pretrained_seg_resnet(vt, sd)
    else:
        enc_sd = {k.replace("encoder.", "", 1): v for k, v in sd.items()}
        n_loaded = convert_mobilenet_encoder(vt, enc_sd, lenient=True)
        if n_loaded == 0:
            raise ValueError(
                f"no mobilenet backbone weights matched in {path!r} "
                f"({len(enc_sd)} keys present)"
            )
        if has_seg:
            convert_pretrained_seg_mobilenet(vt, sd)
    return vt.result(), True
