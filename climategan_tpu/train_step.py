"""Functional G/D training steps (the reference Trainer's hot loop as two
jit-compiled SPMD functions).

Re-design of reference climategan/trainer.py:
  * update_G (:989-1015) / get_G_loss (:1162-1182) / get_masker_loss
    (:1184-1254) / get_painter_loss (:1256-1387)
  * update_D (:1017-1032) / get_D_loss (:1034-1160)
  * masker_d_loss (:1389-1407) / masker_s_loss (:1409-1504)
    / masker_m_loss (:1506-1616) / painter_loss_for_masker (:1618-1651)

Design: instead of .backward() + in-place optimizer mutation, each update is
a pure function (params, states, batch, rng) -> (params, states, metrics)
built with jax.value_and_grad. ExtraAdam's even/odd extrapolate/step
alternation is a traced bool so the whole loop compiles once. Data
parallelism: run the step under jit with batch sharded over the mesh's
"data" axis — XLA inserts the gradient all-reduces (no pmap plumbing).

Batch layout: {domain: {task: NHWC array}} with NHW int32 for "s" labels.
Domains: "r" (real), "s" (sim) for the masker; "rf" (real flooded) for the
painter. Which tasks exist per domain is static (from the dataset schema).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from climategan_tpu import losses as L
from climategan_tpu.models.discriminator import create_discriminator
from climategan_tpu.models.generator import create_generator
from climategan_tpu.ops.interpolate import resize

Array = jax.Array


def vgg_preprocess(batch: Array) -> Array:
    """[-1,1] RGB -> caffe-style BGR-255 minus imagenet mean
    (reference tutils.py:416-428)."""
    bgr = batch[..., ::-1]
    bgr = (bgr + 1.0) * 255.0 * 0.5
    mean = jnp.array([103.939, 116.779, 123.680], dtype=bgr.dtype)
    return bgr - mean


def divide_pred(pred):
    """Split a (multiscale) discriminator output of a real||fake batch-concat
    into (real, fake) halves (reference tutils.py:443-469)."""
    if isinstance(pred, (list, tuple)):
        real = [[t[: t.shape[0] // 2] for t in scale] for scale in pred]
        fake = [[t[t.shape[0] // 2:] for t in scale] for scale in pred]
        return real, fake
    return pred[: pred.shape[0] // 2], pred[pred.shape[0] // 2:]


def _wgan_gp(disc_fn, x: Array) -> Array:
    """WGAN gradient penalty ((||grad||_2 - 1)^2 per sample, meaned)
    (reference tutils.py:487-501 get_WGAN_gradient)."""
    g = jax.grad(lambda v: jnp.sum(disc_fn(v)))(x)
    n = g.shape[0]
    norms = jnp.sqrt(jnp.sum(g.reshape(n, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (opts.train.lambdas et al.)."""

    tasks: Tuple[str, ...] = ("d", "s", "m", "p")
    # lambdas
    lam_d_main: float = 1.0
    lam_d_gml: float = 0.5
    lam_s_crossent: float = 1.0
    lam_s_minent: float = 0.001
    lam_s_advent: float = 0.001
    lam_m_bce: float = 1.0
    lam_m_tv: float = 1.0
    lam_m_gi: float = 0.05
    lam_m_pl4m: float = 1.0
    lam_p_vgg: float = 10.0
    lam_p_tv: float = 0.0
    lam_p_context: float = 0.0
    lam_p_reconstruction: float = 0.0
    lam_p_featmatch: float = 10.0
    lam_p_gan: float = 1.0
    adv_main: float = 1.0
    ent_main: float = 0.5
    ent_var: float = 0.1
    # flags
    d_loss: str = "sigm"  # sigm | dada (reference losses.py:398-405)
    d_classify: bool = False  # depth bucket classification -> cross-entropy
    s_use_advent: bool = True
    s_use_dada: bool = True
    s_use_minent: bool = True
    m_use_advent: bool = True
    m_use_dada: bool = False
    m_use_minent: bool = True
    m_use_minent_var: bool = True
    m_use_ground_intersection: bool = True
    m_use_spade: bool = False
    m_spade_detach: bool = False
    use_pl4m: bool = False
    p_loss: str = "gan"  # gan | hinge
    p_use_local: bool = False
    p_diff_aug_use: bool = False
    p_diff_aug_color: bool = False
    p_diff_aug_cutout: bool = False
    p_diff_aug_translation: bool = False
    p_diff_aug_cutout_ratio: float = 0.5
    p_diff_aug_translation_ratio: float = 0.125
    soft_shift: float = 0.2
    flip_prob: float = 0.05
    m_gan_type: str = "WGAN_norm"
    s_gan_type: str = "WGAN_norm"
    use_vgg: bool = True
    bf16: bool = True  # bf16 activations, f32 params/losses (TPU policy)
    pseudo_tasks: Tuple[str, ...] = ()
    lam_s_crossent_pseudo: float = 0.001
    wgan_gp_lambda: float = 10.0
    wgan_clamp: Tuple[float, float] = (-0.01, 0.01)
    # domain labels (reference trainer.py:107)
    label_s: float = 0.0
    label_r: float = 1.0

    @classmethod
    def from_opts(cls, opts) -> "TrainConfig":
        lam = opts.train.lambdas
        return cls(
            tasks=tuple(opts.tasks),
            lam_d_main=float(lam.G.d.main),
            lam_d_gml=float(lam.G.d.gml),
            lam_s_crossent=float(lam.G.s.crossent),
            lam_s_minent=float(lam.G.s.minent),
            lam_s_advent=float(lam.G.s.advent),
            lam_m_bce=float(lam.G.m.bce),
            lam_m_tv=float(lam.G.m.tv),
            lam_m_gi=float(lam.G.m.gi),
            lam_m_pl4m=float(lam.G.m.pl4m),
            lam_p_vgg=float(lam.G.p.vgg),
            lam_p_tv=float(lam.G.p.tv),
            lam_p_context=float(lam.G.p.context),
            lam_p_reconstruction=float(lam.G.p.reconstruction),
            lam_p_featmatch=float(lam.G.p.featmatch),
            lam_p_gan=float(lam.G.p.gan),
            adv_main=float(lam.advent.adv_main),
            ent_main=float(lam.advent.ent_main),
            ent_var=float(lam.advent.ent_var),
            d_loss=opts.gen.d.get("loss", "sigm"),
            d_classify=bool(opts.gen.d.get("classify", {}).get("enable",
                                                               False)),
            s_use_advent=bool(opts.gen.s.get("use_advent", True)),
            s_use_dada=bool(opts.gen.s.get("use_dada", True)),
            s_use_minent=bool(opts.gen.s.get("use_minent", True)),
            m_use_advent=bool(opts.gen.m.get("use_advent", True)),
            m_use_dada=bool(opts.gen.m.get("use_dada", False)),
            m_use_minent=bool(opts.gen.m.get("use_minent", True)),
            m_use_minent_var=bool(opts.gen.m.get("use_minent_var", True)),
            m_use_ground_intersection=bool(
                opts.gen.m.get("use_ground_intersection", True)
            ),
            m_use_spade=bool(opts.gen.m.get("use_spade", False)),
            m_spade_detach=bool(opts.gen.m.spade.get("detach", False)),
            use_pl4m=bool(opts.gen.m.get("use_pl4m", False)),
            p_loss=opts.gen.p.get("loss", "gan"),
            p_use_local=bool(opts.dis.p.get("use_local_discriminator",
                                            False)),
            p_diff_aug_use=bool(opts.gen.p.diff_aug.get("use", False)),
            p_diff_aug_color=bool(
                opts.gen.p.diff_aug.get("do_color_jittering", False)
            ),
            p_diff_aug_cutout=bool(opts.gen.p.diff_aug.get("do_cutout", False)),
            p_diff_aug_translation=bool(
                opts.gen.p.diff_aug.get("do_translation", False)
            ),
            p_diff_aug_cutout_ratio=float(
                opts.gen.p.diff_aug.get("cutout_ratio", 0.5)
            ),
            p_diff_aug_translation_ratio=float(
                opts.gen.p.diff_aug.get("translation_ratio", 0.125)
            ),
            soft_shift=float(opts.dis.get("soft_shift", 0.2)),
            flip_prob=float(opts.dis.get("flip_prob", 0.05)),
            m_gan_type=opts.dis.m.get("gan_type", "WGAN_norm"),
            s_gan_type=opts.dis.s.get("gan_type", "WGAN_norm"),
            use_vgg=float(lam.G.p.vgg) != 0,
            bf16=bool(opts.train.get("bf16", True)),
            pseudo_tasks=tuple(opts.train.get("pseudo", {}).get("tasks", [])
                               or []),
            lam_s_crossent_pseudo=float(lam.G.s.get("crossent_pseudo", 0.001)),
            wgan_gp_lambda=float(lam.advent.get("WGAN_gp", 10.0)),
            wgan_clamp=(
                float(opts.dis.m.get("wgan_clamp_lower", -0.01)),
                float(opts.dis.m.get("wgan_clamp_upper", 0.01)),
            ),
        )


class TrainState(NamedTuple):
    g_params: Any
    g_state: Any       # batch_stats + spectral collections of G
    d_params: Any
    d_state: Any       # spectral collection of D
    g_opt: Any         # ExtraAdamState | AdamState (per opts.*.opt.optimizer)
    d_opt: Any
    step: Array        # global step (int32)
    rng: Array


def _merge_vars(params, state):
    return {"params": params, **state}


def _split_vars(variables):
    # a config may build no discriminators at all (e.g. masker-only without
    # ADVENT) — init then yields no "params" collection
    params = variables.get("params", {})
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


def _state_of(variables):
    """Non-param collections of a variables dict."""
    return {k: v for k, v in variables.items() if k != "params"}


def make_remat_policy(spec):
    """Build a jax.checkpoint policy from an opts string.

    ``""``/``"full"`` -> None (plain remat: save nothing, recompute the
    whole forward in the backward — maximum HBM savings).
    ``"dots"`` -> ``jax.checkpoint_policies.dots_saveable`` (save every
    conv/matmul output; cheapest recompute, highest residency).
    ``"small_convs[:AREA]"`` -> save conv/matmul outputs whose *input*
    spatial area is <= AREA pixels (default 160*160): the os8 masker
    trunk's activations are saved (its convs dominate recompute FLOPs
    but are small), while the painter's full-res 320^2/640^2 tensors —
    the HBM hogs that forced remat on in the first place — are still
    rematerialized.
    """
    if not spec or spec == "full":
        return None
    import jax

    if spec == "dots":
        return jax.checkpoint_policies.dots_saveable
    if spec.startswith("small_convs"):
        area = int(spec.split(":", 1)[1]) if ":" in spec else 160 * 160

        def policy(prim, *avals, **params):
            if prim.name == "dot_general":
                return True
            if prim.name == "conv_general_dilated" and avals:
                dn = params.get("dimension_numbers")
                shape = avals[0].shape
                if dn is None or not shape:
                    return False
                spatial = 1
                for d in dn.lhs_spec[2:]:
                    spatial *= shape[d]
                return spatial <= area

            return False

        return policy
    raise ValueError(f"unknown tpu.remat_policy: {spec!r}")


class StepBuilder:
    """Builds jittable G/D update functions for given (G, D, config)."""

    def __init__(self, opts, vgg_variables=None):
        self.cfg = TrainConfig.from_opts(opts)
        self.G = create_generator(opts)
        self.D = create_discriminator(opts)
        # rematerialization: recompute forward activations in the backward
        # pass (jax.checkpoint) — trades FLOPs for HBM, enabling 640^2
        # training batches on a 16GB chip
        self.remat = bool(opts.get("tpu", {}).get("remat", False))
        # selective remat: which activations the checkpoint may keep
        # (see make_remat_policy; A/B'd on v5e in BENCH_NOTES round 5)
        self.remat_policy = make_remat_policy(
            opts.get("tpu", {}).get("remat_policy", "") or ""
        )
        # rematerializing the D step trades ~12% step time for the HBM to
        # fit one more sample per domain at 640^2 (measured: b3 fits but
        # 7.6 img/s vs 8.5 at b2) — separate knob, off by default
        self.remat_d = bool(opts.get("tpu", {}).get("remat_d", False))
        # gradient accumulation (greenfield — the reference has none,
        # SURVEY §2.4): split each domain batch into k micro-batches,
        # average grads over a lax.scan, one optimizer step
        self.grad_accumulation = int(
            opts.train.get("grad_accumulation", 1) or 1
        )
        self.vgg_variables = vgg_variables
        g_lr_conf = opts.gen.opt.lr
        d_lr_conf = opts.dis.opt.lr
        self.g_lr = float(g_lr_conf.get("default", 5e-5)) \
            if isinstance(g_lr_conf, dict) else float(g_lr_conf)
        self.d_lr = float(d_lr_conf.get("default", 2e-5)) \
            if isinstance(d_lr_conf, dict) else float(d_lr_conf)
        self.g_b1 = float(opts.gen.opt.get("beta1", 0.9))
        self.d_b1 = float(opts.dis.opt.get("beta1", 0.5))
        # optimizer menu (reference optim.py:109-123)
        from climategan_tpu.optim import make_optimizer

        self.g_opt_init, self.g_opt_step = make_optimizer(
            opts.gen.opt.get("optimizer", "ExtraAdam"), self.g_b1
        )
        self.d_opt_init, self.d_opt_step = make_optimizer(
            opts.dis.opt.get("optimizer", "ExtraAdam"), self.d_b1
        )
        # per-task LR groups (reference optim.py:54-123): map param-path
        # prefixes to lr multipliers relative to the default lr
        self.g_lr_rules = {}
        if isinstance(g_lr_conf, dict) and len(g_lr_conf) > 1:
            task_prefix = {
                "m": "encoder", "d": "depth_decoder", "s": "seg_decoder",
                "p": "painter",
            }
            extra = {"m": "mask_decoder"}
            for task, prefix in task_prefix.items():
                if task in g_lr_conf:
                    scale = float(g_lr_conf[task]) / self.g_lr
                    self.g_lr_rules[prefix] = scale
                    if task in extra:
                        self.g_lr_rules[extra[task]] = scale
        self.d_lr_rules = {}
        if isinstance(d_lr_conf, dict) and len(d_lr_conf) > 1:
            for task, prefix in (("p", "p"), ("m", "m_advent"),
                                 ("s", "s_advent")):
                if task in d_lr_conf:
                    self.d_lr_rules[prefix] = float(d_lr_conf[task]) / self.d_lr
        self._g_lr_scales = None
        self._d_lr_scales = None

    # ------------------------------------------------------------------
    def init_state(self, rng, batch, d_image_size: int = 640) -> TrainState:
        """Initialize all params/states from a sample multi-domain batch."""
        kg, kd = jax.random.split(rng)
        some_x = next(iter(batch.values()))["x"]
        g_vars = self.G.init(kg, some_x)
        g_params, g_state = _split_vars(g_vars)

        # D inputs: p gets [m, x] 4ch; m advent 2ch entropy; s advent 11ch
        n, h, w, _ = some_x.shape
        p_in = jnp.zeros((n, h, w, 4))
        m_in = jnp.zeros((n, h, w, 2))
        s_in = jnp.zeros((n, 32, 32, self.D.cfg.s_num_classes))
        d_vars = self.D.init(kd, p_in, m_in, s_in)
        d_params, d_state = _split_vars(d_vars)

        return TrainState(
            g_params=g_params,
            g_state=g_state,
            d_params=d_params,
            d_state=d_state,
            g_opt=self.g_opt_init(g_params),
            d_opt=self.d_opt_init(d_params),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    # ------------------------------------------------------------------
    # loss pieces (mirror reference masker_*_loss / painter losses)
    # ------------------------------------------------------------------
    def _masker_losses(self, g_vars, d_vars, batch, domain, for_, rng,
                       mutable, eval_mode: bool = False,
                       d_mutable: bool = False, pseudo_scale=1.0):
        """Masker losses for one domain batch.

        ``pseudo_scale`` is a TRACED 1/0 scalar multiplying only the
        pseudo-label loss terms (depth/seg supervision on the real domain):
        the reference clears pseudo_training_tasks after train.pseudo.epochs
        (trainer.py:920-922); gating by a traced scalar keeps one compiled
        graph across the phase flip instead of recompiling the step.

        Returns ``(loss, metrics, new_gstate, new_dstate)``. State threading
        matches the reference, where G stays in train mode during BOTH
        update_G and update_D (BatchNorm running stats and SpectralNorm u/v
        update on every train-mode forward — reference norms.py:100-112,
        trainer.py:989-1032): each mutable apply here starts from the latest
        collections and feeds the next. ``new_gstate``/``new_dstate`` are
        None when the corresponding net is applied read-only.
        """
        cfg = self.cfg
        G, D = self.G, self.D
        x = batch["x"]
        if cfg.bf16 and not eval_mode:
            x = x.astype(jnp.bfloat16)
        metrics = {}

        gv = dict(g_vars)
        dv = dict(d_vars)
        train_flag = not eval_mode

        def gapply(method, *args, **kw):
            rngs = {"dropout": rng} if train_flag else None
            if mutable:
                out, new_state = G.apply(
                    gv, *args, method=method,
                    mutable=["batch_stats", "spectral"],
                    rngs=rngs,
                    **kw,
                )
                gv.update(new_state)
                return out
            return G.apply(gv, *args, method=method, rngs=rngs, **kw)

        def dapply(method, inp):
            if d_mutable:
                out, new_state = D.apply(
                    dv, inp, method=method, update_sn=True,
                    mutable=["spectral"],
                )
                dv.update(new_state)
                return out
            return D.apply(dv, inp, method=method)

        # one shared encoder forward for all heads
        z = gapply("encode", x, train=train_flag)

        total = 0.0
        d_pred = s_pred = z_depth = None

        if "d" in cfg.tasks:
            d_pred, z_depth = gapply(
                "depth", z, train=train_flag, update_sn=train_flag and mutable
            )

        # ---- depth loss (sim only unless pseudo-labels are enabled;
        # reference masker_d_loss :1389-1407). Criterion selection mirrors
        # reference get_losses (losses.py:398-405): bucket classification
        # -> CrossEntropy; gen.d.loss == "dada" -> berHu; else SIGM.
        if for_ == "G" and "d" in batch and "d" in cfg.tasks:
            if ((domain == "s" or "d" in cfg.pseudo_tasks)
                    and cfg.lam_d_main != 0):
                pred_f32 = d_pred.astype(jnp.float32)
                if cfg.d_classify:
                    target = batch["d"]
                    if target.ndim == 4:  # NHW1 bucket indices -> NHW
                        target = target[..., 0]
                    dl = L.cross_entropy(pred_f32, target.astype(jnp.int32))
                elif cfg.d_loss == "dada":
                    dl = L.dada_depth_loss(
                        pred_f32, batch["d"].astype(jnp.float32)
                    )
                else:
                    dl = L.sigm_loss(
                        pred_f32,
                        batch["d"].astype(jnp.float32),
                        gmweight=cfg.lam_d_gml,
                    )
                dl = dl * cfg.lam_d_main
                if domain != "s":  # pseudo-label supervision on real domain
                    dl = dl * pseudo_scale
                total += dl
                metrics[f"d_{domain}"] = dl

        # ---- segmentation losses (reference masker_s_loss :1409-1504).
        # The s decoder runs on EVERY domain like the reference: the real
        # domain has no s labels but still gets minent + ADVENT fool-D
        # losses, and the SPADE masker's conditioning needs s_pred.
        if "s" in cfg.tasks:
            s_pred = gapply("segmentation", z, z_depth, train=train_flag)
            softmax_s = jax.nn.softmax(s_pred.astype(jnp.float32), axis=-1)
            if for_ == "G":
                if "s" in batch and (domain == "s" or "s" in cfg.pseudo_tasks):
                    w = (cfg.lam_s_crossent if domain == "s"
                         else cfg.lam_s_crossent_pseudo)
                    if w != 0:
                        sl = L.cross_entropy(
                            s_pred.astype(jnp.float32), batch["s"]
                        ) * w
                        if domain != "s":  # pseudo-label supervision
                            sl = sl * pseudo_scale
                        total += sl
                        metrics[f"s_crossent_{domain}"] = sl
                if domain == "r" and cfg.s_use_minent and cfg.lam_s_minent != 0:
                    ml = L.minent_loss(softmax_s) * cfg.lam_s_minent
                    total += ml
                    metrics["s_minent"] = ml
            if cfg.s_use_advent:
                dp = (jax.lax.stop_gradient(d_pred)
                      if cfg.s_use_dada and d_pred is not None else None)
                if for_ == "D":
                    label = cfg.label_s if domain == "s" else cfg.label_r
                    weight = cfg.adv_main
                    sm = jax.lax.stop_gradient(softmax_s)
                else:
                    label = cfg.label_s
                    weight = cfg.lam_s_advent
                    sm = softmax_s
                if (for_ == "D" or domain == "r") and weight != 0:
                    disc_fn = lambda e: dapply(  # noqa: E731
                        "disc_s", e.astype(jnp.float32),
                    )
                    al = L.advent_loss(
                        sm, label, disc_fn, cfg.s_gan_type, dp
                    ) * weight
                    total += al
                    metrics[f"s_advent_{for_}_{domain}"] = al
                    if for_ == "D" and cfg.s_gan_type == "WGAN_gp":
                        # gp differentiates the disc wrt its input; use a
                        # read-only apply (a mutating one would leak inner-
                        # trace tracers into dv)
                        pure_fn = lambda e: D.apply(  # noqa: E731
                            dict(dv), e.astype(jnp.float32), method="disc_s",
                        )
                        gp = _wgan_gp(pure_fn, jax.lax.stop_gradient(
                            s_pred.astype(jnp.float32)))
                        total += gp * cfg.wgan_gp_lambda
                        metrics[f"s_gp_{domain}"] = gp

        # ---- mask losses (reference masker_m_loss :1506-1616)
        if "m" in cfg.tasks and ("m" in batch or for_ == "D"):
            cond = None
            if cfg.m_use_spade and d_pred is not None and s_pred is not None:
                d_c, s_c = d_pred, s_pred
                if for_ == "D" or cfg.m_spade_detach:
                    d_c = jax.lax.stop_gradient(d_c)
                    s_c = jax.lax.stop_gradient(s_c)
                cond = G.apply(gv, d_c, s_c, x, method="make_m_cond")
            zd = z_depth if cfg.m_use_dada else None
            logits = gapply(
                "mask_logits", z, cond, zd,
                train=train_flag, update_sn=train_flag and mutable,
            )
            logits = logits.astype(jnp.float32)
            prob1 = jax.nn.sigmoid(logits)
            prob = jnp.concatenate([prob1, 1.0 - prob1], axis=-1)

            if for_ == "G":
                if cfg.lam_m_tv != 0:
                    tl = L.tv_loss(prob1) * cfg.lam_m_tv
                    total += tl
                    metrics[f"m_tv_{domain}"] = tl
                if domain == "s" and "m" in batch and cfg.lam_m_bce != 0:
                    bl = L.bce_with_logits(
                        logits, batch["m"].astype(jnp.float32)
                    ) * cfg.lam_m_bce
                    total += bl
                    metrics["m_bce"] = bl
                if domain == "r":
                    if (cfg.m_use_ground_intersection and "m" in batch
                            and cfg.lam_m_gi != 0):
                        gl = L.ground_intersection_loss(
                            prob1, batch["m"].astype(jnp.float32)
                        ) * cfg.lam_m_gi
                        total += gl
                        metrics["m_gi"] = gl
                    if cfg.use_pl4m and cfg.lam_m_pl4m != 0:
                        pl = self._pl4m_loss(
                            g_vars, d_vars, x, prob1, rng
                        ) * cfg.lam_m_pl4m
                        total += pl
                        metrics["m_pl4m"] = pl
                    if cfg.m_use_minent and cfg.ent_main != 0:
                        ml = L.minent_loss(
                            prob,
                            version=2 if cfg.m_use_minent_var else 1,
                            lambda_var=cfg.ent_var,
                        ) * cfg.ent_main
                        total += ml
                        metrics["m_minent"] = ml

            if cfg.m_use_advent:
                dp = None
                if cfg.m_use_dada and d_pred is not None:
                    dp = jax.lax.stop_gradient(d_pred)
                    dp = resize(dp, (x.shape[1], x.shape[2]), mode="nearest")
                if for_ == "D":
                    label = cfg.label_s if domain == "s" else cfg.label_r
                    weight = cfg.adv_main
                    pr = jax.lax.stop_gradient(prob)
                else:
                    label = cfg.label_s
                    weight = cfg.adv_main
                    pr = prob
                if (for_ == "D" or domain == "r") and weight != 0:
                    disc_fn = lambda e: dapply(  # noqa: E731
                        "disc_m", e.astype(jnp.float32),
                    )
                    al = L.advent_loss(
                        pr, label, disc_fn, cfg.m_gan_type, dp
                    ) * weight
                    total += al
                    metrics[f"m_advent_{for_}_{domain}"] = al
                    if for_ == "D" and cfg.m_gan_type == "WGAN_gp":
                        pure_fn = lambda e: D.apply(  # noqa: E731
                            dict(dv), e.astype(jnp.float32), method="disc_m",
                        )
                        gp = _wgan_gp(pure_fn, jax.lax.stop_gradient(prob))
                        total += gp * cfg.wgan_gp_lambda
                        metrics[f"m_gp_{domain}"] = gp

        new_gstate = _state_of(gv) if mutable else None
        new_dstate = _state_of(dv) if d_mutable else None
        return total, metrics, new_gstate, new_dstate

    def _diff_aug(self, rng, x):
        """DiffAugment before the painter D (reference trainer.py:1075-1078,
        1319-1321)."""
        if not self.cfg.p_diff_aug_use:
            return x
        from climategan_tpu.ops.diff_aug import DiffTransforms

        dt = DiffTransforms({
            "do_color_jittering": self.cfg.p_diff_aug_color,
            "do_cutout": self.cfg.p_diff_aug_cutout,
            "do_translation": self.cfg.p_diff_aug_translation,
            "cutout_ratio": self.cfg.p_diff_aug_cutout_ratio,
            "translation_ratio": self.cfg.p_diff_aug_translation_ratio,
        })
        return dt(rng, x)

    def _paint(self, g_vars, x, m, rng, update_sn=False):
        """Painter forward. With ``update_sn`` the painter's spectral u/v
        power-iteration state advances (reference norms.py:100-112 runs it
        on every train-mode forward); returns (fake, new_state|None)."""
        if update_sn:
            return self.G.apply(
                g_vars, m, x,
                rng=None if self.G.cfg.p_no_z else rng,
                method="paint", train=True, update_sn=True,
                mutable=["batch_stats", "spectral"],
            )
        return self.G.apply(
            g_vars, m, x,
            rng=None if self.G.cfg.p_no_z else rng,
            method="paint",
        ), None

    def _disc_p(self, d_vars, inp, update_sn=False):
        if update_sn:
            return self.D.apply(
                d_vars, inp, method="disc_p", update_sn=True,
                mutable=["spectral"],
            )
        return self.D.apply(d_vars, inp, method="disc_p"), None

    def _p_gan_loss(self, pred, target_is_real, rng, for_discriminator):
        cfg = self.cfg
        if cfg.p_loss == "hinge":
            return L.hinge_loss(pred, target_is_real, for_discriminator)
        return L.gan_loss(
            pred, target_is_real, rng,
            use_lsgan=False, soft_shift=cfg.soft_shift,
            flip_prob=cfg.flip_prob,
        )

    def _pl4m_loss(self, g_vars, d_vars, x, m, rng):
        """Painter loss for the masker; painter weights frozen
        (reference trainer.py:1618-1651)."""
        frozen = dict(g_vars)
        frozen["params"] = dict(g_vars["params"])
        if "painter" in frozen["params"]:
            frozen["params"]["painter"] = jax.lax.stop_gradient(
                frozen["params"]["painter"]
            )
        # no update_sn: the painter is frozen here (its u/v advance in the
        # unfrozen painter path when the p task trains)
        fake, _ = self._paint(frozen, x, m, rng)
        if self.cfg.p_use_local:
            fdg = self.D.apply(d_vars, fake, method="disc_p_global")
            fdl = self.D.apply(d_vars, fake * m, method="disc_p_local")
            return (self._p_gan_loss(fdg, True, rng, False)
                    + self._p_gan_loss(fdl, True, rng, False))
        real_fake = jnp.concatenate(
            [jnp.concatenate([m, x], axis=-1),
             jnp.concatenate([m, fake], axis=-1)], axis=0
        )
        pred, _ = self._disc_p(d_vars, real_fake)
        _, fake_d = divide_pred(pred)
        return self._p_gan_loss(fake_d, True, rng, for_discriminator=False)

    def _painter_losses(self, g_vars, d_vars, batch, rng,
                        mutable: bool = False, d_mutable: bool = False):
        """Painter G losses on the rf domain (reference :1256-1387).

        Returns ``(total, metrics, new_gstate, new_dstate)`` — the painter's
        spectral u/v advance when ``mutable``, the painter D's when
        ``d_mutable`` (None otherwise)."""
        cfg = self.cfg
        cdtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        x = batch["x"].astype(cdtype)
        m = batch["m"].astype(cdtype)
        metrics = {}
        total = 0.0

        gv = dict(g_vars)
        dv = dict(d_vars)

        def dapply(method, inp):
            if d_mutable:
                out, new_state = self.D.apply(
                    dv, inp, method=method, update_sn=True,
                    mutable=["spectral"],
                )
                dv.update(new_state)
                return out
            return self.D.apply(dv, inp, method=method)

        fake, pstate = self._paint(gv, x, m, rng, update_sn=mutable)
        if pstate is not None:
            gv.update(pstate)
        # losses accumulate in f32
        x = x.astype(jnp.float32)
        m = m.astype(jnp.float32)
        fake = fake.astype(jnp.float32)

        if cfg.use_vgg and cfg.lam_p_vgg != 0 and self.vgg_variables is not None:
            vl = L.vgg_loss(
                self.vgg_variables,
                vgg_preprocess(fake * m),
                vgg_preprocess(x * m),
            ) * cfg.lam_p_vgg
            total += vl
            metrics["p_vgg"] = vl
        if cfg.lam_p_tv != 0:
            tl = L.tv_loss(fake * m) * cfg.lam_p_tv
            total += tl
            metrics["p_tv"] = tl
        if cfg.lam_p_context != 0:
            cl = L.context_loss(fake, x, m) * cfg.lam_p_context
            total += cl
            metrics["p_context"] = cl
        if cfg.lam_p_reconstruction != 0:
            rl = L.reconstruction_loss(fake, x, m) * cfg.lam_p_reconstruction
            total += rl
            metrics["p_reconstruction"] = rl

        if self.cfg.p_diff_aug_use:
            k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
            fake = self._diff_aug(k1, fake)
            x = self._diff_aug(k2, x)

        if cfg.p_use_local:
            # global on full images + local on masked regions
            # (reference trainer.py:1324-1356)
            fake_d_g = dapply("disc_p_global", fake)
            fake_d_l = dapply("disc_p_local", fake * m)
            real_d_g = dapply("disc_p_global", x)
            gl = self._p_gan_loss(fake_d_g, True, rng, False)
            gl += self._p_gan_loss(fake_d_l, True, rng, False)
            gl *= cfg.lam_p_gan
            total += gl
            metrics["p_gan"] = gl
            if cfg.lam_p_featmatch != 0:
                fl = L.feat_match_loss(real_d_g, fake_d_g) * cfg.lam_p_featmatch
                total += fl
                metrics["p_featmatch"] = fl
        else:
            real_fake = jnp.concatenate(
                [jnp.concatenate([m, x], axis=-1),
                 jnp.concatenate([m, fake], axis=-1)], axis=0
            )
            pred = dapply("disc_p", real_fake)
            real_d, fake_d = divide_pred(pred)

            gl = self._p_gan_loss(fake_d, True, rng, for_discriminator=False)
            total += gl
            metrics["p_gan"] = gl

            if cfg.lam_p_featmatch != 0:
                fl = L.feat_match_loss(real_d, fake_d) * cfg.lam_p_featmatch
                total += fl
                metrics["p_featmatch"] = fl

        new_gstate = _state_of(gv) if mutable else None
        new_dstate = _state_of(dv) if d_mutable else None
        return total, metrics, new_gstate, new_dstate

    # ------------------------------------------------------------------
    # the two jittable steps
    # ------------------------------------------------------------------
    @staticmethod
    def _split_micro(batch, k: int):
        """{domain: {task: (B,...)}} -> list of k micro-batches."""
        return [
            jax.tree_util.tree_map(
                lambda a: a[i * (a.shape[0] // k):(i + 1) * (a.shape[0] // k)],
                batch,
            )
            for i in range(k)
        ]

    def _accumulate(self, grad_fn, params, batch):
        """Average (loss, metrics, grads) over grad_accumulation
        micro-batches (unrolled; k is small and static). Aux layout:
        (metrics, g_state, d_state); the last micro-batch's states win."""
        k = self.grad_accumulation
        if k <= 1:
            return grad_fn(params, batch)
        micros = self._split_micro(batch, k)
        total_out = None
        for mb in micros:
            out = grad_fn(params, mb)
            if total_out is None:
                total_out = out
            else:
                (l0, (m0, _, _)), g0 = total_out
                (l1, (m1, gs1, ds1)), g1 = out
                l = l0 + l1
                m = {kk: m0[kk] + m1[kk] for kk in m0}
                g = jax.tree_util.tree_map(jnp.add, g0, g1)
                total_out = ((l, (m, gs1, ds1)), g)  # keep last micro's state
        (l, (m, gs, ds)), g = total_out
        inv = 1.0 / k
        return ((l * inv, ({kk: v * inv for kk, v in m.items()}, gs, ds)),
                jax.tree_util.tree_map(lambda t: t * inv, g))

    def g_step(self, state: TrainState, batch: Dict[str, Dict[str, Array]],
               lr_scale, pseudo_scale=1.0
               ) -> Tuple[TrainState, Dict[str, Array]]:
        """update_G: masker losses over r/s + painter loss over rf.

        G and D state collections (BatchNorm running stats, SpectralNorm
        u/v) are chained sequentially across the r -> s -> rf forwards and
        persisted, matching the reference where every train-mode forward
        mutates them in place (trainer.py:989-1015)."""
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(g_params, batch):
            total = 0.0
            metrics = {}
            cur_gstate = state.g_state
            cur_dstate = state.d_state
            for domain in ("r", "s"):
                if domain not in batch:
                    continue
                if not any(t in self.cfg.tasks for t in "msd"):
                    continue

                def masker_domain(p, dbatch, gstate, dstate, domain=domain):
                    return self._masker_losses(
                        _merge_vars(p, gstate),
                        _merge_vars(state.d_params, dstate),
                        dbatch, domain, "G", rng,
                        mutable=True, d_mutable=True,
                        pseudo_scale=pseudo_scale,
                    )

                if self.remat:
                    masker_domain = jax.checkpoint(
                        masker_domain, policy=self.remat_policy
                    )
                dl, dm, gs, ds = masker_domain(
                    g_params, batch[domain], cur_gstate, cur_dstate
                )
                total += dl
                metrics.update(dm)
                if gs is not None:
                    cur_gstate = gs
                if ds is not None:
                    cur_dstate = ds
            if "p" in self.cfg.tasks and "rf" in batch:

                def painter_fn(p, dbatch, gstate, dstate):
                    return self._painter_losses(
                        _merge_vars(p, gstate),
                        _merge_vars(state.d_params, dstate),
                        dbatch, rng, mutable=True, d_mutable=True,
                    )

                if self.remat:
                    painter_fn = jax.checkpoint(
                        painter_fn, policy=self.remat_policy
                    )
                pl, pm, gs, ds = painter_fn(
                    g_params, batch["rf"], cur_gstate, cur_dstate
                )
                total += pl
                metrics.update(pm)
                if gs is not None:
                    cur_gstate = gs
                if ds is not None:
                    cur_dstate = ds
            metrics["g_total"] = total
            return total, (metrics, cur_gstate, cur_dstate)

        (loss, (metrics, new_gstate, new_dstate)), grads = self._accumulate(
            jax.value_and_grad(loss_fn, has_aux=True), state.g_params, batch
        )

        if self.g_lr_rules and self._g_lr_scales is None:
            from climategan_tpu.optim import build_lr_scales

            self._g_lr_scales = build_lr_scales(state.g_params,
                                                self.g_lr_rules)
        extrapolate = (state.step % 2) == 0
        new_params, new_opt = self.g_opt_step(
            grads, state.g_opt, state.g_params,
            lr=self.g_lr * lr_scale, extrapolate=extrapolate,
            lr_scales=self._g_lr_scales,
        )
        return state._replace(
            g_params=new_params, g_state=new_gstate, d_state=new_dstate,
            g_opt=new_opt, rng=new_rng,
        ), metrics

    def d_step(self, state: TrainState, batch: Dict[str, Dict[str, Array]],
               lr_scale) -> Tuple[TrainState, Dict[str, Array]]:
        """update_D: painter D on rf + ADVENT m/s D on r/s.

        D's spectral u/v advance through every D forward and persist into
        the returned state; G also runs in train mode here (BN batch stats,
        u/v updates) exactly as the reference, where update_D never switches
        G to eval (trainer.py:1017-1160)."""
        rng, new_rng = jax.random.split(state.rng)

        def painter_d_losses(d_params, dbatch, gstate, dstate):
            d_vars = _merge_vars(d_params, dstate)
            dv = dict(d_vars)

            def dapply(method, inp):
                out, new_state = self.D.apply(
                    dv, inp, method=method, update_sn=True,
                    mutable=["spectral"],
                )
                dv.update(new_state)
                return out

            cdtype = jnp.bfloat16 if self.cfg.bf16 else jnp.float32
            x = dbatch["x"].astype(cdtype)
            m = dbatch["m"].astype(cdtype)
            g_vars = _merge_vars(state.g_params, gstate)
            fake, pstate = self._paint(g_vars, x, m, rng, update_sn=True)
            fake = jax.lax.stop_gradient(fake)
            new_gstate = ({**gstate, **pstate} if pstate is not None
                          else gstate)
            x = x.astype(jnp.float32)
            m = m.astype(jnp.float32)
            fake = fake.astype(jnp.float32)
            if self.cfg.p_diff_aug_use:
                k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
                fake = self._diff_aug(k1, fake)
                x = self._diff_aug(k2, x)
            if self.cfg.p_use_local:
                # reference trainer.py:1088-1107
                fdg = dapply("disc_p_global", fake)
                rdg = dapply("disc_p_global", x)
                fdl = dapply("disc_p_local", fake * m)
                rdl = dapply("disc_p_local", x * m)
                dl = (self._p_gan_loss(fdg, False, rng, True)
                      + self._p_gan_loss(rdg, True, rng, True)
                      + self._p_gan_loss(fdl, False, rng, True)
                      + self._p_gan_loss(rdl, True, rng, True))
            else:
                real_fake = jnp.concatenate(
                    [jnp.concatenate([m, x], axis=-1),
                     jnp.concatenate([m, fake], axis=-1)], axis=0
                )
                pred = dapply("disc_p", real_fake)
                real_d, fake_d = divide_pred(pred)
                dl = self._p_gan_loss(fake_d, False, rng, True)
                dl += self._p_gan_loss(real_d, True, rng, True)
            return dl, new_gstate, _state_of(dv)

        def masker_d_losses(d_params, dbatch, gstate, dstate, domain):
            g_vars = _merge_vars(state.g_params, gstate)
            d_vars = _merge_vars(d_params, dstate)
            return self._masker_losses(
                g_vars, d_vars, dbatch, domain, "D", rng,
                mutable=True, d_mutable=True,
            )

        if self.remat_d:
            painter_d_losses = jax.checkpoint(
                painter_d_losses, policy=self.remat_policy
            )
            masker_d_losses = jax.checkpoint(
                masker_d_losses, static_argnums=(4,),
                policy=self.remat_policy,
            )

        def loss_fn(d_params, batch):
            cur_gstate = state.g_state
            cur_dstate = state.d_state
            total = 0.0
            metrics = {}
            for domain, dbatch in batch.items():
                if domain == "rf" and "p" in self.cfg.tasks:
                    dl, cur_gstate, cur_dstate = painter_d_losses(
                        d_params, dbatch, cur_gstate, cur_dstate
                    )
                    total += dl
                    metrics["D_p_gan"] = dl
                elif domain in ("r", "s"):
                    dl, dm, gs, ds = masker_d_losses(
                        d_params, dbatch, cur_gstate, cur_dstate, domain
                    )
                    if gs is not None:
                        cur_gstate = gs
                    if ds is not None:
                        cur_dstate = ds
                    # reference get_D_loss scales advent step losses again
                    # by adv_main (trainer.py:1127,1155)
                    total += dl * self.cfg.adv_main
                    metrics.update(dm)
            metrics["d_total"] = total
            return total, (metrics, cur_gstate, cur_dstate)

        (loss, (metrics, new_gstate, new_dstate)), grads = self._accumulate(
            jax.value_and_grad(loss_fn, has_aux=True), state.d_params, batch
        )
        if self.d_lr_rules and self._d_lr_scales is None:
            from climategan_tpu.optim import build_lr_scales

            self._d_lr_scales = build_lr_scales(state.d_params,
                                                self.d_lr_rules)
        extrapolate = (state.step % 2) == 0
        new_params, new_opt = self.d_opt_step(
            grads, state.d_opt, state.d_params,
            lr=self.d_lr * lr_scale, extrapolate=extrapolate,
            lr_scales=self._d_lr_scales,
        )
        if self.cfg.m_gan_type == "WGAN" or self.cfg.s_gan_type == "WGAN":
            # WGAN weight clipping on the ADVENT discriminators
            # (reference trainer.py:1489-1494, 1598-1603)
            from climategan_tpu.optim import clamp_params

            lo, hi = self.cfg.wgan_clamp
            new_params = dict(new_params)
            for name in ("m_advent", "s_advent"):
                if name in new_params:
                    new_params[name] = clamp_params(new_params[name], lo, hi)
        return state._replace(
            d_params=new_params, d_state=new_dstate, g_state=new_gstate,
            d_opt=new_opt, rng=new_rng,
            step=state.step + 1,
        ), metrics

    def train_step(self, state, batch, g_lr_scale=1.0, d_lr_scale=1.0,
                   pseudo_scale=1.0):
        """One full step: update_G then update_D (reference run_epoch
        :924-981); jit/shard-ready. ``pseudo_scale`` gates the pseudo-label
        losses (1.0 while epoch < train.pseudo.epochs, then 0.0 — reference
        trainer.py:920-922) as a traced scalar: no recompile at the flip."""
        state, g_metrics = self.g_step(state, batch, g_lr_scale,
                                       pseudo_scale)
        state, d_metrics = self.d_step(state, batch, d_lr_scale)
        return state, {**g_metrics, **d_metrics}

    def eval_losses(self, state: TrainState,
                    batch: Dict[str, Dict[str, Array]],
                    pseudo_scale=1.0) -> Dict[str, Array]:
        """Validation G losses, eval-mode (reference run_evaluation
        :1653-1704 reuses get_G_loss over val loaders). ``pseudo_scale``
        must mirror the train step's: the reference clears
        pseudo_training_tasks for ALL loss computation after
        train.pseudo.epochs (trainer.py:920-922), so val totals gate the
        pseudo-label terms identically."""
        rng = jax.random.PRNGKey(0)  # deterministic eval randomness
        g_vars = _merge_vars(state.g_params, state.g_state)
        d_vars = _merge_vars(state.d_params, state.d_state)
        metrics: Dict[str, Array] = {}
        total = 0.0
        for domain in ("r", "s"):
            if domain in batch and any(t in self.cfg.tasks for t in "msd"):
                dl, dm, _, _ = self._masker_losses(
                    g_vars, d_vars, batch[domain], domain, "G", rng,
                    mutable=False, eval_mode=True,
                    pseudo_scale=pseudo_scale,
                )
                total += dl
                metrics.update({f"val_{k}": v for k, v in dm.items()})
        if "p" in self.cfg.tasks and "rf" in batch:
            pl, pm, _, _ = self._painter_losses(g_vars, d_vars, batch["rf"],
                                                rng)
            total += pl
            metrics.update({f"val_{k}": v for k, v in pm.items()})
        metrics["val_g_total"] = total
        return metrics
