"""Scenario-table tests mirroring the reference's integration harness
(tests/test_trainer.py:205-308): each scenario is an opts-override dict run
through real model construction. On this 1-core host, every scenario gets
a generator build + masker/painter forward; one representative scenario
runs a full G+D train step (the rest of the training path is covered by
test_train_step / test_trainer_integration).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climategan_tpu.models.generator import create_generator
from climategan_tpu.utils.opts import merge, Opts
from climategan_tpu.utils.testing import tiny_opts

# mirror of the reference scenario list (test_trainer.py:205-308), minus
# comet-only variants; tiny sizes for 1-core CPU compile budgets
SCENARIOS = [
    {"__doc": "MSD (default)"},
    {"__doc": "P only", "tasks": ["p"]},
    {"__doc": "M only no DA", "tasks": ["m"],
     "gen": {"m": {"use_advent": False, "use_minent": False},
             "s": {"use_dada": False}}},
    {"__doc": "M advent+minent, no dada", "tasks": ["m", "d"],
     "gen": {"m": {"use_advent": True, "use_minent": True, "use_dada": False},
             "s": {"use_dada": False}}},
    {"__doc": "M dada", "tasks": ["m", "d"],
     "gen": {"m": {"use_dada": True}, "s": {"use_dada": False}}},
    {"__doc": "MSD minent-var", "gen": {"m": {"use_minent_var": True}}},
    {"__doc": "MSD no low-level feats",
     "gen": {"m": {"use_low_level_feats": False}}},
    {"__doc": "SPADE masker cond_nc 15",
     "gen": {"m": {"use_spade": True,
                   "spade": {"cond_nc": 15, "latent_dim": 32}}}},
    {"__doc": "SPADE masker cond_nc 12",
     "gen": {"m": {"use_spade": True, "detach": False,
                   "spade": {"cond_nc": 12, "latent_dim": 32}}}},
    {"__doc": "depth base architecture",
     "gen": {"d": {"architecture": "base"},
             "m": {"use_dada": False}, "s": {"use_dada": False}}},
    {"__doc": "depth DADA + seg DADA",
     "gen": {"s": {"use_dada": True}, "m": {"use_dada": True}}},
    {"__doc": "depth classification",
     "gen": {"d": {"architecture": "base",
                   "classify": {"enable": True,
                                "linspace": {"min": 0.35, "max": 6.95,
                                             "buckets": 32}}},
             "m": {"use_dada": False}, "s": {"use_dada": False}}},
    {"__doc": "mobilenet backbone",
     "gen": {"deeplabv3": {"backbone": "mobilenet"}}},
    {"__doc": "painter hinge loss", "gen": {"p": {"loss": "hinge"}}},
    {"__doc": "painter diff-aug",
     "gen": {"p": {"diff_aug": {"use": True, "do_color_jittering": True,
                                "do_cutout": True, "do_translation": True}}}},
    {"__doc": "pl4m end-to-end", "gen": {"m": {"use_pl4m": True}}},
    {"__doc": "no final shortcut off", "gen": {"p": {"use_final_shortcut": True}}},
]


def _opts_for(scenario):
    opts = tiny_opts(image_size=64)
    overrides = {k: v for k, v in scenario.items() if not k.startswith("__")}
    merge(Opts(overrides), opts)
    return opts


@pytest.mark.parametrize(
    "scenario", SCENARIOS, ids=[s["__doc"] for s in SCENARIOS]
)
def test_scenario_builds_and_forwards(scenario):
    opts = _opts_for(scenario)
    G = create_generator(opts)
    x = jnp.ones((1, 64, 64, 3))
    variables = G.init(jax.random.PRNGKey(0), x)
    out = G.apply(variables, x)
    tasks = set(opts.tasks)
    if "m" in tasks:
        assert out["m"].shape == (1, 64, 64, 1)
        assert np.isfinite(np.asarray(out["m"])).all()
    if "p" in tasks:
        assert out["p"].shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(out["p"])).all()
    if "d" in tasks:
        assert np.isfinite(np.asarray(out["d"])).all()
    if "s" in tasks:
        assert out["s"].shape[-1] == opts.gen.s.output_dim


def test_deeplabv2_scenario():
    """v2 encoder + v2 seg decoder (reference deeplab_v2/resnetmulti_v2)."""
    opts = tiny_opts(image_size=64)
    opts.gen.encoder.architecture = "deeplabv2"
    opts.gen.s.architecture = "deeplabv2"
    G = create_generator(opts)
    x = jnp.ones((1, 64, 64, 3))
    variables = G.init(jax.random.PRNGKey(0), x)
    out = G.apply(variables, x)
    assert out["m"].shape == (1, 64, 64, 1)
    assert out["s"].shape[-1] == 11
    assert np.isfinite(np.asarray(out["p"])).all()


def test_painter_with_sampled_z():
    """no_z=False: painter consumes a sampled latent
    (reference generator.py:179-194)."""
    opts = tiny_opts(image_size=64)
    opts.gen.p.no_z = False
    G = create_generator(opts)
    x = jnp.ones((1, 64, 64, 3))
    m = jnp.zeros((1, 64, 64, 1))
    rng = jax.random.PRNGKey(0)
    variables = G.init(rng, x)
    z = G.apply(variables, rng, 1, 64, 64, method="sample_painter_z")
    assert z is not None and z.shape == (1, 2, 2, 32)
    painted = G.apply(variables, m, x, rng=rng, method="paint")
    assert painted.shape == (1, 64, 64, 3)
