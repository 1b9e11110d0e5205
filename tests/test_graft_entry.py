"""The driver gates (__graft_entry__) must keep building.

The driver exercises ``entry()`` (single-chip compile check) and
``dryrun_multichip(n)`` (multi-device train/eval/detection/spatial step
execution) out-of-band; these smoke tests keep the configs they build from
rotting inside the suite, where a breakage is visible immediately instead
of at round end. The full dryrun is NOT run here (it compiles four train
step families — that is the driver's job); we only build the gate models
and shape-check their forwards.
"""

import jax
import jax.numpy as jnp

import __graft_entry__ as gate
from efficient_slowfast_tpu.models import build_model


def _shape_check(cfg):
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, s = 2, cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    inputs = [
        jnp.zeros((b, t // cfg.SLOWFAST.ALPHA, s, s, 3), jnp.float32),
        jnp.zeros((b, t, s, s, 3), jnp.float32),
    ]
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        {"params": rng, "dropout": rng}, inputs)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, inputs)
    return out


def test_flagship_cfg_builds():
    out = _shape_check(gate._flagship_cfg(tiny=True))
    assert out.shape == (2, 400)


def test_gate_cfg_builds():
    cfg = gate._gate_cfg()
    assert cfg.RESNET.DEPTH == 18
    out = _shape_check(cfg)
    assert out.shape == (2, 400)


def test_entry_returns_jittable_forward():
    # entry() builds the full R50 flagship via eval_shape + zeros — cheap
    # enough for the suite; we only trace it (no compile/execute).
    fn, (variables, inputs) = gate.entry()
    out = jax.eval_shape(fn, variables, inputs)
    assert out.shape == (1, 400)
