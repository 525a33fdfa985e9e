"""GLIGEN grounded fine-tuning: the reference trains ONLY the gated
self-attention fusers + PositionNet (+ downsamplers) with everything else
frozen (modules/GLIGEN/trainer.py:218-245, run_one_step :353-372)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.diffusion import unet2d
from vitron_tpu.models.diffusion.samplers import DiffusionSchedule
from vitron_tpu.train import gligen as gt


@pytest.fixture(scope="module")
def tiny():
    cfg = unet2d.UNetConfig.tiny()
    params = unet2d.init_params(jax.random.PRNGKey(0), cfg, grounding=True)

    # GLIGEN training starts FROM the SD checkpoint (read_official_ckpt,
    # trainer.py:199-214), where the ldm zero-init convs (the final out
    # conv, spatial proj_out, res conv2) are trained nonzero and the fuser
    # gates are mid-anneal. A fresh random init keeps out_w == 0, which
    # makes the UNet output identically zero and ALL grads vanish — so
    # emulate checkpoint-start: perturb the zero convs, open the gates.
    r = np.random.RandomState(7)

    def fix(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        last = keys[-1] if keys else ""
        if last in ("alpha_attn", "alpha_dense"):
            return leaf + 0.7
        if last in ("out_w", "proj_out_w", "conv2_w") and \
                float(jnp.max(jnp.abs(leaf))) == 0.0:
            return jnp.asarray(0.05 * r.randn(*leaf.shape), leaf.dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(fix, params)
    return cfg, params


def _batch(cfg, b=2, hw=16, max_box=4, seed=0):
    r = np.random.RandomState(seed)
    return {
        "x0": jnp.asarray(r.randn(b, hw, hw, 4), jnp.float32),
        "context": jnp.asarray(r.randn(b, 8, cfg.context_dim), jnp.float32),
        "boxes": jnp.asarray(r.rand(b, max_box, 4), jnp.float32),
        "masks": jnp.ones((b, max_box), jnp.float32),
        "phrase_emb": jnp.asarray(r.randn(b, max_box, cfg.context_dim),
                                  jnp.float32),
    }


def test_trainable_selection(tiny):
    """Exactly the fuser/position_net subtrees train (trainer.py:218-241)."""
    cfg, params = tiny
    tcfg = gt.GligenTrainConfig()
    n_train, n_frozen = gt.partition_params(params, tcfg)
    assert n_train > 0 and n_frozen > 0
    mask = gt.trainable_mask(params, tcfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, m in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        expect = "fuser" in keys or "position_net" in keys
        assert m == expect, (keys, m)


@pytest.mark.nightly
def test_loss_descends_and_freeze_respected(tiny):
    cfg, params = tiny
    tcfg = gt.GligenTrainConfig(lr=1e-3)
    sched = DiffusionSchedule.create(timesteps=50)
    step, init_state = gt.make_gligen_train_step(cfg, sched, tcfg)
    state = init_state(params)
    batch = _batch(cfg)
    jstep = jax.jit(step)
    losses = []
    for i in range(12):
        state, loss = jstep(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    # frozen leaves identical; at least one trainable leaf moved
    mask = gt.trainable_mask(params, tcfg)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          params, state["params"])
    flat_mask = jax.tree.leaves(mask)
    flat_delta = jax.tree.leaves(deltas)
    train_deltas = [d for m, d in zip(flat_mask, flat_delta) if m]
    frozen_deltas = [d for m, d in zip(flat_mask, flat_delta) if not m]
    assert max(frozen_deltas) == 0.0
    assert max(train_deltas) > 0.0


@pytest.mark.nightly
def test_grounding_drop_is_whole_null(tiny):
    """p_drop_grounding=1: the grounding input must equal get_null_input's
    all-zeros (text_grounding_tokinzer_input.py:29-44) — loss finite."""
    cfg, params = tiny
    tcfg = gt.GligenTrainConfig(p_drop_grounding=1.0)
    sched = DiffusionSchedule.create(timesteps=50)
    step, init_state = gt.make_gligen_train_step(cfg, sched, tcfg)
    state = init_state(params)
    state, loss = jax.jit(step)(state, _batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_input_conv_train_marks_widened_first_conv():
    """The inpainting variant additionally trains the widened 9-channel
    first conv, params["input_blocks"][0][0] (trainer.py:232-236)."""
    cfg = unet2d.UNetConfig.tiny(in_channels=9)
    params = unet2d.init_params(jax.random.PRNGKey(0), cfg, grounding=True)
    on = gt.trainable_mask(params, gt.GligenTrainConfig(input_conv_train=True))
    off = gt.trainable_mask(params, gt.GligenTrainConfig())
    assert all(on["input_blocks"][0][0].values())
    assert not any(off["input_blocks"][0][0].values())
