"""Ring attention over an 8-device CPU context axis vs full attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.core.mesh import create_mesh
from vitron_tpu.distributed.ring_attention import ring_attention
from vitron_tpu.kernels.flash_attention import reference_attention


@pytest.fixture(scope="module")
def ctx_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return create_mesh({"context": 8})


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(ctx_mesh, causal):
    b, s, n, d = 2, 64, 4, 16
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))
    got = ring_attention(q, k, v, ctx_mesh, causal=causal)
    if causal:
        want = reference_attention(q, k, v, q_offset=0)
    else:
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / np.sqrt(d)
        probs = jax.nn.softmax(logits, axis=-1)
        want = jnp.einsum("bnqk,bknd->bqnd", probs, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ring_under_jit(ctx_mesh):
    b, s, n, d = 1, 32, 2, 8
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(b, s, n, d).astype(np.float32))

    @jax.jit
    def f(q):
        return ring_attention(q, q, q, ctx_mesh, causal=True)

    out = f(q)
    want = reference_attention(q, q, q, q_offset=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------- model-level

def test_llama_ring_forward_matches_dense(ctx_mesh):
    """cfg.attn_impl='ring' through llama.forward (not just the kernel):
    sequence-parallel prefill over the context axis == dense logits."""
    from vitron_tpu.models.llm import llama

    cfg = llama.LlamaConfig.tiny(max_seq_len=128)
    cfg_ring = llama.LlamaConfig.tiny(max_seq_len=128, attn_impl="ring")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    s = 64
    ids = jnp.asarray(np.random.RandomState(0).randint(1, cfg.vocab_size, (2, s)))
    pos = jnp.broadcast_to(jnp.arange(s), (2, s))
    dense, _ = llama.forward_tokens(params, cfg, ids, positions=pos)
    ring, _ = llama.forward_tokens(params, cfg_ring, ids, positions=pos,
                                   mesh=ctx_mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_long_video_qa_ring_matches_dense(ctx_mesh):
    """64-frame video QA through the full multimodal forward with the
    context-sharded LLM — the reference caps videos at 8 frames
    (processing_video.py:93); ring attention removes the cap."""
    import dataclasses as dc

    from vitron_tpu.constants import IMAGE_TOKEN_INDEX
    from vitron_tpu.models import vitron_model
    from vitron_tpu.models.llm.llama import LlamaConfig
    from vitron_tpu.models.vision.vit import ViTConfig
    from vitron_tpu.runtime.engine import MediaItem, prepare_batch

    tower = ViTConfig.tiny(image_size=14, patch_size=7, hidden_size=32,
                           num_heads=4, num_layers=2)
    cfg = vitron_model.VitronConfig(
        llm=LlamaConfig.tiny(hidden_size=64, num_heads=4, num_kv_heads=4,
                             max_seq_len=512),
        image_tower=tower,
        video_tower=dc.replace(tower, add_time_attn=True, num_frames=64),
    )
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)

    rows = [[1, 5, IMAGE_TOKEN_INDEX, 6, 7]]
    video = MediaItem("video", np.random.RandomState(0)
                      .rand(64, 14, 14, 3).astype(np.float32))
    # 64 frames x 4 patches = 256 media tokens + 4 text -> pad to 320 (div 8)
    plan, images, videos, perm = prepare_batch(
        rows, [video], pad_to=320, image_len=tower.num_patches)

    def run(llm_cfg, mesh=None):
        logits, _ = vitron_model.forward(
            params, dc.replace(cfg, llm=llm_cfg),
            jnp.asarray(plan.token_ids), jnp.asarray(plan.media_idx),
            jnp.asarray(plan.use_media), jnp.asarray(plan.position_ids),
            jnp.asarray(plan.attention_mask),
            videos=jnp.asarray(videos),
            block_perm=jnp.asarray(perm) if perm is not None else None,
            mesh=mesh)
        return logits

    dense = run(cfg.llm)
    ring = run(dc.replace(cfg.llm, attn_impl="ring"), mesh=ctx_mesh)
    # padded queries attend ring-wide (no padding mask on the ring path) but
    # real positions are causal-safe with right padding: compare those only
    valid = np.asarray(plan.attention_mask[0])
    np.testing.assert_allclose(np.asarray(ring)[0, valid],
                               np.asarray(dense)[0, valid],
                               rtol=5e-4, atol=5e-4)
