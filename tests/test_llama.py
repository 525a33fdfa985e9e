"""Llama decoder: parity vs HF transformers, KV-cache equivalence, sharding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.llm.llama import (
    KVCache,
    LlamaConfig,
    LLAMA_SHARDING_RULES,
    forward,
    forward_tokens,
    init_params,
)


def test_forward_shapes():
    cfg = LlamaConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(10)[None] % cfg.vocab_size
    pos = jnp.arange(10)[None]
    logits, cache = forward_tokens(params, cfg, ids, positions=pos)
    assert logits.shape == (1, 10, cfg.vocab_size)
    assert cache is None


def test_kv_cache_matches_full_prefill():
    """Chunked prefill + decode through the cache == one uncached forward."""
    cfg = LlamaConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    full_logits, _ = forward_tokens(params, cfg, ids, positions=pos)

    cache = KVCache.create(cfg, B, max_len=32)
    # prefill first 8, then decode 4 single tokens
    logits_p, cache = forward_tokens(
        params, cfg, ids[:, :8], positions=pos[:, :8], cache=cache)
    outs = [logits_p]
    for i in range(8, S):
        li, cache = forward_tokens(
            params, cfg, ids[:, i : i + 1], positions=pos[:, i : i + 1], cache=cache)
        outs.append(li)
    cached_logits = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(full_logits, cached_logits, rtol=2e-4, atol=2e-4)
    assert int(cache.index) == S


def test_padding_mask_blocks_pad_keys():
    cfg = LlamaConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 6, 7, 0, 0, 0]])
    pos = jnp.arange(6)[None]
    mask = jnp.array([[True, True, True, False, False, False]])
    logits_a, _ = forward_tokens(params, cfg, ids, positions=pos, attn_mask=mask)
    # changing pad token ids must not change valid-position logits
    ids_b = ids.at[0, 4].set(99)
    logits_b, _ = forward_tokens(params, cfg, ids_b, positions=pos, attn_mask=mask)
    np.testing.assert_allclose(logits_a[:, :3], logits_b[:, :3], rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def hf_tiny():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return model


def test_hf_parity(hf_tiny):
    """fp32 logits parity against HF LlamaForCausalLM on random weights."""
    import torch

    from vitron_tpu.models.llm.loader import convert_hf_llama

    cfg = LlamaConfig.tiny()
    params = convert_hf_llama(hf_tiny.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16))
    with torch.no_grad():
        ref = hf_tiny(torch.tensor(ids)).logits.numpy()
    pos = jnp.broadcast_to(jnp.arange(16), (2, 16))
    got, _ = forward_tokens(params, cfg, jnp.asarray(ids), positions=pos)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_hf_parity_gqa():
    """Grouped-query attention path parity (num_kv_heads < num_heads)."""
    torch = pytest.importorskip("torch")
    import transformers

    from vitron_tpu.models.llm.loader import convert_hf_llama

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.tiny(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_layers=2, num_heads=8, num_kv_heads=2, max_seq_len=64)
    params = jax.tree.map(jnp.asarray, convert_hf_llama(model.state_dict(), cfg))
    ids = np.random.RandomState(1).randint(0, 128, (1, 12))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got, _ = forward_tokens(
        params, cfg, jnp.asarray(ids),
        positions=jnp.arange(12)[None])
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_lora_merge():
    from vitron_tpu.models.llm.loader import merge_lora

    rs = np.random.RandomState(0)
    w = rs.randn(8, 8).astype(np.float32)
    a = rs.randn(2, 8).astype(np.float32)
    b = rs.randn(8, 2).astype(np.float32)
    sd = {"model.layers.0.self_attn.q_proj.weight": w.copy()}
    lora = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
    }
    merged = merge_lora(sd, lora, r=2, alpha=4)
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"], w + (b @ a) * 2.0, rtol=1e-6)


def test_sharded_forward_8dev():
    """Forward under jit with params sharded over the 8-device CPU mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitron_tpu.core.mesh import create_mesh, shard_params

    cfg = LlamaConfig.tiny(num_heads=4, num_kv_heads=4, hidden_size=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    params = shard_params(params, mesh, LLAMA_SHARDING_RULES)
    ids = jnp.zeros((4, 8), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (4, 8))
    data_sharding = NamedSharding(mesh, P("data"))
    ids = jax.device_put(ids, data_sharding)

    @jax.jit
    def step(params, ids, pos):
        logits, _ = forward_tokens(params, cfg, ids, positions=pos)
        return logits

    logits = step(params, ids, pos)
    assert logits.shape == (4, 8, cfg.vocab_size)


def test_remat_forward_and_grad():
    """remat=True (gradient checkpointing, the reference's
    --gradient_checkpointing flag, finetune_lora.sh:42) must not change
    logits and must be differentiable."""
    cfg = LlamaConfig.tiny()
    cfg_r = LlamaConfig.tiny(remat=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(12)[None] % cfg.vocab_size
    pos = jnp.arange(12)[None]
    a, _ = forward_tokens(params, cfg, ids, positions=pos)
    b, _ = forward_tokens(params, cfg_r, ids, positions=pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def loss(p):
        logits, _ = forward_tokens(p, cfg_r, ids, positions=pos)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    assert bool(jnp.isfinite(g["layers"]["wq"]).all())


def test_sharded_quantized_forward_8dev():
    """Quantized trees (int8/int4 dicts) shard under the same substring
    rules: fit_spec replicates the non-dividable dims (the [L, 1, out]
    scales keep only the output-channel axis) and the sharded forward runs
    on an fsdp x tensor mesh."""
    from vitron_tpu.core import mesh as mesh_mod
    from vitron_tpu.kernels.quantization import quantize_llama

    cfg = LlamaConfig.tiny(hidden_size=128, intermediate_size=256,
                           num_heads=8, num_kv_heads=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    m = mesh_mod.create_mesh({"fsdp": 2, "tensor": 4})
    ids = jnp.ones((1, 8), jnp.int32)
    pos = jnp.arange(8)[None]
    for bits in (8, 4):
        q = quantize_llama(params, bits=bits)
        sharded = mesh_mod.shard_params(q, m, LLAMA_SHARDING_RULES)
        s_spec = sharded["layers"]["wq"]["s"].sharding.spec
        assert s_spec == jax.sharding.PartitionSpec(None, None, "tensor"), s_spec
        with m:
            logits, _ = jax.jit(
                lambda p, i: forward_tokens(p, cfg, i, positions=pos)
            )(sharded, ids)
        assert bool(jnp.isfinite(logits).all())
