"""MPT backbone: ALiBi parity vs reference + full-model parity when loadable."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_package_module
from vitron_tpu.models.llm import mpt

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_attention():
    return load_reference_package_module(
        "vitron.model.language_model.mpt.attention")


def test_alibi_slopes_parity(ref_attention):
    for n_heads in (4, 6, 8, 16):
        want = ref_attention.gen_slopes(n_heads, 8).view(-1).numpy()
        got = mpt.gen_alibi_slopes(n_heads, 8)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_alibi_bias_parity(ref_attention):
    n_heads, s = 4, 10
    want = ref_attention.build_alibi_bias(n_heads, s, full=False,
                                          alibi_bias_max=8).numpy()[0]  # [H,1,S]
    got = np.asarray(mpt.alibi_bias(n_heads, jnp.asarray([s - 1]), jnp.arange(s)))
    # reference builds bias for the LAST query row: -(s-1..0)*slope
    np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=1e-5, atol=1e-6)


def test_mpt_full_parity(ref_attention):
    """Full tiny MPT forward vs the vendored torch model (with the removed
    transformers bloom helpers patched back in)."""
    import transformers.models.bloom.modeling_bloom as bloom
    import transformers.models.opt.modeling_opt as opt_mod

    def _expand_mask(mask, dtype=None, tgt_length=None):
        b, src = mask.shape
        tgt = tgt_length or src
        e = mask[:, None, None, :].expand(b, 1, tgt, src).to(torch.bool)
        return ~e

    def _make_causal_mask(input_ids_shape, device=None, past_key_values_length=0):
        b, s = input_ids_shape
        m = torch.triu(torch.ones(s, s + past_key_values_length,
                                  dtype=torch.bool), diagonal=1 + past_key_values_length)
        return m[None, None].expand(b, 1, s, s + past_key_values_length)

    for m in (bloom, opt_mod):
        if not hasattr(m, "_expand_mask"):
            m._expand_mask = _expand_mask
        if not hasattr(m, "_make_causal_mask"):
            m._make_causal_mask = _make_causal_mask

    try:
        mod = load_reference_package_module(
            "vitron.model.language_model.mpt.modeling_mpt")
        cfg_mod = load_reference_package_module(
            "vitron.model.language_model.mpt.configuration_mpt")
    except BaseException as e:  # pytest.skip raises BaseException
        pytest.skip(f"reference MPT unloadable: {e}")

    attn_cfg = dict(cfg_mod.attn_config_defaults)
    attn_cfg.update(attn_impl="torch", alibi=True)
    hf_cfg = cfg_mod.MPTConfig(
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=4, max_seq_len=64,
        vocab_size=256, no_bias=True, learned_pos_emb=False,
        norm_type="layernorm", attn_config=attn_cfg)
    torch.manual_seed(0)
    ref = mod.MPTForCausalLM(hf_cfg)
    ref.eval()

    cfg = mpt.MPTConfig.tiny(max_seq_len=64)
    params = jax.tree.map(jnp.asarray, mpt.convert_hf_mpt(ref.state_dict(), cfg))
    ids = np.random.RandomState(0).randint(0, 256, (2, 12))
    with torch.no_grad():
        want = ref(torch.tensor(ids)).logits.numpy()
    got = mpt.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_mpt_forward_shapes():
    cfg = mpt.MPTConfig.tiny()
    params = mpt.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(10)[None] % cfg.vocab_size
    logits = mpt.forward(params, cfg, ids)
    assert logits.shape == (1, 10, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_mpt_cache_matches_full():
    """Chunked prefill + decode through the KV cache == uncached forward."""
    from vitron_tpu.models.llm.llama import KVCache

    cfg = mpt.MPTConfig.tiny()
    params = mpt.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    full = mpt.forward(params, cfg, ids)

    # llama.KVCache layout works with head_dim/kv_heads == MPT heads
    import dataclasses as dc

    fake = dc.make_dataclass("C", ["num_layers", "num_kv_heads", "head_dim",
                                   "compute_dtype", "max_seq_len"])(
        cfg.n_layers, cfg.n_heads, cfg.head_dim, cfg.compute_dtype, 32)
    cache = KVCache.create(fake, 2, max_len=32)
    l1, cache = mpt.forward(params, cfg, ids[:, :8], cache=cache)
    outs = [l1]
    for i in range(8, 12):
        li, cache = mpt.forward(params, cfg, ids[:, i:i + 1], cache=cache)
        outs.append(li)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=3e-4, atol=3e-4)


def test_mpt_prefix_lm_parity(ref_attention):
    """Prefix-LM mode vs the vendored torch model with
    attn_config prefix_lm=True (modeling_mpt.py:99-132): prompt positions
    attend bidirectionally, completions stay causal."""
    try:
        mod = load_reference_package_module(
            "vitron.model.language_model.mpt.modeling_mpt")
        cfg_mod = load_reference_package_module(
            "vitron.model.language_model.mpt.configuration_mpt")
    except BaseException as e:
        pytest.skip(f"reference MPT unloadable: {e}")

    attn_cfg = dict(cfg_mod.attn_config_defaults)
    attn_cfg.update(attn_impl="torch", alibi=True, prefix_lm=True)
    hf_cfg = cfg_mod.MPTConfig(
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=4, max_seq_len=64,
        vocab_size=256, no_bias=True, learned_pos_emb=False,
        norm_type="layernorm", attn_config=attn_cfg)
    torch.manual_seed(1)
    ref = mod.MPTForCausalLM(hf_cfg)
    ref.eval()

    cfg = mpt.MPTConfig.tiny(max_seq_len=64)
    params = jax.tree.map(jnp.asarray, mpt.convert_hf_mpt(ref.state_dict(), cfg))
    rs = np.random.RandomState(1)
    ids = rs.randint(0, 256, (2, 12))
    prefix = np.zeros((2, 12), np.int64)
    prefix[0, :5] = 1   # row 0: 5-token bidirectional prompt
    prefix[1, :8] = 1
    with torch.no_grad():
        want = ref(torch.tensor(ids),
                   prefix_mask=torch.tensor(prefix, dtype=torch.uint8)).logits.numpy()
    got = mpt.forward(params, cfg, jnp.asarray(ids),
                      prefix_mask=jnp.asarray(prefix, bool))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)

    # the prefix must actually change early-position logits vs pure causal
    causal = mpt.forward(params, cfg, jnp.asarray(ids))
    assert float(np.abs(np.asarray(causal) - np.asarray(got)).max()) > 1e-4
