"""Video diffusion: temporal block parity + tiny pipeline end-to-end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.models.diffusion import video_pipelines, video_unet

torch = pytest.importorskip("torch")


def test_temporal_conv_block_parity():
    """vs a torch replica of TemporalConvBlock_v2 (i2vgen util.py:1347-1392):
    4x (GroupNorm -> SiLU -> (3,1,1) conv) with identity residual."""
    import torch.nn as tnn

    c, b, t, h, w = 32, 1, 4, 5, 6
    torch.manual_seed(0)
    convs = tnn.ModuleList()
    norms = tnn.ModuleList()
    for i in range(4):
        norms.append(tnn.GroupNorm(32, c))
        # keep conv4 NON-zero here: the reference zero-inits it, which would
        # make this parity test vacuous (block == identity)
        convs.append(tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0)))

    x = np.random.RandomState(0).randn(b, c, t, h, w).astype(np.float32)
    with torch.no_grad():
        y = torch.tensor(x)
        iden = y
        for i in range(4):
            y = convs[i](tnn.functional.silu(norms[i](y)))
        want = (iden + y).numpy()

    p = {}
    for i in range(4):
        p[f"norm{i}_s"] = jnp.asarray(norms[i].weight.detach().numpy())
        p[f"norm{i}_b"] = jnp.asarray(norms[i].bias.detach().numpy())
        # torch conv3d [O, I, 3, 1, 1] -> temporal conv1d HWIO [3, 1, I, O]
        w_ = convs[i].weight.detach().numpy()[:, :, :, 0, 0]
        p[f"conv{i}_w"] = jnp.asarray(np.ascontiguousarray(w_.transpose(2, 1, 0))[:, None])
        p[f"conv{i}_b"] = jnp.asarray(convs[i].bias.detach().numpy())

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # [B, T, H, W, C]
    got = video_unet.temporal_conv_block(p, xj)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want, rtol=2e-4, atol=2e-4)


def test_temporal_attention_block_parity():
    """vs a torch replica of TemporalAttentionBlock (util.py:871-990)."""
    c, heads, b, t, h, w = 32, 4, 1, 4, 3, 5
    torch.manual_seed(1)
    import torch.nn as tnn

    norm = tnn.GroupNorm(32, c)
    to_qkv = tnn.Linear(c, 3 * c)
    to_out = tnn.Linear(c, c)
    x = np.random.RandomState(1).randn(b, c, t, h, w).astype(np.float32)

    with torch.no_grad():
        y = torch.tensor(x)
        iden = y
        yn = norm(y)
        yn = yn.permute(0, 3, 4, 2, 1).reshape(b, h * w, t, c)
        qkv = to_qkv(yn).chunk(3, dim=-1)
        d = c // heads
        q = qkv[0].view(b, h * w, t, heads, d).permute(0, 1, 3, 2, 4) * d ** -0.5
        k = qkv[1].view(b, h * w, t, heads, d).permute(0, 1, 3, 2, 4)
        v = qkv[2].view(b, h * w, t, heads, d).permute(0, 1, 3, 2, 4)
        sim = q @ k.transpose(-1, -2)
        sim = sim - sim.amax(dim=-1, keepdim=True)
        att = sim.softmax(dim=-1)
        out = (att @ v).permute(0, 1, 3, 2, 4).reshape(b, h * w, t, c)
        out = to_out(out).reshape(b, h, w, t, c).permute(0, 4, 3, 1, 2)
        want = (iden + out).numpy()

    p = {
        "norm_s": jnp.asarray(norm.weight.detach().numpy()),
        "norm_b": jnp.asarray(norm.bias.detach().numpy()),
        "qkv_w": jnp.asarray(np.ascontiguousarray(to_qkv.weight.detach().numpy().T)),
        "qkv_b": jnp.asarray(to_qkv.bias.detach().numpy()),
        "out_w": jnp.asarray(np.ascontiguousarray(to_out.weight.detach().numpy().T)),
        "out_b": jnp.asarray(to_out.bias.detach().numpy()),
    }
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    got = video_unet.temporal_attention_block(p, xj, heads)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want, rtol=2e-4, atol=2e-4)


class _StubTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        out = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            ids = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][: max_length - 2] + [127]
            out[i, : len(ids)] = ids
        return {"input_ids": out}


@pytest.mark.nightly
def test_video_unet_forward_shapes():
    cfg = video_unet.VideoUNetConfig.tiny()
    params = video_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    out = video_unet.forward(params, cfg, x, jnp.asarray([500]), ctx)
    assert out.shape == (1, 4, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_temporal_attention_nmajor_parity(monkeypatch):
    """VITRON_TATTN=nmajor (pixel-major frame attention with the transpose
    hoisted to the temporal-transformer block boundary) is bit-identical to
    the default frame-major einsum path."""
    from vitron_tpu.models.diffusion import unet_sd_video as m

    cfg = m.UNetSDVideoConfig.tiny("t2v")
    p = m.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 8, 8, 4), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(1, 3, 1024) * 0.02,
                    jnp.float32)
    monkeypatch.delenv("VITRON_TATTN", raising=False)
    a = m.forward(p, cfg, x, jnp.asarray([7.0]), y=y)
    monkeypatch.setenv("VITRON_TATTN", "nmajor")
    b = m.forward(p, cfg, x, jnp.asarray([7.0]), y=y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_text2video_tiny():
    from vitron_tpu.models.diffusion import clip_text, unet_sd_video, vae

    cfg = video_pipelines.Text2VideoConfig.tiny()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pipe = video_pipelines.Text2VideoPipeline(
        cfg,
        unet_sd_video.init_params(ks[0], cfg.unet),
        vae.init_params(ks[1], cfg.vae),
        clip_text.init_params(ks[2], cfg.text),
        tokenizer=_StubTokenizer())
    frames = pipe.generate("a rocket launch", rng=jax.random.PRNGKey(1), steps=4)
    assert frames.shape == (4, 16, 16, 3)
    assert frames.dtype == jnp.uint8


def test_image2video_tiny():
    from vitron_tpu.models.diffusion import clip_text, unet_sd_video, vae

    cfg = video_pipelines.Image2VideoConfig.tiny()
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    pipe = video_pipelines.Image2VideoPipeline(
        cfg,
        unet_sd_video.init_params(ks[0], cfg.unet),
        vae.init_params(ks[1], cfg.vae),
        clip_text.init_params(ks[2], cfg.text),
        tokenizer=_StubTokenizer(),
        image_embedder=lambda img: np.ones((1, cfg.unet.y_dim), np.float32))
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    frames = pipe.generate(jnp.asarray(img), "make it move",
                           rng=jax.random.PRNGKey(1), steps=5)
    assert frames.shape == (4, 16, 16, 3)


def test_ddim_v_loop_matches_reference():
    """ddim_sample_v (cosine + zero-terminal-SNR) vs the vendored
    DiffusionDDIM.ddim_sample_loop with mean_type='v' on a closed-form
    denoiser (diffusion_ddim.py:206-253)."""
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    from tests import torch_shims
    from tests.conftest import load_reference_package_module
    from vitron_tpu.models.diffusion import samplers

    torch_shims.install()
    torch_shims.install_i2vgen()
    ref = load_reference_package_module(
        "modules.i2vgen-xl.tools.modules.diffusions.diffusion_ddim")

    diff = ref.DiffusionDDIM(
        schedule="cosine",
        schedule_param={"num_timesteps": 1000, "cosine_s": 0.008,
                        "zero_terminal_snr": True},
        mean_type="v", var_type="fixed_small", loss_type="mse",
        rescale_timesteps=False)

    class Toy(torch.nn.Module):
        def forward(self, x, t, **kw):
            return 0.3 * x + 0.05 * torch.sin(0.01 * t.float()).view(-1, 1, 1, 1)

    x0 = torch.tensor(np.random.RandomState(0).randn(1, 2, 8, 8).astype(np.float32))
    with torch.no_grad():
        want = diff.ddim_sample_loop(x0.clone(), Toy(), ddim_timesteps=10).numpy()

    sched = samplers.DiffusionSchedule.create("cosine", 1000,
                                              zero_terminal_snr=True)

    def v_fn(x, t):
        return 0.3 * x + 0.05 * jnp.sin(0.01 * jnp.asarray(t, jnp.float32))

    got = samplers.ddim_sample_v(v_fn, jnp.asarray(x0.numpy()), sched, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
