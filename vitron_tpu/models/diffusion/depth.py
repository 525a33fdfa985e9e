"""MiDaS/DPT monocular depth estimation (StableVideo's depth annotator).

JAX re-implementation of the vendored MiDaS DPT models (reference:
modules/StableVideo/annotator/midas/midas/dpt_depth.py:26-110, vit.py
forward_flex/reassemble, blocks.py fusion heads, annotator/midas/
__init__.py:9-40 MidasDetector). Two variants, matching api.py:77-104:

- **dpt_hybrid** (the reference default, __init__.py:11): timm
  `vit_base_resnet50_384` — a ResNetV2-50 stem (weight-standardized convs
  + GroupNorm(32), stages (3, 4, 9), SAME padding) feeding a ViT-B/1 on
  the 1/16 feature map. Reassemble hooks: ResNet stage-0 (1/4, 256ch),
  stage-1 (1/8, 512ch), transformer blocks 8 and 11 through 'project'
  readout + 1x1 conv (vit.py:343-460).
- **dpt_large**: plain ViT-L/16, hooks (5, 11, 17, 23), learned
  ConvTranspose upsampling in the reassemble (vit.py:194-341).

Both share the scratch head: per-scale 3x3 convs -> residual fusion
refinenets (ResidualConvUnit_custom: relu-conv-relu-conv + input;
FeatureFusionBlock_custom: sum, RCU, x2 bilinear align_corners=True,
1x1 out conv) -> output conv stack (blocks.py:104-364).

All matmuls/convs run on the MXU; the whole forward is one jittable
function of static shape, fully convolutional (pos embeddings are
resized on the fly like forward_flex does).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    variant: str = "dpt_hybrid"          # "dpt_hybrid" | "dpt_large"
    image_size: int = 384                # native checkpoint resolution
    patch_size: int = 16                 # effective stride of the token grid
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    hooks: Tuple[int, ...] = (8, 11)     # transformer hooks (last 2 for hybrid)
    features: int = 256
    # per-scale reassemble channels (hybrid: rn50 stage dims + vit dims)
    reassemble_dims: Tuple[int, ...] = (256, 512, 768, 768)
    # ResNetV2 stem (hybrid only)
    resnet_layers: Tuple[int, ...] = (3, 4, 9)
    resnet_channels: Tuple[int, ...] = (256, 512, 1024)
    stem_width: int = 64
    gn_groups: int = 32

    @staticmethod
    def dpt_hybrid(**kw) -> "DPTConfig":
        return DPTConfig(**kw)

    @staticmethod
    def dpt_large(**kw) -> "DPTConfig":
        base = dict(variant="dpt_large", hidden_size=1024, num_layers=24,
                    num_heads=16, mlp_dim=4096, hooks=(5, 11, 17, 23),
                    reassemble_dims=(256, 512, 1024, 1024))
        base.update(kw)
        return DPTConfig(**base)

    @staticmethod
    def tiny(**kw) -> "DPTConfig":
        base = dict(variant="dpt_hybrid", image_size=64, hidden_size=32,
                    num_layers=2, num_heads=4, mlp_dim=64, hooks=(0, 1),
                    features=16, reassemble_dims=(8, 16, 32, 32),
                    resnet_layers=(1, 1, 1), resnet_channels=(8, 16, 32),
                    stem_width=8, gn_groups=2)
        base.update(kw)
        return DPTConfig(**base)


# ---------------------------------------------------------------------------
# primitives

def _conv(x, w, b=None, stride=1, padding="SAME"):
    # 1x1 convs as matmuls (see kernels/conv2d.py)
    if w.shape[0] == w.shape[1] == 1 and stride == 1:
        y = x @ w[0, 0].astype(x.dtype)
        return y if b is None else y + b
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def _std_weight(w, eps=1e-8):
    """Weight standardization (timm StdConv2dSame, eps=1e-8 in the hybrid):
    per-output-channel zero mean / unit (biased) variance over (kh,kw,cin)."""
    w32 = w.astype(jnp.float32)
    mu = w32.mean(axis=(0, 1, 2), keepdims=True)
    var = w32.var(axis=(0, 1, 2), keepdims=True)
    return ((w32 - mu) * jax.lax.rsqrt(var + eps)).astype(w.dtype)


def _group_norm(x, p, groups, eps=1e-5, act=True):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups).astype(jnp.float32)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(b, h, w, c) * p["scale"] + p["bias"]
    if act:
        y = jax.nn.relu(y)
    return y.astype(x.dtype)


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def resize_align_corners(x: jax.Array, oh: int, ow: int) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics (the fusion
    blocks and head use F.interpolate(..., align_corners=True), which
    jax.image.resize cannot express). Separable gather-interp; x is NHWC."""
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        if n_in == 1 or n_out == 1:
            return jnp.zeros(n_out, jnp.int32), jnp.zeros(n_out, jnp.int32), jnp.zeros(n_out)
        f = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        i0 = jnp.floor(f).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        return i0, i1, (f - i0).astype(jnp.float32)

    y0, y1, wy = axis_weights(h, oh)
    x32 = x.astype(jnp.float32)
    rows = x32[:, y0] * (1.0 - wy)[None, :, None, None] + x32[:, y1] * wy[None, :, None, None]
    x0, x1, wx = axis_weights(w, ow)
    out = rows[:, :, x0] * (1.0 - wx)[None, None, :, None] + rows[:, :, x1] * wx[None, None, :, None]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# ResNetV2 hybrid stem (timm resnetv2: StdConv + GroupNormAct, non-preact
# bottlenecks; stride on the 3x3 conv; downsample = 1x1 conv + GN)

def _bottleneck(x, p, groups, stride):
    if "down_w" in p:
        sc = _conv(x, _std_weight(p["down_w"]), stride=stride)
        sc = _group_norm(sc, p["down_norm"], groups, act=False)
    else:
        sc = x
    y = _group_norm(_conv(x, _std_weight(p["w1"])), p["n1"], groups)
    y = _group_norm(_conv(y, _std_weight(p["w2"]), stride=stride), p["n2"], groups)
    y = _group_norm(_conv(y, _std_weight(p["w3"])), p["n3"], groups, act=False)
    return jax.nn.relu(y + sc)


def _resnet_stem(params, cfg: DPTConfig, x):
    """Returns (stage0_out [1/4], stage1_out [1/8], stage2_out [1/16])."""
    g = cfg.gn_groups
    x = _conv(x, _std_weight(params["stem_w"]), stride=2)
    x = _group_norm(x, params["stem_norm"], g)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    outs = []
    for si, blocks in enumerate(params["stages"]):
        for bi, bp in enumerate(blocks):
            x = _bottleneck(x, bp, g, stride=2 if (si > 0 and bi == 0) else 1)
        outs.append(x)
    return outs


# ---------------------------------------------------------------------------
# ViT trunk

def _vit_block(x, p, heads):
    b, n, c = x.shape
    d = c // heads
    xn = _ln(x, p["ln1"])
    qkv = xn @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, d)
    k = k.reshape(b, n, heads, d)
    v = v.reshape(b, n, heads, d)
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
    a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, c)
    x = x + att @ p["proj_w"] + p["proj_b"]
    xn = _ln(x, p["ln2"])
    h = jax.nn.gelu(xn @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + h @ p["fc2_w"] + p["fc2_b"]


def _resize_pos_embed(pos, gh, gw):
    """vit.py:100-115 _resize_pos_embed: cls kept, grid bilinearly resized
    (align_corners=False, matching F.interpolate defaults)."""
    tok, grid = pos[:1], pos[1:]
    gs = int(round(np.sqrt(grid.shape[0])))
    if (gs, gs) == (gh, gw):
        return pos
    grid = grid.reshape(gs, gs, -1)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]), "linear")
    return jnp.concatenate([tok, grid.reshape(gh * gw, -1)], axis=0)


def _vit_trunk(params, cfg: DPTConfig, tokens, gh, gw):
    """tokens: [B, gh*gw, C] patch embeddings. Returns hooked block outputs."""
    b = tokens.shape[0]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + _resize_pos_embed(params["pos_emb"], gh, gw)
    hooked: List[jax.Array] = []
    for i, blk in enumerate(params["blocks"]):
        x = _vit_block(x, blk, cfg.num_heads)
        if i in cfg.hooks:
            hooked.append(x)
    return hooked


def _readout_project(tokens_with_cls, p):
    """'project' readout (vit.py ProjectReadout): concat cls onto every
    patch token, Linear(2C->C) + GELU."""
    cls, tokens = tokens_with_cls[:, :1], tokens_with_cls[:, 1:]
    b, n, c = tokens.shape
    cat = jnp.concatenate([tokens, jnp.broadcast_to(cls, (b, n, c))], axis=-1)
    return jax.nn.gelu(cat @ p["w"] + p["b"], approximate=False)


def _deconv_block(x, w, b, s):
    """torch ConvTranspose2d with kernel_size == stride == s (non-overlapping
    scatter): pure einsum + reshape, exact and MXU-friendly. w: [cin, cout, s, s]."""
    bb, h, ww, c = x.shape
    y = jnp.einsum("bhwc,cdij->bhiwjd", x, w)
    return y.reshape(bb, h * s, ww * s, -1) + b


# ---------------------------------------------------------------------------
# full model

def forward(params: Dict[str, Any], cfg: DPTConfig, image: jax.Array) -> jax.Array:
    """image: [B, H, W, 3] normalized (MidasDetector scale: x/127.5 - 1)
    -> relative inverse depth [B, H, W]. Mirrors DPT.forward
    (dpt_depth.py:66-85) + DPTDepthModel head (:94-110)."""
    b, H, W, _ = image.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size

    if cfg.variant == "dpt_hybrid":
        s0, s1, s2 = _resnet_stem(params["resnet"], cfg, image)
        tokens = s2.reshape(b, gh * gw, s2.shape[-1]) @ params["patch_w"] + params["patch_b"]
        h3, h4 = _vit_trunk(params, cfg, tokens, gh, gw)
        l3 = _readout_project(h3, params["readout"][0]).reshape(b, gh, gw, -1)
        l4 = _readout_project(h4, params["readout"][1]).reshape(b, gh, gw, -1)
        feats = [
            s0,                                                   # 1/4, identity
            s1,                                                   # 1/8, identity
            _conv(l3, params["post3"]["w"], params["post3"]["b"]),
            _conv(_conv(l4, params["post4"]["w"], params["post4"]["b"]),
                  params["post4"]["w2"], params["post4"]["b2"], stride=2,
                  padding=[(1, 1), (1, 1)]),                      # 1/32
        ]
    elif cfg.variant == "dpt_large":
        p = cfg.patch_size
        x = image.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        tokens = x.reshape(b, gh * gw, p * p * 3) @ params["patch_w"] + params["patch_b"]
        hooked = _vit_trunk(params, cfg, tokens, gh, gw)
        grids = [
            _conv(_readout_project(h, params["readout"][i]).reshape(b, gh, gw, -1),
                  params[f"post{i + 1}"]["w"], params[f"post{i + 1}"]["b"])
            for i, h in enumerate(hooked)]
        feats = [
            _deconv_block(grids[0], params["post1"]["up_w"], params["post1"]["up_b"], 4),
            _deconv_block(grids[1], params["post2"]["up_w"], params["post2"]["up_b"], 2),
            grids[2],
            _conv(grids[3], params["post4"]["w2"], params["post4"]["b2"],
                  stride=2, padding=[(1, 1), (1, 1)]),
        ]
    else:
        raise ValueError(cfg.variant)

    # scratch 3x3 projections to `features` (blocks.py _make_scratch, bias=False)
    rn = [_conv(f, params["scratch"][i]["w"], padding=[(1, 1), (1, 1)])
          for i, f in enumerate(feats)]

    def rcu(y, u):
        """ResidualConvUnit_custom (blocks.py:280-330): relu-conv-relu-conv
        plus the unit input."""
        h = jax.nn.relu(y)
        h = _conv(h, u["w1"], u["b1"], padding=[(1, 1), (1, 1)])
        h = jax.nn.relu(h)
        return _conv(h, u["w2"], u["b2"], padding=[(1, 1), (1, 1)]) + y

    def fusion(i, x_up, skip):
        """FeatureFusionBlock_custom (blocks.py:333-364): add RCU1(skip),
        RCU2, x2 bilinear align_corners=True, 1x1 out conv."""
        fp = params["fusion"][i]
        if skip is not None:
            x_up = x_up + rcu(skip, fp["res1"])
        x_up = rcu(x_up, fp["res2"])
        bb, hh, ww, _ = x_up.shape
        x_up = resize_align_corners(x_up, hh * 2, ww * 2)
        return _conv(x_up, fp["out_w"], fp["out_b"])

    path = fusion(3, rn[3], None)
    path = fusion(2, path, rn[2])
    path = fusion(1, path, rn[1])
    path = fusion(0, path, rn[0])
    # head (dpt_depth.py:94-103): conv3x3 -> x2 up (align_corners) -> conv3x3
    # -> relu -> conv1x1 -> relu
    hd = params["head"]
    y = _conv(path, hd["w1"], hd["b1"], padding=[(1, 1), (1, 1)])
    bb, hh, ww, _ = y.shape
    y = resize_align_corners(y, hh * 2, ww * 2)
    y = jax.nn.relu(_conv(y, hd["w2"], hd["b2"], padding=[(1, 1), (1, 1)]))
    y = jax.nn.relu(_conv(y, hd["w3"], hd["b3"]))
    return y[..., 0]


def depth_hint(params, cfg: DPTConfig, image_uint8: np.ndarray,
               run_size: Optional[int] = None) -> np.ndarray:
    """MidasDetector-style hint (annotator/midas/__init__.py:13-27): scale
    pixels to [-1, 1], run DPT (at native resolution like the reference, or
    at `run_size`), min-max normalize to [0, 1]; returned 3-channel at the
    input resolution."""
    h, w = image_uint8.shape[:2]
    x = jnp.asarray(image_uint8, jnp.float32) / 127.5 - 1.0
    if run_size is None:
        # reference runs at input resolution (multiple-of-64 by resize_image);
        # round down to the model's full stride (2x patch: the 1/32 pyramid
        # level must stay >= 1px) here instead of asserting
        stride = 2 * cfg.patch_size
        rh = max(stride, h - h % stride)
        rw = max(stride, w - w % stride)
    else:
        rh = rw = run_size
    if (rh, rw) != (h, w):
        x = jax.image.resize(x, (rh, rw, 3), "linear")
    d = forward(params, cfg, x[None])[0]
    d = d - d.min()
    d = d / jnp.maximum(d.max(), 1e-6)
    if (rh, rw) != (h, w):
        d = jax.image.resize(d, (h, w), "linear")
    return np.asarray(jnp.stack([d] * 3, axis=-1), np.float32)


# ---------------------------------------------------------------------------
# init / convert

def init_params(rng: jax.Array, cfg: DPTConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 4096))
    c = cfg.hidden_size
    f = cfg.features

    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout)) / np.sqrt(cin)

    def conv(kh, kw, cin, cout):
        return jax.random.normal(next(ki), (kh, kw, cin, cout)) / np.sqrt(kh * kw * cin)

    def gn(ch):
        return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}

    def ln():
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    params: Dict[str, Any] = {
        "cls": jax.random.normal(next(ki), (1, 1, c)) * 0.02,
        "pos_emb": jax.random.normal(next(ki), (n_tok, c)) * 0.02,
        "blocks": [
            {"ln1": ln(), "ln2": ln(),
             "qkv_w": dense(c, 3 * c), "qkv_b": jnp.zeros((3 * c,)),
             "proj_w": dense(c, c), "proj_b": jnp.zeros((c,)),
             "fc1_w": dense(c, cfg.mlp_dim), "fc1_b": jnp.zeros((cfg.mlp_dim,)),
             "fc2_w": dense(cfg.mlp_dim, c), "fc2_b": jnp.zeros((c,))}
            for _ in range(cfg.num_layers)],
        "scratch": [
            {"w": conv(3, 3, cfg.reassemble_dims[i], f)} for i in range(4)],
        "fusion": [
            {"res1": {"w1": conv(3, 3, f, f), "b1": jnp.zeros((f,)),
                      "w2": conv(3, 3, f, f), "b2": jnp.zeros((f,))},
             "res2": {"w1": conv(3, 3, f, f), "b1": jnp.zeros((f,)),
                      "w2": conv(3, 3, f, f), "b2": jnp.zeros((f,))},
             "out_w": conv(1, 1, f, f), "out_b": jnp.zeros((f,))}
            for _ in range(4)],
        "head": {
            "w1": conv(3, 3, f, f // 2), "b1": jnp.zeros((f // 2,)),
            "w2": conv(3, 3, f // 2, 32), "b2": jnp.zeros((32,)),
            "w3": conv(1, 1, 32, 1), "b3": jnp.zeros((1,)),
        },
    }
    d3, d4 = cfg.reassemble_dims[2], cfg.reassemble_dims[3]
    if cfg.variant == "dpt_hybrid":
        sw = cfg.stem_width
        stages = []
        cin = sw
        for si, n_blocks in enumerate(cfg.resnet_layers):
            cout = cfg.resnet_channels[si]
            mid = cout // 4
            blocks = []
            for bi in range(n_blocks):
                bp = {"w1": conv(1, 1, cin if bi == 0 else cout, mid),
                      "n1": gn(mid),
                      "w2": conv(3, 3, mid, mid), "n2": gn(mid),
                      "w3": conv(1, 1, mid, cout), "n3": gn(cout)}
                if bi == 0:
                    bp["down_w"] = conv(1, 1, cin, cout)
                    bp["down_norm"] = gn(cout)
                blocks.append(bp)
            stages.append(blocks)
            cin = cout
        params["resnet"] = {
            "stem_w": conv(7, 7, 3, sw), "stem_norm": gn(sw),
            "stages": stages,
        }
        params["patch_w"] = dense(cfg.resnet_channels[-1], c)
        params["patch_b"] = jnp.zeros((c,))
        params["readout"] = [{"w": dense(2 * c, c), "b": jnp.zeros((c,))}
                             for _ in range(2)]
        params["post3"] = {"w": conv(1, 1, c, d3), "b": jnp.zeros((d3,))}
        params["post4"] = {"w": conv(1, 1, c, d4), "b": jnp.zeros((d4,)),
                           "w2": conv(3, 3, d4, d4), "b2": jnp.zeros((d4,))}
    else:
        params["patch_w"] = dense(cfg.patch_size ** 2 * 3, c)
        params["patch_b"] = jnp.zeros((c,))
        params["readout"] = [{"w": dense(2 * c, c), "b": jnp.zeros((c,))}
                             for _ in range(4)]
        d1, d2 = cfg.reassemble_dims[0], cfg.reassemble_dims[1]
        params["post1"] = {"w": conv(1, 1, c, d1), "b": jnp.zeros((d1,)),
                           "up_w": jax.random.normal(next(ki), (d1, d1, 4, 4)) / np.sqrt(d1),
                           "up_b": jnp.zeros((d1,))}
        params["post2"] = {"w": conv(1, 1, c, d2), "b": jnp.zeros((d2,)),
                           "up_w": jax.random.normal(next(ki), (d2, d2, 2, 2)) / np.sqrt(d2),
                           "up_b": jnp.zeros((d2,))}
        params["post3"] = {"w": conv(1, 1, c, d3), "b": jnp.zeros((d3,))}
        params["post4"] = {"w": conv(1, 1, c, d4), "b": jnp.zeros((d4,)),
                           "w2": conv(3, 3, d4, d4), "b2": jnp.zeros((d4,))}
    return params


def convert_midas_torch(sd: Dict[str, Any], cfg: DPTConfig) -> Dict[str, Any]:
    """Convert a MiDaS DPT torch state dict (dpt_hybrid-midas-501f0c75.pt /
    dpt_large-midas-2f21e586.pt layout: pretrained.model.* + scratch.*,
    optionally wrapped in a 'model.' prefix by MiDaSInference) to our tree."""
    import numpy as _np

    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}

    def t(k):
        v = sd[k]
        return _np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def cw(k):   # torch conv OIHW -> HWIO
        return t(k).transpose(2, 3, 1, 0)

    def lin(pfx):
        return t(pfx + ".weight").T, t(pfx + ".bias")

    def ln(pfx):
        return {"scale": t(pfx + ".weight"), "bias": t(pfx + ".bias")}

    m = "pretrained.model."
    c = cfg.hidden_size
    params: Dict[str, Any] = {
        "cls": t(m + "cls_token"),
        "pos_emb": t(m + "pos_embed")[0],
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = f"{m}blocks.{i}."
        qw, qb = lin(b + "attn.qkv")
        pw, pb = lin(b + "attn.proj")
        f1w, f1b = lin(b + "mlp.fc1")
        f2w, f2b = lin(b + "mlp.fc2")
        params["blocks"].append({
            "ln1": ln(b + "norm1"), "ln2": ln(b + "norm2"),
            "qkv_w": qw, "qkv_b": qb, "proj_w": pw, "proj_b": pb,
            "fc1_w": f1w, "fc1_b": f1b, "fc2_w": f2w, "fc2_b": f2b,
        })

    if cfg.variant == "dpt_hybrid":
        bb = m + "patch_embed.backbone."
        stages = []
        for si, n_blocks in enumerate(cfg.resnet_layers):
            blocks = []
            for bi in range(n_blocks):
                p = f"{bb}stages.{si}.blocks.{bi}."
                bp = {"w1": cw(p + "conv1.weight"), "n1": ln(p + "norm1"),
                      "w2": cw(p + "conv2.weight"), "n2": ln(p + "norm2"),
                      "w3": cw(p + "conv3.weight"), "n3": ln(p + "norm3")}
                if p + "downsample.conv.weight" in sd:
                    bp["down_w"] = cw(p + "downsample.conv.weight")
                    bp["down_norm"] = ln(p + "downsample.norm")
                blocks.append(bp)
            stages.append(blocks)
        params["resnet"] = {"stem_w": cw(bb + "stem.conv.weight"),
                            "stem_norm": ln(bb + "stem.norm"),
                            "stages": stages}
        # 1x1 proj conv == dense on the channel axis
        params["patch_w"] = t(m + "patch_embed.proj.weight")[:, :, 0, 0].T
        params["patch_b"] = t(m + "patch_embed.proj.bias")
        ros = []
        for idx in (3, 4):
            w, b = lin(f"pretrained.act_postprocess{idx}.0.project.0")
            ros.append({"w": w, "b": b})
        params["readout"] = ros
        params["post3"] = {"w": cw("pretrained.act_postprocess3.3.weight"),
                           "b": t("pretrained.act_postprocess3.3.bias")}
        params["post4"] = {"w": cw("pretrained.act_postprocess4.3.weight"),
                           "b": t("pretrained.act_postprocess4.3.bias"),
                           "w2": cw("pretrained.act_postprocess4.4.weight"),
                           "b2": t("pretrained.act_postprocess4.4.bias")}
    else:
        # patch embed is a 16x16/16 conv; fold to a dense on flattened patches
        w = t(m + "patch_embed.proj.weight")            # [C, 3, 16, 16]
        p = cfg.patch_size
        params["patch_w"] = w.transpose(2, 3, 1, 0).reshape(p * p * 3, c)
        params["patch_b"] = t(m + "patch_embed.proj.bias")
        ros = []
        for idx in (1, 2, 3, 4):
            wl, bl = lin(f"pretrained.act_postprocess{idx}.0.project.0")
            ros.append({"w": wl, "b": bl})
        params["readout"] = ros
        for idx in (1, 2, 3, 4):
            pp = {"w": cw(f"pretrained.act_postprocess{idx}.3.weight"),
                  "b": t(f"pretrained.act_postprocess{idx}.3.bias")}
            if idx in (1, 2):
                pp["up_w"] = t(f"pretrained.act_postprocess{idx}.4.weight")
                pp["up_b"] = t(f"pretrained.act_postprocess{idx}.4.bias")
            if idx == 4:
                pp["w2"] = cw("pretrained.act_postprocess4.4.weight")
                pp["b2"] = t("pretrained.act_postprocess4.4.bias")
            params[f"post{idx}"] = pp

    params["scratch"] = [{"w": cw(f"scratch.layer{i + 1}_rn.weight")}
                         for i in range(4)]
    params["fusion"] = []
    for i in range(4):
        r = f"scratch.refinenet{i + 1}."
        params["fusion"].append({
            "res1": {"w1": cw(r + "resConfUnit1.conv1.weight"),
                     "b1": t(r + "resConfUnit1.conv1.bias"),
                     "w2": cw(r + "resConfUnit1.conv2.weight"),
                     "b2": t(r + "resConfUnit1.conv2.bias")},
            "res2": {"w1": cw(r + "resConfUnit2.conv1.weight"),
                     "b1": t(r + "resConfUnit2.conv1.bias"),
                     "w2": cw(r + "resConfUnit2.conv2.weight"),
                     "b2": t(r + "resConfUnit2.conv2.bias")},
            "out_w": cw(r + "out_conv.weight"),
            "out_b": t(r + "out_conv.bias"),
        })
    params["head"] = {
        "w1": cw("scratch.output_conv.0.weight"), "b1": t("scratch.output_conv.0.bias"),
        "w2": cw("scratch.output_conv.2.weight"), "b2": t("scratch.output_conv.2.bias"),
        "w3": cw("scratch.output_conv.4.weight"), "b3": t("scratch.output_conv.4.bias"),
    }
    return jax.tree.map(jnp.asarray, params)
