"""StableVideo: atlas-based video editing with ControlNet.

TPU-native rebuild of the reference editor (reference:
modules/StableVideo/app.py:67-413 + stablevideo/atlas_data.py,
implicit_neural_networks.py:20-70). A video is represented by precomputed
Neural Layered Atlases: IMLP networks map (x, y, t) pixels to foreground /
background atlas UVs plus alpha. Editing:

- background: ControlNet img2img on the background atlas crop
  (app.py:79-139);
- foreground: per-keyframe ControlNet (canny) edit with an
  atlas-propagated init latent (stochastic encode at strength*T, then DDIM
  decode, app.py:197-223), scattered back to atlas space with scipy
  griddata on host (app.py:241-251), median-aggregated;
- render: per-frame UV grid-sample of the edited atlases + alpha blend
  (app.py:292-413). grid_sample == map_coordinates, fully on device; the
  reference runs it per frame in Python, here frames batch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- IMLP

@dataclasses.dataclass(frozen=True)
class IMLPConfig:
    input_dim: int = 3
    hidden_dim: int = 256
    output_dim: int = 2
    num_layers: int = 8
    positional_dim: int = 10  # frequencies for positional encoding
    skip_layers: Tuple[int, ...] = (4, 7)


def positional_encode(x: jax.Array, num_freqs: int) -> jax.Array:
    """[..., D] -> [..., D*2*num_freqs] sin/cos at 2^i (implicit_neural_
    networks.py:6-17 convention)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32) * np.pi
    ang = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(x.shape[:-1] + (-1,))


def imlp_forward(params: Dict[str, Any], cfg: IMLPConfig, x: jax.Array,
                 use_tanh: bool = True) -> jax.Array:
    """x: [..., 3] (x, y, t) in [-1, 1] -> [..., output_dim]."""
    inp = positional_encode(x, cfg.positional_dim) if cfg.positional_dim > 0 else x
    h = inp
    for i, layer in enumerate(params["layers"]):
        if i in cfg.skip_layers:
            h = jnp.concatenate([h, inp], axis=-1)
        h = h @ layer["w"] + layer["b"]
        if i < len(params["layers"]) - 1:
            h = jnp.maximum(h, 0.0)
    return jnp.tanh(h) if use_tanh else h


def imlp_init(rng: jax.Array, cfg: IMLPConfig) -> Dict[str, Any]:
    in_dim = cfg.input_dim * 2 * cfg.positional_dim if cfg.positional_dim else cfg.input_dim
    dims = [in_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [cfg.output_dim]
    layers = []
    ks = jax.random.split(rng, cfg.num_layers)
    for i in range(cfg.num_layers):
        d_in = dims[i] + (in_dim if i in cfg.skip_layers else 0)
        layers.append({
            "w": jax.random.normal(ks[i], (d_in, dims[i + 1]), jnp.float32) / np.sqrt(d_in),
            "b": jnp.zeros((dims[i + 1],)),
        })
    return {"layers": layers}


def convert_imlp_torch(sd, prefix: str = "") -> Dict[str, Any]:
    """Convert a torch IMLP state dict. The released NLA checkpoints name
    the stack `hidden.{i}` (implicit_neural_networks.py:46); `layers.{i}` /
    `hidden_layers.{i}` are accepted for other IMLP exports."""
    import numpy as np

    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    layers = []
    i = 0
    while True:
        stem = next((f"{prefix}{nm}.{i}" for nm in ("hidden", "hidden_layers", "layers")
                     if f"{prefix}{nm}.{i}.weight" in sd), None)
        if stem is None:
            break
        layers.append({"w": np.ascontiguousarray(_np(sd[stem + ".weight"]).T),
                       "b": _np(sd[stem + ".bias"])})
        i += 1
    if not layers:
        raise ValueError(
            f"no IMLP layers found under prefix {prefix!r}; keys look like "
            f"{sorted(sd)[:3]}")
    return {"layers": layers}


# ----------------------------------------------------------------- render

def grid_sample_bilinear(img: jax.Array, uv: jax.Array) -> jax.Array:
    """torch F.grid_sample(align_corners=True) equivalent.
    img: [H, W, C]; uv: [..., 2] in [-1, 1] (x, y). Returns [..., C]."""
    h, w, c = img.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = x - x0
    wy = y - y0
    out = (img[y0, x0] * ((1 - wy) * (1 - wx))[..., None]
           + img[y0, x1] * ((1 - wy) * wx)[..., None]
           + img[y1, x0] * (wy * (1 - wx))[..., None]
           + img[y1, x1] * (wy * wx)[..., None])
    return out


def render_frames(fg_atlas: jax.Array, bg_atlas: jax.Array,
                  fg_uv: jax.Array, bg_uv: jax.Array,
                  alpha: jax.Array) -> jax.Array:
    """Alpha-composite edited atlases into frames (app.py:292-413).

    fg_atlas/bg_atlas: [Ha, Wa, 3] in [0, 1]; fg_uv/bg_uv: [T, H, W, 2] in
    [-1, 1]; alpha: [T, H, W, 1]. Returns [T, H, W, 3]."""

    def per_frame(args):
        fuv, buv, a = args
        fg = grid_sample_bilinear(fg_atlas, fuv)
        bg = grid_sample_bilinear(bg_atlas, buv)
        return fg * a + bg * (1.0 - a)

    return jax.lax.map(per_frame, (fg_uv, bg_uv, alpha))


def atlas_uvs(fg_mlp, bg_mlp, alpha_mlp, imlp_cfgs, t_frames: int, h: int, w: int,
              fg_uv_scale=None, bg_uv_scale=None, max_frames: int = None):
    """Evaluate the IMLP mapping networks on the full (x, y, t) grid,
    batched on device (atlas_utils.py:92-120 get_frames_data, which the
    reference runs frame-by-frame in Python).

    Released-checkpoint input conventions (atlas_utils.py:93-109): pixel
    (x, y) are both normalized by max(resx, resy)/2 and t by
    maximum_number_of_frames/2 (`indices / normalizing_factor - 1`), so a
    shorter axis does NOT span [-1, 1]. Alpha head: 0.5*(tanh+1) then
    0.99*a + 0.001 (atlas_utils.py:118-119). The raw UV outputs in [-1, 1]
    index the SEPARATE fg/bg atlas images directly — the reference's
    `*0.5+0.5` / `*0.5-0.5` maps the same values onto its combined
    two-quadrant texture.

    max_frames: the checkpoint config's maximum_number_of_frames
    (defaults to t_frames). Returns fg_uv, bg_uv [T, H, W, 2] and alpha
    [T, H, W, 1]."""
    half = max(h, w) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) / half - 1.0
    xs = jnp.arange(w, dtype=jnp.float32) / half - 1.0
    mf = float(max_frames if max_frames is not None else t_frames)
    ts = jnp.arange(t_frames, dtype=jnp.float32) / (mf / 2.0) - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")

    def per_t(tv):
        pts = jnp.stack([gx, gy, jnp.full_like(gx, tv)], axis=-1)  # [H, W, 3]
        fg = imlp_forward(fg_mlp, imlp_cfgs["fg"], pts)
        bg = imlp_forward(bg_mlp, imlp_cfgs["bg"], pts)
        a = imlp_forward(alpha_mlp, imlp_cfgs["alpha"], pts, use_tanh=False)
        a = 0.5 * (jax.nn.tanh(a) + 1.0)  # alpha head convention
        a = 0.99 * a + 0.001
        return fg, bg, a

    fg, bg, a = jax.lax.map(per_t, ts)
    if fg_uv_scale is not None:
        fg = fg * fg_uv_scale
    if bg_uv_scale is not None:
        bg = bg * bg_uv_scale
    return fg, bg, a


# ----------------------------------------------------------------- editing

def canny_hint(image_uint8: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    """Host-side canny edge hint (reference annotator/canny uses cv2)."""
    import cv2

    edges = cv2.Canny(image_uint8, low, high)
    return (np.stack([edges] * 3, axis=-1) / 255.0).astype(np.float32)


def depth_hint(depth_params, depth_cfg, image_uint8: np.ndarray) -> np.ndarray:
    """DPT depth hint for the depth-ControlNet background edit
    (StableVideo/app.py:79-139); delegates to the parity-tested MiDaS
    annotator in depth.py."""
    from vitron_tpu.models.diffusion import depth as depth_mod

    return depth_mod.depth_hint(depth_params, depth_cfg, image_uint8)


def scatter_to_atlas(edited_frame: np.ndarray, uv: np.ndarray,
                     atlas_hw: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """Host: map an edited keyframe back to atlas space with griddata
    (app.py:241-251). uv in [-1, 1]; returns (atlas_rgb, valid_mask)."""
    from scipy.interpolate import griddata

    ha, wa = atlas_hw
    pts_x = (uv[..., 0].reshape(-1) + 1) * 0.5 * (wa - 1)
    pts_y = (uv[..., 1].reshape(-1) + 1) * 0.5 * (ha - 1)
    pts = np.stack([pts_y, pts_x], axis=1)
    vals = edited_frame.reshape(-1, edited_frame.shape[-1])
    gy, gx = np.mgrid[0:ha, 0:wa]
    out = griddata(pts, vals, (gy, gx), method="linear")
    valid = ~np.isnan(out[..., 0])
    out = np.nan_to_num(out)
    return out.astype(np.float32), valid


class StableVideoEditor:
    """Edit foreground/background atlases with ControlNet and re-render.

    Holds the canny ControlNet + SD UNet/VAE/text params (resident; the
    reference rebuilds StableVideo per request, app.py:295-303)."""

    def __init__(self, unet_cfg, unet_params, control_params, vae_cfg,
                 vae_params, text_cfg, text_params, tokenizer=None,
                 depth_control_params=None, depth_annotator=None):
        """control_params: the canny ControlNet (control_sd15_canny.pth);
        depth_control_params: the depth ControlNet used for background edits
        (control_sd15_depth.pth, reference app.py:84-88);
        depth_annotator: (dpt_params, DPTConfig) for the MiDaS hint."""
        self.unet_cfg = unet_cfg
        self.unet_params = unet_params
        self.control_params = control_params
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        self.text_cfg = text_cfg
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.depth_control_params = depth_control_params
        self.depth_annotator = depth_annotator

    def _encode_prompt(self, texts):
        from vitron_tpu.models.diffusion import clip_text

        tok = self.tokenizer(texts, padding="max_length",
                             max_length=self.text_cfg.max_length,
                             truncation=True, return_tensors="np")
        return clip_text.encode(self.text_params, self.text_cfg,
                                jnp.asarray(tok["input_ids"]))

    def edit_image(self, image: Optional[jax.Array], hint: jax.Array,
                   prompt: str,
                   negative_prompt: str = "", strength: float = 0.9,
                   steps: int = 20, guidance_scale: float = 9.0,
                   rng: Optional[jax.Array] = None,
                   init_latent: Optional[jax.Array] = None,
                   from_noise: bool = False,
                   control: str = "canny") -> jax.Array:
        """ControlNet img2img (app.py:79-139 background path / :197-223
        keyframe path): stochastic-encode the init latent at strength*T,
        DDIM-decode with control residuals. image [H, W, 3] uint8; hint
        [H, W, 3] float in [0, 1]. `from_noise=True` samples the full DDIM
        chain from pure noise instead (the first keyframe of
        advanced_edit_foreground, app.py:203-209)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t_enc = (steps - 1) if from_noise else min(int(strength * steps),
                                                   steps - 1)
        use_image = init_latent is None
        if use_image:
            ds = 2 ** (len(self.vae_cfg.channel_mult) - 1)
            lh, lw = image.shape[0] // ds, image.shape[1] // ds
            init_latent = jnp.zeros((1, lh, lw, 4), jnp.float32)
            image = jnp.asarray(image)
        else:
            lh, lw = init_latent.shape[1:3]
            image = jnp.zeros((8, 8, 3), jnp.uint8)     # unused placeholder
        tok = self.tokenizer([prompt, negative_prompt], padding="max_length",
                             max_length=self.text_cfg.max_length,
                             truncation=True, return_tensors="np")
        cp = (self.depth_control_params
              if control == "depth" and self.depth_control_params is not None
              else self.control_params)
        run = self._get_edit_run(steps, t_enc, float(guidance_scale),
                                 from_noise, use_image, (lh, lw))
        return run(self.unet_params, cp, self.vae_params, self.text_params,
                   jnp.asarray(tok["input_ids"]), image, jnp.asarray(hint),
                   jnp.asarray(init_latent), rng)

    def _get_edit_run(self, steps: int, t_enc: int, guidance_scale: float,
                      from_noise: bool, use_image: bool,
                      latent_hw: Tuple[int, int]):
        """One jitted program per static edit configuration: on the
        tunnel-attached TPU each eager op costs ~33 ms of dispatch, so the
        original eager DDIM python loop took minutes per edit."""
        from vitron_tpu.models.diffusion import clip_text, controlnet, samplers, vae
        from vitron_tpu.models.diffusion.vae import SD_SCALE_FACTOR

        if not hasattr(self, "_edit_cache"):
            from vitron_tpu.runtime.telemetry import ProgramCache
            self._edit_cache = ProgramCache("stablevideo-edit", max_entries=8)
        key = (steps, t_enc, guidance_scale, from_noise, use_image, latent_hw)
        fn = self._edit_cache.lookup(key)
        if fn is not None:
            return fn
        cfg = self.unet_cfg
        lh, lw = latent_hw
        sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
        ts, alphas, alphas_prev, _ = samplers.make_ddim_arrays(sched, steps, 0.0)
        idx = np.arange(t_enc, -1, -1)
        scan_ts = jnp.asarray(ts[idx], jnp.int32)
        scan_a = jnp.asarray(alphas[idx])
        scan_ap = jnp.asarray(alphas_prev[idx])

        def run(unet_params, ctrl_params, vae_params, text_params, ids2,
                image, hint, init_latent, rng):
            ctx2 = clip_text.encode(text_params, self.text_cfg, ids2)
            if use_image:
                img = (image.astype(jnp.float32) / 255.0 - 0.5) / 0.5
                mean, _ = vae.encode(vae_params, self.vae_cfg, img[None])
                init = mean * SD_SCALE_FACTOR
            else:
                init = init_latent
            # the hint encoder downsamples 8x; align it to the latent grid
            if hint.shape[:2] != (lh * 8, lw * 8):
                hint = jax.image.resize(hint, (lh * 8, lw * 8, 3),
                                        method="linear")
            hint2 = jnp.concatenate([hint[None], hint[None]], axis=0)

            rng2, k = jax.random.split(rng)
            if from_noise:
                x = jax.random.normal(k, init.shape, init.dtype)
            else:
                # stochastic encode at step t_enc (ldm ddim stochastic_encode)
                a_enc = scan_a[0]
                noise = jax.random.normal(k, init.shape, init.dtype)
                x = jnp.sqrt(a_enc) * init + jnp.sqrt(1 - a_enc) * noise

            def step(x, inp):
                t, a, ap = inp
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.broadcast_to(t, (2,))
                ctrl = controlnet.control_residuals(ctrl_params, cfg, xx,
                                                    hint2, tt, ctx2)
                out = controlnet.controlled_forward(unet_params, cfg, xx, tt,
                                                    ctx2, ctrl)
                e_c, e_uc = jnp.split(out, 2, axis=0)
                e = e_uc + guidance_scale * (e_c - e_uc)
                x, _ = samplers._x_prev(x, e, a, ap, jnp.zeros((), x.dtype),
                                        jnp.zeros((), x.dtype))
                return x, None

            x, _ = jax.lax.scan(step, x, (scan_ts, scan_a, scan_ap))
            out = vae.decode(vae_params, self.vae_cfg, x / SD_SCALE_FACTOR)[0]
            out = jnp.clip(out, -1, 1) * 0.5 + 0.5
            return (out * 255).astype(jnp.uint8)

        return self._edit_cache.store(key, jax.jit(run))


# ------------------------------------------------------ foreground editing

def advanced_edit_foreground(
    editor: "StableVideoEditor",
    keyframes: List[np.ndarray],          # [H, W, 3] uint8 fg crops
    keyframe_uvs: List[np.ndarray],       # [H, W, 2] in [-1, 1] into fg atlas
    keyframe_alphas: List[np.ndarray],    # [H, W, 1] in [0, 1]
    atlas_hw: Tuple[int, int],
    prompt: str,
    negative_prompt: str = "",
    strength: float = 0.9,
    steps: int = 20,
    guidance_scale: float = 9.0,
    rng: Optional[jax.Array] = None,
    aggnet_refine: bool = False,
    aggnet_epochs: int = 50,
    aggnet_lr: float = 1e-3,
) -> np.ndarray:
    """The reference foreground flow (app.py:143-280): per-keyframe canny
    ControlNet edit — the first keyframe from pure noise, later keyframes
    initialised from the previous keyframe's atlas mapped through their own
    UVs (stochastic encode at strength*T, app.py:197-223) — alpha-multiplied,
    scattered to atlas space (scipy griddata on host, app.py:241-251),
    median-aggregated across keyframes, optionally refined with a small
    AGGNet trained to reproduce the edited keyframes (app.py:256-276).

    Returns the aggregated foreground atlas [Ha, Wa, 3] float in [0, 1].
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = len(keyframes)
    per_kf_atlas = np.zeros((n,) + tuple(atlas_hw) + (3,), np.float32)
    edited_list = []

    for i in range(n):
        kf = np.asarray(keyframes[i])
        hint = canny_hint(kf)
        rng, k = jax.random.split(rng)
        if i == 0:
            edited = editor.edit_image(
                jnp.asarray(kf), jnp.asarray(hint), prompt, negative_prompt,
                steps=steps, guidance_scale=guidance_scale, rng=k,
                from_noise=True)
        else:
            # propagate: previous keyframe's atlas sampled at this frame's UVs
            mapped = grid_sample_bilinear(
                jnp.asarray(per_kf_atlas[i - 1]), jnp.asarray(keyframe_uvs[i]))
            mapped = jnp.clip(mapped, 0.0, 1.0)
            edited = editor.edit_image(
                (mapped * 255).astype(jnp.uint8), jnp.asarray(hint), prompt,
                negative_prompt, strength=strength, steps=steps,
                guidance_scale=guidance_scale, rng=k)
        edited_f = np.asarray(edited, np.float32) / 255.0
        edited_f = edited_f * np.asarray(keyframe_alphas[i])  # app.py:234
        edited_list.append(edited_f)
        atlas_i, _ = scatter_to_atlas(edited_f, np.asarray(keyframe_uvs[i]),
                                      atlas_hw)
        per_kf_atlas[i] = atlas_i

    agg = np.median(per_kf_atlas, axis=0)  # app.py:255

    if aggnet_refine and n > 1:
        agg = np.asarray(_aggnet_refine(
            jnp.asarray(agg), [jnp.asarray(e) for e in edited_list],
            [jnp.asarray(u) for u in keyframe_uvs],
            epochs=aggnet_epochs, lr=aggnet_lr))
    return agg


def _aggnet_refine(agg_atlas: jax.Array, edited_frames: List[jax.Array],
                   uvs: List[jax.Array], epochs: int = 50,
                   lr: float = 1e-3) -> jax.Array:
    """AGGNet refinement (app.py:256-276): train a 2-conv residual net with
    SGD+momentum so grid-sampling the refined atlas reproduces every edited
    keyframe (L1), then apply it once. All on device via optax."""
    import optax

    params = aggnet_init(jax.random.PRNGKey(0))
    opt = optax.sgd(lr, momentum=0.9)
    opt_state = opt.init(params)

    def loss_fn(p):
        refined = aggnet_forward(p, agg_atlas[None])[0]
        total = 0.0
        for e, uv in zip(edited_frames, uvs):
            rec = jnp.clip(grid_sample_bilinear(refined, uv), 0.0, 1.0)
            total = total + jnp.mean(jnp.abs(rec - e))
        return total

    @jax.jit
    def train_step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(epochs):
        params, opt_state, _ = train_step(params, opt_state)
    return aggnet_forward(params, agg_atlas[None])[0]


# ----------------------------------------------------------------- AGGNet

def aggnet_forward(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Atlas refinement net (reference stablevideo/aggnet.py:3-17):
    conv3x3(3->64) + ReLU + conv3x3(64->3), residual. x: [B, H, W, 3]."""
    h = jax.lax.conv_general_dilated(
        x, p["w1"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.nn.relu(h)
    h = jax.lax.conv_general_dilated(
        h, p["w2"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + h


def aggnet_init(rng: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(rng)
    return {
        "w1": jax.random.normal(k1, (3, 3, 3, 64)) / np.sqrt(27),
        "w2": jax.random.normal(k2, (3, 3, 64, 3)) / np.sqrt(576),
    }
