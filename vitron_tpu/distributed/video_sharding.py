"""Multi-chip sharding for the video diffusion UNets.

The faithful UNetSD_T2V (dim=512, reference
modules/i2vgen-xl/tools/modules/unet/unet_t2v.py:20-50) is a 4.4B-param,
~86 TFLOP/CFG-step model: a single v5e chip (197 TF/s bf16 peak) tops out at
2.3 steps/s at 100% MFU, so the ZeroScope 50-step request (app.py:228-240)
cannot meet interactive latency on one chip — the TPU-native answer is to
shard the *step* over the mesh and let XLA place the collectives on ICI.

Layout: activations are [B(=2 CFG), F, H, W, C].

- `cfg` axis (size 2): the classifier-free-guidance pair is embarrassingly
  parallel until the final guided combine (one tiny all-gather of eps).
- `frames` axis: spatial convs/attention fold F into the batch dim, so they
  are also embarrassingly parallel; the temporal ops (k=3 temporal conv,
  frame self-attention) need their F-neighborhood — GSPMD inserts the halo
  exchange / all-gather for exactly those ops.

Params are replicated (4.4B bf16 = 8.8 GB fits each 16 GB chip alongside
activation shards; weight reads are ~11 ms/step of the ~440 ms compute floor,
so replication costs bandwidth-nothing and avoids weight all-gathers).

Use `shard_video_step` to wrap any (params, x, t, ctx, ...) -> eps step
function; `dryrun` / tests run it on a virtual CPU mesh
(tests/test_video_sharding.py), the driver's `dryrun_multichip` on n virtual
devices, and real deployments on a (2, n/2) slice.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CFG_AXIS = "cfg"
FRAME_AXIS = "frames"


def create_video_mesh(n_devices: int, devices: Optional[Sequence] = None,
                      cfg_parallel: bool = True) -> Mesh:
    """(cfg=2, frames=n/2) when possible, else (1, n)."""
    devices = list(devices if devices is not None else jax.devices())[:n_devices]
    cfg_size = 2 if (cfg_parallel and n_devices % 2 == 0) else 1
    frames = n_devices // cfg_size
    arr = np.asarray(devices).reshape(cfg_size, frames)
    return Mesh(arr, (CFG_AXIS, FRAME_AXIS))


def video_in_shardings(mesh: Mesh):
    """Sharding for the latent tensor [B, F, H, W, C]."""
    return NamedSharding(mesh, P(CFG_AXIS, FRAME_AXIS))


def shard_video_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """jit `step_fn(params, x, *cond)` with x sharded (cfg, frames) and
    everything else replicated; the output eps keeps x's sharding.

    XLA/GSPMD derives every internal collective: halo exchanges for the
    temporal k=3 convs, frame-axis all-gathers for the per-pixel frame
    attention, nothing for the folded spatial ops."""
    xs = video_in_shardings(mesh)
    rep = NamedSharding(mesh, P())
    cache = {}

    def call(params, x, *cond):
        n = len(cond)
        fn = cache.get(n)
        if fn is None:
            # pytree-prefix shardings: `rep` covers the whole params tree
            fn = cache[n] = jax.jit(
                step_fn, in_shardings=(rep, xs) + (rep,) * n,
                out_shardings=xs)
        return fn(params, x, *cond)

    return call
