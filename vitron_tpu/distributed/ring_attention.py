"""Ring attention: sequence-parallel attention over the `context` mesh axis.

New capability the reference lacks entirely (SURVEY §2.4: no sequence /
context parallelism anywhere — long videos are handled by dropping frames to
a fixed 8, processing_video.py:93). Here the sequence dim shards over the
`context` mesh axis; K/V shards rotate around the ring with
`jax.lax.ppermute` while each device accumulates online-softmax partial
attention for its local queries — O(S/N) memory per device, exact result.

Designed for shard_map over the (…, context) mesh; collectives ride ICI.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _block_attend(q, k, v, q_start, k_start, scale, causal):
    """Local block: q [B,Sq,N,D] vs k/v [B,Sk,N,D] -> (out*sumexp, max, sumexp)."""
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) * scale
    if causal:
        qpos = q_start + jnp.arange(q.shape[1])[:, None]
        kpos = k_start + jnp.arange(k.shape[1])[None, :]
        mask = qpos >= kpos
        logits = jnp.where(mask[None, None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)            # [B,N,Sq,1]
    # guard all-masked rows
    m_safe = jnp.maximum(m, -1e30)
    p = jnp.exp(logits - m_safe)
    p = jnp.where(logits <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v).astype(jnp.float32)
    return o, m_safe, l


def ring_attention_shard(q, k, v, axis_name: str, scale: Optional[float] = None,
                         causal: bool = True):
    """Per-shard body (call inside shard_map). q/k/v: [B, S_local, N, D];
    sequence is sharded contiguously over `axis_name`."""
    b, s_local, n, d = q.shape
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    q_start = my * s_local

    o_acc = jnp.zeros((b, s_local, n, d), jnp.float32)
    m_acc = jnp.full((b, n, s_local, 1), -1e30, jnp.float32)
    l_acc = jnp.zeros((b, n, s_local, 1), jnp.float32)

    def step(i, carry):
        o_acc, m_acc, l_acc, k_cur, v_cur = carry
        src = (my - i) % size          # which shard's K/V we hold now
        k_start = src * s_local
        o, m, l = _block_attend(q, k_cur, v_cur, q_start, k_start, scale, causal)
        m_new = jnp.maximum(m_acc, m)
        alpha_old = jnp.exp(m_acc - m_new)
        alpha_blk = jnp.exp(m - m_new)
        l_acc2 = l_acc * alpha_old + l * alpha_blk
        # o is [B,Sq,N,D]; scale rows by per-(n,q) alphas
        o_acc2 = (o_acc * alpha_old.transpose(0, 2, 1, 3)
                  + o * alpha_blk.transpose(0, 2, 1, 3))
        # rotate K/V to the next device
        perm = [(j, (j + 1) % size) for j in range(size)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return o_acc2, m_new, l_acc2, k_nxt, v_nxt

    o_acc, m_acc, l_acc, _, _ = jax.lax.fori_loop(
        0, size, step, (o_acc, m_acc, l_acc, k, v))
    denom = jnp.maximum(l_acc, 1e-30).transpose(0, 2, 1, 3)
    return (o_acc / denom).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "context",
                   scale: Optional[float] = None, causal: bool = True):
    """Full-array entry: shards the sequence dim of q/k/v over `axis_name`
    and runs the ring. q/k/v: [B, S, N, D] with S divisible by the axis."""
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(ring_attention_shard, axis_name=axis_name,
                          scale=scale, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
