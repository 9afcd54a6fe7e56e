"""Memory-efficient exact attention for long token sequences.

The reference's MV-UNet runs its "3D" self-attention over the tokens of ALL
frames jointly and leans on xformers' memory-efficient kernels to make that
feasible (See3D mv_unet.py:139-227 wraps xformers.ops.memory_efficient_
attention; at 512px latents with F frames the sequence is F*64*64 tokens, so
materialising the (N, N) logits is tens of GB).  The TPU-native equivalent
here is an online-softmax (FlashAttention-style) computation that never
materialises more than a (q_chunk, kv_chunk) logits tile per head:

* ``chunked_attention`` — pure-JAX lax.scan over query/key blocks with f32
  accumulation.  Exact (not an approximation): the online rescaling
  reproduces softmax(QK^T)V up to float associativity.  Runs on every
  backend, so CPU tests exercise the same code path as the chip.
* ``memory_efficient_attention`` — the public entry: small problems keep
  ``jax.nn.dot_product_attention`` (one fused XLA kernel, fastest when the
  logits fit), big ones switch to the chunked path.  On TPU, self-attention
  shapes that tile cleanly use the Pallas flash-attention kernel shipped
  with JAX (jax.experimental.pallas.ops.tpu.flash_attention) — MXU-tiled,
  double-buffered, the speed-of-light path.

All functions take/return ``(B, N, H, D)`` (query) / ``(B, M, H, D)``
(key/value) tensors, matching ``jax.nn.dot_product_attention``.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Switch to the chunked path once the full per-head logits for one batch
# element would exceed this many elements (f32): 4096^2 = 64 MB of logits
# per (batch, head) — past that the fused XLA path starts spilling.
_DENSE_LOGITS_LIMIT = 4096 * 4096
# Opt-in routing to the shipped Pallas flash kernel for shapes it tiles
# cleanly (D >= 128, block-divisible N/M) — see memory_efficient_attention.
_USE_TPU_FLASH = bool(int(__import__("os").environ.get(
    "G4_TPU_FLASH_ATTENTION", "0")))

# Default tile sizes: 8 MB f32 logits tile per (batch, head) pair.
_Q_CHUNK = 1024
_KV_CHUNK = 2048

_NEG_INF = -0.7 * jnp.finfo(jnp.float32).max


def _pad_axis(x, axis, to):
    n = x.shape[axis]
    if n % to == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - n % to)
    return jnp.pad(x, pad), n


@partial(jax.jit, static_argnames=("q_chunk", "kv_chunk"))
def chunked_attention(q, k, v, *, q_chunk: int = _Q_CHUNK,
                      kv_chunk: int = _KV_CHUNK):
    """Exact attention with O(q_chunk * kv_chunk) live logits per head.

    q: (B, N, H, D); k, v: (B, M, H, D).  Returns (B, N, H, D) in q's dtype.
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = 1.0 / (D ** 0.5)

    qp, _ = _pad_axis(q, 1, q_chunk)
    kp, _ = _pad_axis(k, 1, kv_chunk)
    vp, _ = _pad_axis(v, 1, kv_chunk)
    nq = qp.shape[1] // q_chunk
    nk = kp.shape[1] // kv_chunk

    # (nk, B, H, kv_chunk, D) blocks; padded keys masked by position.
    kb = jnp.moveaxis(kp.reshape(B, nk, kv_chunk, H, D), (1, 3), (0, 2))
    vb = jnp.moveaxis(vp.reshape(B, nk, kv_chunk, H, D), (1, 3), (0, 2))
    k_pos = (jnp.arange(nk * kv_chunk).reshape(nk, kv_chunk) < M)

    def q_block(qc):
        # qc: (B, q_chunk, H, D) -> (B, H, q_chunk, D)
        qc = jnp.moveaxis(qc, 2, 1).astype(jnp.float32) * scale

        def body(carry, blk):
            m, l, acc = carry
            kc, vc, valid = blk
            s = jnp.einsum("bhqd,bhkd->bhqk", qc, kc.astype(jnp.float32))
            s = jnp.where(valid[None, None, None, :], s, _NEG_INF)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + p.sum(axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32))
            return (m_new, l, acc), None

        m0 = jnp.full((B, H, q_chunk), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, H, q_chunk), jnp.float32)
        a0 = jnp.zeros((B, H, q_chunk, D), jnp.float32)
        (m, l, acc), _ = lax.scan(body, (m0, l0, a0), (kb, vb, k_pos))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return jnp.moveaxis(out, 1, 2)  # (B, q_chunk, H, D)

    out = lax.map(q_block, jnp.moveaxis(
        qp.reshape(B, nq, q_chunk, H, D), 1, 0))
    out = jnp.moveaxis(out, 0, 1).reshape(B, nq * q_chunk, H, D)[:, :N]
    return out.astype(q.dtype)


def _tpu_flash(q, k, v):
    """Route to JAX's shipped Pallas flash-attention kernel (TPU only).

    Expects (B, N, H, D) layout; the kernel wants (B, H, N, D) with
    block-divisible sequence lengths. Returns None if the shape doesn't
    tile (caller falls back to the chunked path).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, N, H, D = q.shape
    M = k.shape[1]
    blk = 512
    if N % blk or M % blk or D % 64:
        return None
    bs = fa.BlockSizes(
        block_q=min(blk, N), block_k_major=min(blk, M), block_k=min(blk, M),
        block_b=1, block_q_major_dkv=min(blk, N), block_k_major_dkv=min(blk, M),
        block_q_dkv=min(blk, N), block_k_dkv=min(blk, M),
        block_q_dq=min(blk, N), block_k_dq=min(blk, M),
        block_k_major_dq=min(blk, M),
    )
    f = jnp.moveaxis  # (B, N, H, D) -> (B, H, N, D)
    out = fa.flash_attention(
        f(q, 1, 2), f(k, 1, 2), f(v, 1, 2),
        sm_scale=1.0 / (D ** 0.5), block_sizes=bs,
    )
    return f(out, 1, 2)


def memory_efficient_attention(q, k, v):
    """Drop-in for ``jax.nn.dot_product_attention`` that stays exact while
    bounding attention memory.

    Measured on v5e at the MV-UNet budget shape (B=2, H=5, D=64, N=M=36864):
    chunked 76.1 ms vs the shipped Pallas flash kernel's 87.9 ms (D=64 pads
    to 128 lanes there, idling half the MXU), both exact to 5e-5 — so the
    chunked path is the big-problem default; set G4_TPU_FLASH_ATTENTION=1 to
    route cleanly-tiling D>=128 workloads to ``_tpu_flash`` instead.

    The dense-path budget counts the full (B, H, N, M) logits tensor, not
    just N·M — large batch·head products spill to the chunked path too."""
    B, N, H, _ = q.shape
    M = k.shape[1]
    if B * H * N * M <= _DENSE_LOGITS_LIMIT:
        return jax.nn.dot_product_attention(q, k, v)
    if _USE_TPU_FLASH and jax.default_backend() not in ("cpu",):
        out = _tpu_flash(q, k, v)
        if out is not None:
            return out
    return chunked_attention(q, k, v)
