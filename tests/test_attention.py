"""Memory-efficient attention: exactness vs the dense reference.

The MV-UNet's joint-frame self-attention (priors/see3d.py::CrossAttention)
routes through ops/attention.py once the logits would not fit; these tests
pin the chunked online-softmax path to the dense computation.
Reference role model: See3D mv_unet.py:139-227 (xformers
memory_efficient_attention is bit-compatible with dense softmax attention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.ops.attention import (
    chunked_attention,
    memory_efficient_attention,
)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


class TestChunkedAttention:
    @pytest.mark.parametrize("N,M", [(64, 64), (300, 300), (1000, 257)])
    def test_matches_dense(self, N, M):
        B, H, D = 2, 3, 32
        q, k, v = (_rand((B, N, H, D), 0), _rand((B, M, H, D), 1),
                   _rand((B, M, H, D), 2))
        ref = jax.nn.dot_product_attention(q, k, v)
        got = chunked_attention(q, k, v, q_chunk=128, kv_chunk=96)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    def test_non_divisible_padding_is_masked(self):
        # M far from a chunk multiple: padded keys must contribute nothing.
        q, k, v = (_rand((1, 50, 2, 16), 3), _rand((1, 33, 2, 16), 4),
                   _rand((1, 33, 2, 16), 5))
        ref = jax.nn.dot_product_attention(q, k, v)
        got = chunked_attention(q, k, v, q_chunk=64, kv_chunk=64)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    def test_bf16_inputs_f32_accumulation(self):
        q, k, v = (_rand((1, 256, 2, 64), 6, jnp.bfloat16),
                   _rand((1, 256, 2, 64), 7, jnp.bfloat16),
                   _rand((1, 256, 2, 64), 8, jnp.bfloat16))
        ref = jax.nn.dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32))
        got = chunked_attention(q, k, v, q_chunk=128, kv_chunk=128)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            got.astype(jnp.float32), ref, atol=2e-2, rtol=2e-2)

    def test_extreme_logits_stay_finite(self):
        # Online softmax must not overflow exp() on large-scale inputs.
        q = 30.0 * _rand((1, 130, 1, 8), 9)
        k = 30.0 * _rand((1, 130, 1, 8), 10)
        v = _rand((1, 130, 1, 8), 11)
        got = chunked_attention(q, k, v, q_chunk=64, kv_chunk=64)
        assert np.isfinite(np.asarray(got)).all()
        ref = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class TestRouting:
    def test_small_problem_matches_dense(self):
        q, k, v = (_rand((2, 65, 4, 16), 12), _rand((2, 65, 4, 16), 13),
                   _rand((2, 65, 4, 16), 14))
        got = memory_efficient_attention(q, k, v)
        ref = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_large_problem_takes_chunked_path(self, monkeypatch):
        import g4splat_tpu.ops.attention as A

        calls = {}
        orig = A.chunked_attention

        def spy(q, k, v, **kw):
            calls["hit"] = True
            return orig(q, k, v, **kw)

        monkeypatch.setattr(A, "chunked_attention", spy)
        monkeypatch.setattr(A, "_DENSE_LOGITS_LIMIT", 32 * 32)
        q = _rand((1, 64, 1, 8), 15)
        got = A.memory_efficient_attention(q, q, q)
        assert calls.get("hit"), "big logits must route to the chunked path"
        ref = jax.nn.dot_product_attention(q, q, q)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
